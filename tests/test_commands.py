"""Command steps + parallel output tasks (reference job-command.rs,
job.rs:606-643,433-451,280-314)."""

from __future__ import annotations

import time

import pytest

from etl_tools_rs_spark.jobs.runner import JobRunner, JobStepError
from etl_tools_rs_spark.jobs.state import RUN_COMPLETED, RUN_FATAL
from etl_tools_rs_spark.sinks.simple_store import MemoryStore


def test_run_cmd_success_and_skip():
    store = MemoryStore()
    calls = []
    jr = JobRunner("c1", "cmds", store)
    jr.run_cmd("ddl", lambda r: calls.append("ran"))
    jr.complete()
    assert calls == ["ran"]

    # re-run: command step skipped (job.rs:610-617)
    jr2 = JobRunner("c1", "cmds", store)
    jr2.run_cmd("ddl", lambda r: calls.append("again"))
    assert calls == ["ran"]


def test_run_cmd_stop_on_error_false():
    # job-command.rs:52-67: error recorded at its step index; job continues
    store = MemoryStore()
    jr = JobRunner("c2", "soft", store, stop_on_error=False)

    def boom(r):
        raise ValueError("step failed")

    assert jr.run_cmd("bad", boom) is None
    assert jr.state.step_history["bad"].status == "Error"
    assert jr.state.step_history["bad"].step_index == 0
    jr.run_cmd("good", lambda r: 42)
    assert jr.state.step_history["good"].status == "Complete"
    assert jr.state.step_history["good"].step_index == 1
    state = jr.complete()
    assert state.run_status == RUN_COMPLETED


def test_run_cmd_stop_on_error_true():
    # job-command.rs:105-114: JobStepError aborts the job
    store = MemoryStore()
    jr = JobRunner("c3", "hard", store, stop_on_error=True)

    def boom(r):
        raise ValueError("fatal")

    with pytest.raises(JobStepError):
        jr.run_cmd("bad", boom)
    assert jr.state.run_status == RUN_FATAL


def test_output_tasks_awaited_at_complete():
    # P3/O1: detached tasks run concurrently, awaited + recorded at complete
    store = MemoryStore()
    jr = JobRunner("c4", "tasks", store)
    results = []

    def slow_task():
        time.sleep(0.05)
        results.append("done")
        return 7

    jr.run_output_task("side_write", slow_task)
    state = jr.complete()
    assert results == ["done"]
    st = state.step_history["side_write"]
    assert st.status == "Complete" and st.outputs["side_write"] == 7


def test_output_task_failure_is_fatal():
    store = MemoryStore()
    jr = JobRunner("c5", "taskfail", store)

    def bad_task():
        raise RuntimeError("sink down")

    jr.run_output_task("bad", bad_task)
    with pytest.raises(JobStepError):
        jr.complete()
    assert jr.state.run_status == RUN_FATAL


class TestRetryBackoff:
    def test_succeeds_after_transient_failures(self):
        jr = JobRunner("r1", "retry", MemoryStore())
        delays = []
        calls = {"n": 0}

        def flaky(_jr):
            calls["n"] += 1
            if calls["n"] < 3:
                raise OSError("transient")
            return "ok"

        out = jr.run_cmd(
            "step", flaky, retries=5, backoff_s=0.1, sleep=delays.append
        )
        assert out == "ok" and calls["n"] == 3
        assert delays == [0.1, 0.2]  # exponential
        assert jr.state.step_history["step"].status == "Complete"

    def test_backoff_cap_and_final_failure(self):
        jr = JobRunner("r2", "retry2", MemoryStore())
        delays = []

        def always(_jr):
            raise OSError("down")

        with pytest.raises(JobStepError, match="down"):
            jr.run_cmd(
                "step", always, retries=6, backoff_s=1.0, backoff_cap_s=4.0,
                sleep=delays.append,
            )
        assert delays == [1.0, 2.0, 4.0, 4.0, 4.0, 4.0]  # doubling, capped
        assert jr.state.step_history["step"].status == "Error"

    def test_non_retryable_exception_fails_immediately(self):
        jr = JobRunner("r3", "retry3", MemoryStore())
        calls = {"n": 0}

        def bad(_jr):
            calls["n"] += 1
            raise ValueError("logic bug")

        with pytest.raises(JobStepError, match="logic bug"):
            jr.run_cmd("step", bad, retries=5, retry_on=OSError, sleep=lambda s: None)
        assert calls["n"] == 1  # ValueError is not retryable here
