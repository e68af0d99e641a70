"""StreamHandler: init/process_item/shutdown with Start/Skip/Resume
(reference run-stream-handler.rs, job.rs:457-602,674-682)."""

from __future__ import annotations

from etl_tools_rs_spark.jobs.runner import HandlerInit, JobRunner, StreamHandler
from etl_tools_rs_spark.sinks.simple_store import MemoryStore
from etl_tools_rs_spark.sources.memory import CsvLinesSource


class CollectingHandler(StreamHandler):
    def __init__(self, init=None, fail_on=()):
        self._init = init or HandlerInit.start()
        self.fail_on = set(fail_on)
        self.seen: list[tuple[int, str]] = []
        self.shutdown_called = False

    def init(self, runner):
        return self._init

    def process_item(self, index, item, runner):
        if item["id"] in self.fail_on:
            raise ValueError(f"bad row {item['id']}")
        self.seen.append((index, item["id"]))

    def shutdown(self, runner):
        self.shutdown_called = True


CSV = ["id,name,notes", "a,Alice,x", "b,\"McDonald, John\",", "c,Carol,y", "d,Dave,"]


def test_handler_processes_in_order(spark):
    store = MemoryStore()
    jr = JobRunner("h1", "handler", store)
    df = CsvLinesSource(CSV, schema="id string, name string, notes string").to_df(spark)
    h = CollectingHandler()
    step = jr.run_stream_handler("consume", df, h, order_by=["id"])
    assert [x for _, x in h.seen] == ["a", "b", "c", "d"]
    assert [i for i, _ in h.seen] == [0, 1, 2, 3]
    assert h.shutdown_called
    assert step.total_lines_scanned == 4 and step.num_errors == 0


def test_handler_rows_fail_counted(spark):
    # run-stream-handler.rs:70-71 analogue: failing rows are in-band errors
    store = MemoryStore()
    jr = JobRunner("h2", "handler_err", store, max_errors=10)
    df = CsvLinesSource(CSV, schema="id string, name string, notes string").to_df(spark)
    h = CollectingHandler(fail_on={"a", "b", "c", "d"})
    step = jr.run_stream_handler("consume", df, h, order_by=["id"])
    assert h.seen == []
    assert step.num_errors == 4
    assert step.status == "Complete"  # tolerated within budget


def test_handler_resume_skips_prefix(spark):
    # O4: Resume{index} skips the first `index` records deterministically
    store = MemoryStore()
    jr = JobRunner("h3", "resume", store)
    df = CsvLinesSource(CSV, schema="id string, name string, notes string").to_df(spark)
    h = CollectingHandler(init=HandlerInit.resume(2))
    jr.run_stream_handler("consume", df, h, order_by=["id"])
    # indices continue from the resume point (job.rs:484-511)
    assert h.seen == [(2, "c"), (3, "d")]


def test_handler_skip(spark):
    store = MemoryStore()
    jr = JobRunner("h4", "skip", store)
    df = CsvLinesSource(CSV, schema="id string, name string, notes string").to_df(spark)
    h = CollectingHandler(init=HandlerInit.skip())
    step = jr.run_stream_handler("consume", df, h, order_by=["id"])
    assert h.seen == [] and not h.shutdown_called
    assert step.status == "Complete"


def test_handler_fn_form(spark):
    # F6/task-apply parity: closure foreach over 4 records
    store = MemoryStore()
    jr = JobRunner("h5", "apply", store)
    df = CsvLinesSource(CSV, schema="id string, name string, notes string").to_df(spark)
    count = []
    jr.run_stream_handler_fn("apply", df, lambda i, row, r: count.append(1))
    assert len(count) == 4
