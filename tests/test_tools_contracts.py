"""Round-10 tooling contracts (VERDICT r9 #7/#10):

- ``tools/capture_plan.py`` refuses to write a plan dump into another
  checkout's ``plans/`` dir — the provenance bug that shipped an r9
  "after" file captured from the PRE tree.
- ``bench.py``'s stdout ends in ONE parseable JSON line carrying the
  driver-contract keys (``queries``/``value``/``sf``/``unit``) — the
  contract whose r8 breakage nulled the whole ``PERF_r09.json``
  per-query section.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO_ROOT, "tools"))

from capture_plan import assert_out_dir_matches_tree  # noqa: E402


class TestCapturePlanProvenance:
    def _fake_tree(self, tmp_path, name):
        tree = tmp_path / name
        (tree / ".git").mkdir(parents=True)
        (tree / "plans").mkdir()
        return tree

    def test_same_tree_accepted(self, tmp_path):
        tree = self._fake_tree(tmp_path, "mine")
        assert_out_dir_matches_tree(str(tree / "plans"), repo_root=str(tree))

    def test_nonexistent_out_dir_in_same_tree_accepted(self, tmp_path):
        # the tool mkdirs out_dir later; the gate must not require it
        tree = self._fake_tree(tmp_path, "mine")
        assert_out_dir_matches_tree(
            str(tree / "plans" / "r10"), repo_root=str(tree)
        )

    def test_foreign_tree_refused(self, tmp_path):
        mine = self._fake_tree(tmp_path, "mine")
        other = self._fake_tree(tmp_path, "other")
        with pytest.raises(SystemExit, match="tree"):
            assert_out_dir_matches_tree(
                str(other / "plans"), repo_root=str(mine)
            )

    def test_override_env_allows_foreign_tree(self, tmp_path, monkeypatch):
        mine = self._fake_tree(tmp_path, "mine")
        other = self._fake_tree(tmp_path, "other")
        monkeypatch.setenv("SPARK_GRAFT_ALLOW_FOREIGN_PLAN_DIR", "1")
        assert_out_dir_matches_tree(str(other / "plans"), repo_root=str(mine))

    def test_outside_any_checkout_accepted(self, tmp_path):
        # scratch dirs (e.g. /tmp dumps) carry no provenance claim
        mine = self._fake_tree(tmp_path, "mine")
        scratch = tmp_path / "scratch"
        scratch.mkdir()
        assert_out_dir_matches_tree(str(scratch), repo_root=str(mine))


@pytest.mark.slow
def test_bench_stdout_json_contract(tmp_path):
    """Run the real bench subprocess on ONE cheap query at sf0.001 and
    assert the driver contract: the last stdout line is valid JSON with
    ``queries`` (non-empty dict of floats), ``value`` (number), ``sf``
    (number) and ``unit`` == "sec". Guards ``prev_bench_ok`` from ever
    silently going false again (VERDICT r9 #4/#10)."""
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_CPUS": "4",
            "SPARK_GRAFT_BENCH_ONLY": "topk_orders",
            "SPARK_GRAFT_BENCH_RUNS": "1",
            # subset runs never append history, but pin it anyway so a
            # future default change cannot make this test write history
            "SPARK_GRAFT_BENCH_NO_HISTORY": "1",
        }
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO_ROOT, "bench.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=_REPO_ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, "bench printed nothing to stdout"
    parsed = json.loads(lines[-1])  # must parse — the driver contract
    assert parsed["unit"] == "sec"
    assert isinstance(parsed["value"], (int, float))
    assert isinstance(parsed["sf"], (int, float))
    qs = parsed["queries"]
    assert isinstance(qs, dict) and qs
    assert all(isinstance(v, (int, float)) for v in qs.values())
    assert "topk_orders" in qs


class TestSweepGate:
    """tools/sweep_gate.py (VERDICT r9 #2): snapshot requires a
    full-registry sweep of EXACTLY the HEAD tree, clean, with an empty
    or adjudicated regressions block."""

    def _gate(self, tmp_path, monkeypatch, runs, argv_extra=(),
              head="abc123", dirty=False, nreq=2):
        import sweep_gate

        hist = tmp_path / "BENCH_HISTORY.json"
        hist.write_text(json.dumps({"runs": runs}))
        monkeypatch.setattr(sweep_gate, "tree_dirty", lambda: dirty)
        monkeypatch.setattr(sweep_gate, "head_commit", lambda: head)
        monkeypatch.setattr(sweep_gate, "registry_size", lambda: nreq)
        monkeypatch.setattr(
            sys, "argv",
            ["sweep_gate.py", "--history", str(hist), *argv_extra],
        )
        return sweep_gate.main()

    def _run(self, commit="abc123", dirty=False, regs=None, n=2, sf=0.1):
        return {
            "ts": "t", "sf": sf,
            "queries": {f"q{i}": 1.0 for i in range(n)},
            "tree": {"commit": commit, "dirty": dirty},
            "regressions": regs or {},
        }

    def test_clean_sweep_of_head_passes(self, tmp_path, monkeypatch):
        assert self._gate(tmp_path, monkeypatch, [self._run()]) == 0

    def test_dirty_tree_fails(self, tmp_path, monkeypatch):
        assert self._gate(tmp_path, monkeypatch, [self._run()], dirty=True) == 1

    def test_sweep_of_other_commit_fails(self, tmp_path, monkeypatch):
        assert self._gate(
            tmp_path, monkeypatch, [self._run(commit="other")]
        ) == 1

    def test_unstamped_legacy_entry_fails(self, tmp_path, monkeypatch):
        run = self._run()
        del run["tree"]
        assert self._gate(tmp_path, monkeypatch, [run]) == 1

    def test_partial_sweep_fails(self, tmp_path, monkeypatch):
        assert self._gate(tmp_path, monkeypatch, [self._run(n=1)]) == 1

    def test_dirty_sweep_entry_fails(self, tmp_path, monkeypatch):
        assert self._gate(
            tmp_path, monkeypatch, [self._run(dirty=True)]
        ) == 1

    def test_unadjudicated_regressions_fail(self, tmp_path, monkeypatch):
        assert self._gate(
            tmp_path, monkeypatch, [self._run(regs={"q0": [1.0, 2.0]})]
        ) == 1

    def test_adjudicated_regressions_pass(self, tmp_path, monkeypatch):
        assert self._gate(
            tmp_path, monkeypatch, [self._run(regs={"q0": [1.0, 2.0]})],
            argv_extra=("--adjudicated", "host window, reproduced on pre"),
        ) == 0

    def test_latest_full_sweep_wins(self, tmp_path, monkeypatch):
        # an older sweep of HEAD does not satisfy the gate if a NEWER
        # full sweep is for a different tree
        assert self._gate(
            tmp_path, monkeypatch,
            [self._run(), self._run(commit="newer-other")],
        ) == 1
