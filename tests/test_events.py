"""Funnel + cohort retention (operators/events.py) on crafted sequences."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators import events as ev_ops


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1: full ordered funnel
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # u2: clicked BEFORE viewing -> order not satisfied past step 1
        (2, "click", _ts(1)), (2, "view", _ts(2)), (2, "purchase", _ts(3)),
        # u3: view only
        (3, "view", _ts(5)),
        # u4: never viewed -> absent from funnel
        (4, "purchase", _ts(1)),
        # u5: view, then click, no purchase; second click later irrelevant
        (5, "view", _ts(1)), (5, "click", _ts(4)), (5, "click", _ts(6)),
    ]
    return spark.createDataFrame(
        rows, "user_id int, event_type string, ts timestamp"
    )


def test_funnel_users_depths(spark, events):
    got = {r["user_id"]: r["depth"] for r in
           ev_ops.funnel_users(events, ["view", "click", "purchase"]).collect()}
    # u2 stops at depth 1: the click precedes the matched view, and each
    # later step only considers the previous step's survivors — the
    # purchase cannot skip the missing ordered click
    assert got == {1: 3, 2: 1, 3: 1, 5: 2}


def test_funnel_counts_non_increasing(spark, events):
    out = ev_ops.funnel(events, ["view", "click", "purchase"])
    rows = sorted(out.collect(), key=lambda r: r["step"])
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert ns[0] == 4  # u1, u2, u3, u5 viewed
    # counts must agree with funnel_users depths (funnel is sugar over it)
    depths = [r["depth"] for r in
              ev_ops.funnel_users(events, ["view", "click", "purchase"]).collect()]
    assert ns == [sum(1 for d in depths if d >= i + 1) for i in range(3)]


def test_funnel_construction_is_lazy(spark, events):
    """r4 plan pin (VERDICT r3 task #8): building the funnel frame runs
    ZERO driver jobs — the per-step counts ride one lazy plan. The old
    implementation ran a count() + localCheckpoint per step at
    construction time."""
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup())
    df = ev_ops.funnel(events, ["view", "click", "purchase"])
    assert set(st.getJobIdsForGroup()) == before  # no jobs yet
    assert [f.name for f in df.schema.fields] == ["step", "event", "n_users"]
    assert df.count() == 3  # materializes only now


def test_funnel_empty_input_zero_counts(spark):
    df = spark.createDataFrame(
        [], "user_id int, event_type string, ts timestamp"
    )
    rows = sorted(
        ev_ops.funnel(df, ["a", "b"]).collect(), key=lambda r: r["step"]
    )
    assert [(r["step"], r["event"], r["n_users"]) for r in rows] == [
        (0, "a", 0),
        (1, "b", 0),
    ]


def test_funnel_strictly_after_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a", _ts(1)), (1, "b", _ts(1))],  # same timestamp: not 'after'
        "user_id int, event_type string, ts timestamp",
    )
    got = {r["user_id"]: r["depth"] for r in
           ev_ops.funnel_users(df, ["a", "b"]).collect()}
    assert got == {1: 1}


def test_cohort_retention_triangle(spark):
    rows = [
        (1, _ts(1)), (1, _ts(9)),   # cohort w0, active w0 and w1
        (2, _ts(2)), (2, _ts(3)),   # cohort w0, active w0 only
        (3, _ts(10)),               # cohort w1
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = ev_ops.cohort_retention(df, period_days=7)
    cells = {
        (r["cohort_period"].day, r["period_offset"]): r["n_users"]
        for r in out.collect()
    }
    # 7-day buckets anchor at the unix epoch: the bucket containing
    # Jan 1 2024 starts Dec 28 2023; the next starts Jan 4
    assert cells == {(28, 0): 2, (28, 1): 1, (4, 0): 1}


def test_funnel_rejects_empty_steps(spark, events):
    import pytest as _p

    with _p.raises(ValueError, match="at least one"):
        ev_ops.funnel_users(events, [])


class TestResample:
    def test_gap_fill_and_bounds(self, spark):
        rows = [
            (1, "a", _ts(1, 0)), (2, "a", _ts(1, 0)),  # hour 0: 2 events
            (3, "a", _ts(1, 2)),                        # hour 2: 1 event
            (4, "b", _ts(1, 1)),                        # other group
            (5, "a", _ts(2, 0)),                        # outside [start, end)
        ]
        df = spark.createDataFrame(rows, "id int, g string, ts timestamp")
        out = ev_ops.resample(
            df, "ts", 3600, "2024-01-01", "2024-01-01T04:00:00", by=["g"]
        )
        cells = {(r["g"], r["period_start"].hour): r["n"] for r in out.collect()}
        assert len(cells) == 8  # 2 groups x 4 hours, all present
        assert cells[("a", 0)] == 2 and cells[("a", 1)] == 0
        assert cells[("a", 2)] == 1 and cells[("a", 3)] == 0
        assert cells[("b", 1)] == 1 and cells[("b", 0)] == 0

    def test_value_sum_and_validation(self, spark):
        import pytest as _p

        df = spark.createDataFrame(
            [(1, _ts(1), 2.0), (2, _ts(1), 3.0)], "id int, ts timestamp, v double"
        )
        out = ev_ops.resample(
            df, "ts", 3600, "2024-01-01", "2024-01-01T02:00:00", value_col="v"
        )
        got = {r["period_start"].hour: (r["n"], r["sum_value"]) for r in out.collect()}
        assert got[0] == (2, 5.0)
        assert got[1] == (0, None)  # empty period: n=0, sum NULL
        with _p.raises(ValueError, match="step_seconds"):
            ev_ops.resample(df, "ts", 0, "2024-01-01", "2024-01-02")


class TestMergeIntervals:
    def test_overlap_touch_and_gap(self, spark):
        rows = [
            ("u", 0, 10), ("u", 5, 15),   # overlap -> one span 0..15
            ("u", 15, 20),                 # touches (start == prev end): merges
            ("u", 30, 40),                 # gap -> new span
            ("v", 0, 1),
        ]
        df = spark.createDataFrame(rows, "k string, s int, e int")
        got = {
            (r["k"], r["span_start"], r["span_end"]): r["n_merged"]
            for r in ev_ops.merge_intervals(df, "s", "e", by=["k"]).collect()
        }
        assert got == {("u", 0, 20): 3, ("u", 30, 40): 1, ("v", 0, 1): 1}

    def test_contained_interval(self, spark):
        df = spark.createDataFrame(
            [("u", 0, 100), ("u", 10, 20), ("u", 150, 160)], "k string, s int, e int"
        )
        got = {
            (r["span_start"], r["span_end"]): r["n_merged"]
            for r in ev_ops.merge_intervals(df, "s", "e", by=["k"]).collect()
        }
        assert got == {(0, 100): 2, (150, 160): 1}


class TestSessions:
    def test_assignment_and_stats(self, spark):
        rows = [
            (1, _ts(1, 0)), (1, _ts(1, 0)),  # same instant: same session
            (1, _ts(1, 1)),                   # 1h later with 30-min gap: new
            (1, _ts(1, 1)),                   # duplicate ts again
            (2, _ts(1, 5)),
        ]
        df = spark.createDataFrame(rows, "user_id int, ts timestamp")
        out = ev_ops.session_stats(df, gap_seconds=1800)
        got = {
            (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
            for r in out.collect()
        }
        assert got == {(1, 1): (2, 0), (1, 2): (2, 0), (2, 1): (1, 0)}

    def test_gap_boundary_inclusive(self, spark):
        # exactly gap_seconds apart: NOT a new session (> comparison)
        df = spark.createDataFrame(
            [(1, _ts(1, 0)), (1, dt.datetime(2024, 1, 1, 0, 30))],
            "user_id int, ts timestamp",
        )
        out = ev_ops.assign_sessions(df, gap_seconds=1800)
        assert {r["session_idx"] for r in out.collect()} == {1}
        out2 = ev_ops.assign_sessions(df, gap_seconds=1799)
        assert {r["session_idx"] for r in out2.collect()} == {1, 2}


class TestRollingZscore:
    def _z(self, spark, rows, **kw):
        from etl_tools_rs_spark.operators.events import rolling_zscore

        df = spark.createDataFrame(rows, "u int, t int, x double")
        return rolling_zscore(
            df, value_col="x", by=["u"], order_cols=["t"], **kw
        ).collect()

    def test_spike_flagged_constant_baseline_null(self, spark):
        # baseline 1..2 alternating then a wild spike
        rows = [(1, i, float(1 + (i % 2))) for i in range(10)] + [(1, 10, 100.0)]
        got = {r.t: r for r in self._z(spark, rows, lookback=10, min_periods=5)}
        spike = got[10]
        assert spike.is_anomaly is True and spike.zscore > 3
        # first rows: fewer than 5 priors -> no verdict
        assert got[0].zscore is None and got[0].is_anomaly is None
        assert got[4].zscore is None

    def test_zero_variance_baseline_gives_null(self, spark):
        rows = [(1, i, 5.0) for i in range(8)] + [(1, 8, 50.0)]
        got = {r.t: r for r in self._z(spark, rows, min_periods=5)}
        assert got[8].zscore is None and got[8].is_anomaly is None

    def test_window_excludes_current_row(self, spark):
        # 6 observations; the 6th sees exactly the first 5 as baseline
        rows = [(1, i, v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0, 9.0])]
        got = {r.t: r for r in self._z(spark, rows, min_periods=5)}
        r = got[5]
        assert r.n_prior == 5
        # baseline mean 3, population sd sqrt(2): z = (9-3)/1.414214 ~ 4.2426
        assert abs(r.zscore - 4.242640) < 1e-4
        assert r.is_anomaly is True

    def test_groups_are_independent(self, spark):
        rows = [(1, i, 1.0) for i in range(6)] + [(2, i, 1000.0) for i in range(6)]
        got = self._z(spark, rows, min_periods=5)
        assert all(r.zscore is None for r in got)  # flat within each group

    def test_validates_args(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.events import rolling_zscore

        df = spark.createDataFrame([(1, 1, 1.0)], "u int, t int, x double")
        with pytest.raises(ValueError):
            rolling_zscore(df, "x", ["u"], ["t"], lookback=0)


class TestTimeWeightedAvg:
    def _twa(self, spark, rows):
        from etl_tools_rs_spark.operators.events import time_weighted_avg

        df = spark.createDataFrame(
            rows, "g string, ts timestamp, v double, id int"
        )
        return {
            r.g: r
            for r in time_weighted_avg(
                df, "ts", "v", by=["g"], tiebreak=["id"]
            ).collect()
        }

    def test_hand_computed_vs_plain_avg(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        # value 10 held for 9s, then 0 for 1s: TWA = 9, plain avg = 5
        rows = [
            ("a", t0, 10.0, 1),
            ("a", t0 + dt.timedelta(seconds=9), 0.0, 2),
            ("a", t0 + dt.timedelta(seconds=10), 99.0, 3),  # terminal point
        ]
        r = self._twa(spark, rows)["a"]
        assert abs(r.twa - 9.0) < 1e-6
        assert r.span_micros == 10_000_000 and r.n_points == 3

    def test_single_point_null(self, spark):
        import datetime as dt

        r = self._twa(spark, [("a", dt.datetime(2024, 1, 1), 5.0, 1)])["a"]
        assert r.twa is None and r.span_micros == 0 and r.n_points == 1

    def test_uniform_sampling_equals_plain_avg_of_head(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("a", t0 + dt.timedelta(seconds=i), float(i), i) for i in range(5)
        ]
        r = self._twa(spark, rows)["a"]
        # equal dt: TWA = mean of all but the terminal point = (0+1+2+3)/4
        assert abs(r.twa - 1.5) < 1e-6

    def test_tied_timestamps_deterministic(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("a", t0, 100.0, 2),
            ("a", t0, 1.0, 1),  # tie: id orders it first, dt=0
            ("a", t0 + dt.timedelta(seconds=1), 0.0, 3),
        ]
        r = self._twa(spark, rows)["a"]
        # id=1 holds 0us, id=2 holds 1s -> TWA = 100
        assert abs(r.twa - 100.0) < 1e-6


class TestPathNgrams:
    def _paths(self, spark, rows, **kw):
        from etl_tools_rs_spark.operators.events import path_ngrams

        df = spark.createDataFrame(rows, "u int, e string, t int")
        return {
            r.path: r.n_occurrences
            for r in path_ngrams(df, "u", "e", "t", **kw).collect()
        }

    def test_trigram_counts(self, spark):
        rows = [
            (1, "a", 1), (1, "b", 2), (1, "c", 3), (1, "b", 4), (1, "c", 5),
        ]
        got = self._paths(spark, rows, n=3)
        assert got == {"a>b>c": 1, "b>c>b": 1, "c>b>c": 1}

    def test_paths_never_cross_users(self, spark):
        rows = [(1, "a", 1), (1, "b", 2), (2, "c", 3), (2, "d", 4)]
        got = self._paths(spark, rows, n=2)
        assert got == {"a>b": 1, "c>d": 1}  # no b>c bridge

    def test_min_count_filters(self, spark):
        rows = [(u, e, t) for u in (1, 2, 3) for t, e in enumerate("xy")]
        got = self._paths(spark, rows, n=2, min_count=3)
        assert got == {"x>y": 3}

    def test_validates_args(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.events import path_ngrams

        df = spark.createDataFrame([(1, "a", 1)], "u int, e string, t int")
        with pytest.raises(ValueError):
            path_ngrams(df, "u", "e", "t", n=1)


class TestTransitionMatrix:
    def test_probabilities_and_counts(self, spark):
        from etl_tools_rs_spark.operators.events import transition_matrix

        rows = [
            (1, "a", 1), (1, "b", 2), (1, "a", 3), (1, "c", 4),
            (2, "a", 1), (2, "b", 2),
        ]
        df = spark.createDataFrame(rows, "u int, e string, t int")
        got = {
            (r.from_event, r.to_event): (r.n, r.p)
            for r in transition_matrix(df, "u", "e", "t").collect()
        }
        # from 'a': a->b twice, a->c once
        assert got[("a", "b")] == (2, 0.666666)
        assert got[("a", "c")][0] == 1 and abs(got[("a", "c")][1] - 0.333333) < 1e-9
        # from 'b': b->a once (user 1 only; user 2's b is terminal)
        assert got[("b", "a")] == (1, 1.0)
        assert ("b", None) not in got and len(got) == 3

    def test_rows_sum_to_one(self, spark):
        from etl_tools_rs_spark.operators.events import transition_matrix

        rows = [(1, e, t) for t, e in enumerate("abcabcaab")]
        df = spark.createDataFrame(rows, "u int, e string, t int")
        out = transition_matrix(df, "u", "e", "t").collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.from_event, 0.0)
            by_src[r.from_event] += r.p
        # floor-scaling may lose <= 1e-6 per cell
        assert all(0.999 < s <= 1.0 for s in by_src.values())


def test_attribute_last_touch_semantics(spark):
    rows = [
        # u1: click at t1, purchase at t3 -> attributed to t1
        (1, 1, "click", _ts(1)), (2, 1, "purchase", _ts(3)),
        # u1 second purchase at t5: still last click t1 (within window)
        (3, 1, "purchase", _ts(5)),
        # u2: purchase BEFORE any click -> not attributed
        (4, 2, "purchase", _ts(1)), (5, 2, "click", _ts(2)),
        # u3: click long before purchase (216h > 168h window) -> not attributed
        (6, 3, "click", _ts(1)), (7, 3, "purchase", _ts(10)),
        # u4: two clicks -> the LATEST one wins
        (8, 4, "click", _ts(1)), (9, 4, "click", _ts(2)),
        (10, 4, "purchase", _ts(3)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id int, event_type string, ts timestamp"
    )
    out = {
        r["event_id"]: r
        for r in ev_ops.attribute_last_touch(df, max_gap_hours=168).collect()
    }
    assert set(out) == {2, 3, 4, 7, 10}  # one row per purchase
    assert out[2].attributed and out[2].touch_ts == _ts(1)
    assert out[3].attributed and out[3].touch_ts == _ts(1)
    assert not out[4].attributed and out[4].touch_ts is None
    assert not out[7].attributed and out[7].touch_ts is None
    assert out[10].attributed and out[10].touch_ts == _ts(2)
