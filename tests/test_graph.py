"""Graph analytics (PageRank, degree stats) — hand-computed fixtures."""

from __future__ import annotations

import pytest

from etl_tools_rs_spark.operators.graph import degree_stats, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_two_cycle_is_stationary(spark):
    # a<->b: uniform 1/2 is the fixed point; any iteration count keeps it
    ranks = {
        r.node: r.rank
        for r in pagerank(
            _edges(spark, [("a", "b"), ("b", "a")]), iterations=4
        ).collect()
    }
    assert ranks.keys() == {"a", "b"}
    for v in ranks.values():
        assert v == pytest.approx(0.5, abs=1e-8)


def test_pagerank_star_hand_computed(spark):
    # a -> b, a -> c; b, c dangling (mass-dropping variant).
    # N=3: r0 = 1/3 each.
    # r1: a = 0.05 (teleport only); b = c = 0.05 + 0.85*(1/3)/2
    got = {
        r.node: r.rank
        for r in pagerank(
            _edges(spark, [("a", "b"), ("a", "c")]), iterations=1
        ).collect()
    }
    third = 0.333333333  # floor-scaled 1/3 at scale=9
    assert got["a"] == pytest.approx(0.15 / 3, abs=1e-8)
    assert got["b"] == got["c"] == pytest.approx(
        0.15 / 3 + 0.85 * (third / 2), abs=1e-8
    )


def test_pagerank_sink_accumulates_above_source(spark):
    # chain a -> b -> c: authority flows downstream
    got = {
        r.node: r.rank
        for r in pagerank(
            _edges(spark, [("a", "b"), ("b", "c")]), iterations=3
        ).collect()
    }
    assert got["c"] > got["b"] > got["a"]
    # every rank at least the teleport floor
    assert all(v >= 0.15 / 3 - 1e-9 for v in got.values())


def test_pagerank_validates_args(spark):
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.0)


def test_degree_stats_full_outer(spark):
    got = {
        r.node: (r.out_degree, r.in_degree)
        for r in degree_stats(
            _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")])
        ).collect()
    }
    assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


class TestCooccurrence:
    def _pairs(self, spark, rows, **kw):
        from etl_tools_rs_spark.operators.graph import cooccurrence_pairs

        df = spark.createDataFrame(rows, "g int, i string")
        return {
            (r.item_a, r.item_b): r.n_groups
            for r in cooccurrence_pairs(df, "g", "i", **kw).collect()
        }

    def test_counts_and_threshold(self, spark):
        rows = [
            (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"),
        ]
        got = self._pairs(spark, rows, min_count=2)
        assert got == {("a", "b"): 2}  # (a,c) co-occurs once -> filtered

    def test_duplicate_membership_counts_once(self, spark):
        rows = [(1, "a"), (1, "a"), (1, "b")]
        got = self._pairs(spark, rows, min_count=1)
        assert got == {("a", "b"): 1}

    def test_hot_group_capped(self, spark):
        rows = [(1, f"i{k}") for k in range(10)] + [(2, "i0"), (2, "i1")]
        got = self._pairs(spark, rows, min_count=1, max_group_size=5)
        # group 1 (size 10) dropped entirely; only group 2's pair remains
        assert got == {("i0", "i1"): 1}

    def test_validates_min_count(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.graph import cooccurrence_pairs

        df = spark.createDataFrame([(1, "a")], "g int, i string")
        with pytest.raises(ValueError):
            cooccurrence_pairs(df, "g", "i", min_count=0)


class TestTriangleCount:
    def _tc(self, spark, edges):
        from etl_tools_rs_spark.operators.graph import triangle_count

        df = spark.createDataFrame(edges, ["src", "dst"])
        return {
            r.node: (r.degree, r.triangles, r.clustering_coeff)
            for r in triangle_count(df).collect()
        }

    def test_single_triangle(self, spark):
        got = self._tc(spark, [(1, 2), (2, 3), (3, 1)])
        assert got == {
            1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)
        }

    def test_triangle_plus_pendant(self, spark):
        got = self._tc(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
        assert got[4] == (1, 0, None)          # degree-1: coeff undefined
        assert got[3] == (3, 1, 1.0 / 3)       # 2*1/(3*2)
        assert got[1][1] == 1 and got[2][1] == 1

    def test_square_no_triangles(self, spark):
        got = self._tc(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        assert all(t == 0 for (_, t, _) in got.values())

    def test_k4_every_node_three(self, spark):
        import itertools

        edges = list(itertools.combinations(range(4), 2))
        got = self._tc(spark, edges)
        # K4 has 4 triangles; each node participates in C(3,2)=3
        assert all(v == (3, 3, 1.0) for v in got.values())

    def test_direction_duplicates_selfloops_ignored(self, spark):
        messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (3, 1)]
        assert self._tc(spark, messy) == self._tc(
            spark, [(1, 2), (2, 3), (3, 1)]
        )

    def test_matches_naive_on_random_graph(self, spark):
        import itertools
        import random

        rng = random.Random(11)
        nodes = list(range(12))
        edges = [
            (a, b)
            for a, b in itertools.combinations(nodes, 2)
            if rng.random() < 0.35
        ]
        got = self._tc(spark, edges)
        adj = {n: set() for n in nodes}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        for n in nodes:
            d = len(adj[n])
            if d == 0:
                assert n not in got  # isolated nodes have no edges at all
                continue
            tris = sum(
                1
                for u, w in itertools.combinations(sorted(adj[n]), 2)
                if w in adj[u]
            )
            assert got[n][0] == d and got[n][1] == tris, n


class TestGiantGraphPagerank:
    """r7 (VERDICT r6 #2): graph.py's iterative loops moved to DISK_ONLY
    localCheckpoints — pin that a giant single-component graph completes
    under the suite's default memory, mirroring
    test_fuzzy.py::TestGiantComponentCC for the CC loop."""

    def _graph(self, spark):
        from pyspark.sql import functions as F

        n = 500_000
        base = spark.range(n)
        chain = base.filter(f"id < {n - 1}").select(
            F.col("id").cast("string").alias("src"),
            (F.col("id") + 1).cast("string").alias("dst"),
        )
        rnd = base.select(
            F.col("id").cast("string").alias("src"),
            ((F.col("id") * F.lit(2654435761) + 1) % n)
            .cast("string")
            .alias("dst"),
        )
        return chain.union(rnd), n

    @pytest.mark.slow
    def test_giant_graph_three_iterations(self, spark):
        from pyspark.sql import functions as F

        edges, n = self._graph(spark)
        ranks = pagerank(edges, iterations=3, scale=9)
        agg = ranks.agg(
            F.count("*").alias("n"),
            F.sum(F.col("rank").cast("decimal(38,9)")).alias("s"),
            F.min("rank").alias("mn"),
        ).collect()[0]
        assert agg.n == n
        # mass-dropping variant: total rank stays in (0, 1]
        assert 0.0 < float(agg.s) <= 1.0 + 1e-6
        assert agg.mn >= 0.0
