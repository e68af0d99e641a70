"""Inverted index + keyword search (operators/index.py)."""

import pytest

from etl_tools_rs_spark.operators import index as ix


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark shuffles data fast"),
        (2, "spark broadcasts small tables"),
        (3, "duckdb scans fast"),
        (4, "  spark   spark  spark  "),  # repeated token, odd whitespace
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_index_postings_sorted_distinct(spark, docs):
    idx = {r["token"]: r for r in ix.build_inverted_index(docs).collect()}
    assert idx["spark"]["postings"] == [1, 2, 4]  # doc 4 counted once
    assert idx["spark"]["df"] == 3
    assert idx["fast"]["postings"] == [1, 3]
    assert "" not in idx  # empty docs/tokens contribute nothing


def test_keyword_search_all_vs_any(spark, docs):
    all_hits = {
        r["doc_id"]: r["n_matched"]
        for r in ix.keyword_search(docs, ["spark", "fast"]).collect()
    }
    assert all_hits == {1: 2}
    any_hits = {
        r["doc_id"]: r["n_matched"]
        for r in ix.keyword_search(docs, ["spark", "fast"], mode="any").collect()
    }
    assert any_hits == {1: 2, 2: 1, 3: 1, 4: 1}


def test_search_index_matches_direct_search(spark, docs):
    idx = ix.build_inverted_index(docs)
    for mode in ("all", "any"):
        direct = {
            (r["doc_id"], r["n_matched"])
            for r in ix.keyword_search(docs, ["spark", "fast"], mode=mode).collect()
        }
        via_index = {
            (r["doc_id"], r["n_matched"])
            for r in ix.search_index(idx, ["spark", "fast"], mode=mode).collect()
        }
        assert direct == via_index


def test_duplicate_query_terms_collapse(spark, docs):
    hits = {
        r["doc_id"]
        for r in ix.keyword_search(docs, ["spark", "spark"]).collect()
    }
    assert hits == {1, 2, 4}  # 'all' over the DISTINCT term set


def test_rejects_bad_args(spark, docs):
    with pytest.raises(ValueError, match="at least one"):
        ix.keyword_search(docs, [])
    with pytest.raises(ValueError, match="mode"):
        ix.keyword_search(docs, ["x"], mode="phrase")


class TestBm25:
    def test_ranking_properties(self, spark, docs):
        from etl_tools_rs_spark.operators.index import bm25_search

        scores = {
            r["doc_id"]: r["score"]
            for r in bm25_search(docs, ["spark", "fast"]).collect()
        }
        # only docs containing at least one term are scored
        assert set(scores) == {1, 2, 3, 4}
        # doc 1 has both terms: strictly higher than single-term docs
        assert scores[1] > scores[2]
        assert scores[1] > scores[3]
        assert all(v > 0 for v in scores.values())

    def test_hand_computed_single_doc_corpus(self, spark):
        import math

        from etl_tools_rs_spark.operators.index import bm25_search

        df = spark.createDataFrame(
            [(1, "a b"), (2, "c d")], "doc_id bigint, text string"
        )
        # term 'a': N=2, df=1 -> idf = ln(1 + 1.5/1.5) = ln 2; dl=2, avgdl=2
        # tf=1 -> contribution = idf * 2.2 / (1 + 1.2*(0.25 + 0.75*1))
        r = {x["doc_id"]: x["score"] for x in bm25_search(df, ["a"]).collect()}
        idf = math.floor(1e6 * math.log(2.0)) / 1e6
        expect = math.floor(1e6 * (idf * (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * 1.0)))) / 1e6
        assert r == {1: expect}

    def test_rejects_empty_terms(self, spark, docs):
        import pytest

        from etl_tools_rs_spark.operators.index import bm25_search

        with pytest.raises(ValueError, match="at least one"):
            bm25_search(docs, [])


class TestJlProject:
    def test_components_match_numpy(self, spark):
        import numpy as np

        from etl_tools_rs_spark.operators.similarity import jl_project, jl_signs

        dim, out = 6, 3
        vecs = [
            (1, [0.5, -1.25, 2.0, 0.0, 1.5, -0.75]),
            (2, [1.0] * 6),
        ]
        df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        got = {
            r.vec_id: [r.p0, r.p1, r.p2]
            for r in jl_project(df, "embedding", "vec_id", dim, out).collect()
        }
        R = np.array(jl_signs(dim, out))
        for vid, v in vecs:
            want = np.round(np.array(v), 6) @ R  # exact: r = ±1
            assert np.allclose(got[vid], want, atol=1e-9), vid

    def test_distance_preservation_rough(self, spark):
        # JL with enough components roughly preserves relative distances
        import numpy as np

        from etl_tools_rs_spark.operators.similarity import jl_project

        rng = np.random.RandomState(3)
        X = rng.randn(20, 32)
        df = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(20)],
            ["vec_id", "embedding"],
        )
        out = jl_project(df, "embedding", "vec_id", 32, 16).collect()
        P = np.array(
            [[getattr(r, f"p{j}") for j in range(16)] for r in sorted(out, key=lambda r: r.vec_id)]
        ) / np.sqrt(16)
        d_orig = np.linalg.norm(X[0] - X[1:], axis=1)
        d_proj = np.linalg.norm(P[0] - P[1:], axis=1)
        # rank correlation of distances stays positive and strong-ish
        from numpy import corrcoef

        assert corrcoef(d_orig, d_proj)[0, 1] > 0.5

    def test_signs_deterministic_and_balanced(self):
        from etl_tools_rs_spark.operators.similarity import jl_signs

        a = jl_signs(64, 8)
        assert a == jl_signs(64, 8)
        flat = [s for row in a for s in row]
        assert set(flat) == {1, -1}
        assert 0.3 < flat.count(1) / len(flat) < 0.7
