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
