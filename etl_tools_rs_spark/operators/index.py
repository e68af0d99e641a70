"""Inverted index + boolean keyword search over a document corpus.

The retrieval primitive behind corpus exploration and rule-based
filtering ("every document mentioning X and Y"): build a token → postings
table once, answer term queries with joins against it — never a
full-text rescan per query. The reference has no search surface; its
closest shape is a Transformer closure scanning every record per
question (etl-core/src/transformer.rs:7-65).

Scale shape:
- the index is one explode + groupBy(token) (map-side combined); postings
  are doc-id arrays sorted for deterministic output and mergeable across
  corpus shards (array union);
- a query touches only the queried tokens' rows — a handful of index
  rows — then joins doc-ids; the corpus text is never rescanned;
- AND semantics = postings intersection via groupBy(doc) counting
  distinct matched terms == n_terms; OR = distinct union. Both stay
  relational (no driver-side set math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tools_rs_spark.functions import tokens


def build_inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token → ``(postings, df)``: sorted distinct doc-id array and
    document frequency. Shard indexes merge by array union + re-sort
    (postings are sets), so a 100 TB corpus can index incrementally."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(
            F.array_sort(F.collect_set(id_col)).alias("postings"),
            F.countDistinct(id_col).cast("bigint").alias("df"),
        )
    )


def keyword_search(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "all",
) -> DataFrame:
    """Doc ids whose token set covers ``terms`` (``mode='all'``) or hits
    any of them (``mode='any'``). Returns ``(id_col, n_matched)`` with
    ``n_matched`` = how many distinct query terms the doc contains.

    One explode filtered to the query terms (Catalyst pushes the IN
    filter below the explode's generate), one groupBy(doc) — the
    matched-token stream, typically a sliver of the corpus, is all that
    shuffles."""
    if not terms:
        raise ValueError("keyword_search needs at least one term")
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    uniq = sorted(set(terms))
    hits = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_tok"))
        .filter(F.col("_tok").isin(uniq))
        .groupBy(id_col)
        .agg(F.countDistinct("_tok").cast("bigint").alias("n_matched"))
    )
    if mode == "all":
        hits = hits.filter(F.col("n_matched") == len(uniq))
    return hits


def search_index(
    index: DataFrame, terms: list[str], mode: str = "all"
) -> DataFrame:
    """Answer the same query from a prebuilt inverted index: explode the
    queried tokens' postings (a few rows) instead of rescanning text.
    Returns ``(doc_id, n_matched)``."""
    if not terms:
        raise ValueError("search_index needs at least one term")
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    uniq = sorted(set(terms))
    hits = (
        index.filter(F.col("token").isin(uniq))
        .select(F.explode("postings").alias("doc_id"), "token")
        .groupBy("doc_id")
        .agg(F.countDistinct("token").cast("bigint").alias("n_matched"))
    )
    if mode == "all":
        hits = hits.filter(F.col("n_matched") == len(uniq))
    return hits
