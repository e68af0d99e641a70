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


def bm25_search(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    scale: int = 6,
) -> DataFrame:
    """BM25-ranked keyword search — the standard lexical relevance score
    (Robertson/Spärck Jones; the Elasticsearch/Lucene formula):

    ``score(D, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``

    with ``idf(t) = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))``. Returns
    ``(id_col, score)`` for documents matching ANY query term, higher =
    more relevant.

    Determinism: idf (the ln) and each per-term contribution are
    floor-scaled to ``scale`` decimals, and contributions sum as exact
    decimals — so the score is partition-order-proof and oracle-exact.

    Plan shape: one explode for doc lengths folded into the same scan's
    tf aggregate; term stats (df_t, N, avgdl) are 1-row/handful-row
    aggregates broadcast back; the matched-term stream (a sliver of the
    corpus for selective terms) is all that shuffles.
    """
    if not terms:
        raise ValueError("bm25_search needs at least one term")
    uniq = sorted(set(terms))
    p = float(10**scale)
    toks = df.select(F.col(id_col), tokens(text_col).alias("_ts"))
    # document lengths + corpus totals
    dl = toks.select(id_col, F.size("_ts").alias("_dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sumdl"),
    )
    # term frequencies for query terms only (IN filter under the explode)
    tf = (
        toks.select(F.col(id_col), F.explode("_ts").alias("_tok"))
        .filter(F.col("_tok").isin(uniq))
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )
    dft = tf.groupBy("_tok").agg(F.count(F.lit(1)).cast("double").alias("_df"))
    idf = dft.crossJoin(F.broadcast(corpus)).select(
        "_tok",
        (
            F.floor(
                F.lit(p)
                * F.log(
                    F.lit(1.0)
                    + (F.col("_n").cast("double") - F.col("_df") + F.lit(0.5))
                    / (F.col("_df") + F.lit(0.5))
                )
            )
            / F.lit(p)
        ).alias("_idf"),
        # avgdl floor-scaled once, corpus-wide, so dl/avgdl is shared
        (
            F.floor(F.lit(p) * (F.col("_sumdl").cast("double") / F.col("_n")))
            / F.lit(p)
        ).alias("_avgdl"),
    )
    contrib = (
        tf.join(F.broadcast(idf), "_tok")
        .join(dl, id_col)
        .select(
            F.col(id_col),
            (
                F.floor(
                    F.lit(p)
                    * (
                        F.col("_idf")
                        * (F.col("_tf") * F.lit(k1 + 1.0))
                        / (
                            F.col("_tf")
                            + F.lit(k1)
                            * (
                                F.lit(1.0 - b)
                                + F.lit(b)
                                * (F.col("_dl").cast("double") / F.col("_avgdl"))
                            )
                        )
                    )
                )
                / F.lit(p)
            ).cast("decimal(18,6)").alias("_c"),
        )
    )
    return contrib.groupBy(id_col).agg(
        F.sum("_c").cast("double").alias("score")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    by: tuple[str, ...] = (),
    k: int = 60,
    scale: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher SIGIR'09) of
    pre-ranked retrieval lists — the standard hybrid-search combiner
    (lexical BM25 + embedding ANN): ``rrf(d) = Σ_lists 1/(k + rank_d)``.

    Each input carries ``by + (id_col, rank_col)`` with rank 1-based;
    items missing from a list simply contribute nothing (no imputation),
    matching the canonical formulation. Returns ``by + (id_col, n_lists,
    rrf_score)`` — callers order by (rrf_score DESC, id) for the fused
    ranking.

    Determinism/oracle: each reciprocal is floor-scaled to ``scale``
    decimals and summed as an exact DECIMAL — add-order-proof, so the
    fused score hash-matches the SQL oracle bit-for-bit.

    Scale: the op itself is union + ONE groupBy on (by, id) — no windows,
    no joins. Rank assignment is the caller's concern on purpose: result
    lists are top-k bounded (k×queries rows, not corpus rows), where a
    rank window is cheap; fusing never touches the corpus.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    p = float(10**scale)
    keys = [*by, id_col]
    tagged = [
        r.select(
            *keys,
            (
                F.floor(F.lit(p) / (F.lit(float(k)) + F.col(rank_col).cast("double")))
                / F.lit(p)
            )
            .cast(f"decimal(18,{scale})")
            .alias("_contrib"),
        )
        for r in rankings
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionAll(t)
    return u.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.sum("_contrib").cast("double").alias("rrf_score"),
    )
