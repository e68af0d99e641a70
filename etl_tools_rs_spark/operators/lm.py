"""N-gram language-model quality scoring (CCNet-style).

No reference equivalent (extension surface): the classic corpus-quality
signal — fit a smoothed unigram LM on a (clean) training corpus, score
every candidate document by average negative log-likelihood per token;
high NLL ≈ far from the training distribution (gibberish, boilerplate,
wrong language). CCNet uses a Wikipedia 5-gram KenLM; the distributed
skeleton is identical for any order — the unigram form keeps every step
a relational op.

Spark-first: the whole pipeline is explode → groupBy → join → groupBy,
all JVM-side. The LM "model" IS a DataFrame of (token, count) — fitting
is lazy, scoring composes into one plan (corpus stats fold in via a
1-row broadcast cross join, never a driver collect).

Determinism/oracle: per-token log-probs round to 6 dp before an exact
DECIMAL sum (add-order-proof), final NLL rounds to 4 dp — hash-stable
against the DuckDB oracle despite float ln() across engines.

Scale notes: token counts shuffle once on token (map-side combined);
scoring shuffles tokens once to join the LM and once on doc id for the
final aggregate. Vocab skew ("the" appears everywhere) is a broadcast
problem only if you broadcast — the LM join is a plain shuffle join and
AQE handles the hot keys. At 100 TB the LM table (≤ vocab size) is tiny
next to the corpus; fit on a sample or a reference corpus and reuse.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lowercase alnum runs: RE2-safe, identical in Spark and DuckDB
LM_TOKEN_PATTERN = "[a-z0-9]+"


def lm_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) — one row per token occurrence."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(LM_TOKEN_PATTERN), 0
            )
        ).alias("tok"),
    )


@dataclass
class UnigramLM:
    """A fitted LM: lazy token-count table + smoothing constant."""

    counts: DataFrame  # (tok, c bigint)
    alpha: float = 0.5

    def logprobs(self) -> DataFrame:
        """(tok, lp) with add-alpha smoothing, lp rounded to 6 dp; plus
        the corpus totals folded in via a 1-row cross join (stays lazy)."""
        stats = self.counts.agg(
            F.sum("c").alias("_n"), F.count(F.lit(1)).alias("_v")
        )
        return self.counts.crossJoin(F.broadcast(stats)).select(
            "tok",
            F.round(
                F.log(
                    (F.col("c") + F.lit(self.alpha))
                    / (F.col("_n") + F.lit(self.alpha) * F.col("_v"))
                ),
                6,
            ).alias("lp"),
        )

    def oov_logprob(self) -> Column:
        """Smoothed log-prob for unseen tokens, as a column expression
        usable after a cross join with the stats row."""
        return F.round(
            F.log(
                F.lit(self.alpha) / (F.col("_n") + F.lit(self.alpha) * F.col("_v"))
            ),
            6,
        )


def lm_fit(
    train: DataFrame, text_col: str = "text", alpha: float = 0.5
) -> UnigramLM:
    toks = lm_tokens(train.select(F.lit(0).alias("_id"), text_col), text_col, "_id")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    return UnigramLM(counts=counts, alpha=alpha)


def lm_score(
    df: DataFrame,
    model: UnigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average negative log-likelihood under ``model``:
    ``(id, n_tokens bigint, avg_nll double)`` — lower is more fluent /
    closer to the training distribution. Documents with zero LM tokens
    yield no row (nothing to score). Out-of-vocabulary tokens get the
    smoothed OOV mass."""
    toks = lm_tokens(df, text_col, id_col)
    stats = model.counts.agg(F.sum("c").alias("_n"), F.count(F.lit(1)).alias("_v"))
    scored = (
        toks.join(model.logprobs(), "tok", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.coalesce(F.col("lp"), model.oov_logprob()).alias("lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # exact decimal sum: add-order-proof across partitions
            F.sum(F.col("lp").cast("decimal(20,6)")).alias("_s"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(-F.col("_s").cast("double") / F.col("n_tokens"), 4).alias(
                "avg_nll"
            ),
        )
    )


def lm_self_score_oracle_sql(alpha: float = 0.5, table: str = "documents") -> str:
    """DuckDB oracle for the self-trained scoring query (fit and score on
    the same table): identical tokenization, smoothing, rounding."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{LM_TOKEN_PATTERN}')) AS tok
  FROM {table}
), counts AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT sum(c) AS n, count(*) AS v FROM counts
), lp AS (
  SELECT tok, round(ln((c + {alpha}) / (n + {alpha} * v)), 6) AS lp
  FROM counts, tot
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       round(-CAST(sum(CAST(lp AS DECIMAL(20,6))) AS DOUBLE) / count(*), 4) AS avg_nll
FROM toks t JOIN lp USING (tok)
GROUP BY t.doc_id
"""


def _tok_array(col: str | Column) -> Column:
    """Lowercased LM-token array for ``col`` (same pattern as lm_tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(LM_TOKEN_PATTERN), 0)


def _pair_frame(df: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    """(id?, t1, t2) — one row per ADJACENT token pair. Pairs are built
    row-locally with zip_with over two slices of the token array (no
    window, no positional shuffle): pair i = (toks[i], toks[i+1])."""
    cols = [F.col(id_col)] if id_col else []
    toks = _tok_array(text_col).alias("_toks")
    pairs = F.expr(
        "zip_with(slice(_toks, 1, greatest(size(_toks) - 1, 0)),"
        "         slice(_toks, 2, greatest(size(_toks) - 1, 0)),"
        "         (a, b) -> struct(a AS t1, b AS t2))"
    )
    return (
        df.select(*cols, toks)
        .select(*cols, F.explode(pairs).alias("_p"))
        .select(*cols, F.col("_p.t1").alias("t1"), F.col("_p.t2").alias("t2"))
    )


@dataclass
class BigramLM:
    """A fitted conditional bigram LM: lazy unigram + bigram count tables
    with shared add-alpha smoothing.

    ``P(b | a) = (c_ab + alpha) / (c_a + alpha * V)`` where ``V`` is the
    unigram vocabulary size — a proper conditional distribution for every
    context ``a`` (sums to 1 over the vocabulary), including unseen
    contexts (``c_a = 0`` gives the uniform ``1/V``). The first token of
    a document is scored by the smoothed unigram marginal.
    """

    unigrams: DataFrame  # (tok, c bigint)
    bigrams: DataFrame  # (t1, t2, c2 bigint)
    alpha: float = 0.5


def bigram_fit(
    train: DataFrame, text_col: str = "text", alpha: float = 0.5
) -> BigramLM:
    """Fit = two lazy count tables: one token groupBy and one pair groupBy,
    both map-side combined. The pair stream is built row-locally (see
    ``_pair_frame``) so fitting shuffles count rows, never positions."""
    uni = (
        lm_tokens(train.select(F.lit(0).alias("_id"), text_col), text_col, "_id")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        _pair_frame(train, text_col, None)
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    return BigramLM(unigrams=uni, bigrams=bi, alpha=alpha)


def bigram_score(
    df: DataFrame,
    model: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document average negative log-likelihood under the conditional
    bigram model: ``(id, n_tokens bigint, avg_nll double)``.

    ``NLL(doc) = -( ln P_uni(t_1) + sum_i ln P(t_i | t_{i-1}) ) / n`` —
    the CCNet-style fluency signal, one order up from ``lm_score``
    (word-salad scores high even when every unigram is in-vocab, because
    its transitions are unseen). Documents with zero LM tokens yield no
    row.

    Scale: the score stream shuffles once to join the bigram table on
    (t1, t2), once to join the unigram context counts on t1, and once on
    the doc id for the final aggregate. Both model tables are
    vocab-bounded (not corpus-bounded) — at gate scale AQE broadcasts
    them; at 100 TB they are still tiny next to the corpus. Per-token
    log-probs round to 6 dp before an exact DECIMAL sum (add-order-proof),
    final NLL rounds to 4 dp — hash-stable vs the DuckDB oracle.
    """
    a = F.lit(model.alpha)
    stats = model.unigrams.agg(
        F.sum("c").alias("_n"), F.count(F.lit(1)).alias("_v")
    )
    # first token of each doc: smoothed unigram marginal
    firsts = (
        df.select(F.col(id_col), _tok_array(text_col).alias("_toks"))
        .filter(F.size("_toks") >= 1)
        .select(id_col, F.element_at("_toks", 1).alias("tok"))
        .join(model.unigrams, "tok", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + a)
                    / (F.col("_n") + a * F.col("_v"))
                ),
                6,
            ).alias("lp"),
        )
    )
    # transitions: conditional add-alpha bigram
    pairs = (
        _pair_frame(df, text_col, id_col)
        .join(model.bigrams, ["t1", "t2"], "left")
        .join(
            model.unigrams.select(F.col("tok").alias("t1"), F.col("c").alias("_ca")),
            "t1",
            "left",
        )
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + a)
                    / (F.coalesce(F.col("_ca"), F.lit(0)) + a * F.col("_v"))
                ),
                6,
            ).alias("lp"),
        )
    )
    return (
        firsts.unionAll(pairs)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("lp").cast("decimal(20,6)")).alias("_s"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(-F.col("_s").cast("double") / F.col("n_tokens"), 4).alias(
                "avg_nll"
            ),
        )
    )


def bigram_self_score_oracle_sql(
    alpha: float = 0.5, table: str = "documents"
) -> str:
    """DuckDB oracle for the self-trained bigram scoring query: identical
    tokenization, pair construction, smoothing and rounding. Pairs come
    from positional list indexing (``toks[i], toks[i+1]``) — the same
    adjacency the Spark side builds with zip_with over slices."""
    return f"""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{LM_TOKEN_PATTERN}') AS toks
  FROM {table}
), toks AS (
  SELECT doc_id, unnest(toks) AS tok FROM tk
), counts AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT sum(c) AS n, count(*) AS v FROM counts
), pairs AS (
  SELECT doc_id, toks[CAST(i AS INT)] AS t1, toks[CAST(i + 1 AS INT)] AS t2
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM tk WHERE len(toks) >= 2)
), bcounts AS (
  SELECT t1, t2, count(*) AS c2 FROM pairs GROUP BY t1, t2
), first_lp AS (
  SELECT doc_id,
         round(ln((COALESCE(c, 0) + {alpha}) / (n + {alpha} * v)), 6) AS lp
  FROM (SELECT doc_id, toks[1] AS tok FROM tk WHERE len(toks) >= 1) f
  LEFT JOIN counts USING (tok), tot
), pair_lp AS (
  SELECT p.doc_id,
         round(ln((COALESCE(b.c2, 0) + {alpha})
                  / (COALESCE(u.c, 0) + {alpha} * v)), 6) AS lp
  FROM pairs p
  LEFT JOIN bcounts b ON p.t1 = b.t1 AND p.t2 = b.t2
  LEFT JOIN counts u ON p.t1 = u.tok, tot
), allp AS (
  SELECT * FROM first_lp UNION ALL SELECT * FROM pair_lp
)
SELECT doc_id,
       count(*) AS n_tokens,
       round(-CAST(sum(CAST(lp AS DECIMAL(20,6))) AS DOUBLE) / count(*), 4) AS avg_nll
FROM allp
GROUP BY doc_id
"""
