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
