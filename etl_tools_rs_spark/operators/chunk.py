"""Document chunking — token-window splitting with overlap.

No reference equivalent (extension surface): the RAG/pretraining prep op
that turns long documents into bounded, overlapping context windows while
keeping provenance (doc id, chunk index, token offsets).

Spark-first: tokenization, window arithmetic, and the 1:N explode are all
built-in column expressions (regexp_extract_all → sequence → posexplode →
slice/array_join) — whole-stage codegen end to end, no Python in the hot
path, and the explode output is distributed by construction (no driver
loops, no per-doc collect).

Scale notes: the explode multiplies rows by ~n_tokens/step — at 100 TB
input that output dominates; write it partitioned (hash on doc_id keeps a
doc's chunks co-located for downstream pack/join) and never cache the
exploded frame. Token arrays exist only inside one projection — the
shuffle rows carry (id, chunk_id, text) narrow columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# \S+ tokenization: RE2-safe, identical semantics in Spark and DuckDB so
# chunk text hash-matches the oracle byte-for-byte
TOKEN_PATTERN = r"\S+"


def chunk_tokens_arr(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), 0)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into windows of ``chunk_size`` whitespace
    tokens advancing by ``chunk_size - overlap`` (consecutive chunks share
    ``overlap`` tokens). Output one row per chunk:

    ``(id, chunk_id int, n_chunks int, start_token int, chunk_tokens int,
    chunk_text string)``

    Empty/whitespace-only documents yield no rows (nothing to embed).
    A document with ≤ chunk_size tokens yields exactly one chunk.
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size!r}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"overlap must be in [0, chunk_size), got {overlap!r}")
    step = chunk_size - overlap
    toks = chunk_tokens_arr(text_col)
    n = F.size(toks)
    # ceil((n - overlap) / step) windows cover all n tokens; max(...,1)
    # keeps single-window docs at exactly one chunk
    n_chunks = F.ceil(F.greatest(n - overlap, F.lit(1)) / F.lit(step)).cast("int")
    base = df.filter(n > 0).select(
        F.col(id_col),
        toks.alias("_toks"),
        n_chunks.alias("n_chunks"),
    )
    exploded = base.select(
        id_col,
        "n_chunks",
        F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
            "chunk_id", "_i"
        ),
        F.col("_toks"),
    )
    start = F.col("chunk_id") * step  # 0-based token offset
    piece = F.slice(F.col("_toks"), start + 1, chunk_size)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "n_chunks",
        start.cast("int").alias("start_token"),
        F.size(piece).cast("int").alias("chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_documents_oracle_sql(
    chunk_size: int = 64, overlap: int = 8, table: str = "documents"
) -> str:
    """The DuckDB-equivalent SQL (same tokenization, same window math) for
    the correctness gate."""
    step = chunk_size - overlap
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_PATTERN}') AS t
  FROM {table}
), base AS (
  SELECT doc_id, t, len(t) AS n,
         CAST(ceil(greatest(len(t) - {overlap}, 1) / CAST({step} AS DOUBLE)) AS INT) AS n_chunks
  FROM toks WHERE len(t) > 0
), ex AS (
  SELECT doc_id, n_chunks, t,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM base
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       n_chunks,
       CAST(chunk_id * {step} AS INT) AS start_token,
       CAST(len(list_slice(t, chunk_id * {step} + 1, chunk_id * {step} + {chunk_size})) AS INT) AS chunk_tokens,
       array_to_string(list_slice(t, chunk_id * {step} + 1, chunk_id * {step} + {chunk_size}), ' ') AS chunk_text
FROM ex
"""
