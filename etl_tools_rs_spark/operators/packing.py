"""Sequence packing for LLM training pipelines: lay documents out into
fixed-token-budget training sequences.

Two layouts, both distributed:

- ``pack_concat`` — the GPT-style concatenated stream: documents are
  concatenated in a deterministic global order and the stream is cut
  every ``budget`` tokens; a document may straddle a cut. Fully
  SQL-expressible (it is exactly an exclusive prefix sum), so it is
  oracle-checked against DuckDB.
- ``pack_first_fit`` — no-straddle bin packing (first-fit-decreasing per
  hash shard): every document lands in exactly one bin, bins respect the
  budget (oversize documents get singleton bins). The greedy loop is
  per-shard state, run as an ``applyInPandas`` over deterministic
  hash shards — shards are independent, so the packing parallelizes to
  any cluster width at the cost of (shards × budget) wasted tail tokens.

The global prefix sum does NOT use a single-partition window (the classic
driver-chokepoint mistake at 100 TB): see ``scalable_cumsum``.

Reference parity: none (the reference has no notion of token budgets);
this is part of the training-data extension surface (BASELINE.json scale
ops), like dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_tools_rs_spark.session import default_parallelism


def _bucket_of(order: Column, bounds: list) -> Column:
    """Deterministic range-bucket id: number of boundaries <= order.
    A pure function of the order value (unlike spark_partition_id after a
    sampled repartition), so repeated actions over the same frame can
    never disagree about which bucket a row is in."""
    if not bounds:
        return F.lit(0)
    return F.size(F.filter(F.lit(bounds), lambda b: b <= order))


def scalable_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_buckets: int | None = None,
) -> DataFrame:
    """Global running total of ``value_col`` in ``order_col`` order,
    WITHOUT a global-order window (which Spark executes as a single
    partition — the whole dataset through one task).

    Classic two-phase distributed prefix sum:
    1. split the order domain into range buckets (approxQuantile
       boundaries — one driver round-trip of ``num_buckets`` doubles);
    2. windowed cumsum WITHIN each bucket (parallel, one shuffle);
    3. per-bucket totals (tiny agg) become per-bucket starting offsets on
       the driver; a literal-array lookup adds the offset back — no join.

    ``order_col`` must be numeric/timestamp and UNIQUE (the tie-break is
    the order key itself; equal keys would make "running" ambiguous —
    same contract as the reference's resume index, SURVEY §2.6 O4).
    """
    return scalable_cumsum_multi(
        df, order_col, [(value_col, out_col)], num_buckets
    )


def scalable_cumsum_multi(
    df: DataFrame,
    order_col: str,
    cols: list[tuple[str, str]],
    num_buckets: int | None = None,
) -> DataFrame:
    """Two-phase distributed prefix sum over SEVERAL value columns in one
    pass (r4): ``cols`` is ``[(value_col, out_col), ...]``. The bucket
    boundaries (one approxQuantile round-trip) and the per-bucket offset
    totals (one tiny collect) are shared across all columns — callers that
    need k running totals over the same order key (e.g. the two-sided
    cumulative counts of ``profile.ks_statistic``) pay ONE boundary
    sample + ONE totals action instead of k of each, and the upstream
    frame is recomputed once per action instead of k times.

    Same contract as :func:`scalable_cumsum`: ``order_col`` numeric/
    timestamp and unique; never a global-order single-partition window.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    spark = df.sparkSession
    n = num_buckets or default_parallelism(spark)
    order = F.col(order_col)
    probs = [i / n for i in range(1, n)]
    bounds = df.stat.approxQuantile(order_col, probs, 0.001) if probs else []
    # dedupe equal quantiles (skewed/small data) — empty buckets are fine
    bounds = sorted(set(bounds))
    bucketed = df.withColumn("__b", _bucket_of(order, bounds))
    w = Window.partitionBy("__b").orderBy(order_col)
    local = bucketed
    for i, (value_col, _out) in enumerate(cols):
        local = local.withColumn(f"__local{i}", F.sum(value_col).over(w))
    totals = {
        r["__b"]: tuple(r[f"__t{i}"] for i in range(len(cols)))
        for r in bucketed.groupBy("__b")
        .agg(
            *[
                F.sum(vc).alias(f"__t{i}")
                for i, (vc, _o) in enumerate(cols)
            ]
        )
        .collect()
    }
    zero = tuple(0 for _ in cols)
    out = local
    for i, (_vc, out_col) in enumerate(cols):
        offsets, acc = [], 0
        for b in range(len(bounds) + 1):
            offsets.append(acc)
            acc += (totals.get(b, zero)[i]) or 0
        # type the offset literals from the sum column itself so
        # exact-decimal value columns stay exact (mixed int/Decimal
        # literals won't coerce)
        sum_type = local.schema[f"__local{i}"].dataType
        offs = F.array(*[F.lit(o).cast(sum_type) for o in offsets])
        out = out.withColumn(
            out_col,
            F.col(f"__local{i}")
            + F.element_at(offs, F.col("__b").cast("int") + F.lit(1)),
        )
    return out.drop("__b", *[f"__local{i}" for i in range(len(cols))])


def pack_concat(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Concatenated-stream packing: documents in ``order_col`` order form
    one token stream, cut every ``budget`` tokens. Adds:

    - ``start_off`` — exclusive prefix sum (the document's stream offset)
    - ``pack_first`` / ``pack_last`` — ids of the first/last sequence the
      document lands in (straddling documents span several)
    - ``n_packs`` — how many sequences it touches

    One range shuffle + parallel windows (see ``scalable_cumsum``); the
    pack ids are pure arithmetic on the offsets.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    with_end = scalable_cumsum(df, order_col, tokens_col, out_col="__end")
    start = F.col("__end") - F.col(tokens_col)
    last_tok = F.col("__end") - F.lit(1)
    return (
        with_end.withColumn("start_off", start.cast("bigint"))
        .withColumn("pack_first", F.floor(start / budget).cast("bigint"))
        .withColumn(
            "pack_last",
            F.when(F.col(tokens_col) > 0, F.floor(last_tok / budget))
            .otherwise(F.floor(start / budget))
            .cast("bigint"),
        )
        .withColumn("n_packs", (F.col("pack_last") - F.col("pack_first") + 1).cast("bigint"))
        .drop("__end")
    )


def pack_first_fit(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_shards: int | None = None,
) -> DataFrame:
    """No-straddle packing: assign every document to exactly one bin of
    capacity ``budget`` tokens via first-fit-decreasing, sharded by a
    deterministic hash of the id so the greedy loop parallelizes.

    Output: input columns + ``bin_id`` (string ``"<shard>/<n>"``). Bins
    never exceed the budget unless a single document alone does (it gets
    a singleton bin — the caller truncates or splits upstream). FFD waste
    is bounded (≤ 11/9·OPT + 1 bins per shard); sharding adds at most one
    underfull tail bin per shard, negligible when shards ≪ documents.

    The per-shard loop is an Arrow-batched ``applyInPandas`` — state never
    leaves the executor, shards never co-reside, and shard assignment is
    a pure function of the id (stable under retries/re-partitioning).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    n_shards = num_shards or default_parallelism(spark)
    shard = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards))
    sharded = df.withColumn("__shard", shard.cast("int"))
    from pyspark.sql.types import StringType, StructField, StructType

    # copy before extending — df.schema returns the frame's own (cached)
    # StructType and .add mutates in place
    out_schema = StructType(
        list(sharded.schema.fields) + [StructField("bin_id", StringType())]
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        shard_id = int(pdf["__shard"].iloc[0]) if len(pdf) else 0
        bins: list[int] = []  # remaining capacity per bin
        assigned: list[str] = []
        for t in pdf[tokens_col]:
            t = int(t)
            placed = None
            for i, rem in enumerate(bins):
                if rem >= t:
                    placed = i
                    bins[i] = rem - t
                    break
            if placed is None:
                bins.append(max(0, budget - t))
                placed = len(bins) - 1
            assigned.append(f"{shard_id}/{placed}")
        pdf["bin_id"] = pd.Series(assigned, dtype="object")
        return pdf

    return (
        sharded.groupBy("__shard")
        .applyInPandas(pack, schema=out_schema)
        .drop("__shard")
    )


def length_bucket_stats(
    df: DataFrame,
    len_col: str,
    n_buckets: int = 8,
    scale: int = 6,
) -> DataFrame:
    """Length-bucketed batching audit for padded inference/training:
    split the corpus into ``n_buckets`` equal-count rank buckets of
    ``len_col`` (at length-group granularity — equal lengths always
    share a bucket, which is exactly right since they pad identically)
    and report each bucket's padding economics when batched together:
    ``padded_tokens = len_max · n_docs`` vs real tokens, and the waste
    share. The decision table for "how many length buckets until
    padding waste is acceptable".

    Scalable shape: one length-histogram aggregate (output ≈ distinct
    lengths), ranks via the two-phase distributed prefix sum — never a
    global-order window — then a bucket-keyed aggregate. All integer
    arithmetic until the one waste-share division (floor-scaled).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets!r}")
    p10 = float(10**scale)
    hist = df.groupBy(F.col(len_col).alias("_len")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    cum = scalable_cumsum(hist, "_len", "_c", out_col="_endr")
    total = hist.agg(F.sum("_c").cast("bigint").alias("_tot"))
    bucket = F.floor(
        (F.col("_endr") - 1) * F.lit(n_buckets) / F.col("_tot")
    ).cast("bigint")
    per = (
        cum.crossJoin(F.broadcast(total))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.sum("_c").cast("bigint").alias("n_docs"),
            F.min("_len").cast("bigint").alias("len_min"),
            F.max("_len").cast("bigint").alias("len_max"),
            F.sum(F.col("_len") * F.col("_c")).cast("bigint").alias("tokens"),
        )
    )
    padded = F.col("len_max") * F.col("n_docs")
    return per.select(
        "bucket",
        "n_docs",
        "len_min",
        "len_max",
        "tokens",
        padded.cast("bigint").alias("padded_tokens"),
        F.when(padded > 0,
            F.floor(F.lit(p10) * (padded - F.col("tokens")) / padded)
            / F.lit(p10)
        ).otherwise(F.lit(0.0)).cast("double").alias("waste_share"),
    )
