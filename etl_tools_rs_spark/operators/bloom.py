"""Bloom-filter semi-join pruning: filter a huge fact table by membership
in a dim-side key set WITHOUT shuffling the fact and WITHOUT requiring the
key set itself to be broadcast-able.

The 100 TB join problem this solves: `fact JOIN dim ON k` where dim has
too many distinct keys to broadcast exactly (a broadcast hash semi-join
needs the full key hash set per executor), but the fact is so much bigger
that shuffling it on k is the dominant cost. A bloom filter over dim's
keys compresses to `num_bits/8` bytes regardless of key count or width
(10M keys at 1% FPR ≈ 12 MB), broadcasts everywhere, and drops the
(1 - selectivity) of fact rows that can't match BEFORE the shuffle — the
same idea as Spark's runtime row-level bloom pruning
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed as an
explicit, composable operator (the runtime one only triggers under
selectivity/size heuristics and cannot be applied to non-join pipelines
like "keep documents whose url-host appeared in yesterday's allowlist").

No false negatives ever (bloom property), so `bloom_prune(fact) JOIN dim`
is value-identical to `fact JOIN dim` — which makes the whole path
oracle-checkable against the plain join.

Spark-first mechanics: the bitmap is built as a groupBy over bit
positions (`bit_or` of shifted ones, map-side combined — the shuffle is
at most `num_bits/64` longs), assembled into one `array<long>` row, and
broadcast-cross-joined onto the fact; the membership test is pure
codegen-able integer ops (`element_at` + shift + mask), no UDF, no
driver-side loop over fact rows.

Reference parity: the reference has no bloom primitive (its joins are
single-node hash loops — SURVEY §2.4 J1, etl-core left join); this is the
scale-path generalization.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomSpec:
    """Shape of a bloom filter: ``num_bits`` bitmap (rounded up to a
    multiple of 64), ``num_hashes`` probe functions (xxhash64 seeded by
    probe index)."""

    num_bits: int
    num_hashes: int

    @staticmethod
    def for_items(expected_items: int, fpr: float = 0.01) -> "BloomSpec":
        """Standard sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2)."""
        if not (0.0 < fpr < 1.0) or expected_items <= 0:
            raise ValueError("need expected_items > 0 and 0 < fpr < 1")
        m = int(-expected_items * math.log(fpr) / (math.log(2) ** 2))
        m = max(64, ((m + 63) // 64) * 64)
        k = max(1, round(m / expected_items * math.log(2)))
        return BloomSpec(num_bits=m, num_hashes=k)

    def positions(self, key: Column) -> list[Column]:
        """Bit position of ``key`` under each probe hash. xxhash64 with a
        distinct literal first argument per probe gives k independent
        64-bit hashes; pmod folds into the bitmap."""
        return [
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(self.num_bits))
            for i in range(self.num_hashes)
        ]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    spec: BloomSpec | None = None,
    expected_items: int | None = None,
    fpr: float = 0.01,
) -> DataFrame:
    """Build the bloom bitmap over ``keys[key_col]`` (NULLs ignored — NULL
    never equi-joins). Returns a ONE-ROW frame ``(bm: array<long>,
    num_bits: long, num_hashes: int)`` — keep it as a DataFrame so the
    fact-side application is a broadcast join, not a driver collect; the
    bitmap never exceeds ``num_bits/8`` bytes by construction.

    Provide either an explicit ``spec`` or ``expected_items`` (+ ``fpr``)
    for standard sizing. Plan shape: distinct-free (duplicate keys just
    re-set bits), one groupBy(word) shuffle of at most num_bits/64 rows
    with map-side bit_or combine, then a dense-assembly aggregate of the
    (word_idx, word) pairs into the array.
    """
    if spec is None:
        if expected_items is None:
            raise ValueError("pass spec= or expected_items=")
        spec = BloomSpec.for_items(expected_items, fpr)
    n_words = spec.num_bits // 64
    key = F.col(key_col)
    pos = F.explode(F.array(*spec.positions(key))).alias("_pos")
    words = (
        keys.filter(key.isNotNull())
        .select(pos)
        .select(
            (F.col("_pos") / 64).cast("int").alias("_w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), F.pmod(F.col("_pos"), 64).cast("int")
            ).alias("_b"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_b").alias("_word"))
    )
    # dense array: left-join the sparse words onto a range of all slots,
    # then collect SORTED and project the word field — O(n_words log
    # n_words), O(1) plan size. (The earlier map_from_entries +
    # per-slot element_at form was quadratic: Catalyst map lookups are
    # LINEAR scans, so n_words slots × n_words-entry map = O(n_words²)
    # inside one task — measured 1.8s→122s from sf0.1 to sf1, the 68×
    # blowup that motivated this shape.)
    spark = keys.sparkSession
    slots = spark.range(n_words).select(F.col("id").cast("int").alias("_w"))
    dense = slots.join(words, "_w", "left").select(
        "_w", F.coalesce("_word", F.lit(0).cast("bigint")).alias("_word")
    )
    return dense.agg(
        F.array_sort(F.collect_list(F.struct("_w", "_word"))).alias("_e")
    ).select(
        F.transform(F.col("_e"), lambda e: e["_word"]).alias("bm"),
        F.lit(spec.num_bits).cast("bigint").alias("num_bits"),
        F.lit(spec.num_hashes).alias("num_hashes"),
    )


def bloom_might_contain(spec: BloomSpec, bm: Column, key: Column) -> Column:
    """Codegen-able membership test: every probe bit set."""
    cond = F.lit(True)
    for p in spec.positions(key):
        word = F.element_at(bm, (p / 64).cast("int") + F.lit(1))
        bit = F.call_function(
            "shiftright", word, F.pmod(p, 64).cast("int")
        ).bitwiseAND(F.lit(1))
        cond = cond & (bit == F.lit(1))
    return cond


def bloom_prune(
    fact: DataFrame, key_col: str, bloom: DataFrame, spec: BloomSpec
) -> DataFrame:
    """Keep fact rows whose ``key_col`` MIGHT be in the bloom (plus-or-
    minus the FPR; never drops a true match). The bloom frame broadcasts
    (single row); the test runs inside the fact scan's codegen stage, so
    this composes with predicate pushdown on other fact filters and cuts
    the fact BEFORE any shuffle a downstream join would do."""
    b = F.broadcast(bloom.select("bm"))
    return (
        fact.join(b)
        .filter(bloom_might_contain(spec, F.col("bm"), F.col(key_col)))
        .drop("bm")
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    dim_key: str | None = None,
    fpr: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """EXACT semi-join accelerated by bloom pre-pruning: bloom-prune the
    fact (approximate, no false negatives), then the exact semi-join only
    shuffles the survivors. Value-identical to ``fact.join(dim, ...,
    "left_semi")`` — the bloom only changes how much data moves.

    ``expected_items`` defaults to a dim count (one extra cheap action on
    the dim side — at 100 TB the dim count is the small side by
    definition)."""
    dk = dim_key or key_col
    keys = dim.select(F.col(dk).alias("__bk"))
    n = expected_items if expected_items is not None else keys.count()
    spec = BloomSpec.for_items(max(1, n), fpr)
    bloom = build_bloom(keys, "__bk", spec=spec)
    pruned = bloom_prune(fact, key_col, bloom, spec)
    cond = pruned[key_col] == dim[dk]
    return pruned.join(dim, cond, "left_semi")
