"""Scale-up generator: expand the driver's sf0.1 testdata K× with
foreign-key-consistent key remapping (VERDICT r3 task #1 — produce a
>=sf1 empirical datapoint; /root/testdata is read-only, so derived data
lands under the repo in a gitignored dir).

Method: each fact/entity table is replicated K times; replica ``r``
shifts every key column by ``r * (max_key + 1)`` OF ITS OWN DOMAIN, so
referential integrity, per-key cardinalities (orders per customer,
lineitems per order, events per user), and all value distributions are
preserved exactly — the result is K independent, structurally identical
shards of the original, which is precisely the "same data, more of it"
shape a scale test wants. Dimension tables (region, nation) stay fixed,
as TPC-H itself scales them. To avoid a degenerate 10×-exact-duplicate
corpus for the dedup/similarity operators, replica>0 document text gets
a 3-token suffix (n_chars recomputed) and embeddings get a deterministic
±0.005 per-element jitter (xxhash64-derived — no rand(), reproducible on
any partitioning).

Usage:
    python tools/gen_scale_data.py [K] [SRC_DIR] [OUT_DIR] [TABLES]
defaults: K=10, SRC=/root/testdata/sf0.1, OUT=<repo>/.scaledata/sf1,
TABLES=all (comma-separated subset, e.g. ``orders,lineitem`` for a
graph-only sf30 probe — skips replicating documents/embeddings 300x
when only the purchase graph is needed).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from etl_tools_rs_spark.session import get_spark  # noqa: E402

COPY_TABLES = ("region", "nation")

# table -> {column: key_domain} ; every column in the same domain shifts
# by the same per-replica offset so joins keep lining up
KEYED_TABLES: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}

# domain -> (table, column) to measure the key range from
DOMAIN_SOURCE = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}


def _replicate(df: DataFrame, k: int, key_cols: dict[str, str], offsets: dict[str, int]) -> DataFrame:
    reps = df.sparkSession.range(k).select(F.col("id").alias("_rep"))
    out = df.crossJoin(reps)
    for col, domain in key_cols.items():
        dtype = dict(out.dtypes)[col]
        out = out.withColumn(
            col, (F.col(col) + F.col("_rep") * F.lit(offsets[domain])).cast(dtype)
        )
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(repo, ".scaledata", "sf1")
    only = (
        {t.strip() for t in sys.argv[4].split(",") if t.strip()}
        if len(sys.argv) > 4
        else None
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("gen-scale-data")
    spark.sparkContext.setLogLevel("ERROR")

    copy_tables = tuple(
        t for t in COPY_TABLES if only is None or t in only
    )
    keyed_tables = {
        t: cols for t, cols in KEYED_TABLES.items() if only is None or t in only
    }
    tables = {
        name: spark.read.parquet(f"{src}/{name}.parquet")
        for name in copy_tables + tuple(keyed_tables)
    }
    # offsets only for domains the selected tables actually reference;
    # measured from the selected table itself when the canonical domain
    # source isn't in the subset (same max over the FK column)
    needed_domains = {d for cols in keyed_tables.values() for d in cols.values()}
    offsets = {}
    for dom in needed_domains:
        tbl, col = DOMAIN_SOURCE[dom]
        if tbl in tables:
            mx = tables[tbl].agg(F.max(col)).collect()[0][0]
        else:
            # canonical domain source excluded from the subset: the
            # offset must clear the max over ALL selected FK columns on
            # this domain, not just the first found — otherwise two
            # tables sharing the domain can overlap across replicas
            # (ADVICE r7) when the first table's max is the smaller one
            # skip None maxes (empty table / all-NULL FK column) so one
            # degenerate table can't TypeError the whole offset pass
            # (ADVICE r8); fail loudly only when NO candidate has a value
            maxes = [
                m
                for m in (
                    tables[t].agg(F.max(c)).collect()[0][0]
                    for t, cols in keyed_tables.items()
                    for c, d in cols.items()
                    if d == dom
                )
                if m is not None
            ]
            if not maxes:
                raise ValueError(
                    f"domain {dom!r}: every selected FK column is empty/NULL;"
                    " cannot derive a replica offset"
                )
            mx = max(maxes)
        offsets[dom] = mx + 1
    print(f"# domains: {offsets}", file=sys.stderr)

    for name in copy_tables:
        tables[name].write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"# {name}: copied", file=sys.stderr)

    synth_text = (
        os.environ.get("SPARK_GRAFT_SYNTH_TEXT") == "1"
        and "documents" in keyed_tables
    )
    if synth_text:
        # r6 (VERDICT r5 #8): NON-replicated synthetic text for replica>0
        # — each replica doc gets a fresh deterministic word stream of
        # the same length from the source vocabulary, so near-dup
        # density stays that of the ORIGINAL corpus instead of growing
        # ~k² via suffixed copies (the sf3 artifact that dominated the
        # duplicate-span/cooccurrence exponents). Word-level stats stay
        # comparable; doc count/length distributions identical.
        vocab_words = [
            r.w
            for r in tables["documents"]
            .select(
                F.explode(
                    F.filter(
                        F.split(F.trim(F.lower("text")), r"\s+"),
                        lambda t: t != "",
                    )
                ).alias("w")
            )
            .distinct()
            .collect()
        ]
        vocab_lit = F.array(*[F.lit(w) for w in sorted(vocab_words)])
        print(f"# synth text vocab: {len(vocab_words)} words", file=sys.stderr)

    for name, key_cols in keyed_tables.items():
        df = _replicate(tables[name], k, key_cols, offsets)
        if name == "documents" and synth_text:
            n_words = F.size(
                F.filter(
                    F.split(F.trim(F.lower("text")), r"\s+"), lambda t: t != ""
                )
            )
            fresh = F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.greatest(n_words, F.lit(1))),
                    lambda i: F.element_at(
                        vocab_lit,
                        (
                            F.pmod(
                                F.xxhash64(F.col("doc_id"), F.col("_rep"), i),
                                F.lit(len(vocab_words)),
                            )
                            + 1
                        ).cast("int"),
                    ),
                ),
            )
            df = df.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(fresh),
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        elif name == "documents":
            # suffix replica>0 text so the corpus isn't K× exact dups;
            # n_chars stays consistent with text
            df = df.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" rep "), F.col("_rep").cast("string"))
                ),
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        if name == "embeddings":
            # deterministic tiny jitter for replica>0 (xxhash64 per
            # element): near-dup structure survives, exact dups don't
            df = df.withColumn(
                "embedding",
                F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                    F.transform(
                        "embedding",
                        lambda x, i: (
                            x
                            + (
                                F.pmod(
                                    F.xxhash64(F.col("vec_id"), i, F.col("_rep")),
                                    F.lit(1000),
                                )
                                - 500
                            ).cast("float")
                            / F.lit(100000.0)
                        ).cast("float"),
                    )
                ),
            )
        n_files = 32 if name in ("lineitem", "orders", "events") else 8
        df = df.drop("_rep").repartition(n_files)
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"# {name}: x{k} written", file=sys.stderr)

    # verification: row counts exactly K x source, FK integrity on samples
    for name in keyed_tables:
        n_src = tables[name].count()
        n_out = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        assert n_out == k * n_src, (name, n_src, n_out)
    if "lineitem" in keyed_tables and "orders" in keyed_tables:
        li = spark.read.parquet(f"{out_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{out_dir}/orders.parquet")
        dangling = li.join(od, li.l_orderkey == od.o_orderkey, "left_anti").count()
        assert dangling == 0, f"{dangling} dangling lineitem FK rows"
        print(f"# verified: counts x{k}, lineitem->orders FK intact", file=sys.stderr)
    else:
        print(f"# verified: counts x{k}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
