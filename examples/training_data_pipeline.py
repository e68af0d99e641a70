"""End-to-end example: the LLM training-data path — quality-filter →
exact dedup → MinHash near-dup dedup → eval-set decontamination →
sequence packing → content-addressed shards, as resumable JobRunner
steps with an error budget and per-step accounting.

This is the pipeline shape the extension operators exist for (the
reference engine streams/transforms records but has none of these
corpus-level ops); every step here is a distributed Spark action, and
re-running the script skips completed steps via the persisted job
state.

Run:  python examples/training_data_pipeline.py [workdir] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(workdir: str | None = None, sf_dir: str | None = None) -> int:
    from etl_tools_rs_spark.jobs.runner import JobRunner
    from etl_tools_rs_spark.operators.dedup import (
        decontaminate_ngram,
        dedup_exact,
        dedup_minhash_lsh,
    )
    from etl_tools_rs_spark.operators.packing import pack_concat
    from etl_tools_rs_spark.operators.text import gopher_filter
    from etl_tools_rs_spark.session import get_spark
    from etl_tools_rs_spark.sinks.shards import write_training_shards
    from etl_tools_rs_spark.sinks.simple_store import SimpleStore

    work = workdir or tempfile.mkdtemp(prefix="training_pipeline_")
    sf = sf_dir or "/root/testdata/sf0.001"
    spark = get_spark("training-data-example", shuffle_partitions=8)

    jr = JobRunner(
        "example-2", "training-data", SimpleStore(f"{work}/state"),
        max_errors=0, stop_on_error=True,
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def quality(_jr):
        kept = gopher_filter(docs, "text").filter(F.col("keep")).drop("keep")
        kept.write.mode("overwrite").parquet(f"{work}/quality")
        return spark.read.parquet(f"{work}/quality").count()

    n_quality = jr.run_cmd("quality_filter", quality)

    def dedup(_jr):
        q = spark.read.parquet(f"{work}/quality")
        # exact pass: keep one full row per distinct text (smallest id wins)
        winners = dedup_exact(q, "text", "doc_id").select("doc_id")
        exact = q.join(winners, "doc_id")
        # near-dup pass: LSH candidate pairs -> drop the larger id of each
        pairs = dedup_minhash_lsh(
            exact, "text", "doc_id", num_hashes=16, bands=4, threshold=0.8
        )
        losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        exact.join(losers, "doc_id", "left_anti").write.mode(
            "overwrite"
        ).parquet(f"{work}/deduped")
        return spark.read.parquet(f"{work}/deduped").count()

    n_dedup = jr.run_cmd("dedup", dedup)

    def decontaminate(_jr):
        d = spark.read.parquet(f"{work}/deduped")
        # stand-in eval set: the 5 lexicographically-first docs
        eval_set = docs.orderBy("doc_id").limit(5).select("text")
        clean = decontaminate_ngram(d, eval_set, "text", n=8)
        clean.write.mode("overwrite").parquet(f"{work}/clean")
        return spark.read.parquet(f"{work}/clean").count()

    n_clean = jr.run_cmd("decontaminate", decontaminate)

    def pack_and_shard(_jr):
        from etl_tools_rs_spark.functions import token_count

        clean = spark.read.parquet(f"{work}/clean").withColumn(
            "n_tokens", token_count("text").cast("bigint")
        )
        packed = pack_concat(clean, "doc_id", "n_tokens", budget=512)
        return write_training_shards(
            packed, f"{work}/shards", 4, key_cols=["doc_id"]
        ).total_rows

    n_seqs = jr.run_cmd("pack_shard", pack_and_shard)
    state = jr.complete()
    print(
        json.dumps(
            {
                "input_docs": docs.count(),
                "after_quality": n_quality,
                "after_dedup": n_dedup,
                "after_decontaminate": n_clean,
                "packed_sequences": n_seqs,
                "steps": {k: s.status for k, s in state.step_history.items()},
                "workdir": work,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else None,
            sys.argv[2] if len(sys.argv) > 2 else None,
        )
    )
