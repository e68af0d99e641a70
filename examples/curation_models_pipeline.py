"""End-to-end example: the model-prep side of corpus curation —
duplicate-span audit → rule-based quality labels distilled into a
logistic-regression classifier → BPE tokenizer training → leakage-safe
train/val/test split, as resumable JobRunner steps.

Companion to examples/training_data_pipeline.py (which covers
filter/dedup/pack/shard): this one exercises the ops that LEARN from the
corpus — the classifier that replaces hand rules at scale (the GPT-3 /
LLaMA curation move: fit a cheap linear model on rule labels, then score
everything), the tokenizer that ships with the model, and the split
that exact duplicates can never straddle.

Run:  python examples/curation_models_pipeline.py [workdir] [sf_dir]
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
    from etl_tools_rs_spark.operators import ml
    from etl_tools_rs_spark.operators.bpe import bpe_train
    from etl_tools_rs_spark.operators.dedup import duplicate_spans
    from etl_tools_rs_spark.operators.sample import leakage_safe_split
    from etl_tools_rs_spark.operators.text import char_stats, gopher_filter
    from etl_tools_rs_spark.session import get_spark
    from etl_tools_rs_spark.sinks.simple_store import SimpleStore

    work = workdir or tempfile.mkdtemp(prefix="curation_models_")
    sf = sf_dir or "/root/testdata/sf0.001"
    spark = get_spark("curation-models-example", shuffle_partitions=8)

    jr = JobRunner(
        "example-3", "curation-models", SimpleStore(f"{work}/state"),
        max_errors=0, stop_on_error=True,
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def span_audit(_jr):
        spans = duplicate_spans(docs, "text", "doc_id", k=20)
        flagged = spans.select("doc_id").distinct().count()
        return flagged

    n_flagged = jr.run_cmd("span_audit", span_audit)

    def distill_classifier(_jr):
        # label = the rule-based gopher verdict; features = cheap signals
        labeled = gopher_filter(docs, "text")
        cs = char_stats("text")
        feats = [
            cs["char_entropy"],
            cs["tri_distinct_ratio"],
            F.col("n_chars") / F.lit(1000.0),
        ]
        w = ml.logreg_fit(
            labeled, feats, F.col("keep").cast("double"),
            iterations=10, lr=0.5,
        )
        scored = docs.withColumn("quality_p", ml.logreg_score(docs, w, feats))
        scored.write.mode("overwrite").parquet(f"{work}/scored")
        return len(w)

    n_weights = jr.run_cmd("distill_classifier", distill_classifier)

    def train_tokenizer(_jr):
        merges = bpe_train(docs, "text", num_merges=8)
        with open(f"{work}/merges.json", "w") as fh:
            json.dump(merges, fh)
        return len(merges)

    n_merges = jr.run_cmd("train_tokenizer", train_tokenizer)

    def split(_jr):
        out = leakage_safe_split(
            spark.read.parquet(f"{work}/scored"),
            {"train": 0.8, "val": 0.1, "test": 0.1},
            "text",
        )
        out.write.mode("overwrite").partitionBy("split").parquet(
            f"{work}/splits"
        )
        return out.count()

    n_split = jr.run_cmd("split", split)

    jr.complete()
    state = jr.state
    print(
        json.dumps(
            {
                "flagged_docs": n_flagged,
                "classifier_weights": n_weights,
                "bpe_merges": n_merges,
                "split_rows": n_split,
                "steps": {k: s.status for k, s in state.step_history.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
