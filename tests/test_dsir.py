"""DSIR importance resampling: brute-force equivalence + selection laws.

The pure-Python reference reimplements the whole pipeline (hashing,
smoothing, integer quantization, Gumbel keys) independently of the Spark
expressions; equality is exact because every accumulated quantity is an
integer micro-unit (the module's numeric contract).
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.dsir import (
    dsir_bucket_weights,
    dsir_log_weights,
    dsir_sample,
)

B = 64  # small bucket table so collisions actually happen in tests
LAM = 0.5
P10 = 10**6


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip()) if t]


def _feats(text: str) -> list[int]:
    toks = _tokens(text)
    grams = list(toks)
    grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B for g in grams
    ]


def _brute_weights(raw: list[tuple[int, str]], target: list[str]):
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for txt in target:
        for b in _feats(txt):
            ct[b] = ct.get(b, 0) + 1
    for _, txt in raw:
        for b in _feats(txt):
            cr[b] = cr.get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    lr = {
        b: math.floor(
            P10
            * (
                math.log((ct.get(b, 0) + LAM) / (nt + LAM * B))
                - math.log((cr.get(b, 0) + LAM) / (nr + LAM * B))
            )
        )
        for b in range(B)
    }
    out = {}
    for did, txt in raw:
        fs = _feats(txt)
        out[did] = (len(fs), sum(lr[b] for b in fs))
    return lr, out


def _gumbel_micro(did: int) -> int:
    h = int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16)
    u = (h + 1) / float((1 << 60) + 1)
    return math.floor(P10 * -math.log(-math.log(u)))


CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "el gato se sienta"),
    (4, "der hund sitzt auf dem baum"),
    (5, "the cat and the dog sat"),
    (6, ""),  # zero features
    (7, "cat cat cat cat"),
    (8, "completely unrelated words here xyzzy"),
]
TARGET = ["the cat sat on the mat", "the dog and the cat", "cat sat mat"]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    tgt = spark.createDataFrame([(t,) for t in TARGET], ["text"])
    return raw, tgt


class TestDsirWeights:
    def test_bucket_table_matches_brute(self, frames):
        raw, tgt = frames
        got = {
            r["bucket"]: (r["n_target"], r["n_raw"], r["lr_micro"])
            for r in dsir_bucket_weights(
                raw, tgt, num_buckets=B
            ).collect()
        }
        lr, _ = _brute_weights(CORPUS, TARGET)
        assert set(got) == set(range(B))  # full fixed domain, zeros smoothed
        for b in range(B):
            assert got[b][2] == lr[b], f"bucket {b}"

    def test_log_weights_match_brute(self, frames):
        raw, tgt = frames
        got = {
            r["doc_id"]: (r["n_feats"], r["log_weight"])
            for r in dsir_log_weights(raw, tgt, num_buckets=B).collect()
        }
        _, exp = _brute_weights(CORPUS, TARGET)
        assert set(got) == {d for d, _ in CORPUS}  # every doc scored
        for did, (nf, lwm) in exp.items():
            assert got[did][0] == nf
            assert got[did][1] == pytest.approx(lwm / P10, abs=0)

    def test_empty_doc_scores_zero(self, frames):
        raw, tgt = frames
        row = (
            dsir_log_weights(raw, tgt, num_buckets=B)
            .filter(F.col("doc_id") == 6)
            .collect()[0]
        )
        assert row["n_feats"] == 0 and row["log_weight"] == 0.0

    def test_target_like_docs_rank_higher(self, frames):
        raw, tgt = frames
        got = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_log_weights(raw, tgt, num_buckets=B).collect()
        }
        # doc 1 is literally in the target; docs 3/4/8 share no tokens
        assert got[1] > got[3]
        assert got[1] > got[4]
        assert got[1] > got[8]

    def test_raw_equals_target_gives_zero(self, spark):
        df = spark.createDataFrame(CORPUS[:5], ["doc_id", "text"])
        out = dsir_log_weights(df, df.select("text"), num_buckets=B).collect()
        # p == q bucket-for-bucket -> ln p - ln q == 0.0 exactly
        assert all(r["log_weight"] == 0.0 for r in out)


class TestDsirScore:
    def test_score_path_equals_join_path(self, frames):
        """dsir_score (model-as-literal, row-local fold — the streaming /
        100 TB deployment path) must equal dsir_log_weights (the
        join-based fit path) doc-for-doc, bit-for-bit."""
        from etl_tools_rs_spark.operators.dsir import (
            dsir_model_vector,
            dsir_score,
        )

        raw, tgt = frames
        lr = dsir_model_vector(raw, tgt, num_buckets=B)
        assert len(lr) == B
        via_join = {
            r["doc_id"]: (r["n_feats"], r["log_weight"])
            for r in dsir_log_weights(raw, tgt, num_buckets=B).collect()
        }
        via_score = {
            r["doc_id"]: (r["n_feats"], r["log_weight"])
            for r in dsir_score(raw, lr).collect()
        }
        assert via_score == via_join

    def test_score_rejects_tiny_model(self, frames):
        from etl_tools_rs_spark.operators.dsir import dsir_score

        raw, _ = frames
        with pytest.raises(ValueError):
            dsir_score(raw, [0])


class TestDsirSample:
    def test_matches_brute_gumbel_topk(self, frames):
        raw, tgt = frames
        k = 4
        got = dsir_sample(raw, tgt, k=k, num_buckets=B).collect()
        _, exp = _brute_weights(CORPUS, TARGET)
        keyed = sorted(
            ((exp[d][1] + _gumbel_micro(d), d) for d, _ in CORPUS),
            key=lambda t: (-t[0], t[1]),
        )
        assert [r["doc_id"] for r in got] == [d for _, d in keyed[:k]]
        for r in got:
            key = exp[r["doc_id"]][1] + _gumbel_micro(r["doc_id"])
            assert r["gumbel_key"] == pytest.approx(key / P10, abs=0)

    def test_k_at_least_corpus_returns_all(self, frames):
        raw, tgt = frames
        got = dsir_sample(raw, tgt, k=100, num_buckets=B).collect()
        assert len(got) == len(CORPUS)

    def test_deterministic_across_runs(self, frames):
        raw, tgt = frames
        a = [r["doc_id"] for r in dsir_sample(raw, tgt, 3, num_buckets=B).collect()]
        b = [r["doc_id"] for r in dsir_sample(raw, tgt, 3, num_buckets=B).collect()]
        assert a == b

    def test_rejects_bad_params(self, frames):
        raw, tgt = frames
        with pytest.raises(ValueError):
            dsir_bucket_weights(raw, tgt, num_buckets=1)
        with pytest.raises(ValueError):
            dsir_bucket_weights(raw, tgt, smoothing=0.0)


class TestDsirPlans:
    def test_score_plan_is_shuffle_free(self, frames):
        """The deployment scorer's core claim: model-as-literal scoring
        adds NO exchange and NO Python stage — it must run as a pure
        narrow projection over the scan (that's what lets the identical
        expression score a stream statelessly)."""
        from etl_tools_rs_spark.operators.dsir import (
            dsir_model_vector,
            dsir_score,
        )

        raw, tgt = frames
        lr = dsir_model_vector(raw, tgt, num_buckets=B)
        plan = (
            dsir_score(raw, lr)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_log_weights_model_join_is_broadcast(self, frames):
        """The fit path's bucket table must reach the per-doc join as a
        broadcast — num_buckets rows, never a shuffled side."""
        raw, tgt = frames
        plan = (
            dsir_log_weights(raw, tgt, num_buckets=B)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestDsirFusedFit:
    """r9 fused one-pass fit: ``target_filter`` must produce EXACTLY the
    two-frame path's integers (the registry entries run the fused path
    against the unchanged two-frame SQL oracle, so equality here is the
    optimization's correctness argument)."""

    PRED_CORPUS = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the log", "en"),
        (3, "el gato se sienta", "es"),
        (4, "der hund sitzt auf dem baum", "de"),
        (5, "the cat and the dog sat", "en"),
        (6, "", "en"),
        (7, "cat cat cat cat", None),  # NULL lang: never target
        (8, "completely unrelated words here xyzzy", "es"),
    ]

    @pytest.fixture(scope="class")
    def pred_frames(self, spark):
        raw = spark.createDataFrame(
            self.PRED_CORPUS, ["doc_id", "text", "lang"]
        )
        return raw, raw.filter(F.col("lang") == "en"), F.col("lang") == "en"

    def test_bucket_weights_fused_equals_two_frame(self, pred_frames):
        raw, tgt, pred = pred_frames
        two = {
            r["bucket"]: (r["n_target"], r["n_raw"], r["lr_micro"])
            for r in dsir_bucket_weights(raw, tgt, num_buckets=B).collect()
        }
        one = {
            r["bucket"]: (r["n_target"], r["n_raw"], r["lr_micro"])
            for r in dsir_bucket_weights(
                raw, None, num_buckets=B, target_filter=pred
            ).collect()
        }
        assert one == two  # NULL-lang doc counts raw-only in both paths

    def test_log_weights_fused_equals_two_frame(self, pred_frames):
        raw, tgt, pred = pred_frames
        two = sorted(
            map(tuple, dsir_log_weights(raw, tgt, num_buckets=B).collect())
        )
        one = sorted(
            map(
                tuple,
                dsir_log_weights(
                    raw, None, num_buckets=B, target_filter=pred
                ).collect(),
            )
        )
        assert one == two

    def test_sample_fused_equals_two_frame(self, pred_frames):
        raw, tgt, pred = pred_frames
        two = sorted(
            map(tuple, dsir_sample(raw, tgt, 3, num_buckets=B).collect())
        )
        one = sorted(
            map(
                tuple,
                dsir_sample(
                    raw, None, 3, num_buckets=B, target_filter=pred
                ).collect(),
            )
        )
        assert one == two

    def test_fused_fit_halves_the_gram_scans(self, pred_frames):
        """The point of the fusion: ONE distinct gram-explode subtree
        instead of two. Each subtree appears twice in the unexecuted
        plan (the smoothing-totals branch cross-joins back over the
        counts; at runtime the pair collapses to a ReusedExchange), so
        the pin is 2 vs the two-frame path's 4."""
        raw, _, pred = pred_frames
        plan = (
            dsir_bucket_weights(raw, None, num_buckets=B, target_filter=pred)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Generate explode") == 2
        two_plan = (
            dsir_bucket_weights(
                raw, raw.filter(pred), num_buckets=B
            )._jdf.queryExecution().executedPlan().toString()
        )
        assert two_plan.count("Generate explode") == 4

    def test_rejects_ambiguous_target(self, pred_frames):
        raw, tgt, pred = pred_frames
        with pytest.raises(ValueError):
            dsir_bucket_weights(raw, tgt, num_buckets=B, target_filter=pred)
        with pytest.raises(ValueError):
            dsir_bucket_weights(raw, None, num_buckets=B)
