"""Round-4 extension operators: bigram LM scoring, C4 line filtering,
reciprocal-rank fusion, skew reporting, interval-overlap join, pHash."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators import lm
from etl_tools_rs_spark.operators.index import rrf_fuse
from etl_tools_rs_spark.operators.join import overlap_join
from etl_tools_rs_spark.operators.profile import skew_report
from etl_tools_rs_spark.operators.text import c4_line_filter


# ---------------------------------------------------------------- bigram LM
def _py_bigram_nll(train: list[str], doc: str, alpha: float = 0.5) -> tuple[int, float]:
    """Pure-Python reference for bigram_score's exact semantics (same
    tokenization, smoothing, 6-dp per-token rounding, 4-dp final)."""
    tok = lambda s: re.findall("[a-z0-9]+", s.lower())  # noqa: E731
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for t in train:
        ts = tok(t)
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n, v = sum(uni.values()), len(uni)
    ts = tok(doc)
    lps = [round(math.log((uni.get(ts[0], 0) + alpha) / (n + alpha * v)), 6)]
    for a, b in zip(ts, ts[1:]):
        lps.append(
            round(
                math.log(
                    (bi.get((a, b), 0) + alpha) / (uni.get(a, 0) + alpha * v)
                ),
                6,
            )
        )
    return len(ts), round(-sum(lps) / len(ts), 4)


def test_bigram_score_matches_python_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ate the fish",
        "a dog sat on a log",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    model = lm.bigram_fit(docs)
    got = {
        r.doc_id: (r.n_tokens, r.avg_nll)
        for r in lm.bigram_score(docs, model).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_bigram_nll(texts, t), f"doc {i}"


def test_bigram_prefers_seen_transitions(spark):
    # train heavily on one phrase; the phrase must score lower NLL than
    # the same words in reversed (unseen-transition) order
    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(20)],
        "doc_id long, text string",
    )
    model = lm.bigram_fit(train)
    probe = spark.createDataFrame(
        [(0, "the quick brown fox jumps"), (1, "jumps fox brown quick the")],
        "doc_id long, text string",
    )
    nll = {r.doc_id: r.avg_nll for r in lm.bigram_score(probe, model).collect()}
    assert nll[0] < nll[1]


def test_bigram_single_and_zero_token_docs(spark):
    train = spark.createDataFrame(
        [(0, "alpha beta gamma")], "doc_id long, text string"
    )
    model = lm.bigram_fit(train)
    probe = spark.createDataFrame(
        [(1, "alpha"), (2, "???"), (3, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in lm.bigram_score(probe, model).collect()}
    assert set(rows) == {1}  # no-token docs yield no row
    assert rows[1].n_tokens == 1  # scored by the unigram marginal alone


# ------------------------------------------------------------ C4 line filter
def test_c4_line_filter_arms(spark):
    doc = "\n".join(
        [
            "This line has plenty of words and ends well.",  # kept
            "Too short.",  # < min words
            "javascript must be enabled to view this page today.",  # phrase
            "No terminal punctuation but otherwise a fine line here",  # punct
            "Another good line with enough words to survive, yes.",  # kept
        ]
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = c4_line_filter(df, min_words_per_line=5).collect()[0]
    assert (r.n_lines, r.n_kept_lines, r.keep) == (5, 2, True)
    assert r.clean_text.split("\n") == [
        "This line has plenty of words and ends well.",
        "Another good line with enough words to survive, yes.",
    ]


def test_c4_line_filter_empty_and_thresholds(spark):
    df = spark.createDataFrame(
        [(1, "nothing survives here"), (2, "Good line one two three four.")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in c4_line_filter(df, min_words_per_line=5, min_kept_lines=1)
        .collect()
    }
    assert out[1].n_kept_lines == 0
    assert out[1].clean_text == ""  # empty, never NULL (oracle contract)
    assert out[1].keep is False
    assert out[2].keep is True


def test_c4_no_terminal_punct_requirement(spark):
    df = spark.createDataFrame(
        [(1, "five words but no punctuation")], "doc_id long, text string"
    )
    strict = c4_line_filter(df, min_words_per_line=5).collect()[0]
    lax = c4_line_filter(
        df, min_words_per_line=5, require_terminal_punct=False
    ).collect()[0]
    assert strict.n_kept_lines == 0
    assert lax.n_kept_lines == 1


# ------------------------------------------------------------------ RRF fuse
def test_rrf_fuse_hand_computed(spark):
    ra = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
    )
    rb = spark.createDataFrame([(11, 1), (13, 2)], "doc_id long, rank long")
    got = {
        r.doc_id: (r.n_lists, r.rrf_score)
        for r in rrf_fuse([ra, rb], k=60).collect()
    }
    c = lambda r: math.floor(1e6 / (60 + r)) / 1e6  # noqa: E731
    assert got[10] == (1, c(1))
    assert got[11] == (2, round(c(2) + c(1), 6))
    assert got[12] == (1, c(3))
    assert got[13] == (1, c(2))


def test_rrf_fuse_grouped_and_validates(spark):
    ra = spark.createDataFrame(
        [("q1", 1, 1), ("q2", 1, 1)], "qid string, doc_id long, rank long"
    )
    rb = spark.createDataFrame(
        [("q1", 1, 2)], "qid string, doc_id long, rank long"
    )
    got = {
        (r.qid, r.doc_id): r.n_lists
        for r in rrf_fuse([ra, rb], by=("qid",)).collect()
    }
    # same doc under different query keys stays separate
    assert got[("q1", 1)] == 2
    assert got[("q2", 1)] == 1
    with pytest.raises(ValueError):
        rrf_fuse([])


# --------------------------------------------------------------- skew report
def test_skew_report_counts_and_shares(spark):
    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, ["k"], top=2).collect()
    assert [(r.k, r.cnt, r.share) for r in got] == [
        ("hot", 6, 0.6),
        ("warm", 3, 0.3),
    ]


def test_skew_report_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",)], "k string"
    )
    got = [r.k for r in skew_report(df, ["k"], top=2).collect()]
    assert got == ["a", "b"]  # equal counts -> key ascending


# ------------------------------------------------------------- overlap join
def _naive_overlap(left, right):
    out = set()
    for lk, cust, ls, le in left:
        for rk, rcust, rs, re_ in right:
            if cust == rcust and ls < re_ and rs < le:
                out.add((lk, rk))
    return out


def test_overlap_join_matches_naive(spark):
    left = [(i, i % 3, float(i * 2), float(i * 2 + 5)) for i in range(30)]
    right = [(100 + i, i % 3, float(i * 3 + 1), float(i * 3 + 4)) for i in range(30)]
    ldf = spark.createDataFrame(
        left, "l_key long, l_cust long, l_start double, l_end double"
    )
    rdf = spark.createDataFrame(
        right, "r_key long, r_cust long, r_start double, r_end double"
    )
    for width in (1, 3, 10, 100):  # pair set must be width-invariant
        got = {
            (r.l_key, r.r_key)
            for r in overlap_join(
                ldf, rdf, "l_start", "l_end", "r_start", "r_end",
                bucket_width=width, by="l_cust", right_by="r_cust",
            ).collect()
        }
        assert got == _naive_overlap(left, right), f"width={width}"


def test_overlap_join_multibucket_pair_counted_once(spark):
    # both intervals span many buckets -> share many buckets; the
    # first-shared-bucket filter must keep exactly ONE copy
    ldf = spark.createDataFrame(
        [(1, 0.0, 100.0)], "l_key long, l_start double, l_end double"
    )
    rdf = spark.createDataFrame(
        [(2, 5.0, 95.0)], "r_key long, r_start double, r_end double"
    )
    rows = overlap_join(
        ldf, rdf, "l_start", "l_end", "r_start", "r_end", bucket_width=10
    ).collect()
    assert len(rows) == 1


def test_overlap_join_boundary_touch_excluded(spark):
    ldf = spark.createDataFrame(
        [(1, 0.0, 10.0)], "l_key long, l_start double, l_end double"
    )
    rdf = spark.createDataFrame(
        [(2, 10.0, 20.0)], "r_key long, r_start double, r_end double"
    )
    assert (
        overlap_join(
            ldf, rdf, "l_start", "l_end", "r_start", "r_end", bucket_width=10
        ).count()
        == 0
    )


def test_overlap_join_timestamps(spark):
    ldf = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-10 00:00:00")],
        "l_key long, l_start string, l_end string",
    ).select(
        "l_key",
        F.col("l_start").cast("timestamp").alias("l_start"),
        F.col("l_end").cast("timestamp").alias("l_end"),
    )
    rdf = spark.createDataFrame(
        [
            (2, "2024-01-09 00:00:00", "2024-01-20 00:00:00"),
            (3, "2024-01-10 00:00:00", "2024-01-20 00:00:00"),
        ],
        "r_key long, r_start string, r_end string",
    ).select(
        "r_key",
        F.col("r_start").cast("timestamp").alias("r_start"),
        F.col("r_end").cast("timestamp").alias("r_end"),
    )
    got = [
        r.r_key
        for r in overlap_join(
            ldf, rdf, "l_start", "l_end", "r_start", "r_end",
            bucket_width=7 * 86400,
        ).collect()
    ]
    assert got == [2]  # key 3 touches at the boundary only


def test_overlap_join_rejects_bad_width(spark):
    ldf = spark.createDataFrame(
        [(1, 0.0, 1.0)], "l_key long, l_start double, l_end double"
    )
    with pytest.raises(ValueError):
        overlap_join(
            ldf, ldf.selectExpr("l_key r_key", "l_start r_start", "l_end r_end"),
            "l_start", "l_end", "r_start", "r_end", bucket_width=0,
        )


# --------------------------------------------------------------------- pHash
def _pack_bmp(pixel_rows):
    """Pack top-down (b,g,r) pixel rows into an uncompressed 24-bit BMP
    (same helper shape as tests/test_extensions.py)."""
    import struct

    h, w = len(pixel_rows), len(pixel_rows[0])
    stride = ((w * 3 + 3) // 4) * 4
    body = bytearray()
    for row in reversed(pixel_rows):
        for px in row:
            body += bytes(px)
        body += b"\x00" * (stride - w * 3)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return head + info + bytes(body)


class TestImagePhash:
    def _img(self, pattern=0, brightness=0):
        rows = []
        for r in range(16):
            row = []
            for c in range(16):
                if pattern == 0:
                    v = (r * 255) // 15  # vertical gradient
                elif pattern == 1:
                    v = (c * 255) // 15  # horizontal gradient
                else:
                    v = 255 if (r // 4 + c // 4) % 2 == 0 else 0
                v = min(255, v // 2 + brightness)
                row.append((v, v, v))
            rows.append(row)
        return _pack_bmp(rows)

    def test_deterministic_and_hex_width(self):
        from etl_tools_rs_spark.operators.multimodal import phash_bytes

        assert phash_bytes(self._img()) == phash_bytes(self._img())
        assert len(phash_bytes(self._img())) == 16

    def test_brightness_shift_exact_invariance(self):
        # a uniform brightness shift lands ENTIRELY in the (excluded) DC
        # coefficient; with quantized ACs the hash is bit-identical
        from etl_tools_rs_spark.operators.multimodal import phash_bytes

        base = phash_bytes(self._img(0, 0))
        for b in (20, 40, 60, 80):  # no saturation at these shifts
            assert phash_bytes(self._img(0, b)) == base

    def test_distinct_patterns_differ(self):
        from etl_tools_rs_spark.operators.multimodal import phash_bytes

        ham = lambda x, y: bin(int(x, 16) ^ int(y, 16)).count("1")  # noqa: E731
        assert ham(phash_bytes(self._img(0)), phash_bytes(self._img(1))) >= 6
        assert ham(phash_bytes(self._img(0)), phash_bytes(self._img(2))) >= 6
        assert ham(phash_bytes(self._img(1)), phash_bytes(self._img(2))) >= 6

    def test_pipeline_and_error_records(self, spark):
        from etl_tools_rs_spark.operators.multimodal import (
            ahash_near_dup,
            image_phash,
        )

        payloads = [
            (0, self._img(0, 0)),
            (1, self._img(0, 60)),  # brightness variant -> near dup of 0
            (2, self._img(1, 0)),
            (3, b"garbage not an image"),
        ]
        media = spark.createDataFrame(payloads, "media_id long, content binary")
        hashes = image_phash(media)
        by_id = {r.media_id: r for r in hashes.collect()}
        assert by_id[3].decode_ok.startswith("error:")
        assert by_id[3].phash is None
        pairs = {
            (r.id_a, r.id_b)
            for r in ahash_near_dup(
                hashes, max_hamming=4, hash_col="phash"
            ).collect()
        }
        assert (0, 1) in pairs
        assert (0, 2) not in pairs


# ------------------------------------------------------------ binary metrics
class TestBinaryMetrics:
    def _metrics(self, spark, rows, threshold=0.5):
        from etl_tools_rs_spark.operators.ml import binary_metrics

        df = spark.createDataFrame(rows, "y int, s double")
        return binary_metrics(
            df, F.col("y"), F.col("s"), threshold=threshold
        ).collect()[0]

    def test_hand_computed_confusion_and_auc(self, spark):
        # scores: pos at .9/.8/.4, neg at .7/.3/.1 -> pairs won: .9 and .8
        # beat all 3 negs (6), .4 beats .3/.1 (2) -> AUC = 8/9
        rows = [(1, 0.9), (1, 0.8), (1, 0.4), (0, 0.7), (0, 0.3), (0, 0.1)]
        m = self._metrics(spark, rows)
        assert (m.n, m.n_pos, m.n_neg) == (6, 3, 3)
        assert (m.tp, m.fp, m.tn, m.fn) == (2, 1, 2, 1)
        assert m.prec == math.floor(1e6 * (2 / 3)) / 1e6
        assert m.rec == math.floor(1e6 * (2 / 3)) / 1e6
        assert m.auc == math.floor(1e6 * (8 / 9)) / 1e6

    def test_tied_scores_average_rank(self, spark):
        # one pos and one neg share score 0.5 -> that pair counts 1/2:
        # AUC = (1*1 + 0.5) / (1*2)... pos=.5 beats neg=.1 (1), ties
        # with neg=.5 (0.5) -> AUC = 1.5/2
        rows = [(1, 0.5), (0, 0.5), (0, 0.1)]
        m = self._metrics(spark, rows)
        assert m.auc == math.floor(1e6 * (1.5 / 2)) / 1e6

    def test_perfect_and_inverted(self, spark):
        perfect = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
        assert self._metrics(spark, perfect).auc == 1.0
        inverted = [(0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)]
        assert self._metrics(spark, inverted).auc == 0.0

    def test_degenerate_single_class(self, spark):
        m = self._metrics(spark, [(1, 0.9), (1, 0.2)])
        assert m.auc is None  # no negatives -> undefined
        assert m.rec == 0.5  # one of two positives above threshold
        m2 = self._metrics(spark, [(0, 0.9), (0, 0.2)])
        assert m2.auc is None and m2.rec is None

    def test_no_predicted_positives(self, spark):
        m = self._metrics(spark, [(1, 0.1), (0, 0.2)], threshold=0.9)
        assert m.tp == 0 and m.fp == 0
        assert m.prec is None and m.f1 is None


# ------------------------------------------------- fuzzy LCP prefix stripping
class TestFuzzyCommonPrefix:
    def _pairs(self, spark, names, **kw):
        from etl_tools_rs_spark.operators.fuzzy import fuzzy_self_pairs

        df = spark.createDataFrame(
            list(enumerate(names)), "nid long, name string"
        )
        return {
            (r.id_a, r.id_b, r.distance)
            for r in fuzzy_self_pairs(df, "name", "nid", 2, **kw).collect()
        }

    def test_shared_prefix_corpus_exact(self, spark):
        # ID-like corpus: every string shares 'Customer#00000' — the
        # degenerate case the LCP strip exists for. Results must match
        # the brute-force distances exactly.
        names = [f"Customer#{i:09d}" for i in (1, 2, 11, 500, 501, 999999)]
        import itertools

        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(
                        dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                    )
            return dp[len(b)]

        want = {
            (i, j, lev(names[i], names[j]))
            for i, j in itertools.combinations(range(len(names)), 2)
            if lev(names[i], names[j]) <= 2
        }
        assert self._pairs(spark, names) == want
        assert len(want) >= 2  # the fixture is non-trivial

    def test_strip_matches_unstripped(self, spark):
        names = ["prefix_alpha", "prefix_alphb", "prefix_beta", "other"]
        from etl_tools_rs_spark.operators.fuzzy import fuzzy_join

        df = spark.createDataFrame(
            [(n,) for n in names], "a string"
        )
        df2 = spark.createDataFrame([(n,) for n in names], "b string")
        on = lambda strip: {  # noqa: E731
            (r.a, r.b, r.distance)
            for r in fuzzy_join(
                df, df2, "a", "b", 2, strip_common_prefix=strip
            ).collect()
        }
        assert on(True) == on(False)

    def test_no_common_prefix_noop(self, spark):
        names = ["apple", "apply", "zebra"]
        got = self._pairs(spark, names)
        assert got == {(0, 1, 1)}

    def test_all_identical_strings(self, spark):
        # full-length LCP -> empty suffixes route through the short
        # bucket; all pairs are genuine distance-0 duplicates
        got = self._pairs(spark, ["same", "same", "same"])
        assert got == {(0, 1, 0), (0, 2, 0), (1, 2, 0)}


# ---------------------------------------------------------------- MMR rerank
class TestMmrRerank:
    def _df(self, spark, rows, with_q=False):
        schema = "vec_id long, score double, embedding array<double>"
        if with_q:
            schema = "query_id long, " + schema
        return spark.createDataFrame(rows, schema)

    def test_diversity_beats_redundancy(self, spark):
        from etl_tools_rs_spark.operators.similarity import mmr_rerank

        rows = [
            (1, 0.99, [1.0, 0.0]),   # best relevance
            (2, 0.98, [1.0, 0.01]),  # near-duplicate of 1
            (3, 0.60, [0.0, 1.0]),   # orthogonal, lower relevance
        ]
        got = (
            mmr_rerank(self._df(spark, rows), k=3, lam=0.5)
            .orderBy("rank")
            .collect()
        )
        assert [r.vec_id for r in got] == [1, 3, 2]

    def test_lambda_one_is_pure_relevance(self, spark):
        from etl_tools_rs_spark.operators.similarity import mmr_rerank

        rows = [
            (1, 0.9, [1.0, 0.0]),
            (2, 0.8, [1.0, 0.0]),
            (3, 0.7, [0.0, 1.0]),
        ]
        got = (
            mmr_rerank(self._df(spark, rows), k=3, lam=1.0)
            .orderBy("rank")
            .collect()
        )
        assert [r.vec_id for r in got] == [1, 2, 3]

    def test_matches_python_reference(self, spark):
        import math

        from etl_tools_rs_spark.operators.similarity import mmr_rerank

        rows = [
            (i, ((i * 37) % 11) / 11.0, [((i * 13) % 7) / 7.0, ((i * 5) % 3) / 3.0, 1.0])
            for i in range(12)
        ]

        def py_mmr(rows, k, lam, p=1e6):
            rows = sorted(rows)
            unit = []
            for _, _, v in rows:
                n = math.sqrt(sum(x * x for x in v)) or 1.0
                unit.append([x / n for x in v])
            rel = [math.floor(p * s) / p for _, s, _ in rows]
            picked, max_sim, out = [], [0.0] * len(rows), []
            avail = set(range(len(rows)))
            for rank in range(1, k + 1):
                best = min(
                    (
                        (-(math.floor(p * (lam * rel[i] - (1 - lam) * (max_sim[i] if picked else 0.0))) / p), rows[i][0], i)
                        for i in avail
                    )
                )
                i = best[2]
                out.append((rank, rows[i][0], -best[0]))
                avail.discard(i)
                picked.append(i)
                for j in range(len(rows)):
                    s = math.floor(p * sum(a * b for a, b in zip(unit[j], unit[i]))) / p
                    max_sim[j] = max(max_sim[j], s)
            return out

        got = [
            (r.rank, r.vec_id, r.mmr_score)
            for r in mmr_rerank(self._df(spark, rows), k=6, lam=0.7)
            .orderBy("rank")
            .collect()
        ]
        assert got == py_mmr(rows, 6, 0.7)

    def test_grouped_and_small_pool(self, spark):
        from etl_tools_rs_spark.operators.similarity import mmr_rerank

        rows = [
            (1, 10, 0.9, [1.0, 0.0]),
            (1, 11, 0.8, [0.0, 1.0]),
            (2, 20, 0.7, [1.0, 1.0]),
        ]
        got = mmr_rerank(
            self._df(spark, rows, with_q=True),
            k=5,
            by=("query_id",),
        ).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append(r.vec_id)
        assert sorted(by_q[1]) == [10, 11]
        assert by_q[2] == [20]  # pool smaller than k

    def test_validation(self, spark):
        import pytest as _pytest

        from etl_tools_rs_spark.operators.similarity import mmr_rerank

        df = self._df(spark, [(1, 0.5, [1.0])])
        with _pytest.raises(ValueError):
            mmr_rerank(df, k=0)
        with _pytest.raises(ValueError):
            mmr_rerank(df, lam=1.5)
