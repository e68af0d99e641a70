"""BPE trainer pinned against an independent pure-Python reference
implementation of the Sennrich algorithm (same lowercasing, EOW marker,
greedy non-overlapping replace, and count-desc/pair-asc tie-break)."""

from __future__ import annotations

from collections import Counter

import pytest

from etl_tools_rs_spark.operators import bpe


def _ref_bpe(texts: list[str], num_merges: int):
    """Reference implementation — deliberately written with plain dicts,
    no shared code with the operator."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + [bpe.EOW])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        (l, r), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, n))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


class TestBpeTrain:
    def test_matches_reference_merges(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
        got = bpe.bpe_train(df, "text", num_merges=8)
        want, _ = _ref_bpe(CORPUS, 8)
        assert got == want

    def test_merge_fold_greedy_nonoverlapping(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(["a", "a", "a"],)], ["syms"])
        out = df.select(
            bpe._merge_fold(F.col("syms"), "a", "a").alias("m")
        ).first()["m"]
        assert out == ["aa", "a"]

    def test_tokenize_roundtrip_consistent_with_reference(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
        merges = bpe.bpe_train(df, "text", num_merges=6)
        toks = bpe.bpe_tokenize(df, merges, "text").select("bpe_tokens").collect()
        # reference segmentation of 'low': apply same merges
        _, ref_vocab = _ref_bpe(CORPUS, 6)
        ref_words = {"".join(s).replace(bpe.EOW, ""): list(s) for s in ref_vocab}
        for row, text in zip(toks, CORPUS):
            expect = [sym for w in text.lower().split() for sym in ref_words[w]]
            assert row["bpe_tokens"] == expect

    def test_single_char_words_no_crash(self, spark):
        df = spark.createDataFrame([("a b a b",)], ["text"])
        got = bpe.bpe_train(df, "text", num_merges=3)
        want, _ = _ref_bpe(["a b a b"], 3)
        assert got == want

    def test_num_merges_validation(self, spark):
        df = spark.createDataFrame([("x",)], ["text"])
        with pytest.raises(ValueError):
            bpe.bpe_train(df, num_merges=0)
