"""Unigram-LM tokenizer trainer (operators/unigram.py): trained
vocabulary pinned against an independent pure-Python reference, Viterbi
determinism, fallback coverage, and tokenizer round-trip."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.unigram import (
    _segment_word,
    _viterbi,
    unigram_seed_vocab,
    unigram_tokenize,
    unigram_train,
)

WS = re.compile(r"[ \t\n\x0b\f\r]+")

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox",
    "lazy dogs sleep all day the lazy way",
    "quick thinking wins the day",
    "the the the brown dog sleeps",
    "foxes and dogs play all day",
]


# ---- independent reference implementation (same published algorithm,
# written against the documented spec, not the Spark code) ----------------


def ref_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in WS.split(t.lower()):
            if w:
                c[w] += 1
    return c


def ref_seed(words, max_len, seed_size):
    usage = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_len, len(w) - i) + 1):
                usage[w[i : i + ln]] += f
    chars = {p: c for p, c in usage.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in usage.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    return chars | dict(multi)


def ref_viterbi(word, logp, max_len):
    """Max score; among equal scores, the longest last piece wins."""
    n = len(word)
    best = {0: (0.0, 0)}
    for end in range(1, n + 1):
        cands = []
        for start in range(max(0, end - max_len), end):
            piece = word[start:end]
            if piece in logp and start in best:
                cands.append((best[start][0] + logp[piece], len(piece), start))
        if cands:
            score, _ln, start = max(cands, key=lambda c: (c[0], c[1]))
            best[end] = (score, start)
    if n not in best:
        return None
    pieces, end = [], n
    while end > 0:
        start = best[end][1]
        pieces.append(word[start:end])
        end = start
    return pieces[::-1]


def ref_train(texts, vocab_size, n_iters, max_len, seed_size, shrink=0.75):
    words = ref_word_counts(texts)
    usage = ref_seed(words, max_len, seed_size)
    for _ in range(n_iters):
        total = float(sum(usage.values()))
        logp = {p: math.log(c / total) for p, c in usage.items() if c > 0}
        known = set(usage)
        counts = Counter()
        for w, f in words.items():
            for piece in ref_viterbi(w, logp, max_len) or list(w):
                counts[piece] += f
        usage = {p: c for p, c in counts.items() if p in known}
        multi = sorted(
            ((p, c) for p, c in usage.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        n_chars = len(usage) - len(multi)
        keep = max(vocab_size, math.ceil(len(usage) * shrink)) - n_chars
        usage = {p: c for p, c in usage.items() if len(p) == 1} | dict(
            multi[: max(0, keep)]
        )
    total = float(sum(usage.values()))
    return {
        p: (math.log(c / total), c) for p, c in usage.items() if c > 0
    }


class TestViterbi:
    LOGP = {"a": -1.0, "b": -1.0, "ab": -1.5, "abc": -2.0, "c": -1.0}

    def test_prefers_high_probability_split(self):
        # "abc" as one piece: -2.0 beats ab+c (-2.5) and a+b+c (-3.0)
        assert _viterbi("abc", self.LOGP, 3) == ["abc"]

    def test_tie_keeps_longest_last_piece(self):
        logp = {"a": -1.0, "b": -1.0, "ab": -2.0}  # exact tie a+b vs ab
        assert _viterbi("ab", logp, 2) == ["ab"]

    def test_uncoverable_returns_none_and_fallback_covers(self):
        assert _viterbi("axb", self.LOGP, 3) is None
        assert _segment_word("axb", self.LOGP, 3) == ["a", "x", "b"]
        assert "".join(_segment_word("zzabcz", self.LOGP, 3)) == "zzabcz"


class TestTrainMatchesReference:
    @pytest.mark.parametrize("n_iters", [1, 2, 3])
    def test_vocab_and_logprobs_match(self, spark, n_iters):
        df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
        got = unigram_train(
            df,
            vocab_size=12,
            n_iters=n_iters,
            max_piece_len=3,
            seed_size=40,
        )
        want = ref_train(
            CORPUS, vocab_size=12, n_iters=n_iters, max_len=3, seed_size=40
        )
        got_map = {p: (lp, u) for p, lp, u in got}
        assert set(got_map) == set(want)
        for p, (lp, u) in want.items():
            assert got_map[p][1] == u, p
            assert got_map[p][0] == pytest.approx(lp, rel=1e-12)
        # output ordering is (usage desc, piece asc)
        order = [(-u, p) for p, _lp, u in got]
        assert order == sorted(order)

    def test_seed_keeps_all_chars(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
        from etl_tools_rs_spark.operators.bpe import bpe_word_counts

        seed = unigram_seed_vocab(
            bpe_word_counts(df), max_piece_len=3, seed_size=5
        ).collect()
        chars = {r["piece"] for r in seed if len(r["piece"]) == 1}
        all_chars = {c for t in CORPUS for c in t.lower() if not c.isspace()}
        assert chars == all_chars
        assert sum(1 for r in seed if len(r["piece"]) > 1) == 5


class TestTokenize:
    def test_round_trip_and_memoization(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
        vocab = unigram_train(
            df, vocab_size=12, n_iters=2, max_piece_len=3, seed_size=40
        )
        out = unigram_tokenize(df, vocab).collect()
        for r in out:
            assert "".join(r["pieces"]) == "".join(
                w for w in WS.split(r["text"].lower()) if w
            )

    def test_unknown_chars_become_single_pieces(self, spark):
        df = spark.createDataFrame([("héllo wörld",)], ["text"])
        vocab = {"h": -1.0, "llo": -1.0, "w": -1.0, "rld": -1.0}
        pieces = unigram_tokenize(df, vocab).first()["pieces"]
        assert pieces == ["h", "é", "llo", "w", "ö", "rld"]

    def test_rejects_empty_vocab(self, spark):
        df = spark.createDataFrame([("x",)], ["text"])
        with pytest.raises(ValueError):
            unigram_tokenize(df, {})
