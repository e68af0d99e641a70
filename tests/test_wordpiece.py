"""WordPiece training + segmentation pinned against an independent
pure-Python reference (the same strategy as test_bpe.py / test_unigram.py
— the oracle gate replays training in SQL; these tests pin the engine
against a second independent implementation and the edge cases)."""

from __future__ import annotations

from collections import Counter

from etl_tools_rs_spark.operators.wordpiece import (
    CONT,
    UNK,
    wordpiece_tokenize,
    wordpiece_train,
    wordpiece_vocab,
)

_Q = 10**24


def py_wordpiece_train(docs, num_merges):
    """Independent reference: exact integer likelihood-gain argmax with
    (q DESC, l, r) tie-break, greedy left-to-right non-overlapping merge
    application."""
    words = Counter()
    for t in docs:
        for w in t.lower().split():
            words[w] += 1
    vocab = Counter()
    for w, f in words.items():
        vocab[tuple([w[0]] + [CONT + c for c in w[1:]])] += f
    merges = []
    for _ in range(num_merges):
        pair_counts, sym_counts = Counter(), Counter()
        for syms, f in vocab.items():
            for s in syms:
                sym_counts[s] += f
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        l, r = min(
            pair_counts,
            key=lambda p: (
                -(pair_counts[p] * _Q // (sym_counts[p[0]] * sym_counts[p[1]])),
                p[0],
                p[1],
            ),
        )
        n_ab = pair_counts[(l, r)]
        q6 = n_ab * 10**6 // (sym_counts[l] * sym_counts[r])
        merges.append((l, r, n_ab, q6))
        merged = l + r[len(CONT):]
        nxt = Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] += f
        vocab = nxt
    return merges


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest",
    "low new wide slow slower",
]


def test_train_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = wordpiece_train(df, "text", num_merges=6)
    assert got == py_wordpiece_train(CORPUS, 6)


def test_train_is_partitioning_invariant(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    a = wordpiece_train(df.repartition(7), "text", num_merges=4)
    b = wordpiece_train(df.coalesce(1), "text", num_merges=4)
    assert a == b


def test_merged_pieces_strip_continuation_marker(spark):
    df = spark.createDataFrame([("aaa aaa aa",)], ["text"])
    merges = wordpiece_train(df, "text", num_merges=2)
    for l, r, _, _ in merges:
        assert r.startswith(CONT)
        # the produced piece never carries an interior '##'
        produced = l + r[len(CONT):]
        assert CONT not in produced[1:] or produced.startswith(CONT)


def test_tokenize_greedy_longest_match(spark):
    vocab = {"un", "##aff", "##able", "##a", "u", "##n", "hat"}
    df = spark.createDataFrame(
        [(1, "unaffable"), (2, "hat"), (3, "unzzz")], ["i", "text"]
    )
    out = {
        r.i: r.wp_tokens
        for r in wordpiece_tokenize(df, vocab, "text").collect()
    }
    assert out[1] == ["un", "##aff", "##able"]
    assert out[2] == ["hat"]
    assert out[3] == [UNK]  # 'zzz' tail has no continuation piece


def test_tokenize_roundtrip_on_training_corpus(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    vocab, _ = wordpiece_vocab(df, "text", num_merges=6)
    seg = wordpiece_tokenize(df, vocab, "text").collect()
    for row in seg:
        toks = row.text.lower().split()
        # concatenating pieces (## stripped) must reproduce the words
        rebuilt, cur = [], ""
        for p in row.wp_tokens:
            assert p != UNK  # training corpus is always segmentable
            if p.startswith(CONT):
                cur += p[len(CONT):]
            else:
                if cur:
                    rebuilt.append(cur)
                cur = p
        if cur:
            rebuilt.append(cur)
        assert rebuilt == toks


def test_train_validates_args(spark):
    import pytest

    df = spark.createDataFrame([("x",)], ["text"])
    with pytest.raises(ValueError):
        wordpiece_train(df, "text", num_merges=0)


def test_tokenize_java_whitespace_parity(spark):
    """ADVICE r7: the segmenter's word splitter must use JVM \\s+
    semantics (_JAVA_WS), not Python str.split() — a NBSP-joined pair is
    ONE word to tokens()/the oracle and must stay one word here."""
    vocab = {"a", "b", "##b"}
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, " a  b ")],
        ["i", "text"],
    )
    out = {
        r.i: r.wp_tokens
        for r in wordpiece_tokenize(df, vocab, "text").collect()
    }
    # NBSP / LS are NOT Java \s: the pair is a single word; with no
    # multi-char pieces in vocab the greedy matcher emits a + ##b? no —
    # 'a b' needs a piece for ' ' which is absent -> [UNK]
    assert out[1] == [UNK]
    assert out[3] == [UNK]
    # real spaces (and leading/trailing runs) split exactly as tokens()
    assert out[2] == ["a", "b"]
    assert out[4] == ["a", "b"]
