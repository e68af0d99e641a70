"""Distributed unigram-LM tokenizer training (Kudo 2018 — the
SentencePiece "unigram" model), the probabilistic companion to the BPE
trainer in ``operators/bpe.py``.

No reference equivalent (extension surface). The model: a vocabulary of
pieces with probabilities; a word's tokenization is the piece sequence
maximizing Σ log p(piece) (Viterbi DP). Training alternates EM over the
corpus with vocabulary pruning. Like BPE, the state that iterates is the
WORD HISTOGRAM, not the corpus:

1. one corpus pass builds ``(word, freq)`` — the only corpus-sized
   shuffle (map-side combined, Heaps' law bounds the output);
2. the seed vocabulary is every substring of every distinct word up to
   ``max_piece_len`` — a JVM substring-explode over the word histogram,
   top-``seed_size`` by weighted frequency (single characters always
   kept for coverage);
3. each EM round Viterbi-segments the distinct words under the current
   piece log-probs inside ONE Arrow-batched pandas UDF (the vocabulary
   rides the closure — ship-small-metadata, like k-means centroids),
   aggregates freq-weighted piece usages (vocab-sized shuffle), and
   re-estimates probabilities on the driver (vocab-sized collect, the
   same metadata-collect pattern as the BPE arg-max);
4. pruning between rounds drops the lowest-usage pieces on a geometric
   schedule until ``vocab_size`` remains (Viterbi-EM with usage-count
   pruning is the standard hard-EM approximation of SentencePiece's
   forward-backward + likelihood-loss pruning; the E-step here is exact
   Viterbi, deterministic by construction — see ``_viterbi``).

At 100 TB the corpus pass dominates and everything after runs on the
histogram; per-round cost is (histogram rows × piece lookups), and the
driver only ever holds the vocabulary. Tokenization (``unigram_tokenize``)
is one Arrow-batched UDF with per-batch word memoization — constant
Catalyst expression depth at any vocabulary size (the hazard the BPE
column-fold form has at 1k+ merges).

Determinism: ties in the Viterbi DP resolve to the LONGEST last piece
(strict ``>`` over candidates scanned longest-first); seed truncation and
pruning order by (usage desc, piece asc). The trained vocabulary is
therefore identical on any partitioning — pinned in tests against an
independent pure-Python reference implementation.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.bpe import _JAVA_WS, bpe_word_counts


def _viterbi(
    word: str, logp: dict[str, float], max_len: int
) -> list[str] | None:
    """Best segmentation of ``word`` into vocabulary pieces, or None if
    some prefix can't be covered. DP over end positions; candidates for
    each end are scanned LONGEST piece first with strict ``>``, so ties
    deterministically keep the longest last piece."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for end in range(1, n + 1):
        for start in range(max(0, end - max_len), end):
            lp = logp.get(word[start:end])
            if lp is None or best[start] == -math.inf:
                continue
            cand = best[start] + lp
            if cand > best[end]:
                best[end] = cand
                back[end] = start
    if best[n] == -math.inf:
        return None
    pieces: list[str] = []
    end = n
    while end > 0:
        start = back[end]
        pieces.append(word[start:end])
        end = start
    pieces.reverse()
    return pieces


def _segment_word(
    word: str, logp: dict[str, float], max_len: int
) -> list[str]:
    """Viterbi with single-character fallback: characters outside the
    vocabulary become their own pieces (the <unk>-free byte-fallback
    convention), so every word always segments."""
    out = _viterbi(word, logp, max_len)
    if out is not None:
        return out
    # split at characters outside the vocabulary's ALPHABET (a char only
    # covered by a multi-char piece still belongs to a coverable span),
    # Viterbi each span; a span that still can't cover falls to chars
    alphabet = {ch for p in logp for ch in p}
    pieces: list[str] = []
    span = ""
    for ch in word:
        if ch in alphabet:
            span += ch
        else:
            if span:
                pieces.extend(_viterbi(span, logp, max_len) or list(span))
                span = ""
            pieces.append(ch)
    if span:
        pieces.extend(_viterbi(span, logp, max_len) or list(span))
    return pieces


def unigram_seed_vocab(
    words: DataFrame,
    max_piece_len: int = 4,
    seed_size: int = 2000,
) -> DataFrame:
    """Candidate pieces from the ``(word, freq)`` histogram: every
    substring of length 1..``max_piece_len`` of every word, usage =
    freq-weighted occurrence count. JVM substring-explode (no Python),
    truncated to the top ``seed_size`` by (usage desc, piece asc) —
    single characters are ALWAYS kept (coverage). Returns
    ``(piece, usage)``."""
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length(w) - i + 1),
                ),
                lambda ln: F.substring(w, i, ln),
            ),
        )
    )
    usage = (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("usage"))
    )
    chars = usage.filter(F.length("piece") == 1)
    top = (
        usage.filter(F.length("piece") > 1)
        .orderBy(F.col("usage").desc(), F.col("piece").asc())
        .limit(max(0, seed_size))
    )
    return chars.unionByName(top)


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 500,
    n_iters: int = 3,
    max_piece_len: int = 4,
    seed_size: int = 2000,
    shrink: float = 0.75,
) -> list[tuple[str, float, int]]:
    """Train the unigram LM vocabulary; returns
    ``[(piece, logprob, usage), …]`` ordered (usage desc, piece asc).

    Each of the ``n_iters`` EM rounds: Viterbi-segment the word
    histogram under current log-probs (Arrow-batched UDF, vocabulary in
    the closure), sum freq-weighted piece usages (vocab-sized shuffle +
    vocab-sized driver collect), re-estimate ``p = usage/total``, then
    prune to ``max(vocab_size, ceil(current*shrink))`` pieces by
    (usage desc, piece asc) — single characters never pruned."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size!r}")
    if not (0.0 < shrink <= 1.0):
        raise ValueError(f"shrink must be in (0, 1], got {shrink!r}")
    words = bpe_word_counts(df, text_col).localCheckpoint(eager=False)
    seed = unigram_seed_vocab(words, max_piece_len, seed_size).collect()
    usage = {r["piece"]: int(r["usage"]) for r in seed}

    def logprobs(u: dict[str, int]) -> dict[str, float]:
        total = float(sum(u.values())) or 1.0
        return {p: math.log(c / total) for p, c in u.items() if c > 0}

    for _ in range(max(1, n_iters)):
        lp = logprobs(usage)
        known = set(usage)

        def _estep(it):
            counts: dict[str, int] = {}
            for pdf in it:
                for word, freq in zip(pdf["word"], pdf["freq"]):
                    seg = _viterbi(word, lp, max_piece_len) or list(word)
                    for piece in seg:
                        counts[piece] = counts.get(piece, 0) + int(freq)
            yield pd.DataFrame(
                {"piece": list(counts), "usage": list(counts.values())}
            )

        used = (
            words.mapInPandas(_estep, schema="piece string, usage long")
            .groupBy("piece")
            .agg(F.sum("usage").cast("bigint").alias("usage"))
            .collect()
        )
        usage = {
            r["piece"]: int(r["usage"]) for r in used if r["piece"] in known
        }
        # prune: geometric schedule toward vocab_size, chars immortal
        multi = sorted(
            ((p, c) for p, c in usage.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        n_chars = len(usage) - len(multi)
        keep = max(vocab_size, math.ceil(len(usage) * shrink)) - n_chars
        usage = {p: c for p, c in usage.items() if len(p) == 1} | dict(
            multi[: max(0, keep)]
        )
    lp = logprobs(usage)
    return sorted(
        ((p, lp[p], c) for p, c in usage.items() if c > 0),
        key=lambda t: (-t[2], t[0]),
    )


def unigram_tokenize(
    df: DataFrame,
    vocab: list[tuple[str, float, int]] | dict[str, float],
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Viterbi-segment ``text_col`` under a trained vocabulary: one
    Arrow-batched pandas UDF, vocabulary in the closure, per-batch
    word→pieces memoization (Zipf makes unique words per batch small).
    Unknown characters fall back to single-char pieces. Constant
    expression depth at any vocabulary size."""
    logp = (
        dict(vocab)
        if isinstance(vocab, dict)
        else {p: lp for p, lp, _ in vocab}
    )
    if not logp:
        raise ValueError("vocab must be non-empty")
    max_len = max(len(p) for p in logp)

    @F.pandas_udf("array<string>")
    def _seg(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            pieces: list[str] = []
            for w in _JAVA_WS.split((t or "").lower()):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _segment_word(w, logp, max_len)
                pieces.extend(got)
            out.append(pieces)
        return pd.Series(out)

    return df.withColumn(out_col, _seg(F.col(text_col)))
