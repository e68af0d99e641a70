"""Distributed WordPiece tokenizer training (Schuster & Nakajima 2012,
the BERT-family tokenizer — likelihood-scored merges + greedy
longest-match segmentation).

No reference equivalent (extension surface, the third tokenizer family
next to bpe.py and unigram.py). Same distributed skeleton as BPE — the
iterating state is the WORD VOCABULARY, never the corpus — but the merge
rule is argmax of the unigram-LM likelihood gain
``score(a,b) = n_ab / (n_a * n_b)`` instead of raw pair frequency, and
pieces carry the ``##`` continuation marker instead of an EOW sentinel.

Per round (all vocab-frame-sized jobs after the one corpus pass):
1. adjacent-pair counts ``n_ab`` — explode + map-side-combined sum;
2. symbol counts ``n_s`` — explode + sum (the score denominators);
3. join pairs to both symbol counts, float score prunes to the
   float-max tie class (>= max * (1 - 1e-9) — a provable superset of
   the exact-score argmax, since doubles order counts < 2^53 within
   1e-15 relative; fetched with max + guard as ONE TakeOrdered job per
   round, r8), and the DRIVER picks the winner by the EXACT
   integer quotient ``q = n_ab * 10^24 // (n_a * n_b)`` with
   (q DESC, l ASC, r ASC) tie-break — unbounded Python ints here,
   HUGEINT in the DuckDB oracle replay, so training is deterministic
   on any partitioning and value-replayable at any sf;
4. a JVM aggregate fold rewrites every word greedily left-to-right
   (``##`` stripped from the right piece on concat); lazy
   localCheckpoint keeps plan depth constant.

At 100 TB: pass 1 is the only corpus shuffle; every round is bounded by
the distinct-word vocabulary (Heaps-law sized). The reported
``score_q6 = n_ab * 10^6 // (n_a * n_b)`` stays BIGINT-exact up to
~10^12 pair occurrences — beyond that, report from the driver's
unbounded q instead.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.bpe import _JAVA_WS, bpe_word_counts

CONT = "##"
UNK = "[UNK]"
_Q_SCALE = 10**24  # exact-selection quotient scale (HUGEINT-safe in DuckDB)


def _wp_syms(word: Column) -> Column:
    """word → [c0, ##c1, ##c2, …] — first char plain, continuations
    marked."""
    chars = F.filter(F.split(word, ""), lambda ch: ch != "")
    n = F.size(chars)
    head = F.slice(chars, 1, 1)
    return F.when(
        n >= 2,
        F.concat(
            head,
            F.transform(
                F.slice(chars, 2, n - 1),
                lambda ch: F.concat(F.lit(CONT), ch),
            ),
        ),
    ).otherwise(head)


def _wp_merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right replacement of adjacent (left, right) with
    the WordPiece concatenation (right's ``##`` stripped) — same
    non-overlapping semantics as bpe.py::_merge_fold."""
    merged = F.lit(left + right[len(CONT):] if right.startswith(CONT) else left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _wp_initial_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """The one corpus-sized pass: word histogram → initial symbol
    arrays, lazily checkpointed so training rounds (and the alphabet
    derivation in :func:`wordpiece_vocab`) all reuse one
    materialization."""
    return bpe_word_counts(df, text_col).select(
        _wp_syms(F.col("word")).alias("syms"), "freq"
    ).localCheckpoint(eager=False)


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    _vocab: DataFrame | None = None,
) -> list[tuple[str, str, int, int]]:
    """Learn ``num_merges`` WordPiece merge rules; returns
    ``[(left, right, pair_freq, score_q6), …]`` in merge order, where
    ``score_q6 = pair_freq * 10^6 // (freq_left * freq_right)`` is the
    exact integer-floored likelihood-gain score."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges!r}")
    vocab = _vocab if _vocab is not None else _wp_initial_vocab(df, text_col)
    merges: list[tuple[str, str, int, int]] = []
    for _ in range(num_merges):
        n = F.size(F.col("syms"))
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.when(
                        n >= 2,
                        F.zip_with(
                            F.slice(F.col("syms"), 1, n - 1),
                            F.slice(F.col("syms"), 2, n - 1),
                            lambda l, r: F.struct(l.alias("l"), r.alias("r")),
                        ),
                    ).otherwise(
                        F.array().cast("array<struct<l:string,r:string>>")
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n_ab"))
        )
        syms = (
            vocab.select("freq", F.explode("syms").alias("s"))
            .groupBy("s")
            .agg(F.sum("freq").alias("n_s"))
        )
        scored = (
            pairs.join(syms.select(F.col("s").alias("l"), F.col("n_s").alias("n_l")), "l")
            .join(syms.select(F.col("s").alias("r"), F.col("n_s").alias("n_r")), "r")
            .withColumn(
                "score_f",
                F.col("n_ab").cast("double")
                / (F.col("n_l").cast("double") * F.col("n_r").cast("double")),
            )
        )
        # ONE action per round (r8; was a max() job + a tie-class collect
        # + a guard count): in (score_f DESC, l, r) order the first row
        # IS the float max and the float-max tie class is a prefix, so a
        # single TakeOrdered collect yields max, tie class, and the cap
        # guard together. Start small (the tie class is almost always a
        # handful of score collisions) and escalate once if the prefix
        # might be cut.
        tie: list = []
        lim = 1024
        while True:
            cand = (
                scored.orderBy(F.col("score_f").desc(), "l", "r")
                .limit(lim)
                .collect()
            )
            if not cand:
                break
            mx = cand[0].score_f
            tie = [row for row in cand if row.score_f >= mx * (1 - 1e-9)]
            if len(tie) < len(cand) or len(cand) < lim:
                break  # the tie class ended inside the collected prefix
            if lim >= 100_000:
                # a >100k tie class could hide the true exact-quotient
                # argmax past the cut — refuse rather than silently
                # break determinism
                raise RuntimeError(
                    "wordpiece_train: float-max tie class exceeds the "
                    "100k collect guard; raise the cap or tighten the "
                    "tolerance"
                )
            lim = 100_000
        if not tie:
            break
        best = min(
            tie,
            key=lambda row: (
                -(row.n_ab * _Q_SCALE // (row.n_l * row.n_r)),
                row.l,
                row.r,
            ),
        )
        q6 = best.n_ab * 10**6 // (best.n_l * best.n_r)
        merges.append((best.l, best.r, int(best.n_ab), int(q6)))
        vocab = vocab.select(
            _wp_merge_fold(F.col("syms"), best.l, best.r).alias("syms"), "freq"
        ).localCheckpoint(eager=False)
    return merges


def wordpiece_vocab(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
) -> tuple[set[str], list[tuple[str, str, int, int]]]:
    """Vocabulary = initial alphabet pieces (plain first chars +
    ``##``-continuations) + each merge's produced piece.

    r8: the alphabet derives from the SAME checkpointed initial vocab
    frame training starts from (vocab-sized explode) instead of a
    second full corpus tokenization — one corpus pass total."""
    v0 = _wp_initial_vocab(df, text_col)
    merges = wordpiece_train(df, text_col, num_merges, _vocab=v0)
    alpha = (
        v0.select(F.explode("syms").alias("s")).distinct().collect()
    )
    vocab = {r.s for r in alpha}
    for l, r, _, _ in merges:
        vocab.add(l + (r[len(CONT):] if r.startswith(CONT) else r))
    return vocab, merges


def wordpiece_tokenize(
    df: DataFrame,
    vocab: set[str] | list[str],
    text_col: str = "text",
    out_col: str = "wp_tokens",
) -> DataFrame:
    """Greedy longest-match-first WordPiece segmentation (the BERT
    ``WordpieceTokenizer`` algorithm): per word, take the longest vocab
    piece prefixing the remainder (``##``-prefixed after the first
    piece); any position with no match makes the whole word ``[UNK]``.

    Arrow-batched pandas UDF with the vocabulary in the closure (the
    same deployment shape as bpe_tokenize_pandas / unigram_tokenize):
    constant plan depth at any vocab size, per-batch word memoization,
    text never shuffles."""
    vocab_set = set(vocab)

    def word_pieces(w: str) -> list[str]:
        pieces: list[str] = []
        i, n = 0, len(w)
        while i < n:
            j = n
            cur = None
            while j > i:
                sub = w[i:j]
                if i > 0:
                    sub = CONT + sub
                if sub in vocab_set:
                    cur = sub
                    break
                j -= 1
            if cur is None:
                return [UNK]
            pieces.append(cur)
            i = j
        return pieces

    @F.pandas_udf("array<string>")
    def _segment(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def doc(t: str) -> list[str]:
            out: list[str] = []
            # _JAVA_WS, not str.split(): Python splits on Unicode
            # whitespace (U+00A0, U+2028, ...) which would diverge
            # from the JVM tokens() stream the vocabulary was trained on
            for w in _JAVA_WS.split((t or "").lower()):
                if not w:
                    continue
                if w not in memo:
                    memo[w] = word_pieces(w)
                out.extend(memo[w])
            return out

        return texts.map(doc)

    return df.withColumn(out_col, _segment(F.col(text_col)))
