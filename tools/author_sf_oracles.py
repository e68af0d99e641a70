"""Author the per-sf oracle artifacts for the six sf-scoped gate entries
(VERDICT r8 task #3): bpe/wordpiece/unigram tokenize word->pieces maps,
the unigram vocabulary literals, the PCA model literals, and the
xxhash64 minhash band fixture — re-derived at a NEW sf so the local gate
can value-check those entries there instead of recording
rows_only_out_of_scope.

Independence: every trainable artifact is computed by the PURE-PYTHON
reference implementations from tests/ (test_bpe._ref_bpe,
test_wordpiece.py_wordpiece_train, test_unigram.ref_train/ref_viterbi)
over the raw parquet read with DuckDB — no engine code in the loop — so
the gate still compares two independent derivations. The PCA model
replays pca_fit_exact's published law (floor-quantize 1e6 -> exact
integer moments -> eigh -> max-|x|-positive signs) in numpy over exact
Python ints. The one engine-authored artifact is the xxhash64 band
table (not SQL-computable by design); as at r7 authoring it is grounded
by cross-checking the xxhash64-family verified pairs against the
portable md5 family on the same corpus.

    python tools/author_sf_oracles.py /root/testdata/sf0.1

Writes etl_tools_rs_spark/oracle_fixtures_sf0_1.py (suffix derived from
the sf label). queries.py wires the artifacts in via qdef(oracle_by_sf).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SF_LABEL = os.path.basename(os.path.normpath(SF_DIR)).removeprefix("sf")
SUFFIX = "SF" + SF_LABEL.replace(".", "_")
OUT = os.path.join(
    _REPO, "etl_tools_rs_spark", f"oracle_fixtures_sf{SF_LABEL.replace('.', '_')}.py"
)


def corpus_words_and_texts():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    texts = [r[0] for r in rows]
    words = sorted(
        {w for t in texts for w in t.lower().split() if w}
    )
    return texts, words


def author_bpe(texts, words, num_merges=8):
    from test_bpe import _ref_merges, _ref_segment

    merges = _ref_merges(texts, num_merges)
    return {w: _ref_segment([w], merges)[0] for w in words}


def author_wordpiece(texts, words, num_merges=8):
    from etl_tools_rs_spark.operators.wordpiece import CONT, UNK
    from test_wordpiece import py_wordpiece_train

    merges = py_wordpiece_train(texts, num_merges)
    vocab = {w[0] for w in words} | {
        CONT + c for w in words for c in w[1:]
    }
    for l, r, _, _ in merges:
        vocab.add(l + (r[len(CONT):] if r.startswith(CONT) else r))

    def segment(w):  # BERT WordpieceTokenizer greedy longest-match
        pieces, i = [], 0
        while i < len(w):
            for j in range(len(w), i, -1):
                cand = (CONT if i else "") + w[i:j]
                if cand in vocab:
                    pieces.append(cand)
                    i = j
                    break
            else:
                return [UNK]
        return pieces

    return {w: segment(w) for w in words}


def author_unigram(texts, words, cfg):
    from test_unigram import ref_train, ref_viterbi

    trained = ref_train(
        texts,
        cfg["vocab_size"],
        cfg["n_iters"],
        cfg["max_piece_len"],
        cfg["seed_size"],
    )
    vocab = sorted(
        ((p, lp, c) for p, (lp, c) in trained.items()),
        key=lambda r: (-r[2], r[0]),
    )
    logp = {p: lp for p, lp, _ in vocab}
    pieces = {
        w: ref_viterbi(w, logp, cfg["max_piece_len"]) or list(w)
        for w in words
    }
    return vocab, pieces


def author_pca(k=4, input_scale=6):
    """numpy replay of pca_fit_exact's law over exact Python-int
    moments (no int64 overflow exposure regardless of corpus size)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    p = 10**input_scale
    Q = np.floor(p * X).astype(object)  # object -> exact python ints
    n = Q.shape[0]
    s = Q.sum(axis=0)
    G = (Q.T @ Q)
    mean = np.asarray([int(v) for v in s], dtype=np.float64) / (n * p)
    Gf = np.asarray([[int(v) for v in row] for row in G], dtype=np.float64)
    cov = Gf / (n * p * p) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return mean.tolist(), comps.tolist()


def author_minhash_bands():
    """Engine-authored (xxhash64 is not SQL-computable), md5-family
    cross-checked — the same grounding as the r7 sf0.01 authoring."""
    from pyspark.sql import functions as F

    from etl_tools_rs_spark.operators.dedup import (
        dedup_minhash_lsh,
        minhash_table,
    )
    from etl_tools_rs_spark.session import get_spark, load_tables

    NUM_HASHES, BANDS, SHINGLE_N, THRESHOLD = 16, 4, 3, 0.5
    rpb = NUM_HASHES // BANDS
    spark = get_spark("author-sf-oracles", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    fast = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup_minhash_lsh(
            docs, num_hashes=NUM_HASHES, bands=BANDS, shingle_n=SHINGLE_N,
            threshold=THRESHOLD, hash_family="xxhash64",
        ).collect()
    }
    slow = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup_minhash_lsh(
            docs, num_hashes=NUM_HASHES, bands=BANDS, shingle_n=SHINGLE_N,
            threshold=THRESHOLD, hash_family="md5",
        ).collect()
    }
    diff = fast ^ slow
    assert all(j >= THRESHOLD for (_, _, j) in diff), f"unverified pair in {diff}"
    assert len(diff) <= max(2, len(fast | slow) // 20), (
        f"families diverge too much at authoring: {len(diff)} of {len(fast | slow)}"
    )
    print(f"minhash family agreement: {len(fast & slow)} shared, {len(diff)} near-miss diffs")
    sig = minhash_table(docs, "text", "doc_id", NUM_HASHES, SHINGLE_N, "xxhash64")
    buckets = sig.select(
        "doc_id",
        *[
            F.xxhash64(*[F.col(f"_h{i}") for i in range(b * rpb, (b + 1) * rpb)])
            .alias(f"b{b}")
            for b in range(BANDS)
        ],
    ).orderBy("doc_id").collect()
    spark.stop()
    return [(r.doc_id, r.b0, r.b1, r.b2, r.b3) for r in buckets]


def main() -> int:
    texts, words = corpus_words_and_texts()
    print(f"{SF_DIR}: {len(texts)} docs, {len(words)} distinct words")

    bpe_map = author_bpe(texts, words)
    wp_map = author_wordpiece(texts, words)
    from etl_tools_rs_spark.queries import _UNIGRAM_CFG

    uni_vocab, uni_map = author_unigram(texts, words, _UNIGRAM_CFG)
    pca_mean, pca_comps = author_pca()
    bands = author_minhash_bands()

    lines = [
        f'"""Authored per-sf oracle fixtures for sf{SF_LABEL} (r9, VERDICT r8 #3).',
        "",
        "Generated by tools/author_sf_oracles.py — tokenizer maps and the",
        "unigram vocabulary from the tests/ pure-python reference trainers",
        "(independent of the engine), the PCA model from a numpy replay of",
        "pca_fit_exact's law over exact integer moments, and the xxhash64",
        "band table from the engine cross-checked against the portable md5",
        'family. Consumed via qdef(oracle_by_sf) in queries.py."""',
        "",
    ]

    def emit_map(name, mapping):
        lines.append(f"{name}_{SUFFIX} = {{")
        for w in sorted(mapping):
            lines.append(f"    {w!r}: {mapping[w]!r},")
        lines.append("}")
        lines.append("")

    emit_map("BPE_WORD_TOKENS", bpe_map)
    emit_map("WP_WORD_PIECES", wp_map)
    emit_map("UNI_WORD_PIECES", uni_map)

    lines.append(f"UNIGRAM_VOCAB_{SUFFIX} = [")
    for p, lp, c in uni_vocab:
        lines.append(f"    ({p!r}, {lp!r}, {c}),")
    lines.append("]")
    lines.append("")
    lines.append(f"PCA_MEAN_{SUFFIX} = {pca_mean!r}")
    lines.append("")
    lines.append(f"PCA_COMPS_{SUFFIX} = [")
    for row in pca_comps:
        lines.append(f"    {row!r},")
    lines.append("]")
    lines.append("")
    lines.append(f"# (doc_id, band0..band3) xxhash64 LSH band keys, 16/4/3")
    lines.append(f"MINHASH_FAST_BANDS_{SUFFIX} = [")
    for row in bands:
        lines.append(f"    {row!r},")
    lines.append("]")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}: {len(bpe_map)} bpe / {len(wp_map)} wp / "
          f"{len(uni_map)} uni words, {len(uni_vocab)} vocab pieces, "
          f"{len(bands)} band rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
