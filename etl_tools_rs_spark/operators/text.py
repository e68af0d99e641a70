"""Text analysis operators for training-data pipelines.

No reference equivalent (the reference has zero scalar functions, SURVEY
§2.7); these are the engine's first-class extension ops. All are pure
column expressions — JVM-side, whole-stage-codegen, no Python in the hot
path — so they scale linearly over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_tools_rs_spark.session import default_parallelism

from etl_tools_rs_spark.functions import fingerprint, ngrams, token_count, tokens

# Tiny per-language marker-word lists for the n-gram/stopword language-ID
# heuristic. Deliberately minimal + deterministic (and mirrored in the
# DuckDB oracle SQL for correctness checking).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "es": ["el", "la", "de", "es", "y"],
    "fr": ["le", "la", "et", "est", "un"],
    "de": ["der", "die", "und", "ist", "ein"],
    "zh": ["的", "是", "在", "了", "和"],
}


def marker_hits(col: str | Column, lang: str) -> Column:
    """Count of tokens that are marker words for ``lang``."""
    return F.size(
        F.filter(tokens(col), lambda t: F.lower(t).isin(LANG_MARKERS[lang]))
    )


def lang_id(col: str | Column) -> Column:
    """Heuristic language ID: argmax of marker-word hit counts, 'und' when
    no marker matches. Deterministic tie-break: language-code order.

    Implemented as one array_max over struct(hits, -lang_index): struct
    ordering picks max hits first, then max(-index) = alphabetically-first
    language on ties (matches the SQL CASE oracle, which checks languages
    in alphabetical order against the max). Each hit count appears exactly
    once in the expression tree — a chained when()/otherwise() fold would
    nest the previous best into two branches per step and blow up to
    O(2^n_langs) copies of the interpreted filter() HOFs.
    """
    langs = sorted(LANG_MARKERS)
    entries = [
        F.struct(
            marker_hits(col, lang).alias("h"),
            F.lit(-i).alias("ni"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    # sentinel: hits=0 with the highest tie-break — wins iff every real
    # language scored zero, yielding 'und' without re-referencing the hits
    entries.append(
        F.struct(F.lit(0).alias("h"), F.lit(1).alias("ni"), F.lit("und").alias("lang"))
    )
    return F.array_max(F.array(*entries))["lang"]


def _ratio4(num: Column, den: Column) -> Column:
    """floor-based 4-dp ratio: floor(1e4*n/d)/1e4. Unlike round(), floor of
    an int/int double quotient has no half-way boundary, so Spark and the
    DuckDB oracle always agree bit-for-bit."""
    return (F.floor(F.lit(10000.0) * num / F.greatest(den, F.lit(1))) / 10000.0).cast(
        "double"
    )


def quality_score(col: str | Column) -> dict[str, Column]:
    """Document quality signals: length, token count, mean token length,
    punctuation ratio, stopword ratio, alpha ratio. Returns a dict of
    named Columns so callers select the subset they need (column pruning
    stays effective)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = tokens(c)
    n_tokens = F.size(toks)
    n_nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[.,;:!?'\"()\[\]{}-]", ""))
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(LANG_MARKERS["en"])))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": _ratio4(n_nonspace, n_tokens),
        "punct_ratio": _ratio4(n_punct, n_chars),
        "alpha_ratio": _ratio4(n_alpha, n_chars),
        "stopword_ratio": _ratio4(n_stop, n_tokens),
    }


BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: str | Column) -> Column:
    """Approximate subword token count: alphanumeric runs + standalone
    punctuation/CJK chars via regexp_extract_all. Pattern is RE2-safe (no
    lookarounds) so the DuckDB oracle can evaluate it identically."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop text-analysis projection: token stats + quality + langid +
    fingerprint. Single narrow scan; everything fuses into one codegen stage."""
    q = quality_score(text_col)
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        q["mean_token_len"].alias("mean_token_len"),
        q["punct_ratio"].alias("punct_ratio"),
        q["alpha_ratio"].alias("alpha_ratio"),
        q["stopword_ratio"].alias("stopword_ratio"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )


def tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 6,
) -> DataFrame:
    """TF-IDF term weights: one row per (doc, term) with ``tf`` (term count
    in the doc), ``idf`` and ``tfidf`` — the classic relevance/feature
    weighting over a document corpus.

    ``idf = ln((1 + N) / (1 + df_t)) + 1`` (the smoothed form: terms in
    every doc get weight 1, never 0), floor-scaled to ``scale`` decimals
    BEFORE the tf multiply — the ln is the one operation whose last ulp
    could differ across engines, and scaling it first confines any such
    divergence to one rounding per distinct df value instead of one per
    output row. ``tfidf = tf * idf`` is then bit-deterministic.

    Plan shape: explode tokens → groupBy(doc, term) count (one shuffle,
    map-side combined) → per-term doc frequency from that aggregate
    (second shuffle on term, input already one row per (doc, term)) → N
    as a 1-row aggregate broadcast back (no driver collect) → broadcast
    the term→idf table onto the tf rows. At 100 TB the vocabulary (not
    the corpus) bounds the broadcast; if the vocab outgrows it, the last
    join degrades gracefully to a shuffle on term.
    """
    p = float(10**scale)
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("_dft"))
    n = tf.select(F.countDistinct(id_col).alias("_n"))
    idf = dft.crossJoin(F.broadcast(n)).select(
        "term",
        (
            F.floor(
                F.lit(p)
                * (
                    F.log(
                        (F.lit(1.0) + F.col("_n").cast("double"))
                        / (F.lit(1.0) + F.col("_dft").cast("double"))
                    )
                    + F.lit(1.0)
                )
            )
            / F.lit(p)
        ).alias("idf"),
    )
    return tf.join(F.broadcast(idf), "term").select(
        id_col,
        "term",
        "tf",
        F.col("idf").cast("double").alias("idf"),
        (F.col("tf").cast("double") * F.col("idf")).cast("double").alias("tfidf"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's
    rolling-hash scheme): hash every character ``k``-gram of the normalized
    text, slide a window of ``w`` consecutive gram hashes, keep each
    window's minimum; the distinct minima are the document's fingerprint
    set (expected density 2/(w+1) of grams).

    Returns ``(id_col, n_fingerprints, fp_digest)`` where ``fp_digest`` is
    the md5 of the sorted minima — two documents sharing long substrings
    share fingerprint hashes, and identical-after-normalization documents
    share the digest.

    Plan shape: ONE shuffle total, of the raw texts — ``repartition(id)``
    up front hash-clusters docs, and every downstream requirement
    (window over id, distinct on (id, minhash), groupBy(id)) is satisfied
    by that clustering, so Spark elides all three would-be exchanges and
    the 100-1000x-wider gram-hash rows never travel. The explicit
    partition count keeps AQE from coalescing the small text shuffle
    below the core count (the md5 stage downstream is the CPU-heavy
    part). Hashes are md5, so the whole pipeline is oracle-portable.
    Documents with fewer than ``k + w - 1`` normalized characters have no
    full window and drop out (define their fingerprint as empty upstream
    if completeness matters)."""
    from pyspark.sql.window import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    n_part = default_parallelism(df.sparkSession)
    base = (
        df.select(F.col(id_col), norm.alias("_t"))
        .filter(F.length("_t") >= k + w - 1)
        .repartition(n_part, F.col(id_col))
    )
    n_grams = F.length("_t") - F.lit(k) + 1
    grams = base.select(
        id_col, "_t", F.explode(F.sequence(F.lit(1), n_grams)).alias("_i")
    )
    hashed = grams.select(
        id_col,
        "_i",
        F.md5(F.substring(F.col("_t"), F.col("_i"), F.lit(k))).alias("_h"),
    )
    wspec = Window.partitionBy(id_col).orderBy("_i").rowsBetween(0, w - 1)
    per_doc = Window.partitionBy(id_col)
    minima = (
        hashed.select(
            id_col,
            "_i",
            F.min("_h").over(wspec).alias("_mh"),
            F.count(F.lit(1)).over(per_doc).alias("_ng"),
        )
        .filter(F.col("_i") <= F.col("_ng") - (w - 1))
        .select(id_col, "_mh")
        .distinct()
    )
    return minima.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
        F.md5(F.concat_ws("|", F.sort_array(F.collect_list("_mh")))).alias(
            "fp_digest"
        ),
    )


# ---------------------------------------------------------------------------
# PII redaction — the scrubbing pass every web-scale training corpus runs
# ---------------------------------------------------------------------------

# Order matters and is part of the contract: SSN before phone (3-2-4 vs
# 3-3-4 digit groups), phone before IPv4 (a dotted 3-3-4 number reads as a
# phone). All patterns are RE2-safe (no lookarounds/backrefs) so a DuckDB
# oracle evaluates them identically to Java regex; \b and \d agree between
# the engines on ASCII text.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(?\b\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
]


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-pattern match counts on the RAW text (before redaction), as
    ``n_email`` / ``n_ssn`` / ``n_phone`` / ``n_ipv4`` long columns.
    Counts are independent per pattern — a dotted 3-3-4 number counts as
    both phone and ipv4-shaped; redaction order (not the counts)
    disambiguates what the output text shows."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast(
            "long"
        )
        for name, pat, _ in PII_PATTERNS
    }


def pii_redact(col: str | Column) -> Column:
    """Redact emails, SSNs, phone numbers and IPv4 addresses with typed
    placeholder tokens. Pure chained ``regexp_replace`` — JVM-side,
    codegen, no shuffle; scales as a narrow map over 100 TB of text."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


# ---------------------------------------------------------------------------
# Unicode script detection — narrow, shuffle-free per-document
# ---------------------------------------------------------------------------

# Fixed priority order (the CASE/when tie-break contract) and explicit
# code-point ranges — ranges, not \p{Script} classes, because Java regex
# (\p{IsLatin}) and RE2 (\p{Latin}) spell script classes differently
# while literal ranges mean the same thing in both engines.
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "A-Za-zÀ-ɏ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("arabic", "؀-ۿ"),
    ("devanagari", "ऀ-ॿ"),
    ("hangul", "ᄀ-ᇿ㄰-㆏가-힣"),
    ("cjk", "぀-ヿ一-鿿"),
]


def script_shares(col: str | Column) -> dict[str, Column]:
    """Unicode script composition — the multilingual routing signal a
    corpus pipeline applies before per-language models (lang_id's marker
    words only cover languages with known stopword lists; script counts
    classify ANY text cheaply). Returns per-script character counts
    (``n_latin`` … ``n_cjk``, plus ``n_digit``), the dominant ``script``
    label (first script in :data:`SCRIPT_RANGES` order reaching the max
    count; ``und`` when no script character occurs), and
    ``script_share`` — the dominant script's fraction of all characters
    (floor-4dp). Counts are length-difference of a remove-all
    regexp_replace, so everything is one narrow codegen projection —
    no shuffle, linear at 100 TB."""
    c = F.col(col) if isinstance(col, str) else col
    n_total = F.length(c)
    counts: dict[str, Column] = {}
    for name, rng in SCRIPT_RANGES:
        counts[f"n_{name}"] = (
            n_total - F.length(F.regexp_replace(c, f"[{rng}]", ""))
        ).cast("long")
    counts["n_digit"] = (
        n_total - F.length(F.regexp_replace(c, "[0-9]", ""))
    ).cast("long")
    m = F.greatest(*[counts[f"n_{name}"] for name, _ in SCRIPT_RANGES])
    # build the when-chain front-to-back so the FIRST max in priority
    # order wins (mirrors the oracle's CASE)
    chain = None
    for name, _ in SCRIPT_RANGES:
        cond = counts[f"n_{name}"] == m
        chain = F.when(cond, F.lit(name)) if chain is None else chain.when(cond, F.lit(name))
    label = F.when(m > 0, chain.otherwise(F.lit("und"))).otherwise(F.lit("und"))
    return {
        **counts,
        "script": label,
        "script_share": _ratio4(m, n_total),
    }


# ---------------------------------------------------------------------------
# Readability (Flesch / Flesch-Kincaid) — narrow, shuffle-free per-document
# ---------------------------------------------------------------------------


def _syllables(word: Column) -> Column:
    """Heuristic per-word syllable count: vowel-group runs ([aeiouy]+),
    minus one for a trailing silent 'e' (consonant+e at word end, only
    when another vowel group exists), floored at 1 — the classic
    dictionary-free approximation. RE2-safe (no lookarounds) so the
    DuckDB oracle evaluates the identical regexes."""
    lw = F.lower(word)
    groups = F.size(F.regexp_extract_all(lw, F.lit("[aeiouy]+"), F.lit(0)))
    silent_e = (
        F.when(lw.rlike("[b-df-hj-np-tv-z]e$") & (groups > F.lit(1)), F.lit(1))
        .otherwise(F.lit(0))
    )
    return F.greatest(groups - silent_e, F.lit(1))


def readability_scores(col: str | Column) -> dict[str, Column]:
    """Flesch reading ease + Flesch-Kincaid grade level (Kincaid et al.
    1975) — the standard edu-quality filter signals (e.g. grade-banded
    corpus selection a la FineWeb-Edu's readability features).

    - ``n_words``: whitespace tokens; ``n_sentences``: [.!?]+ runs
      (min 1); ``n_syllables``: per-word heuristic (:func:`_syllables`).
    - ``flesch``: 206.835 − 1.015·(words/sentence) − 84.6·(syll/word)
    - ``fk_grade``: 0.39·(words/sentence) + 11.8·(syll/word) − 15.59

    Determinism/oracle: both per-doc ratios floor to 4 dp first
    (:func:`_ratio4` — bit-stable int/int quotients), then each linear
    form evaluates left-to-right on those exact doubles and floors to
    4 dp again, so Spark and DuckDB agree bit-for-bit (same literals,
    same IEEE op order). Everything is a per-row expression over the
    token array — a narrow projection, nothing shuffles, linear at
    100 TB."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_words = F.size(toks)
    n_sentences = F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), F.lit(0)))
    n_syllables = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc + _syllables(w).cast("long"),
    )
    wps = _ratio4(n_words, n_sentences)
    spw = _ratio4(n_syllables, n_words)
    flesch = (
        F.floor(
            F.lit(10000.0)
            * ((F.lit(206.835) - F.lit(1.015) * wps) - F.lit(84.6) * spw)
        )
        / 10000.0
    ).cast("double")
    fk_grade = (
        F.floor(
            F.lit(10000.0)
            * ((F.lit(0.39) * wps + F.lit(11.8) * spw) - F.lit(15.59))
        )
        / 10000.0
    ).cast("double")
    return {
        "n_words": n_words.cast("long"),
        "n_sentences": n_sentences.cast("long"),
        "n_syllables": n_syllables.cast("long"),
        "flesch": flesch,
        "fk_grade": fk_grade,
    }


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style) — narrow, shuffle-free per-document
# ---------------------------------------------------------------------------


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements; on a SORTED array this is
    the max multiplicity (mode count). Computed with F.aggregate so the
    whole thing is one JVM-side expression — per-row O(n log n) for the
    sort, no explode, no shuffle. (Higher-order functions run interpreted
    rather than in codegen, but they stay on the JVM and the operator
    remains a narrow map — the property that matters at corpus scale.)"""
    stepped = F.aggregate(
        sorted_arr,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return stepped["best"]


def repetition_stats(col: str | Column) -> dict[str, Column]:
    """Within-document repetition signals (the Gopher repetition filters):

    - ``n_tokens``: whitespace token count
    - ``dup_word_frac``: fraction of tokens that are repeats of an
      earlier token (1 - distinct/total)
    - ``top_word_frac``: share of the single most frequent token
    - ``top_bigram_frac``: share of the most frequent token bigram

    All fractions floor-scaled to 4 dp (cross-engine bit-stable). Every
    stat is a per-row expression over the token array — the whole operator
    is a narrow projection, nothing shuffles."""
    toks = tokens(col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    bi = ngrams(col, 2)
    nb = F.size(bi)
    return {
        "n_tokens": n.cast("long"),
        "dup_word_frac": _ratio4(n - nd, n),
        "top_word_frac": _ratio4(_max_run(F.sort_array(toks)), n),
        "top_bigram_frac": _ratio4(_max_run(F.sort_array(bi)), nb),
    }


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 10.0,
    max_dup_word_frac: float = 0.75,
    max_top_word_frac: float = 0.30,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """Gopher-style document quality filter: keep documents whose token
    count, mean token length, duplicate-word fraction, top-word share and
    stopword ratio all fall inside the configured band. Adds the signal
    columns plus a boolean ``keep`` — callers ``.filter('keep')`` to
    drop, or inspect the signals for threshold tuning. One narrow
    projection; composes with ``analyze`` in the same codegen stage."""
    q = quality_score(text_col)
    r = repetition_stats(text_col)
    out = df.select(
        "*",
        r["n_tokens"].alias("n_tokens"),
        q["mean_token_len"].alias("mean_token_len"),
        r["dup_word_frac"].alias("dup_word_frac"),
        r["top_word_frac"].alias("top_word_frac"),
        q["stopword_ratio"].alias("stopword_ratio"),
    )
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("mean_token_len") >= min_mean_token_len)
        & (F.col("mean_token_len") <= max_mean_token_len)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_word_frac") <= max_top_word_frac)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    )
    return out.withColumn("keep", keep)


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    scale: int = 6,
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — the
    collocation / phrase-mining statistic ("new york" scores high, "of
    the" low) used to build phrase vocabularies for tokenizer training.

    ``pmi = ln( (c_xy / N_bigrams) / ((c_x / N_tokens) * (c_y / N_tokens)) )``

    with occurrence counts over the whole corpus; pairs below
    ``min_count`` are pruned (PMI is noise at tiny counts). The ln is
    floor-scaled to ``scale`` decimals (the only cross-engine-fragile
    operation, applied once per surviving pair).

    Plan shape: one explode → groupBy for unigrams, one zip-shifted
    explode → groupBy for bigrams (both map-side combined; the zip is a
    JVM array op, no Python); corpus totals are 1-row aggregates
    broadcast back (never collected); unigram counts join the bigram
    table on each side — broadcast while the vocabulary fits, shuffle on
    the token key beyond that. Output: (tok_x, tok_y, n_xy, pmi).
    """
    toks = df.select(tokens(text_col).alias("_ts"))
    uni = (
        toks.select(F.explode("_ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    bi = (
        toks.select(
            F.explode(
                F.when(
                    F.size("_ts") >= 2,
                    F.arrays_zip(
                        F.slice(F.col("_ts"), 1, F.size("_ts") - 1).alias("x"),
                        F.slice(F.col("_ts"), 2, F.size("_ts") - 1).alias("y"),
                    ),
                ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
            ).alias("_bg")
        )
        .select(F.col("_bg.x").alias("tok_x"), F.col("_bg.y").alias("tok_y"))
        .groupBy("tok_x", "tok_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
        .filter(F.col("n_xy") >= min_count)
    )
    n_uni = uni.select(F.sum("_c").cast("double").alias("_nu"))
    # total bigram occurrences BEFORE min_count pruning (pruning selects
    # which pairs are reported, it must not skew the probability model) —
    # computed directly from token counts, no second bigram aggregate
    n_bi = toks.select(
        F.sum(F.greatest(F.size("_ts") - 1, F.lit(0))).cast("double").alias("_nb")
    )
    ux = uni.select(F.col("tok").alias("tok_x"), F.col("_c").alias("_cx"))
    uy = uni.select(F.col("tok").alias("tok_y"), F.col("_c").alias("_cy"))
    p = float(10**scale)
    pmi = (
        F.floor(
            F.lit(p)
            * F.log(
                (F.col("n_xy").cast("double") * F.col("_nu") * F.col("_nu"))
                / (F.col("_nb") * F.col("_cx").cast("double") * F.col("_cy").cast("double"))
            )
        )
        / F.lit(p)
    )
    # unigram counts are vocabulary-sized — broadcast them onto the bigram
    # rows (plan-pinned: no SMJ shuffle per side). If a corpus's vocab ever
    # outgrows the broadcast limit, drop the hints and these become two
    # token-keyed shuffle joins — same semantics.
    return (
        bi.join(F.broadcast(ux), "tok_x")
        .join(F.broadcast(uy), "tok_y")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select("tok_x", "tok_y", "n_xy", pmi.cast("double").alias("pmi"))
    )


def token_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    smoothing: float = 0.5,
    scale: int = 6,
) -> DataFrame:
    """Token-distribution drift between two corpora — the
    data-monitoring statistic for "did this week's crawl change?" /
    "does the train split match eval?": per-token smoothed probabilities
    under each corpus plus both KL contributions. Summing ``kl_ab_term``
    gives KL(A‖B); ``kl_ba_term`` gives KL(B‖A).

    Add-λ smoothing over the UNION vocabulary keeps every log finite:
    ``p = (c + λ) / (N + λ·V)``. All probabilities and log terms are
    floor-scaled to ``scale`` decimals, so the whole table is
    bit-reproducible and engine-checkable.

    Plan: one token count aggregate per corpus (map-side combined), a
    full-outer vocab join, corpus totals (N_a, N_b, V) as 1-row
    aggregates broadcast back — no driver collect. Output:
    ``(token, n_a, n_b, p_a, p_b, kl_ab_term, kl_ba_term)``.
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing!r}")
    lam = float(smoothing)
    p10 = float(10**scale)

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(text_col)).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    ca, cb = counts(df_a, "n_a"), counts(df_b, "n_b")
    vocab = ca.join(cb, "token", "full_outer").select(
        "token",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    totals = vocab.agg(
        F.sum("n_a").cast("double").alias("_na"),
        F.sum("n_b").cast("double").alias("_nb"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )

    def fl(c):
        return F.floor(F.lit(p10) * c) / F.lit(p10)

    pa = (F.col("n_a").cast("double") + F.lit(lam)) / (
        F.col("_na") + F.lit(lam) * F.col("_v")
    )
    pb = (F.col("n_b").cast("double") + F.lit(lam)) / (
        F.col("_nb") + F.lit(lam) * F.col("_v")
    )
    return vocab.crossJoin(F.broadcast(totals)).select(
        "token",
        "n_a",
        "n_b",
        fl(pa).cast("double").alias("p_a"),
        fl(pb).cast("double").alias("p_b"),
        fl(pa * F.log(pa / pb)).cast("double").alias("kl_ab_term"),
        fl(pb * F.log(pb / pa)).cast("double").alias("kl_ba_term"),
    )


def char_stats(col: str | Column) -> dict[str, Column]:
    """Character-level quality signals, entirely row-local (ZERO shuffle
    — per-document signals should never pay an exchange; at 100 TB this
    is a narrow codegen projection over the scan):

    - ``n_chars_lc`` — character count of the lowercased text.
    - ``char_entropy`` — Shannon entropy (nats) of the character
      unigram distribution. Low entropy ≈ repeated filler / padding;
      high entropy ≈ random bytes. The classic cheap compressibility
      proxy (a zlib ratio needs a Python UDF; entropy stays JVM-side).
    - ``tri_distinct_ratio`` — distinct / total character trigrams:
      the direct text-diversity signal (near 0 = the document is a
      loop of the same few phrases).

    Determinism contract (hash-gate proof): each entropy term
    ``p·ln(p)`` rounds to 6 dp and accumulates into an exact DECIMAL via
    the ``aggregate`` HOF, so float add-order can never leak; the final
    value is the correctly-rounded double of an exact decimal — no final
    ``round()`` whose half-boundary semantics differ across engines.
    ``tri_distinct_ratio`` is a single int/int IEEE division — exact in
    any engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    lc = F.lower(c)
    chars = F.filter(F.split(lc, ""), lambda ch: ch != "")
    n = F.size(chars)
    dist = F.array_distinct(chars)
    # p·ln(p) per distinct char; O(|alphabet|·len) comparisons per row,
    # all codegen — cheaper than an explode+groupBy shuffle at any scale
    terms = F.transform(
        dist,
        lambda ch: F.round(
            (F.size(F.filter(chars, lambda x: x == ch)) / n)
            * F.log(F.size(F.filter(chars, lambda x: x == ch)) / n),
            6,
        ).cast("decimal(20,6)"),
    )
    ent_dec = F.aggregate(
        terms,
        F.lit(0).cast("decimal(20,6)"),
        lambda acc, x: (acc + x).cast("decimal(20,6)"),
    )
    tri = F.when(
        F.length(lc) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.length(lc) - 3),
            lambda i: lc.substr(i + 1, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return {
        "n_chars_lc": n.cast("bigint"),
        "char_entropy": (-ent_dec).cast("double"),
        "tri_distinct_ratio": F.when(
            F.size(tri) > 0,
            F.size(F.array_distinct(tri)).cast("double") / F.size(tri),
        ),
    }

def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 6,
) -> DataFrame:
    """Per-document n-gram novelty (r4): the fraction of a document's
    DISTINCT word n-grams whose first corpus occurrence (minimum doc id)
    is this document — 1.0 means every shingle is new to the corpus,
    0.0 means pure recombination of earlier content. The streaming-
    corpus diagnostic behind "is this crawl snapshot adding anything":
    dedup says what to drop, novelty says what the keep-rate will be.

    Plan shape: docs explode to distinct grams once; gram → min(id) is
    one gram-keyed aggregate (map-side combined); novelty is a second
    gram-keyed join + doc-keyed aggregate. Text shuffles never — only
    grams and ids move. Docs with fewer than ``n`` tokens are excluded
    (no shingles → undefined ratio), same contract as the shingle ops.

    Output: ``(id_col, n_grams bigint, n_novel bigint, novelty double)``
    with novelty floor-rounded to ``scale`` (division policy).
    """
    grams = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(ngrams(F.col(text_col), n))).alias("_g"),
        )
    )
    first = grams.groupBy("_g").agg(F.min("_id").alias("_first_id"))
    per_doc = (
        grams.join(first, "_g")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("_first_id") == F.col("_id")).cast("bigint")).alias("n_novel"),
        )
    )
    p = 10 ** scale
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_grams",
        "n_novel",
        (F.floor(F.lit(p) * F.col("n_novel") / F.col("n_grams")) / F.lit(p)).alias(
            "novelty"
        ),
    )


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 500,
    scale: int = 6,
) -> DataFrame:
    """Zipf-law fit over the corpus token-frequency distribution (r4):
    OLS slope/intercept of ln(freq) on ln(rank) for the ``top_k`` most
    frequent lowercased tokens. Natural text fits slope ≈ -1; a corpus
    whose slope drifts far from that (template spam → much steeper,
    shuffled/synthetic text → flatter) fails the sanity check. A
    single-number corpus-quality diagnostic to trend across snapshots.

    Plan shape: ONE corpus-sized token aggregate (map-side combined,
    vocab-sized output), then orderBy().limit(top_k) — a TakeOrdered,
    never a global sort — and the regression runs on the k-row frame
    (rank window + sums are driver-trivial but stay in-plan). The OLS
    moments accumulate as exact DECIMAL(28,12) so float add order never
    leaks into the oracle comparison; slope/intercept are floor-rounded
    at ``scale`` (division policy).

    Output: one row ``(n_ranked int, slope double, intercept double)``.
    """
    from pyspark.sql.window import Window

    freq = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_f"))
        .orderBy(F.col("_f").desc(), F.col("_t").asc())
        .limit(top_k)
    )
    w = Window.orderBy(F.col("_f").desc(), F.col("_t").asc())
    # ln() implementations differ by an ulp across engines (libm vs Java
    # Math.log); round to 6dp BEFORE the exact-decimal cast so the moment
    # sums are bit-identical (same move as char_entropy's p·ln(p) terms)
    pts = freq.select(
        F.round(F.log(F.row_number().over(w).cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("_x"),
        F.round(F.log(F.col("_f").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("_y"),
    )
    # exact-decimal sums make the MOMENTS partition-order-proof; the final
    # OLS arithmetic then runs in double with an identical expression shape
    # on both engines (identical inputs + identical IEEE ops → identical
    # bits; pure-decimal slope math overflows DuckDB's 38-digit widening)
    agg = pts.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").cast("double").alias("_sx"),
        F.sum("_y").cast("double").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("double").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("double").alias("_sxx"),
    )
    p = 10 ** scale
    nn = F.col("_n").cast("double")
    slope = (nn * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (
        nn * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    )
    intercept = (F.col("_sy") - slope * F.col("_sx")) / nn
    return agg.select(
        F.col("_n").cast("int").alias("n_ranked"),
        (F.floor(F.lit(p) * slope) / F.lit(p)).cast("double").alias("slope"),
        (F.floor(F.lit(p) * intercept) / F.lit(p)).cast("double").alias("intercept"),
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    require_terminal_punct: bool = True,
    drop_phrases: tuple[str, ...] = ("lorem ipsum", "javascript", "cookie policy"),
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4-style LINE-level cleaning (Raffel et al. 2020 §2.2): drop
    individual lines that are too short, lack terminal punctuation, or
    contain boilerplate phrases, then reassemble the document from the
    surviving lines.

    Distinct from the doc-level ``gopher_filter``: C4 edits documents
    (a nav-bar line dies, the article around it survives) instead of
    dropping them whole. Adds ``n_lines``, ``n_kept_lines``,
    ``clean_text`` (kept lines re-joined with newlines) and ``keep``
    (>= ``min_kept_lines`` survived).

    Scale: entirely row-local array HOFs (split -> filter -> array_join)
    — one narrow projection, no explode, no shuffle; fuses into the
    scan's codegen stage like the rest of the text suite.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    lines = F.split(c, "\n")

    def line_ok(l: Column) -> Column:
        t = F.trim(l)
        words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
        ok = F.size(words) >= F.lit(min_words_per_line)
        if require_terminal_punct:
            ok = ok & t.rlike('[.!?"]$')
        low = F.lower(l)
        for phrase in drop_phrases:
            ok = ok & ~low.contains(phrase.lower())
        return ok

    kept = F.filter(lines, line_ok)
    return df.select(
        "*",
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
        (F.size(kept) >= F.lit(min_kept_lines)).alias("keep"),
    )
