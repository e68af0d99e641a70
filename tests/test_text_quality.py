"""PII redaction, repetition stats, quality filter, URL normalization —
hand-computed expectations on crafted strings (the oracle gate covers the
corpus-scale behavior; these pin the edge cases)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_tools_rs_spark.functions import url_host, url_normalize, url_path
from etl_tools_rs_spark.operators import text as text_ops


def _one(spark, text, expr_fn):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(expr_fn("text").alias("v")).first()["v"]


class TestPiiRedact:
    def test_all_four_types(self, spark):
        red = _one(
            spark,
            "mail a.b+c@x.co, ssn 123-45-6789, tel (415) 555-0142, ip 8.8.8.8.",
            text_ops.pii_redact,
        )
        assert red == "mail <EMAIL>, ssn <SSN>, tel <PHONE>, ip <IPV4>."

    def test_ssn_wins_over_phone_and_dotted_phone_over_ip(self, spark):
        # 3-2-4 digits → SSN (applied first); dotted 3-3-4 → phone, not IP
        red = _one(spark, "123-45-6789 and 415.555.0142", text_ops.pii_redact)
        assert red == "<SSN> and <PHONE>"

    def test_clean_text_unchanged(self, spark):
        s = "no pii here, just words and numbers like 42 or 3.14"
        assert _one(spark, s, text_ops.pii_redact) == s

    def test_counts(self, spark):
        df = spark.createDataFrame(
            [("a@b.io c@d.io 10.0.0.1",)], ["text"]
        )
        row = df.select(
            *[v.alias(k) for k, v in text_ops.pii_counts("text").items()]
        ).first()
        assert row["n_email"] == 2
        assert row["n_ipv4"] == 1
        assert row["n_ssn"] == 0
        assert row["n_phone"] == 0


class TestRepetitionStats:
    def _stats(self, spark, text):
        df = spark.createDataFrame([(text,)], ["text"])
        r = text_ops.repetition_stats("text")
        return df.select(*[v.alias(k) for k, v in r.items()]).first().asDict()

    def test_hand_computed(self, spark):
        s = self._stats(spark, "a a a a b b c")
        assert s["n_tokens"] == 7
        # 3 distinct of 7 → dup = floor(1e4*4/7)/1e4
        assert s["dup_word_frac"] == 0.5714
        assert s["top_word_frac"] == 0.5714  # 'a' 4/7
        assert s["top_bigram_frac"] == 0.5  # 'a a' 3 of 6

    def test_matches_python_counter(self, spark):
        text = "x y z x y z x q r x"
        toks = text.split()
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        s = self._stats(spark, text)
        n = len(toks)
        assert s["n_tokens"] == n
        assert s["top_word_frac"] == int(1e4 * Counter(toks).most_common(1)[0][1] / n) / 1e4
        assert (
            s["top_bigram_frac"]
            == int(1e4 * Counter(bigrams).most_common(1)[0][1] / len(bigrams)) / 1e4
        )

    def test_single_token_doc(self, spark):
        s = self._stats(spark, "solo")
        assert s["n_tokens"] == 1
        assert s["dup_word_frac"] == 0.0
        assert s["top_word_frac"] == 1.0
        assert s["top_bigram_frac"] == 0.0  # no bigrams; guarded denominator


class TestGopherFilter:
    def test_keep_and_drop(self, spark):
        good = "the quick brown fox jumps over the lazy dog " * 5  # 45 tokens
        repetitive = "spam " * 60  # top_word_frac = 1
        short = "too short"
        df = spark.createDataFrame(
            [(1, good), (2, repetitive), (3, short)], ["doc_id", "text"]
        )
        out = text_ops.gopher_filter(
            df, min_tokens=20, max_top_word_frac=0.3, max_dup_word_frac=0.95
        )
        keep = {r["doc_id"]: r["keep"] for r in out.collect()}
        assert keep == {1: True, 2: False, 3: False}


class TestUrlNormalize:
    def test_default_port_stripped_query_dropped(self, spark):
        df = spark.createDataFrame(
            [("HTTPS://WWW.Ex.COM:443/P/x?q=1#f",)], ["url"]
        )
        row = df.select(
            url_normalize("url").alias("n"),
            url_host("url").alias("h"),
            url_path("url").alias("p"),
        ).first()
        assert row["n"] == "https://www.ex.com/P/x"  # path case preserved
        assert row["h"] == "www.ex.com"
        assert row["p"] == "/P/x"

    def test_non_default_port_kept_empty_path(self, spark):
        df = spark.createDataFrame([("http://h.org:8080?x=1",)], ["url"])
        assert df.select(url_normalize("url").alias("n")).first()["n"] == (
            "http://h.org:8080/"
        )

    def test_plan_is_narrow(self, spark):
        # whole pipeline must be a single projection — no exchange
        df = spark.range(10).select(
            F.concat(F.lit("https://h"), F.col("id").cast("string"), F.lit(".com/p")).alias("url")
        )
        from etl_tools_rs_spark.plans.inspect import plan_report

        rep = plan_report(df.select(url_normalize("url")))
        assert rep.num_exchanges == 0


class TestBigramPmi:
    def test_hand_computed(self, spark):
        import math

        from etl_tools_rs_spark.operators.text import bigram_pmi

        # corpus: "a b" x3, "a c" x1  -> unigrams: a=4, b=3, c=1, N_uni=8
        # bigrams: (a,b)=3, (a,c)=1, N_bi=4
        df = spark.createDataFrame(
            [("a b",), ("a b",), ("a b",), ("a c",)], "text string"
        )
        rows = {
            (r["tok_x"], r["tok_y"]): r
            for r in bigram_pmi(df, "text", min_count=1).collect()
        }
        assert set(rows) == {("a", "b"), ("a", "c")}
        assert rows[("a", "b")]["n_xy"] == 3
        expect_ab = math.floor(1e6 * math.log((3 * 8.0 * 8.0) / (4.0 * 4 * 3))) / 1e6
        assert rows[("a", "b")]["pmi"] == expect_ab
        expect_ac = math.floor(1e6 * math.log((1 * 8.0 * 8.0) / (4.0 * 4 * 1))) / 1e6
        assert rows[("a", "c")]["pmi"] == expect_ac

    def test_min_count_prunes_pairs_not_totals(self, spark):
        from etl_tools_rs_spark.operators.text import bigram_pmi

        df = spark.createDataFrame([("a b",), ("a b",), ("c d",)], "text string")
        out = bigram_pmi(df, "text", min_count=2)
        rows = out.collect()
        assert [(r["tok_x"], r["tok_y"], r["n_xy"]) for r in rows] == [("a", "b", 2)]
        # N_bi must stay 3 (pre-prune): pmi = ln(2*6*6/(3*2*2)) = ln(6)
        import math

        assert rows[0]["pmi"] == math.floor(1e6 * math.log(6.0)) / 1e6

    def test_single_token_docs_contribute_no_bigrams(self, spark):
        from etl_tools_rs_spark.operators.text import bigram_pmi

        df = spark.createDataFrame([("solo",), ("a b",)], "text string")
        assert bigram_pmi(df, "text", min_count=1).count() == 1


class TestNormalizeText:
    def test_accent_fold_lower_ws(self, spark):
        from etl_tools_rs_spark.functions import normalize_text

        df = spark.createDataFrame(
            [("  Crème   BRÛLÉE\tà la\nmaison  ",), ("ñoño ÀÉÎÕÜ",)], "t string"
        )
        got = [r["n"] for r in df.select(normalize_text("t").alias("n")).collect()]
        assert got[0] == "creme brulee a la maison"
        assert got[1] == "nono aeiou"

    def test_flags_off(self, spark):
        from etl_tools_rs_spark.functions import normalize_text

        df = spark.createDataFrame([("  Ä  B  ",)], "t string")
        keep_case = df.select(
            normalize_text("t", lower=False).alias("n")
        ).collect()[0]["n"]
        assert keep_case == "A B"
        keep_accent = df.select(
            normalize_text("t", strip_accents=False, collapse_ws=False).alias("n")
        ).collect()[0]["n"]
        assert keep_accent == "ä  b"

    def test_fingerprint_stable_after_normalize(self, spark):
        from etl_tools_rs_spark.functions import fingerprint, normalize_text

        df = spark.createDataFrame(
            [("Héllo  Wörld",), ("hello   world",)], "t string"
        )
        fps = [
            r["f"]
            for r in df.select(
                fingerprint(normalize_text("t")).alias("f")
            ).collect()
        ]
        assert fps[0] == fps[1]


class TestTokenDivergence:
    def test_hand_computed(self, spark):
        import math

        from etl_tools_rs_spark.operators.text import token_divergence

        a = spark.createDataFrame([("x x y",)], "text string")  # x:2 y:1
        b = spark.createDataFrame([("y y z",)], "text string")  # y:2 z:1
        rows = {r["token"]: r for r in token_divergence(a, b).collect()}
        assert set(rows) == {"x", "y", "z"}
        # vocab=3, Na=Nb=3, denom = 3 + 0.5*3 = 4.5
        pa_x, pb_x = 2.5 / 4.5, 0.5 / 4.5
        fl = lambda v: math.floor(1e6 * v) / 1e6  # noqa: E731
        assert rows["x"]["p_a"] == fl(pa_x)
        assert rows["x"]["p_b"] == fl(pb_x)
        assert rows["x"]["kl_ab_term"] == fl(pa_x * math.log(pa_x / pb_x))
        assert rows["x"]["n_a"] == 2 and rows["x"]["n_b"] == 0

    def test_identical_corpora_near_zero_kl(self, spark):
        from etl_tools_rs_spark.operators.text import token_divergence

        df = spark.createDataFrame([("a b c a",), ("b c",)], "text string")
        out = token_divergence(df, df)
        total = out.agg(
            F.sum("kl_ab_term").alias("ab"), F.sum("kl_ba_term").alias("ba")
        ).collect()[0]
        # identical distributions: every term is 0 up to the floor-scale
        assert abs(total["ab"]) < 1e-5 and abs(total["ba"]) < 1e-5

    def test_rejects_bad_smoothing(self, spark):
        import pytest as _p

        from etl_tools_rs_spark.operators.text import token_divergence

        df = spark.createDataFrame([("a",)], "text string")
        with _p.raises(ValueError, match="smoothing"):
            token_divergence(df, df, smoothing=0.0)


class TestCharStats:
    def _stats(self, spark, text):
        df = spark.createDataFrame([(text,)], ["text"])
        cs = text_ops.char_stats("text")
        return df.select(
            *[c.alias(k) for k, c in cs.items()]
        ).first().asDict()

    def test_uniform_string_zero_entropy(self, spark):
        r = self._stats(spark, "aaaaaaaa")
        assert r["n_chars_lc"] == 8
        assert r["char_entropy"] == 0.0
        # every trigram is 'aaa'
        assert r["tri_distinct_ratio"] == 1.0 / 6

    def test_two_symbol_entropy_ln2(self, spark):
        import math

        r = self._stats(spark, "abababab")
        # p=0.5 each -> entropy = ln 2 (to the 6dp term rounding)
        assert abs(r["char_entropy"] - math.log(2)) < 2e-6

    def test_case_folding(self, spark):
        a = self._stats(spark, "AbAbAbAb")
        b = self._stats(spark, "abababab")
        assert a == b

    def test_short_text_null_ratio(self, spark):
        r = self._stats(spark, "ab")
        assert r["tri_distinct_ratio"] is None
        assert r["n_chars_lc"] == 2

    def test_diverse_text_ratio_one(self, spark):
        r = self._stats(spark, "abcdefgh")
        assert r["tri_distinct_ratio"] == 1.0

    def test_entropy_matches_counter(self, spark):
        import math

        text = "the quick brown fox jumps over the lazy dog"
        r = self._stats(spark, text)
        n = len(text)
        expect = -sum(
            round((c / n) * math.log(c / n), 6)
            for c in Counter(text).values()
        )
        assert abs(r["char_entropy"] - expect) < 1e-9


class TestNgramNovelty:
    def test_first_doc_fully_novel(self, spark):
        from etl_tools_rs_spark.operators.text import ngram_novelty

        rows = [
            (1, "a b c d"),          # grams: "a b c","b c d" — all novel
            (2, "a b c d"),          # exact repeat — zero novel
            (3, "a b c x y z"),      # "a b c" seen; "b c x","c x y","x y z" new
            (4, "a b"),              # < n tokens: excluded
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in ngram_novelty(df, n=3).collect()}
        assert set(got) == {1, 2, 3}
        assert (got[1].n_grams, got[1].n_novel, got[1].novelty) == (2, 2, 1.0)
        assert (got[2].n_grams, got[2].n_novel, got[2].novelty) == (2, 0, 0.0)
        assert (got[3].n_grams, got[3].n_novel) == (4, 3)
        assert got[3].novelty == 0.75

    def test_duplicate_gram_within_doc_counts_once(self, spark):
        from etl_tools_rs_spark.operators.text import ngram_novelty

        df = spark.createDataFrame(
            [(1, "a b c a b c a b c")], "doc_id long, text string"
        )
        (r,) = ngram_novelty(df, n=3).collect()
        # distinct grams: "a b c","b c a","c a b" — each once
        assert r.n_grams == 3 and r.n_novel == 3


class TestZipfSlope:
    def test_known_powerlaw(self, spark):
        from etl_tools_rs_spark.operators.text import zipf_slope

        # construct exact Zipf-1: token k appears floor(120/k) times
        toks = []
        for k in range(1, 13):
            toks += [f"t{k:02d}"] * (120 // k)
        df = spark.createDataFrame([(" ".join(toks),)], "text string")
        (r,) = zipf_slope(df, top_k=12).collect()
        assert r.n_ranked == 12
        assert -1.15 < r.slope < -0.85  # ~ -1 for true Zipf
        assert r.intercept > 0

    def test_uniform_corpus_flat_slope(self, spark):
        from etl_tools_rs_spark.operators.text import zipf_slope

        df = spark.createDataFrame(
            [("x1 x2 x3 x4 x5 " * 10,)], "text string"
        )
        (r,) = zipf_slope(df, top_k=5).collect()
        assert r.slope == 0.0  # every token same freq -> flat fit


class TestReadability:
    @staticmethod
    def _scores(spark, text):
        df = spark.createDataFrame([(text,)], ["text"])
        r = text_ops.readability_scores("text")
        return df.select(
            *[r[k].alias(k) for k in r]
        ).first().asDict()

    @staticmethod
    def _expected(n_words, n_sentences, n_syllables):
        import math

        wps = math.floor(10000.0 * n_words / max(n_sentences, 1)) / 10000.0
        spw = math.floor(10000.0 * n_syllables / max(n_words, 1)) / 10000.0
        flesch = (
            math.floor(10000.0 * ((206.835 - 1.015 * wps) - 84.6 * spw))
            / 10000.0
        )
        fk = (
            math.floor(10000.0 * ((0.39 * wps + 11.8 * spw) - 15.59))
            / 10000.0
        )
        return flesch, fk

    def test_single_word_counts(self, spark):
        r = self._scores(spark, "go")
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (1, 0, 1)
        flesch, fk = self._expected(1, 0, 1)
        assert (r["flesch"], r["fk_grade"]) == (flesch, fk)

    def test_empty_text_is_all_zero_counts(self, spark):
        r = self._scores(spark, "")
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (0, 0, 0)
        flesch, fk = self._expected(0, 0, 0)
        assert (r["flesch"], r["fk_grade"]) == (flesch, fk)

    def test_syllable_heuristic_cases(self, spark):
        # late: a,e groups minus trailing silent e -> 1; see: one 'ee'
        # group, vowel before final e so no subtraction -> 1; rhythm: 'y'
        # counts as vowel -> 1; xyz: 'y' -> 1; 123: no vowels, floor 1;
        # banana: 3 groups -> 3.
        cases = {
            "late": 1,
            "see": 1,
            "rhythm": 1,
            "xyz": 1,
            "123": 1,
            "banana": 3,
            "beautiful": 3,  # eau / i / u vowel groups
        }
        for w, want in cases.items():
            r = self._scores(spark, w)
            assert r["n_syllables"] == want, (w, r["n_syllables"], want)

    def test_multi_sentence_document(self, spark):
        text = "The cake is a lie. The cake is great! Really?"
        r = self._scores(spark, text)
        # 10 words; 3 sentence-terminator runs; syllables: the=1, cake=1
        # (silent-e strip: a,e groups minus trailing consonant+e), is=1,
        # a=1, 'lie.'=1 (dot blocks the strip, one 'ie' group), the=1,
        # cake=1, is=1, 'great!'=1 ('ea' one group), 'Really?'=2 ('ea'
        # is one contiguous vowel group, then 'y')
        assert r["n_words"] == 10
        assert r["n_sentences"] == 3
        assert r["n_syllables"] == 11
        flesch, fk = self._expected(10, 3, 11)
        assert (r["flesch"], r["fk_grade"]) == (flesch, fk)

    def test_flesch_ordering_simple_vs_complex(self, spark):
        simple = self._scores(spark, "The cat sat. The dog ran. We go now.")
        dense = self._scores(
            spark,
            "Multisyllabic terminological obfuscation notwithstanding "
            "institutional considerations predominantly characterize "
            "bureaucratic communication paradigms",
        )
        assert simple["flesch"] > dense["flesch"]
        assert simple["fk_grade"] < dense["fk_grade"]


class TestScriptShares:
    @staticmethod
    def _scores(spark, text):
        df = spark.createDataFrame([(text,)], ["text"])
        s = text_ops.script_shares("text")
        return df.select(*[s[k].alias(k) for k in s]).first().asDict()

    def test_each_script_detected(self, spark):
        cases = {
            "Hello world": ("latin", 10),
            "привет": ("cyrillic", 6),
            "γειά σου": ("greek", 7),
            "مرحبا": ("arabic", 5),
            "नमस्ते": ("devanagari", 6),
            "안녕하세요": ("hangul", 5),
            "你好世界カナ": ("cjk", 6),
        }
        for text, (script, n) in cases.items():
            r = self._scores(spark, text)
            assert r["script"] == script, (text, r)
            assert r[f"n_{script}"] == n, (text, r)

    def test_tie_goes_to_priority_order(self, spark):
        # 2 latin vs 2 cyrillic — latin comes first in SCRIPT_RANGES
        r = self._scores(spark, "ab пр")
        assert (r["n_latin"], r["n_cyrillic"]) == (2, 2)
        assert r["script"] == "latin"

    def test_empty_and_digits_are_und(self, spark):
        r = self._scores(spark, "")
        assert r["script"] == "und" and r["script_share"] == 0.0
        r = self._scores(spark, "12345 67")
        assert r["script"] == "und"
        assert r["n_digit"] == 7

    def test_share_is_dominant_over_total_chars(self, spark):
        # 6 cyrillic of 10 chars total (space + 'ab!' are not script)
        r = self._scores(spark, "привет ab!")
        assert r["n_cyrillic"] == 6 and r["n_latin"] == 2
        assert r["script"] == "cyrillic"
        import math

        assert r["script_share"] == math.floor(10000.0 * 6 / 10) / 10000.0
