"""Distributed logistic regression: learning behavior on separable data
(the oracle gate pins the exact numeric trajectory; these pin that the
trainer actually LEARNS and that scoring composes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tools_rs_spark.operators import ml


def _separable(spark):
    # y = 1 iff x1 > 0.5; x2 is pure noise (fixed values, no rng)
    rows = []
    for i in range(40):
        x1 = (i % 10) / 10.0
        x2 = ((i * 7) % 10) / 10.0
        rows.append((i, x1, x2, 1.0 if x1 > 0.5 else 0.0))
    return spark.createDataFrame(rows, ["id", "x1", "x2", "y"])


class TestLogreg:
    def test_learns_discriminative_feature(self, spark):
        df = _separable(spark)
        w = ml.logreg_fit(
            df, [F.col("x1"), F.col("x2")], F.col("y"), iterations=30, lr=0.5
        )
        assert w[1] > 1.0          # strong positive weight on x1
        assert abs(w[2]) < w[1]    # noise feature stays smaller

    def test_scores_separate_classes(self, spark):
        df = _separable(spark)
        w = ml.logreg_fit(
            df, [F.col("x1"), F.col("x2")], F.col("y"), iterations=30, lr=0.5
        )
        scored = df.select(
            "y", ml.logreg_score(df, w, [F.col("x1"), F.col("x2")]).alias("p")
        )
        means = {
            r["y"]: r["m"]
            for r in scored.groupBy("y").agg(F.avg("p").alias("m")).collect()
        }
        assert means[1.0] > means[0.0] + 0.1

    def test_zero_iterations_zero_weights(self, spark):
        df = _separable(spark)
        w = ml.logreg_fit(df, [F.col("x1")], F.col("y"), iterations=0)
        assert w == [0.0, 0.0]

    def test_weights_frame_shape(self, spark):
        wf = ml.weights_frame(spark, [0.1, -0.2], ["f1"])
        rows = {r.feature: r.weight for r in wf.collect()}
        assert rows == {"intercept": 0.1, "f1": -0.2}

    def test_oracle_sql_matches_duckdb_runs(self):
        # the generated SQL must at least be executable DuckDB
        import duckdb

        sql = ml.logreg_oracle_sql(
            ["CAST(a AS DOUBLE)"], "CAST(b AS DOUBLE)", "t", iterations=2
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT 0.1*range AS a, range % 2 AS b FROM range(20)")
        out = con.execute(sql).fetchall()
        assert len(out) == 2  # intercept + 1 feature

    def test_l2_shrinks_weights(self, spark):
        df = _separable(spark)
        w_plain = ml.logreg_fit(
            df, [F.col("x1")], F.col("y"), iterations=20, lr=0.5
        )
        w_reg = ml.logreg_fit(
            df, [F.col("x1")], F.col("y"), iterations=20, lr=0.5, l2=0.5
        )
        assert abs(w_reg[1]) < abs(w_plain[1])

    def test_l2_oracle_parity_duckdb(self, spark):
        import duckdb

        rows = [(i, (i % 10) / 10.0, 1.0 if i % 3 == 0 else 0.0) for i in range(30)]
        df = spark.createDataFrame(rows, ["id", "a", "y"])
        w = ml.logreg_fit(
            df, [F.col("a")], F.col("y"), iterations=3, lr=0.25, l2=0.25
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT (range % 10)/10.0 AS a,"
            " CASE WHEN range % 3 = 0 THEN 1.0 ELSE 0.0 END AS y"
            " FROM range(30)"
        )
        sql = ml.logreg_oracle_sql(
            ["CAST(a AS DOUBLE)"], "CAST(y AS DOUBLE)", "t",
            iterations=3, lr=0.25, l2=0.25,
        )
        got = dict(con.execute(sql).fetchall())
        assert got["intercept"] == w[0]  # bit-for-bit
        assert got["x1"] == w[1]


class TestCalibrationBins:
    def test_hand_computed_bins(self, spark):
        from etl_tools_rs_spark.operators.ml import calibration_bins

        # bin 1 ([0.2,0.4) at 5 bins): scores .25/.35, 1 positive of 2
        # bin 4 ([0.8,1.0]): scores .85/.95/1.0, 3 positives of 3
        rows = [
            (0, 0.25), (1, 0.35),
            (1, 0.85), (1, 0.95), (1, 1.0),
        ]
        df = spark.createDataFrame(rows, "y int, s double")
        out = calibration_bins(
            df, F.col("y"), F.col("s"), n_bins=5
        ).collect()
        got = {r["bin"]: r for r in out}
        assert set(got) == {1, 4}
        b1 = got[1]
        assert b1["n"] == 2 and b1["frac_pos"] == 0.5
        assert b1["mean_score"] == 0.3
        # (2/5) * |0.5 - 0.3| = 0.08
        assert b1["ece_term"] == 0.08
        b4 = got[4]  # score 1.0 clamps into the top bin
        assert b4["n"] == 3 and b4["frac_pos"] == 1.0
        assert round(b4["ece_term"], 6) == round(3 / 5 * abs(1.0 - (0.85 + 0.95 + 1.0) / 3), 6)

    def test_perfectly_calibrated_scores(self, spark):
        from etl_tools_rs_spark.operators.ml import calibration_bins

        # within each bin the positive rate equals the mean score
        rows = []
        for _ in range(10):
            rows += [(1, 0.8), (1, 0.8), (1, 0.8), (1, 0.8), (0, 0.8)]
            rows += [(0, 0.2), (0, 0.2), (0, 0.2), (0, 0.2), (1, 0.2)]
        df = spark.createDataFrame(rows, "y int, s double")
        out = calibration_bins(df, F.col("y"), F.col("s"), n_bins=5)
        assert sum(r["ece_term"] for r in out.collect()) == 0.0

    def test_out_of_range_scores_clamp(self, spark):
        from etl_tools_rs_spark.operators.ml import calibration_bins

        df = spark.createDataFrame(
            [(1, 1.0), (0, 0.0)], "y int, s double"
        )
        bins = {r["bin"] for r in calibration_bins(
            df, F.col("y"), F.col("s"), n_bins=10
        ).collect()}
        assert bins == {0, 9}


class TestNaiveBayes:
    """Multinomial NB (r7): hand-checkable corpus + the lm.py
    determinism contracts (zero-token drop, decimal-exact tie-break)."""

    def _corpus(self, spark):
        rows = [
            (0, "spark table join join", "tech"),
            (1, "join shuffle spark", "tech"),
            (2, "bread butter jam", "food"),
            (3, "butter bread bread", "food"),
            (4, "spark join bread", "tech"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    def test_predicts_dominant_class_tokens(self, spark):
        df = self._corpus(spark)
        model = ml.nb_fit(df, "text", "lang", alpha=0.5)
        pred = {
            r.doc_id: r.pred_label
            for r in ml.nb_predict(df, model, "text", "doc_id").collect()
        }
        assert pred[0] == "tech" and pred[1] == "tech"
        assert pred[2] == "food" and pred[3] == "food"

    def test_margin_positive_and_scores_negative(self, spark):
        df = self._corpus(spark)
        model = ml.nb_fit(df, "text", "lang", alpha=0.5)
        for r in ml.nb_predict(df, model, "text", "doc_id").collect():
            assert r.margin >= 0.0
            assert r.score < 0.0  # log-posteriors
            assert r.n_tokens >= 3

    def test_zero_token_docs_dropped(self, spark):
        df = self._corpus(spark).union(
            spark.createDataFrame([(9, "!!! ???", "tech")], ["doc_id", "text", "lang"])
        )
        model = ml.nb_fit(df, "text", "lang")
        out = ml.nb_predict(df, model, "text", "doc_id")
        assert out.filter(F.col("doc_id") == 9).count() == 0
        assert out.count() == 5

    def test_hand_computed_two_docs(self, spark):
        import math

        df = spark.createDataFrame(
            [(0, "a a b", "x"), (1, "b c", "y")],
            ["doc_id", "text", "lang"],
        )
        model = ml.nb_fit(df, "text", "lang", alpha=0.5)
        got = {
            (r.doc_id, r.label): float(r.score_dec)
            for r in ml.nb_score(df, model, "text", "doc_id").collect()
        }
        # vocab = {a,b,c} (v=3); x: counts a=2,b=1 t=3; y: b=1,c=1 t=2
        def lp(c, t):
            return round(math.log((c + 0.5) / (t + 0.5 * 3)), 6)

        prior = round(math.log(1 / 2), 6)
        exp_doc0_x = prior + lp(2, 3) + lp(2, 3) + lp(1, 3)
        assert abs(got[(0, "x")] - exp_doc0_x) < 1e-9

    def test_oracle_parity_duckdb(self, spark):
        import duckdb

        df = self._corpus(spark)
        model = ml.nb_fit(df, "text", "lang", alpha=0.5)
        spark_rows = sorted(
            (r.doc_id, r.pred_label, r.score, r.margin, r.n_tokens)
            for r in ml.nb_predict(df, model, "text", "doc_id").collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR)"
        )
        con.executemany(
            "INSERT INTO documents VALUES (?,?,?)",
            [(r.doc_id, r.text, r.lang) for r in df.collect()],
        )
        duck_rows = sorted(
            tuple(r)
            for r in con.execute(ml.nb_self_predict_oracle_sql()).fetchall()
        )
        assert spark_rows == duck_rows
