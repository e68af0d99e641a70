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
