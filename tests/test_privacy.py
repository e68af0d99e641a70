"""Privacy operators: k-anonymity / l-diversity audit and the
right-to-be-forgotten deletion cascade (operators/privacy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.privacy import (
    k_anonymity_audit,
    k_anonymity_summary,
    propagate_deletes,
)


def _people(spark):
    # (zip, age_band, diagnosis): one unique record, one homogeneous class
    rows = [
        ("94107", "30-39", "flu"),
        ("94107", "30-39", "cold"),
        ("94107", "30-39", "flu"),
        ("10001", "40-49", "flu"),   # k=1 → unique, re-identifiable
        ("60601", "20-29", "cold"),
        ("60601", "20-29", "cold"),  # l=1 → homogeneous
    ]
    return spark.createDataFrame(rows, ["zip", "age_band", "diagnosis"])


class TestKAnonymity:
    def test_audit_k_and_l(self, spark):
        audit = {
            (r["zip"], r["age_band"]): (r["k"], r["l"])
            for r in k_anonymity_audit(
                _people(spark), ["zip", "age_band"], "diagnosis"
            ).collect()
        }
        assert audit[("94107", "30-39")] == (3, 2)
        assert audit[("10001", "40-49")] == (1, 1)
        assert audit[("60601", "20-29")] == (2, 1)

    def test_audit_without_sensitive(self, spark):
        cols = k_anonymity_audit(_people(spark), ["zip"]).columns
        assert cols == ["zip", "k"]

    def test_summary_thresholds(self, spark):
        row = k_anonymity_summary(
            _people(spark),
            ["zip", "age_band"],
            k_min=2,
            sensitive_col="diagnosis",
            l_min=2,
        ).first()
        assert row["n_rows"] == 6 and row["n_classes"] == 3
        assert row["min_k"] == 1 and row["classes_below_k"] == 1
        assert row["rows_below_k"] == 1
        assert row["min_l"] == 1 and row["classes_below_l"] == 2
        assert row["rows_below_l"] == 3  # the k=1 class + the l=1 pair
        assert row["at_risk_share"] == pytest.approx(1 / 6, abs=1e-6)

    def test_requires_quasi_cols_and_l_min(self, spark):
        with pytest.raises(ValueError):
            k_anonymity_audit(_people(spark), [])
        with pytest.raises(ValueError):
            k_anonymity_summary(
                _people(spark), ["zip"], k_min=2, sensitive_col="diagnosis"
            )


def _three_tables(spark):
    cust = spark.createDataFrame(
        [(1, "keep"), (2, "erase"), (3, "keep")], ["cid", "tag"]
    )
    orders = spark.createDataFrame(
        [(10, 1), (20, 2), (21, 2), (30, 3)], ["oid", "cid"]
    )
    items = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 1), (21, 1), (21, 2), (30, 1)],
        ["oid", "line"],
    )
    return {"customer": cust, "orders": orders, "lineitem": items}


class TestPropagateDeletes:
    def test_chain_cascade(self, spark):
        t = _three_tables(spark)
        seed = t["customer"].filter(F.col("tag") == "erase").select("cid")
        out = propagate_deletes(
            tables=t,
            keys={"customer": "cid", "orders": "oid", "lineitem": "oid"},
            seed_table="customer",
            seed_keys=seed,
            edges=[("orders", "cid", "customer"), ("lineitem", "oid", "orders")],
        )
        rep = {r["table"]: (r["purged"], r["kept"]) for r in out.report.collect()}
        assert rep == {
            "customer": (1, 2),
            "orders": (2, 2),
            "lineitem": (3, 3),
        }
        assert {r["cid"] for r in out.survivors["customer"].collect()} == {1, 3}
        assert {r["oid"] for r in out.survivors["orders"].collect()} == {10, 30}
        # survivors keep their original schema
        assert out.survivors["lineitem"].columns == ["oid", "line"]

    def test_untouched_table_passes_through(self, spark):
        t = _three_tables(spark)
        t["region"] = spark.createDataFrame([(7, "x")], ["rid", "name"])
        seed = t["customer"].filter(F.col("cid") == 2).select("cid")
        out = propagate_deletes(
            tables=t,
            keys={
                "customer": "cid",
                "orders": "oid",
                "lineitem": "oid",
                "region": "rid",
            },
            seed_table="customer",
            seed_keys=seed,
            edges=[("orders", "cid", "customer")],
        )
        rep = {r["table"]: (r["purged"], r["kept"]) for r in out.report.collect()}
        assert rep["region"] == (0, 1)
        assert rep["lineitem"] == (0, 6)

    def test_edge_list_order_is_irrelevant(self, spark):
        # edges are topologically re-ordered, so child-first input
        # gives the same cascade as parent-first
        t = _three_tables(spark)
        seed = t["customer"].filter(F.col("tag") == "erase").select("cid")
        out = propagate_deletes(
            tables=t,
            keys={"customer": "cid", "orders": "oid", "lineitem": "oid"},
            seed_table="customer",
            seed_keys=seed,
            edges=[
                ("lineitem", "oid", "orders"),
                ("orders", "cid", "customer"),
            ],
        )
        rep = {r["table"]: (r["purged"], r["kept"]) for r in out.report.collect()}
        assert rep == {
            "customer": (1, 2),
            "orders": (2, 2),
            "lineitem": (3, 3),
        }

    def test_diamond_graph_fully_deletes(self, spark):
        # A→B, A→C, B→D, C→D given in an order that used to consume
        # D's set before the C→D edge enlarged it (silent under-delete)
        a = spark.createDataFrame([(1,), (2,)], ["aid"])
        b = spark.createDataFrame([(10, 1), (20, 2)], ["bid", "aid"])
        c = spark.createDataFrame([(100, 1), (200, 2)], ["cid", "aid"])
        d = spark.createDataFrame(
            [(7, 10, None), (8, None, 200), (9, 20, 100)],
            "did int, bid int, cid int",
        )
        out = propagate_deletes(
            tables={"a": a, "b": b, "c": c, "d": d},
            keys={"a": "aid", "b": "bid", "c": "cid", "d": "did"},
            seed_table="a",
            seed_keys=spark.createDataFrame([(2,)], ["aid"]),
            edges=[
                ("b", "aid", "a"),
                ("d", "bid", "b"),  # consumes B's set...
                ("c", "aid", "a"),
                ("d", "cid", "c"),  # ...then C's edge must STILL apply
            ],
        )
        # erasing aid=2 dooms bid=20, cid=200 → d rows 8 (via c) AND 9 (via b)
        assert {r["did"] for r in out.survivors["d"].collect()} == {7}

    def test_cyclic_graph_rejected(self, spark):
        a = spark.createDataFrame([(1, 10)], ["aid", "bid"])
        b = spark.createDataFrame([(10, 1)], ["bid", "aid"])
        with pytest.raises(ValueError, match="cyclic"):
            propagate_deletes(
                tables={"a": a, "b": b},
                keys={"a": "aid", "b": "bid"},
                seed_table="a",
                seed_keys=a.select("aid").limit(1),
                edges=[("b", "aid", "a"), ("a", "bid", "b")],
            )

    def test_unreachable_parent_rejected(self, spark):
        t = _three_tables(spark)
        t["island"] = spark.createDataFrame([(5,)], ["iid"])
        seed = t["customer"].limit(1).select("cid")
        with pytest.raises(ValueError, match="no FK path"):
            propagate_deletes(
                tables=t,
                keys={
                    "customer": "cid",
                    "orders": "oid",
                    "lineitem": "oid",
                    "island": "iid",
                },
                seed_table="customer",
                seed_keys=seed,
                edges=[("orders", "iid", "island")],
            )

    def test_broadcast_joins_pinned(self, spark):
        """The cascade's fact-table joins must be broadcast, never a
        shuffled sort-merge — the whole point at 100 TB."""
        from etl_tools_rs_spark.plans.inspect import plan_report

        t = _three_tables(spark)
        seed = t["customer"].filter(F.col("cid") == 2).select("cid")
        out = propagate_deletes(
            tables=t,
            keys={"customer": "cid", "orders": "oid", "lineitem": "oid"},
            seed_table="customer",
            seed_keys=seed,
            edges=[("orders", "cid", "customer"), ("lineitem", "oid", "orders")],
        )
        rep = plan_report(out.survivors["lineitem"])
        assert "SortMergeJoin" not in rep.text, rep.text
