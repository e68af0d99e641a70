"""Schema conformance (operators/schema.py)."""

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_tools_rs_spark.operators import schema as sc


TARGET = StructType(
    [
        StructField("order_id", LongType(), False),
        StructField("customer_name", StringType(), True),
        StructField("total_price", DoubleType(), True),
        StructField("note", StringType(), True),
    ]
)


@pytest.fixture(scope="module")
def camel_df(spark):
    return spark.createDataFrame(
        [(1, "alice", "12.50", "x")],
        "orderId int, customerName string, totalPrice string, extraCol string",
    )


def test_camel_case_fold_cast_fill_drop(spark, camel_df):
    out, rep = sc.conform_schema(camel_df, TARGET)
    assert out.columns == ["order_id", "customer_name", "total_price", "note"]
    row = out.collect()[0]
    assert row["order_id"] == 1 and row["total_price"] == 12.5
    assert row["note"] is None
    assert rep.renamed == {
        "orderId": "order_id",
        "customerName": "customer_name",
        "totalPrice": "total_price",
    }
    assert rep.cast["order_id"] == ("int", "bigint")
    assert rep.cast["total_price"] == ("string", "double")
    assert rep.filled == ["note"]
    assert rep.dropped == ["extraCol"]
    assert rep.missing_required == []


def test_explicit_rename_wins(spark):
    df = spark.createDataFrame([(1, 2)], "a int, order_id int")
    tgt = StructType([StructField("order_id", LongType(), False)])
    out, rep = sc.conform_schema(df, tgt, rename={"order_id": "a"})
    assert out.collect()[0]["order_id"] == 1
    assert rep.renamed == {"a": "order_id"}


def test_missing_required_raises_or_reports(spark):
    df = spark.createDataFrame([("x",)], "other string")
    tgt = StructType([StructField("order_id", LongType(), False)])
    with pytest.raises(ValueError, match="order_id"):
        sc.conform_schema(df, tgt)
    out, rep = sc.conform_schema(df, tgt, strict=False)
    assert rep.missing_required == ["order_id"]
    assert out.collect()[0]["order_id"] is None


def test_keep_extras_when_not_dropping(spark, camel_df):
    out, rep = sc.conform_schema(camel_df, TARGET, drop_extra=False)
    assert out.columns[-1] == "extraCol"
    assert rep.dropped == []


def test_conformed_shards_union_positionally(spark):
    a = spark.createDataFrame([(1, "x")], "orderId int, customerName string")
    b = spark.createDataFrame([("y", 2)], "customer_name string, ORDER_ID int")
    tgt = StructType(
        [
            StructField("order_id", LongType(), False),
            StructField("customer_name", StringType(), True),
        ]
    )
    ca, _ = sc.conform_schema(a, tgt)
    cb, _ = sc.conform_schema(b, tgt)
    rows = sorted((r["order_id"], r["customer_name"]) for r in ca.union(cb).collect())
    assert rows == [(1, "x"), (2, "y")]


def test_case_transform_helpers():
    assert sc.camel_to_snake("orderDateTime") == "order_date_time"
    assert sc.camel_to_snake("already_snake") == "already_snake"
    assert sc.snake_to_camel("order_date_time") == "orderDateTime"
