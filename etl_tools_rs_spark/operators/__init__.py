"""Operators — transforms, joins, batching, topology, and the extension
operators (dedup / similarity / text analysis / multimodal)."""

from etl_tools_rs_spark.operators.transform import (  # noqa: F401
    apply_foreach,
    flat_transform,
    transform,
)
from etl_tools_rs_spark.operators.join import asof_join, join, left_join  # noqa: F401
from etl_tools_rs_spark.operators.batch import batch_by_count, batch_by_predicate  # noqa: F401
from etl_tools_rs_spark.operators.split import fan_out  # noqa: F401
from etl_tools_rs_spark.operators.skew import salted_agg, salted_join  # noqa: F401
