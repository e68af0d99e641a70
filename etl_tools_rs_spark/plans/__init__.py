"""Plan inspection utilities — the engine's scale-review feedback loop."""

from etl_tools_rs_spark.plans.inspect import plan_report  # noqa: F401
