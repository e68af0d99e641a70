"""etl_tools_rs_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference `ytitov/etl-tools-rs` (a Rust/tokio streaming ETL orchestration
framework), re-expressed Spark-first:

- Layer A (data surface): sources/sinks/transforms/joins as thin, idiomatic
  DataFrame wrappers (Catalyst optimizes; we don't hand-schedule).
- Layer B (orchestration): a pure-Python JobRunner/JobState state machine
  (idempotent steps, resume, error budgets) — the reference's core value-add
  (reference: etl-job/src/job.rs, etl-job/src/job/state.rs).
- Extensions: large-scale training-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) built on
  DataFrame/SQL and designed for 100 TB scale.
"""

__version__ = "0.1.0"

from etl_tools_rs_spark.session import get_spark  # noqa: F401
