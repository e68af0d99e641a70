"""Orchestration layer — idempotent, resumable, error-tolerant multi-step
pipelines around Spark actions (the reference's core value-add, SURVEY §2.6)."""

from etl_tools_rs_spark.jobs.state import JobState, StepStatus  # noqa: F401
from etl_tools_rs_spark.jobs.runner import JobRunner, TooManyErrors, JobStepError  # noqa: F401
from etl_tools_rs_spark.jobs.manager import JobManager  # noqa: F401
