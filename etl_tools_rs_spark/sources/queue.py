"""Queue clients: push/pop with post-consume ack.

Reference parity:
- ``QueueClient`` trait — pop/push/pop_result with a oneshot ack after the
  consumer processes each message (etl-core/src/queue/mod.rs:9-31);
- file-based queue — a record pushed as ``{hash}.push.json`` on the local
  fs (etl-core/src/datastore/fs.rs:133-148) or held in a mock vector
  (etl-core/src/datastore/mock.rs:208-253);
- ``AwsSqsClient::push`` — JSON to an SQS FIFO queue with dedup id =
  md5(payload) (etl-aws-utils/src/sqs_queue.rs:27-58).

Spark-first: unbounded queue consumption is Structured Streaming (the
file queue IS a streaming source directory — ``file_stream`` tails it, the
checkpoint commit is the ack, SURVEY §2.5 P4). The driver-side client here
covers the reference's imperative push/pop surface and feeds the streaming
path; SQS maps to the same contract with boto3 when available
(import-gated — not shipped in this container).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import Any


@dataclass
class FileQueue:
    """Directory-backed queue: one ``{md5(payload)}.push.json`` file per
    message (reference fs.rs:133-148 naming contract). Content-hash names
    give SQS-FIFO-style dedup: pushing the same payload twice is one
    message."""

    home: str

    def __post_init__(self) -> None:
        os.makedirs(self.home, exist_ok=True)

    def push(self, record: Any) -> str:
        payload = json.dumps(record, sort_keys=True, default=str)
        digest = hashlib.md5(payload.encode()).hexdigest()  # noqa: S324 — dedup id, not security
        name = f"{digest}.push.json"
        with open(os.path.join(self.home, name), "w", encoding="utf-8") as f:
            f.write(payload)
        return name

    def pop(self) -> tuple[str, Any] | None:
        """Oldest message or None; the message stays until ``ack`` (the
        reference acks via oneshot AFTER the consumer processes —
        at-least-once, not at-most-once)."""
        pending = sorted(
            (e for e in os.listdir(self.home) if e.endswith(".push.json")),
            key=lambda e: os.path.getmtime(os.path.join(self.home, e)),
        )
        if not pending:
            return None
        name = pending[0]
        with open(os.path.join(self.home, name), encoding="utf-8") as f:
            return name, json.load(f)

    def ack(self, name: str) -> None:
        path = os.path.join(self.home, name)
        if os.path.exists(path):
            os.remove(path)

    def pop_result(self) -> Any | None:
        """pop + immediate ack (the reference's pop_result convenience)."""
        got = self.pop()
        if got is None:
            return None
        name, record = got
        self.ack(name)
        return record

    def size(self) -> int:
        return sum(1 for e in os.listdir(self.home) if e.endswith(".push.json"))


def sqs_client(queue_url: str, region: str | None = None):
    """SQS-backed queue with the same contract (reference
    sqs_queue.rs:27-58: JSON payload, dedup id = md5). Import-gated: boto3
    is not in this container."""
    try:
        import boto3  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "SQS queue requires boto3 (not available in this environment); "
            "use FileQueue locally or the Kafka streaming source at scale"
        ) from e
    raise NotImplementedError("wire boto3 client here in a deployed environment")
