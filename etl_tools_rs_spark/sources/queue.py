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


class SqsQueue:
    """SQS push queue with the reference contract
    (etl-aws-utils/src/sqs_queue.rs:27-58): the payload is the record's
    JSON string; ``MessageDeduplicationId`` and ``MessageGroupId`` are
    BOTH hex(md5(payload)) — so a FIFO queue dedups identical payloads
    across retries, the same at-least-once-to-exactly-once trick
    FileQueue's ``{md5}.push.json`` naming plays locally.

    ``client`` is any object with boto3's
    ``send_message(QueueUrl=..., MessageBody=..., ...)`` shape —
    injectable for tests; built from boto3 (import-gated) when omitted.
    ``pop`` raises: the reference's pop arm is an explicit panic
    (sqs_queue.rs:29-31) — SQS is its egress-only queue; consumption
    happens via the streaming sources.
    """

    def __init__(
        self, queue_url: str, client=None, region: str | None = None
    ):
        self.queue_url = queue_url
        if client is None:  # pragma: no cover - needs boto3 + AWS
            try:
                import boto3
            except ImportError as e:
                raise NotImplementedError(
                    "SQS queue requires boto3 (not available in this "
                    "environment); use FileQueue locally or the Kafka "
                    "streaming source at scale"
                ) from e
            client = boto3.client("sqs", region_name=region or "us-east-1")
        self.client = client

    def push(self, record: dict) -> str:
        body = json.dumps(record, sort_keys=True)
        digest = hashlib.md5(body.encode("utf-8")).hexdigest()
        self.client.send_message(
            QueueUrl=self.queue_url,
            MessageBody=body,
            MessageDeduplicationId=digest,
            MessageGroupId=digest,
        )
        return digest

    def pop(self):
        raise NotImplementedError(
            "reference parity: AwsSqsClient::pop is an explicit panic "
            "(sqs_queue.rs:29-31); consume via streaming sources instead"
        )


def sqs_client(queue_url: str, region: str | None = None) -> SqsQueue:
    """Reference-parity constructor (sqs_queue.rs ``create``): boto3
    chain-provider client against the given queue URL."""
    return SqsQueue(queue_url, region=region)
