"""SimpleStore — whole-document JSON load/write (driver-side state I/O).

Reference parity: ``SimpleStore<T>`` trait with LocalFs/S3/Mock impls —
``load(path) -> T`` / ``write(path, T)`` for job-state documents
(reference: etl-core/src/datastore/simple.rs:7-19, fs.rs:74-130,
s3_datastore.rs:195-246, mock.rs:144-205).

This is deliberately NOT a Spark job: job state is a single small JSON
document read/written by the driver. Local paths use the stdlib; an
in-memory impl backs tests (Mock parity).
"""

from __future__ import annotations

import json
import os
from typing import Any


class SimpleStore:
    """Local-filesystem JSON document store."""

    def __init__(self, home: str):
        self.home = home
        os.makedirs(home, exist_ok=True)

    def _p(self, key: str) -> str:
        return os.path.join(self.home, key)

    def load(self, key: str) -> Any:
        with open(self._p(key), encoding="utf-8") as f:
            return json.load(f)

    def write(self, key: str, doc: Any) -> None:
        tmp = self._p(key) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(doc, f, indent=2, default=str)
        os.replace(tmp, self._p(key))  # atomic state update

    def exists(self, key: str) -> bool:
        return os.path.exists(self._p(key))

    def delete(self, key: str) -> None:
        if self.exists(key):
            os.remove(self._p(key))


class MemoryStore(SimpleStore):
    """In-memory SimpleStore (reference Mock parity) for tests."""

    def __init__(self):  # noqa: D107 — no home dir
        self.docs: dict[str, Any] = {}

    def load(self, key: str) -> Any:
        return json.loads(json.dumps(self.docs[key], default=str))

    def write(self, key: str, doc: Any) -> None:
        self.docs[key] = json.loads(json.dumps(doc, default=str))

    def exists(self, key: str) -> bool:
        return key in self.docs

    def delete(self, key: str) -> None:
        self.docs.pop(key, None)
