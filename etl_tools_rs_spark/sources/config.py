"""Driver-side config loading.

Reference parity:
- ``load_toml`` with autocreate-default: if the file is missing, write the
  default config and exit-with-instructions (etl-core/src/datastore/fs.rs:151-181);
- SFTP connection helper (etl-sftp/src/lib.rs:28-65) — import-gated: no ssh
  library ships in this container; at scale an SFTP fetch is a pre-stage
  that lands files where a distributed scan can read them.
"""

from __future__ import annotations

import os
import tomllib
from typing import Any


class ConfigAutocreated(Exception):
    """Raised when a missing config file was created from the default —
    the caller should review it and re-run (reference fs.rs:163-172
    behavior: write default, return an instructive error)."""


def load_toml(path: str, default: str | None = None) -> dict[str, Any]:
    """Parse a TOML config; when missing and ``default`` is given, write
    the default and raise ConfigAutocreated (reference parity)."""
    if not os.path.exists(path):
        if default is None:
            raise FileNotFoundError(path)
        with open(path, "w", encoding="utf-8") as f:
            f.write(default)
        raise ConfigAutocreated(
            f"{path} did not exist; a default was created — review it and re-run"
        )
    with open(path, "rb") as f:
        return tomllib.load(f)


def sftp_connect(url: str, username: str, password: str | None = None):
    """SFTP session (reference ssh_connect, etl-sftp/src/lib.rs:28-65).
    Import-gated: paramiko is not available in this container."""
    try:
        import paramiko  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "SFTP requires paramiko (not available in this environment); "
            "stage files to a shared filesystem or object store instead"
        ) from e
    raise NotImplementedError("wire paramiko transport here in a deployed environment")
