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


def sftp_connect(
    url: str,
    username: str,
    password: str | None = None,
    key_comment: str | None = None,
    transport_factory=None,
):
    """SFTP session with the reference's auth arms (ssh_connect,
    etl-sftp/src/lib.rs:28-65): username+password, or an ssh-agent key
    selected by its comment substring (the reference's
    ``Credentials::SshKeyPath`` matches ``i.comment().contains(path)``
    and expects ``ssh-add`` to have loaded the key).

    ``transport_factory(host, port)`` must return an object with
    paramiko's ``Transport`` shape (``connect(username=, password=|pkey=)``,
    ``open_sftp()`` and an ``agent_keys()`` iterable for the key arm) —
    injectable for tests; built from paramiko (import-gated — not in
    this container) when omitted. Returns the SFTP client.
    """
    bare = url.split("://", 1)[-1]  # accept "host", "host:22", "sftp://host:22"
    host, _, port_s = bare.partition(":")
    port = int(port_s) if port_s else 22
    if transport_factory is None:  # pragma: no cover - needs paramiko
        try:
            import paramiko
        except ImportError as e:
            raise NotImplementedError(
                "SFTP requires paramiko (not available in this environment); "
                "stage files to a shared filesystem or object store instead"
            ) from e

        def transport_factory(h, p):
            t = paramiko.Transport((h, p))
            t.agent_keys = lambda: paramiko.Agent().get_keys()
            return t

    transport = transport_factory(host, port)
    if password is not None:
        transport.connect(username=username, password=password)
    else:
        # agent-key arm: pick the loaded identity whose comment contains
        # key_comment (reference lib.rs:44-58 — "try using ssh-add")
        keys = list(transport.agent_keys())
        wanted = key_comment or ""
        key = next(
            (k for k in keys if wanted in getattr(k, "comment", "")), None
        )
        if key is None:
            raise ValueError(
                f"no agent identity matching {wanted!r}; try using ssh-add"
            )
        transport.connect(username=username, pkey=key)
    return transport.open_sftp()
