"""Minimal Delta Lake table reader (file listing + schema + snapshots).

The reference reads Delta tables to list live parquet files / schema /
snapshot versions (``delta/DeltaTableReader.java:63-347``,
``native/src/delta_reader/distributed.rs``). This is the same capability
implemented directly over the public Delta transaction-log format
(``_delta_log/NNNNNNNNNNNNNNNNNNNN.json`` lines of add/remove/metaData
actions + optional ``*.checkpoint.parquet``) — no delta-rs dependency.

``build_index(delta_live_files(table), ...)`` indexes a Delta table.
Iceberg is NOT implemented: its manifests are Avro and no Avro reader
exists in this environment (``sources/iceberg.py`` raises with that
explanation).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field


@dataclass
class DeltaSnapshot:
    version: int
    files: list[str]                 # live data file paths (absolute)
    schema: dict | None = None       # Delta schemaString (parsed)
    metadata: dict = field(default_factory=dict)


def _log_entries(table_path: str) -> list[tuple[int, str]]:
    logdir = os.path.join(table_path, "_delta_log")
    out = []
    for p in glob.glob(os.path.join(logdir, "*.json")):
        name = os.path.basename(p).split(".")[0]
        if name.isdigit():
            out.append((int(name), p))
    return sorted(out)


def read_delta_snapshot(table_path: str,
                        version: int | None = None) -> DeltaSnapshot:
    """Replay the Delta log up to ``version`` (default: latest)."""
    entries = _log_entries(table_path)
    if not entries:
        raise FileNotFoundError(f"no _delta_log under {table_path}")
    live: dict[str, dict] = {}
    schema = None
    metadata: dict = {}
    last_v = -1
    cp_files = sorted(glob.glob(os.path.join(
        table_path, "_delta_log", "*.checkpoint.parquet")))
    if cp_files:
        import pyarrow.parquet as pq
        cp_v = max(int(os.path.basename(p).split(".")[0]) for p in cp_files)
        if version is None or cp_v <= version:
            t = pq.read_table(cp_files[-1])
            for row in t.to_pylist():
                if row.get("add"):
                    live[row["add"]["path"]] = row["add"]
                if row.get("metaData"):
                    metadata = row["metaData"]
            last_v = cp_v
    for v, p in entries:
        if v <= last_v:
            continue
        if version is not None and v > version:
            break
        last_v = v
        with open(p) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    metadata = action["metaData"]
    if metadata.get("schemaString"):
        schema = json.loads(metadata["schemaString"])
    files = sorted(os.path.join(table_path, f) for f in live)
    return DeltaSnapshot(last_v, files, schema, metadata)


def delta_live_files(table_path: str, version: int | None = None) -> list[str]:
    """Live parquet paths — feed straight into ``build_index`` /
    ``ray.data.read_parquet``."""
    return read_delta_snapshot(table_path, version).files


def delta_versions(table_path: str) -> list[int]:
    return [v for v, _ in _log_entries(table_path)]
