"""Minimal Delta Lake table reader (file listing + schema + snapshots).

The reference reads Delta tables to list live parquet files / schema /
snapshot versions (``delta/DeltaTableReader.java:63-347``,
``native/src/delta_reader/distributed.rs``). This is the same capability
implemented directly over the public Delta transaction-log format
(``_delta_log/NNNNNNNNNNNNNNNNNNNN.json`` lines of add/remove/metaData
actions + optional ``*.checkpoint.parquet``) — no delta-rs dependency.

``build_index(delta_live_files(table), ...)`` indexes a Delta table.
Iceberg is implemented alongside: ``sources/iceberg.py`` lists live
data files through the pure-Python Avro container reader in
``sources/avro.py``.
"""

from __future__ import annotations

import glob
import json
import os
import re
from dataclasses import dataclass, field

#: exactly '<20 digits>.json' — log-compaction files (N.M.compacted.json)
#: and v2 JSON checkpoints (N.checkpoint.<uuid>.json) must NOT replay as
#: commit files (their actions would apply at the wrong position)
_COMMIT_RE = re.compile(r"^\d{20}\.json$")

#: reader features this minimal reader actually implements; anything
#: else must be REJECTED, not silently mis-read (deletion vectors would
#: resurrect deleted rows, column mapping would mismatch every column)
_SUPPORTED_READER_FEATURES = {"timestampNtz"}
_MAX_READER_VERSION = 1


def _check_protocol(proto: dict) -> None:
    """The Delta spec REQUIRES readers to fail on unsupported reader
    versions/features — silently dropping e.g. deletion vectors would
    index rows that were deleted."""
    mrv = int(proto.get("minReaderVersion", 1))
    feats = set(proto.get("readerFeatures") or [])
    unsupported = feats - _SUPPORTED_READER_FEATURES
    if mrv > _MAX_READER_VERSION and not (mrv == 3 and not unsupported):
        raise ValueError(
            f"Delta table requires minReaderVersion={mrv} "
            f"(readerFeatures={sorted(feats)}); this reader supports "
            f"version {_MAX_READER_VERSION} plus features "
            f"{sorted(_SUPPORTED_READER_FEATURES)}")


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
        if _COMMIT_RE.fullmatch(os.path.basename(p)):
            out.append((int(os.path.basename(p).split(".")[0]), p))
    return sorted(out)


def _checkpoints(table_path: str) -> dict[int, list[str]]:
    """version -> its checkpoint parquet part files (sorted).

    Handles both single-part ``NNN.checkpoint.parquet`` and multi-part
    ``NNN.checkpoint.MMM.PPP.parquet`` names (the Delta protocol's
    classic checkpoint forms)."""
    out: dict[int, list[str]] = {}
    for p in glob.glob(os.path.join(table_path, "_delta_log",
                                    "*.checkpoint*.parquet")):
        parts = os.path.basename(p).split(".")
        if parts[0].isdigit() and "checkpoint" in parts:
            out.setdefault(int(parts[0]), []).append(p)
    for v in out:
        out[v].sort()
    return out


def _last_checkpoint_hint(table_path: str) -> int | None:
    """Parse ``_delta_log/_last_checkpoint`` (version + parts hint)."""
    p = os.path.join(table_path, "_delta_log", "_last_checkpoint")
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return int(json.load(f).get("version"))
    except (json.JSONDecodeError, TypeError, ValueError):
        return None


def read_delta_snapshot(table_path: str,
                        version: int | None = None) -> DeltaSnapshot:
    """Replay the Delta log up to ``version`` (default: latest)."""
    entries = _log_entries(table_path)
    cps = _checkpoints(table_path)
    if not entries and not cps:
        raise FileNotFoundError(f"no _delta_log under {table_path}")
    live: dict[str, dict] = {}
    schema = None
    metadata: dict = {}
    last_v = -1
    usable = [v for v in cps if version is None or v <= version]
    hint = _last_checkpoint_hint(table_path)
    if hint in cps and (version is None or hint <= version):
        cp_v = hint
    else:
        cp_v = max(usable) if usable else None
    if cp_v is not None:
        import pyarrow.parquet as pq
        # multi-part names carry PPP (total parts): a missing part would
        # silently drop every add it held from the snapshot
        m = re.match(r"^\d+\.checkpoint\.\d+\.(\d+)\.parquet$",
                     os.path.basename(cps[cp_v][0]))
        if m and len(cps[cp_v]) != int(m.group(1)):
            raise ValueError(
                f"Delta checkpoint v{cp_v}: found {len(cps[cp_v])} of "
                f"{int(m.group(1))} part files — refusing a partial "
                f"snapshot")
        for part in cps[cp_v]:
            names = set(pq.ParquetFile(part).schema_arrow.names)
            want = [c for c in ("add", "remove", "metaData", "protocol")
                    if c in names]
            # prune to the action columns: checkpoints are dominated by
            # per-file stats we never use
            t = pq.read_table(part, columns=want)
            for row in t.to_pylist():
                if row.get("protocol"):
                    _check_protocol(row["protocol"])
                if row.get("add"):
                    live[row["add"]["path"]] = row["add"]
                # compacted logs carry unexpired remove tombstones in the
                # checkpoint — a later part/row may tombstone an earlier add
                if row.get("remove"):
                    live.pop(row["remove"]["path"], None)
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
                if "protocol" in action:
                    _check_protocol(action["protocol"])
                elif "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    metadata = action["metaData"]
    if version is not None and last_v != version:
        # Either log retention pruned the commits at/below the requested
        # version (last_v == -1 or only a newer checkpoint existed), or
        # the version was never written. Silently returning an older or
        # empty snapshot would time-travel to the wrong data.
        raise ValueError(
            f"Delta version {version} is not reconstructable from the log "
            f"at {table_path!r}: reachable version is {last_v} "
            f"(requested commits pruned by retention, or never written)")
    if metadata.get("schemaString"):
        schema = json.loads(metadata["schemaString"])
    # Delta spec: add/remove paths are URL-ENCODED relative paths, or
    # absolute URIs (shallow clones / external files). Tombstone keys in
    # `live` stay encoded — adds and removes for the same file use the
    # same encoded form — but the returned paths must be decoded and
    # absolute URIs must pass through, not be table-joined.
    from urllib.parse import unquote

    def _resolve(f: str) -> str:
        d = unquote(f)
        if "://" in d or d.startswith("/"):
            return d
        return os.path.join(table_path, d)

    files = sorted(_resolve(f) for f in live)
    return DeltaSnapshot(last_v, files, schema, metadata)


def delta_live_files(table_path: str, version: int | None = None) -> list[str]:
    """Live parquet paths — feed straight into ``build_index`` /
    ``ray.data.read_parquet``."""
    return read_delta_snapshot(table_path, version).files


def delta_versions(table_path: str) -> list[int]:
    return [v for v, _ in _log_entries(table_path)]
