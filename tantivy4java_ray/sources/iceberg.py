"""Iceberg source — STUB.

The reference reads Iceberg tables (``iceberg/IcebergTableReader.java``:
manifests, snapshots, live file scan). Iceberg's manifest lists and
manifest files are Avro; this environment has no Avro reader, so only the
table-metadata JSON (snapshot inventory) is parsed here, and data-file
listing raises with that explanation. Swap in ``pyiceberg`` on a cluster
that has it.
"""

from __future__ import annotations

import glob
import json
import os


def read_table_metadata(table_path: str) -> dict:
    """Latest ``metadata/v*.metadata.json`` — schema, snapshots, specs."""
    metas = sorted(glob.glob(os.path.join(table_path, "metadata",
                                          "*.metadata.json")))
    if not metas:
        raise FileNotFoundError(f"no iceberg metadata under {table_path}")
    with open(metas[-1]) as f:
        return json.load(f)


def iceberg_snapshots(table_path: str) -> list[dict]:
    return read_table_metadata(table_path).get("snapshots", [])


def iceberg_live_files(table_path: str) -> list[str]:
    raise NotImplementedError(
        "Iceberg data-file listing requires reading Avro manifest files; "
        "no Avro reader is available in this environment. Use pyiceberg "
        "(table.scan().plan_files()) where installed, then pass the paths "
        "to build_index().")
