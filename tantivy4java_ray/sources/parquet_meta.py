"""Parquet footer planning: deterministic build partitions + docID bases.

The reference's parquet-companion mode keeps hidden fast fields
``__pq_file_hash`` / ``__pq_row_in_file`` for O(1) doc->parquet-row
resolution (``native/src/parquet_companion/indexing.rs:39-55``). We get the
same property structurally: build partitions are *contiguous row-group
ranges of one file* in sorted-path order, and ``doc_id = doc_base +
row_within_partition`` — a global prefix sum over footer row counts. DocIDs
are therefore deterministic under retry/resume (pinned ``(file, row_group,
row)`` order, never Ray block order).

Only footers are read here (driver side, cheap): schema + per-row-group row
counts, like the reference's ``ParquetSchemaReader``.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq


@dataclass
class PartitionSpec:
    pid: int
    path: str
    row_groups: list[int]
    doc_base: int
    num_docs: int

    def to_row(self) -> dict:
        return {"pid": self.pid, "path": self.path,
                "row_groups": list(self.row_groups),
                "doc_base": self.doc_base, "num_docs": self.num_docs}


@dataclass
class BuildPlan:
    partitions: list[PartitionSpec]
    num_docs: int
    files: list[str] = field(default_factory=list)


def expand_paths(paths: str | list[str]) -> list[str]:
    from tantivy4java_ray import storage as st
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if st.is_url(p):
            fs, fp = st.fs_for(p)
            proto = p.split("://", 1)[0]
            if any(ch in p for ch in "*?["):
                hits = fs.glob(fp)
            elif fs.isdir(fp):
                hits = fs.glob(fp.rstrip("/") + "/**/*.parquet")
            else:
                hits = [fp]
            # http(s)-style filesystems do NOT strip the scheme, so a
            # blind f"{proto}://{h}" would double-prefix those paths
            out.extend(h if "://" in h else f"{proto}://{h}"
                       for h in sorted(hits))
        elif os.path.isdir(p):
            out.extend(sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                        recursive=True)))
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(glob.glob(p)))
        else:
            out.append(p)
    # stable global order = deterministic doc ids
    return sorted(dict.fromkeys(out))


def plan_partitions(paths: str | list[str],
                    target_docs_per_partition: int = 100_000) -> BuildPlan:
    """Group row groups (within each file) into ~target-sized partitions."""
    files = expand_paths(paths)
    if not files:
        raise FileNotFoundError(f"no parquet files under {paths!r}")
    parts: list[PartitionSpec] = []
    base = 0
    pid = 0
    for path in files:
        from tantivy4java_ray.storage import read_parquet_metadata_any
        meta = read_parquet_metadata_any(path)
        cur_rgs: list[int] = []
        cur_rows = 0
        for rg in range(meta.num_row_groups):
            nrows = meta.row_group(rg).num_rows
            cur_rgs.append(rg)
            cur_rows += nrows
            if cur_rows >= target_docs_per_partition:
                parts.append(PartitionSpec(pid, path, cur_rgs, base, cur_rows))
                pid += 1
                base += cur_rows
                cur_rgs, cur_rows = [], 0
        if cur_rgs:
            parts.append(PartitionSpec(pid, path, cur_rgs, base, cur_rows))
            pid += 1
            base += cur_rows
    return BuildPlan(parts, base, files)
