"""Iceberg source: table metadata, snapshots, and live data-file listing.

The reference reads Iceberg tables (``iceberg/IcebergTableReader.java``:
111-503 — manifests, snapshots, live file scan). Iceberg's manifest
lists and manifest files are Avro object container files; this module
reads them with the engine's own minimal Avro decoder
(``sources/avro.py``, pure Python + zlib — the environment has no Avro
library). Paths may be local or fsspec URLs.

Listing semantics: pick the snapshot (current by default), read its
manifest LIST (one row per manifest file), then each manifest's entries;
an entry is live when ``status != 2`` (2 = DELETED) and its content is
data (content 0; position/equality deletes are skipped — the engine
indexes data files only).
"""

from __future__ import annotations

import glob
import json
import os


def read_table_metadata(table_path: str) -> dict:
    """Latest ``metadata/v*.metadata.json`` — schema, snapshots, specs."""
    from tantivy4java_ray import storage as st
    if st.is_url(table_path):
        fs, p = st.fs_for(table_path)
        proto = table_path.split("://", 1)[0]
        metas = sorted(f"{proto}://{h}" for h in
                       fs.glob(p.rstrip("/") + "/metadata/*.metadata.json"))
    else:
        metas = sorted(glob.glob(os.path.join(table_path, "metadata",
                                              "*.metadata.json")))
    if not metas:
        raise FileNotFoundError(f"no iceberg metadata under {table_path}")

    # pick by NUMERIC version, not lexicographic order (v10 > v9; the
    # HadoopCatalog form is vN.metadata.json, the metastore form
    # NNNNN-<uuid>.metadata.json — both lead with the version number)
    def version_of(path: str) -> int:
        stem = os.path.basename(path).split(".metadata.json")[0]
        digits = stem.lstrip("v").split("-")[0]
        return int(digits) if digits.isdigit() else -1

    return st.read_json_any(max(metas, key=lambda m: (version_of(m), m)))


def iceberg_snapshots(table_path: str) -> list[dict]:
    return read_table_metadata(table_path).get("snapshots", [])


#: remap decision per (table_path, marker): a table copy is treated as
#: all-or-nothing, so ONE existence probe decides for every file under
#: the marker — per-file sexists would be one HEAD round-trip per data
#: file at plan time on object-store tables (100k files = 100k HEADs)
_REMAP_CACHE: dict[tuple[str, str], bool] = {}


def _localize(path: str, table_path: str,
              neg_memo: set | None = None) -> str:
    """Iceberg metadata stores absolute URIs from write time; remap the
    table-location prefix onto the path the CALLER gave — it is the
    authority. Preferring the old absolute path whenever it still exists
    would read stale (possibly vacuumed/rewritten) files on a host where
    the source directory survives; URL-form (s3://...) locations remap
    the same way when the caller points at a local copy."""
    from tantivy4java_ray import storage as st
    meta_loc = path
    for scheme in ("file://",):
        if meta_loc.startswith(scheme):
            meta_loc = meta_loc[len(scheme):]
    is_url = "://" in meta_loc
    if is_url or os.path.isabs(meta_loc):
        for marker in ("/metadata/", "/data/"):
            if marker in meta_loc:
                cand = st.sjoin(
                    table_path, meta_loc[meta_loc.index(marker) + 1:])
                # reading in place (the common case): candidate IS the
                # original location — no probe needed at all
                if cand == meta_loc or (
                        not is_url and "://" not in cand and
                        os.path.normpath(cand) ==
                        os.path.normpath(meta_loc)):
                    return meta_loc
                # sexists, not os.path.exists: when the CALLER's path is
                # an object-store URL the local check is always False and
                # the remap would silently read the stale write-time URIs.
                # Only a POSITIVE probe is cached process-wide: a
                # finished copy never un-copies, but a False seen
                # mid-sync (or before a copy lands) must not pin the
                # stale original for the process lifetime. Negative
                # results memoize only within ONE planning call
                # (``neg_memo``) — bounded staleness, and a never-
                # materializing candidate costs one HEAD per plan
                # instead of one per data file (100k files = 100k HEADs)
                key = (table_path, marker)
                if _REMAP_CACHE.get(key):
                    return cand
                if neg_memo is not None and key in neg_memo:
                    return meta_loc
                if st.sexists(cand):
                    _REMAP_CACHE[key] = True
                    return cand
                if neg_memo is not None:
                    neg_memo.add(key)
                return meta_loc
    return meta_loc


def iceberg_live_files(table_path: str,
                       snapshot_id: int | None = None) -> list[str]:
    """Live data-file paths of a snapshot (default: current)."""
    from tantivy4java_ray.sources.avro import read_avro_file

    meta = read_table_metadata(table_path)
    snaps = meta.get("snapshots", [])
    if not snaps:
        return []
    if snapshot_id is None:
        cur = meta.get("current-snapshot-id")
        # -1 is the spec's 'no current snapshot' sentinel (e.g. after a
        # rollback); treat it like absent, not like a real id
        snapshot_id = (cur if cur is not None and cur != -1
                       else snaps[-1]["snapshot-id"])
    snap = next((s for s in snaps if s["snapshot-id"] == snapshot_id), None)
    if snap is None:
        raise ValueError(
            f"snapshot {snapshot_id} not found in {table_path} "
            f"(have {[s['snapshot-id'] for s in snaps]})")
    neg: set = set()   # per-plan negative-probe memo (see _localize)
    mlist_path = _localize(snap["manifest-list"], table_path, neg)
    _schema, manifests = read_avro_file(mlist_path)
    files: list[str] = []
    for m in manifests:
        mpath = _localize(m["manifest_path"], table_path, neg)
        _s, entries = read_avro_file(mpath)
        for e in entries:
            if e.get("status") == 2:  # DELETED
                continue
            df = e.get("data_file") or {}
            if df.get("content", 0) != 0:  # delete files
                continue
            fp = df.get("file_path")
            if fp:
                files.append(_localize(fp, table_path, neg))
    return sorted(set(files))
