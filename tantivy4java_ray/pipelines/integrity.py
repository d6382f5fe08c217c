"""Artifact integrity: per-file CRC32 sidecar + deep validation.

Analog of tantivy's per-file checksum footers and the reference's split
validation (``QuickwitSplit.java:140-158`` records corrupt inputs; each
tantivy file carries a crc32 the reader can verify). Our artifacts are
immutable once committed, so integrity is a SIDECAR (``checksums.json``
at the index root) generated after commit — the hot build path never
pays an extra pass, and a 100 TB index can (re)generate or verify the
sidecar as a distributed map over files, one streaming read each.

Staleness: the sidecar records the manifest's own crc32; a rebuild or
merge that swaps the manifest makes the old sidecar verifiably stale
instead of silently wrong.
"""

from __future__ import annotations

import json
import zlib

from tantivy4java_ray import storage as st

SIDECAR = "checksums.json"
_CHUNK = 8 << 20  # streaming read granularity


def _crc_file(path: str) -> tuple[int, int]:
    """-> (size_bytes, crc32) via one streaming pass."""
    crc = 0
    n = 0
    with st.sopen(path, "rb") as f:
        while True:
            buf = f.read(_CHUNK)
            if not buf:
                break
            crc = zlib.crc32(buf, crc)
            n += len(buf)
    return n, crc


def index_files(index_dir: str) -> list[str]:
    """Relative paths of every committed artifact (sidecar excluded;
    temp/staging names never appear in a committed tree)."""
    return sorted(r for r in st.swalk_files(index_dir) if r != SIDECAR)


def compute_checksums(index_dir: str) -> dict:
    """CRC32 every artifact — one Ray task per file when a session is
    live (the 100 TB path: files live on object storage, each task
    streams only its own file), serial otherwise."""
    rels = index_files(index_dir)
    paths = [st.sjoin(index_dir, r) for r in rels]
    try:
        import ray
        use_ray = ray.is_initialized() and len(paths) > 1
    except Exception:
        use_ray = False
    if use_ray:
        import ray
        f = ray.remote(num_cpus=0.5)(_crc_file)
        sizes_crcs = ray.get([f.remote(p) for p in paths])
    else:
        sizes_crcs = [_crc_file(p) for p in paths]
    return {r: {"size": s, "crc32": c}
            for r, (s, c) in zip(rels, sizes_crcs)}


def _bundle_path(path: str) -> str | None:
    """A packed ``.split`` is ONE immutable object — its integrity is a
    single crc in a sidecar NEXT to it (``<path>.checksums.json``).
    Accepts both the raw file path and the reader's mounted
    ``t4jrsplit://<path>`` URL form; returns the underlying file path,
    or None when ``path`` is a directory index."""
    if path.startswith("t4jrsplit://"):
        path = path[len("t4jrsplit://"):]
    return path if path.endswith(".split") else None


def write_checksums(index_dir: str) -> dict:
    """Generate and atomically persist the sidecar; returns it."""
    bundle = _bundle_path(index_dir)
    if bundle is not None:
        size, crc = _crc_file(bundle)
        side = {"version": 1, "bundle": True,
                "files": {"": {"size": size, "crc32": crc}}}
        st.write_bytes_atomic(
            json.dumps(side, indent=1, sort_keys=True).encode(),
            bundle + ".checksums.json")
        return side
    files = compute_checksums(index_dir)
    manifest_rel = "manifest.json"
    side = {"version": 1,
            "manifest_crc32": files.get(manifest_rel, {}).get("crc32"),
            "files": files}
    st.write_bytes_atomic(
        json.dumps(side, indent=1, sort_keys=True).encode(),
        st.sjoin(index_dir, SIDECAR))
    return side


def verify_checksums(index_dir: str) -> list[str]:
    """-> problems (empty = every artifact matches the sidecar).

    Reported classes: missing sidecar, stale sidecar (manifest changed
    since generation), missing/extra files, size mismatch, crc mismatch.
    """
    bundle = _bundle_path(index_dir)
    if bundle is not None:
        side_path = bundle + ".checksums.json"
        if not st.sexists(side_path):
            return [f"{side_path} absent — run `checksum` to generate it"]
        try:
            want = st.read_json_any(side_path)["files"][""]
            size_want, crc_want = int(want["size"]), int(want["crc32"])
        except Exception:
            # a corrupt sidecar is itself an integrity finding, not a
            # traceback
            return [f"{side_path} unreadable/malformed — regenerate "
                    "with `checksum`"]
        size, crc = _crc_file(bundle)
        if size != size_want:
            return [f"bundle size {size} != recorded {size_want} "
                    "(truncated or replaced)"]
        if crc != crc_want:
            return ["bundle crc32 mismatch (corrupt payload)"]
        return []
    side_path = st.sjoin(index_dir, SIDECAR)
    if not st.sexists(side_path):
        return [f"{SIDECAR} absent — run `checksum` to generate it"]
    try:
        side = st.read_json_any(side_path)
        recorded = dict(side.get("files", {}))
    except Exception:
        return [f"{SIDECAR} unreadable/malformed — regenerate with "
                "`checksum`"]
    problems: list[str] = []
    # staleness first, on the ONE small file it depends on — bailing
    # before the full re-CRC pass (a 100 TB index should not stream
    # everything just to learn the sidecar predates a rebuild)
    _, man_crc = _crc_file(st.sjoin(index_dir, "manifest.json"))
    if man_crc != side.get("manifest_crc32"):
        problems.append(
            f"{SIDECAR} stale: manifest.json changed since the sidecar "
            "was generated (rebuild/merge without re-running checksum)")
        return problems
    # re-crc everything with the same (Ray-distributed when live)
    # machinery the generator used
    current = compute_checksums(index_dir)
    for rel in sorted(set(recorded) - set(current)):
        problems.append(f"{rel}: missing (recorded in {SIDECAR})")
    for rel in sorted(set(current) - set(recorded)):
        problems.append(f"{rel}: not in {SIDECAR} (extra file)")
    for rel in sorted(set(current) & set(recorded)):
        got, want = current[rel], recorded[rel]
        if got["size"] != want["size"]:
            problems.append(f"{rel}: size {got['size']} != recorded "
                            f"{want['size']} (truncated or replaced)")
        elif got["crc32"] != want["crc32"]:
            problems.append(f"{rel}: crc32 mismatch (corrupt payload)")
    return problems
