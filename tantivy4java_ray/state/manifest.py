"""Versioned transaction log + manifest for index builds.

Delta-Lake-style log modeled on the reference's txlog
(``src/main/java/io/indextables/jni/txlog/TransactionLogWriter.java:48-312``,
``TransactionLogReader.java:53-326``): append-only JSON versions with
add/remove/skip actions, periodic full checkpoints, and snapshot reads that
replay the latest checkpoint plus newer versions. This is what makes builds
resumable with per-partition lineage + metrics (BASELINE.json north rule).

Layout::

    index_dir/txlog/v00000000.json      {"version": 0, "actions": [...]}
    index_dir/txlog/checkpoint-00000003.json   full snapshot at version 3

Action kinds: ``set_meta``, ``add_partition``, ``remove_partition``,
``skip_partition``, ``add_shard``, ``commit`` — mirroring
addFiles/removeFile/skipFile/createCheckpoint.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import time
from typing import Any

_V_RE = re.compile(r"^v(\d{8})\.json$")
_CP_RE = re.compile(r"^checkpoint-(\d{8})\.json$")


def atomic_write_bytes(path: str, data: bytes) -> None:
    """Write-then-rename so concurrent/retried writers are idempotent.
    URL paths (``s3://`` etc.) route through the storage layer."""
    if "://" in path:
        from tantivy4java_ray.storage import write_bytes_atomic
        write_bytes_atomic(data, path)
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path),
                               prefix=".tmp-" + os.path.basename(path))
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def atomic_write_json(path: str, obj: Any) -> None:
    atomic_write_bytes(path, json.dumps(obj, sort_keys=True).encode())


def exclusive_write_json(path: str, obj: Any) -> bool:
    """Put-if-absent: True on success, False when ``path`` already
    exists. A Delta-style log version must be claimed exclusively —
    write-then-replace is idempotent for identical content but lets a
    concurrent writer at the same version silently clobber a different
    transaction. Local paths get real O_EXCL; URL stores route through
    ``storage.write_bytes_if_absent`` — on S3 that is a native
    conditional create (``If-None-Match: *``), a RACE-FREE claim; other
    stores fall back to a pre-existence check, which narrows but cannot
    close the race (the Delta-on-S3-without-coordinator caveat)."""
    data = json.dumps(obj, sort_keys=True).encode()
    if "://" in path:
        from tantivy4java_ray import storage as st
        return st.write_bytes_if_absent(data, path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # write the FULL content to a private tmp first, then claim the
    # version with an atomic hard link: a bare O_EXCL create would
    # expose an empty/partial v*.json to concurrent readers and a crash
    # mid-write would poison the log forever (torn file wins the claim)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path),
                               prefix=".tmp-" + os.path.basename(path))
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        except OSError:
            # filesystem without hard links: fall back to O_EXCL + copy
            try:
                xfd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(xfd, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            return True
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


class TransactionLog:
    def __init__(self, index_dir: str):
        # the directory is created lazily on first WRITE: constructing a
        # log for reading must not scaffold directories at arbitrary paths
        from tantivy4java_ray import storage as st
        self._st = st
        self.dir = st.sjoin(index_dir, "txlog")

    # -- write --------------------------------------------------------------
    def append(self, actions: list[dict]) -> int:
        self._st.smakedirs(self.dir)
        # claim the next version with put-if-absent and retry on
        # collision: two writers computing the same latest_version()+1
        # must never clobber each other's transaction (last-writer-wins
        # silently drops actions)
        v = self.latest_version() + 1
        while not exclusive_write_json(
                self._st.sjoin(self.dir, f"v{v:08d}.json"),
                {"version": v, "ts": time.time(), "actions": actions}):
            v += 1
        return v

    def create_checkpoint(self) -> int:
        """Materialize the replayed state at the latest version."""
        state, v = self._replay()
        if v < 0:
            # no versions yet: nothing to checkpoint ('checkpoint-
            # -0000001.json' would be a malformed orphan _CP_RE never
            # matches, and smakedirs would scaffold a read-only path)
            return -1
        self._st.smakedirs(self.dir)
        atomic_write_json(self._st.sjoin(self.dir, f"checkpoint-{v:08d}.json"),
                          {"version": v, "state": state})
        return v

    # -- read ---------------------------------------------------------------
    def _ls(self) -> list[str]:
        return self._st.slistdir(self.dir)

    def latest_version(self) -> int:
        vs = [int(m.group(1)) for f in self._ls()
              if (m := _V_RE.match(f))]
        return max(vs, default=-1)

    def versions(self, min_version: int = -1) -> list[dict]:
        """Version records with version > ``min_version``. The filter
        uses the FILENAME, so checkpointed history is skipped without
        reading it (one GET per pre-checkpoint version otherwise)."""
        out = []
        for f in sorted(self._ls()):
            m = _V_RE.match(f)
            if m and int(m.group(1)) > min_version:
                out.append(self._st.read_json_any(
                    self._st.sjoin(self.dir, f)))
        return out

    def _latest_checkpoint(self) -> tuple[dict, int]:
        cps = sorted((int(m.group(1)), f) for f in self._ls()
                     if (m := _CP_RE.match(f)))
        if not cps:
            return self._empty_state(), -1
        v, f = cps[-1]
        return (self._st.read_json_any(self._st.sjoin(self.dir, f))["state"],
                v)

    @staticmethod
    def _empty_state() -> dict:
        return {"meta": {}, "partitions": {}, "shards": {},
                "skipped": {}, "committed": False}

    def _replay(self) -> tuple[dict, int]:
        state, from_v = self._latest_checkpoint()
        last = from_v
        for ver in self.versions(min_version=from_v):
            last = ver["version"]
            for a in ver["actions"]:
                kind, payload = next(iter(a.items()))
                if kind == "set_meta":
                    state["meta"].update(payload)
                elif kind == "add_partition":
                    state["partitions"][str(payload["pid"])] = payload
                    state["skipped"].pop(str(payload["pid"]), None)
                elif kind == "remove_partition":
                    state["partitions"].pop(str(payload), None)
                elif kind == "skip_partition":
                    state["skipped"][str(payload["pid"])] = payload
                elif kind == "add_shard":
                    state["shards"][str(payload["sid"])] = payload
                elif kind == "commit":
                    state["committed"] = True
        return state, last

    def read_state(self) -> dict:
        return self._replay()[0]

    def changes_since(self, version: int) -> list[dict]:
        """Catch-up read (``TransactionLogReader.java:141`` semantics)."""
        return self.versions(min_version=version)
