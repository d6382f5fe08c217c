"""Streaming ingest: the ``IndexWriter`` commit/rollback surface.

The reference's ``IndexWriter`` (``core/IndexWriter.java``: addDocument /
addJson / commit / rollback) accumulates documents in a writer heap and
commits segments. The Ray-Data retelling: documents buffer in Arrow
batches, flush to staged parquet at ``heap_docs``, and ``commit()``
builds a delta index over the staged files and LSM-merges it with the
existing index (``merge_indexes`` byte-copy path), swapping the result
in atomically. ``rollback()`` discards everything staged since the last
commit — the files never touch the committed index.

Doc ids: each commit re-bases the delta after the existing docs
(identical to the reference's segment append), so committed doc ids are
stable across later commits.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import shutil
import uuid
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from tantivy4java_ray.schema import FieldType, IndexSchema

#: staged doc-store file name; the counter is parsed by full digit run
#: (a fixed 5-char slice would truncate past flush 99999 and resume at a
#: too-low counter, overwriting committed doc-store files)
_STAGED_RE = re.compile(r"staged-(\d+)\.parquet")

#: declared arrow type per field type — staged parquet columns must have
#: a STABLE type across flushes (pa.array inference gives `null` for an
#: all-None flush and commit()'s concat then fails on schema mismatch)
_ARROW_TYPES = {
    FieldType.TEXT: pa.string(), FieldType.STRING: pa.string(),
    FieldType.FACET: pa.string(), FieldType.IP_ADDR: pa.string(),
    FieldType.INTEGER: pa.int64(), FieldType.UNSIGNED: pa.uint64(),
    FieldType.FLOAT: pa.float64(), FieldType.BOOLEAN: pa.bool_(),
    FieldType.DATE: pa.timestamp("us"), FieldType.BYTES: pa.large_binary(),
}


def _typed_column(fcfg, vals: list,
                  text_mode: dict[str, str] | None = None) -> pa.Array:
    """One staged column with the schema-declared arrow type.

    ``text_mode`` pins a TEXT field's shape (``'scalar'`` | ``'list'``)
    ACROSS flushes: without it, an all-scalar flush followed by an
    all-list flush would write staged parquets with incompatible column
    types and ``commit()`` would fail late on schema unification."""
    if fcfg.type is FieldType.JSON:
        # dicts serialize to JSON strings (the build side parses either
        # form); a struct-typed column would change shape per flush
        return pa.array(
            [v if v is None or isinstance(v, str) else json.dumps(v)
             for v in vals], pa.string())
    if fcfg.type is FieldType.TEXT:
        lists = [isinstance(v, (list, tuple)) for v in vals
                 if v is not None]
        mode = (text_mode or {}).get(fcfg.name)
        if lists and all(lists) and mode != "scalar":
            if text_mode is not None:
                text_mode[fcfg.name] = "list"
            return pa.array(vals, pa.list_(pa.string()))
        if any(lists) and not all(lists):
            raise TypeError(
                f"field {fcfg.name!r}: mixed scalar and list values in "
                f"one flush — multi-valued text must be lists everywhere")
        if any(lists) and mode == "scalar":
            raise TypeError(
                f"field {fcfg.name!r}: earlier flushes staged this TEXT "
                f"field as scalar strings; a later list-valued flush "
                f"would write an incompatible staged column type and "
                f"fail at commit(). Use lists from the first document, "
                f"or commit before switching shape.")
        if not any(lists) and mode == "list":
            # scalar -> single-element list is lossless; keep the
            # staged column type stable instead of failing at commit
            return pa.array([None if v is None else [v] for v in vals],
                            pa.list_(pa.string()))
        if text_mode is not None and mode is None:
            # pin even for an all-null flush: the staged column IS a
            # scalar string column, and reopen-pinning (which reads the
            # staged file's schema) would conclude 'scalar' too
            text_mode[fcfg.name] = "scalar"
    if fcfg.type is FieldType.DATE:
        from tantivy4java_ray.functions.scalars import parse_date_us
        us = [None if v is None
              else (v if isinstance(v, int) else parse_date_us(v))
              for v in vals]
        return pa.array(us, pa.timestamp("us"))
    return pa.array(vals, _ARROW_TYPES[fcfg.type])


def recover_interrupted_commit(index_dir: str) -> bool:
    """Roll a crash-interrupted ``IndexWriter.commit`` generation swap
    forward (or back). The swap is ``rename(index, old); rename(merged,
    index)`` guarded by a ``<index>.swap.json`` marker; a crash between
    the renames leaves no directory at ``index_dir``. Called on writer
    open (and usable standalone); returns True if it repaired anything.
    """
    import glob as _glob
    marker = f"{index_dir}.swap.json"
    info = None
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                info = json.load(f)
        except (json.JSONDecodeError, OSError):
            info = None
    if info is None:
        # marker absent or unreadable: last-resort salvage only when the
        # index dir itself is gone (renames persisted, marker didn't)
        if os.path.exists(index_dir):
            if os.path.exists(marker):
                os.unlink(marker)
            return False
        # tags are random uuid hex: lexicographic max is NOT recency —
        # pick the newest candidate by mtime (ADVICE r2)
        def _newest(pat: str) -> str:
            cands = _glob.glob(pat)
            return max(cands, key=os.path.getmtime) if cands else ""

        info = {"merged": _newest(f"{index_dir}.merged-*"),
                "old": _newest(f"{index_dir}.old-*")}
        if not (info["merged"] or info["old"]):
            return False
    repaired = False
    if not os.path.exists(index_dir):
        if os.path.exists(info.get("merged", "")):
            # crashed between the renames: finish the swap
            os.rename(info["merged"], index_dir)
            repaired = True
        elif os.path.exists(info.get("old", "")):
            # crashed before the merged dir was complete: restore
            os.rename(info["old"], index_dir)
            repaired = True
    if os.path.exists(marker):
        os.unlink(marker)
    for leftover in (info.get("old"), info.get("merged")):
        if leftover and os.path.exists(leftover):
            shutil.rmtree(leftover, ignore_errors=True)
    return repaired


class IndexWriter:
    """Buffered document ingest with commit/rollback.

    Local-path indexes only (the atomic generation swap is a rename);
    bulk parquet-scale ingest should use ``build_index`` directly.
    """

    def __init__(self, index_dir: str, schema: IndexSchema, *,
                 heap_docs: int = 100_000, num_shards: int | None = None,
                 staging_dir: str | None = None):
        self.index_dir = index_dir
        self.schema = schema
        self.heap_docs = heap_docs
        self.num_shards = num_shards
        self.staging = staging_dir or index_dir + ".staging"
        self._lock_path = index_dir + ".writer.lock"
        self._lock_token: str | None = None
        # the lock comes FIRST: recovery and the orphan purge below both
        # MUTATE shared state (unlink markers, rmtree swap leftovers,
        # delete staged files) — running them before mutual exclusion
        # would let a second writer destroy a live writer's in-flight
        # commit swap and only then discover the lock
        self._acquire_writer_lock()
        try:
            recover_interrupted_commit(index_dir)
        except BaseException:
            self.close()
            raise
        self._rows: list[dict] = []
        self._staged: list[str] = []
        #: staged deletes as ``(query, adds_before)`` — the number of
        #: docs added THIS SESSION before the delete was staged, giving
        #: the reference's opstamp ordering (a delete only affects docs
        #: added before it, ``core/IndexWriter.java:164``)
        self._delete_queries: list = []
        self._pending_adds = 0
        #: TEXT field shape pinned across flushes ('scalar' | 'list')
        self._text_mode: dict[str, str] = {}
        # resume the flush counter past any staged files from earlier
        # writer sessions: committed indexes reference staging/staged-N
        # as their doc store, so a reopened writer must never reuse N
        self._flush_i = 0
        try:
            if os.path.isdir(self.staging):
                self._check_staging_owner()
                self._purge_orphan_staged()
                nums = self._pin_text_modes_from_staging()
                self._flush_i = max(nums) + 1 if nums else 0
        except BaseException:
            self.close()                  # a failed init must not hold the lock
            raise

    def _pin_text_modes_from_staging(self) -> list[int]:
        """Pin TEXT shapes to what the surviving (committed) staged
        files already use, so a reopened writer (or a writer continuing
        after rollback) cannot stage an incompatible column type.
        Returns the staged-file numbers found (the one directory scan
        is shared with the flush-counter resume)."""
        self._text_mode = {}
        if not os.path.isdir(self.staging):
            return []
        nums = [int(m.group(1)) for f in os.listdir(self.staging)
                if (m := _STAGED_RE.fullmatch(f))]
        if not nums:
            return nums
        newest = os.path.join(
            self.staging, f"staged-{max(nums):05d}.parquet")
        sch = pq.read_schema(newest)
        for fcfg in self.schema.fields:
            if fcfg.type is FieldType.TEXT and fcfg.name in sch.names:
                t = sch.field(fcfg.name).type
                self._text_mode[fcfg.name] = (
                    "list" if pa.types.is_list(t) or
                    pa.types.is_large_list(t) else "scalar")
        return nums

    # -- writer lock ---------------------------------------------------------
    def _acquire_writer_lock(self) -> None:
        """One live writer per index, across processes (the reference's
        tantivy directory lockfile: a second IndexWriter gets LockBusy).
        Without it, a second writer's ``_purge_orphan_staged`` unlinks
        the first writer's flushed-but-uncommitted staged files. Locks
        from DEAD processes are stolen; a writer opened in the SAME
        process steals too (process-restart simulation / REPL reopen —
        in-process callers own their writer lifecycle)."""
        token = f"{os.getpid()}:{uuid.uuid4().hex}"
        # the lockfile lives BESIDE the (possibly not-yet-built) index
        # dir; the first commit's build_index would create the parent,
        # but the lock is taken before any commit exists
        parent = os.path.dirname(os.path.abspath(self._lock_path))
        os.makedirs(parent, exist_ok=True)
        # The whole read-verify-steal-claim procedure runs under a
        # flock'd side mutex: ANY unserialized steal protocol has a
        # two-winner interleave (removing a stale lock momentarily
        # empties the slot, a concurrent claimer takes it, and a third
        # racer's restore-or-claim collides — observed in the
        # 6-process steal race test). The flock releases on PROCESS
        # DEATH, so the mutex can never go stale; long-lived OWNERSHIP
        # stays in the pid-token lockfile so it survives the writer's
        # lifetime without holding an fd open (and a dead holder's
        # token is steal-able, which flock-as-ownership would not
        # allow for same-process reopen semantics).
        with self._acquire_mutex():
            try:
                with open(self._lock_path) as f:
                    holder = f.read().strip()
                pid = int(holder.split(":", 1)[0])
            except FileNotFoundError:
                pid = None
            except PermissionError as e:
                # an UNREADABLE foreign lock must refuse, never steal:
                # treating it as corrupt would let a second user claim
                # over a LIVE writer and orphan-purge its staged files
                raise RuntimeError(
                    f"writer lock {self._lock_path!r} exists but is not "
                    f"readable by this user; if its owner is dead, "
                    f"remove it manually") from e
            except (OSError, ValueError):
                pid = -1   # corrupt/garbled token: steal-able
            alive = False
            if pid is not None and pid > 0 and pid != os.getpid():
                try:
                    os.kill(pid, 0)
                    alive = True
                except ProcessLookupError:
                    alive = False
                except PermissionError:
                    alive = True
            if alive:
                raise RuntimeError(
                    f"index {self.index_dir!r} is locked by a live "
                    f"writer in process {pid} ({self._lock_path}); "
                    f"close it first (tantivy LockBusy semantics)")
            # free, dead-pid, unreadable, or same-process: (re)claim.
            # Serialized by the mutex, so a plain write is atomic
            # ENOUGH for rivals (they also read under the mutex);
            # write-temp + rename keeps crash-mid-write from leaving a
            # half-written token for a LATER session to misparse (and
            # atomic_write_bytes unlinks the temp on a failed write).
            from tantivy4java_ray.state.manifest import atomic_write_bytes
            atomic_write_bytes(self._lock_path, token.encode())
            try:
                # mkstemp creates 0600; a foreign-user writer must be
                # able to READ the token (liveness probe) and REPLACE
                # it (dead-holder steal, serialized by the mutex)
                os.chmod(self._lock_path, 0o666)
            except OSError:
                pass
            self._lock_token = token

    @contextlib.contextmanager
    def _acquire_mutex(self):
        """flock'd critical section for lock acquisition/release.

        The mutex file is chmod'd world-writable (umask-proof) so a
        writer from ANOTHER user on a shared index can flock it — the
        os.kill(pid, 0) PermissionError probe above exists exactly for
        foreign-user holders. If an old 0644 mutex from another user
        still denies us, surface a clear error instead of EACCES."""
        import fcntl
        mpath = f"{self._lock_path}.mutex"
        try:
            mfd = os.open(mpath, os.O_CREAT | os.O_RDWR, 0o666)
        except PermissionError as e:
            raise RuntimeError(
                f"cannot open writer-lock mutex {mpath!r} (owned by "
                f"another user with restrictive permissions); remove it "
                f"or fix its mode to proceed") from e
        try:
            os.chmod(mpath, 0o666)   # beat the process umask
        except OSError:
            pass                     # foreign owner; it opened, so fine
        try:
            fcntl.flock(mfd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(mfd)   # closing releases the flock

    def close(self) -> None:
        """Release the writer lock. Buffered-but-unflushed rows are
        dropped (call ``commit()`` first); staged files stay for the
        next writer session's orphan purge / commit."""
        if self._lock_token is None:
            return
        try:
            with self._acquire_mutex():
                with open(self._lock_path) as f:
                    if f.read().strip() == self._lock_token:
                        os.unlink(self._lock_path)
        except (OSError, RuntimeError):
            # mutex unavailable (e.g. foreign-owned 0644 file): fall
            # back to an unserialized conditional unlink — releasing a
            # token WE hold cannot race a steal (stealers only remove
            # dead-pid tokens, and we are alive), so this is safe; a
            # leaked lock would block every later writer until our
            # process died
            try:
                with open(self._lock_path) as f:
                    if f.read().strip() == self._lock_token:
                        os.unlink(self._lock_path)
            except OSError:
                pass
        self._lock_token = None

    def __enter__(self) -> "IndexWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _check_staging_owner(self) -> None:
        """A staging dir belongs to exactly one index: the orphan purge
        below deletes staged files this index's txlog doesn't reference,
        which — on a staging dir shared with ANOTHER index — would
        silently destroy that index's committed doc store. Pin ownership
        with a marker and fail loudly on a mismatch."""
        marker = os.path.join(self.staging, ".owner")
        me = os.path.abspath(self.index_dir)
        try:
            with open(marker) as f:
                owner = f.read().strip()
        except (FileNotFoundError, OSError):
            owner = None
        if owner is None:
            from tantivy4java_ray.state.manifest import atomic_write_bytes
            atomic_write_bytes(marker, me.encode())
        elif owner != me:
            raise ValueError(
                f"staging dir {self.staging!r} belongs to index "
                f"{owner!r}, not {me!r} — each index needs its own "
                f"staging_dir (shared staging would let the orphan "
                f"purge delete the other index's doc store)")

    def _purge_orphan_staged(self) -> int:
        """Crash rollback on reopen: staged files that no committed
        partition references were flushed by a session that died before
        commit(). They would otherwise be invisible (not in
        ``pending_docs``, skipped by commit, never unlinked) yet
        indistinguishable from committed doc-store files — rollback
        semantics say uncommitted data is discarded. Compared by
        basename: committed partitions record their source path in the
        txlog, and staged names are unique within this staging dir."""
        referenced: set[str] = set()
        if os.path.exists(os.path.join(self.index_dir, "manifest.json")):
            from tantivy4java_ray.state.manifest import TransactionLog
            state = TransactionLog(self.index_dir).read_state()
            for p in state.get("partitions", {}).values():
                referenced.add(os.path.basename(p.get("path", "")))
        n = 0
        for f in os.listdir(self.staging):
            if _STAGED_RE.fullmatch(f) and f not in referenced:
                os.unlink(os.path.join(self.staging, f))
                n += 1
        return n

    # -- ingest -------------------------------------------------------------
    def add_document(self, doc: dict[str, Any]) -> None:
        self._rows.append(doc)
        self._pending_adds += 1
        if len(self._rows) >= self.heap_docs:
            self._flush()

    def add_json(self, doc_json: str) -> None:
        self.add_document(json.loads(doc_json))

    def add_documents_batch(self, table: pa.Table) -> None:
        """Arrow-native bulk add (the batch-document-protocol analog)."""
        rows = table.to_pylist()
        self._rows.extend(rows)
        self._pending_adds += len(rows)
        if len(self._rows) >= self.heap_docs:
            self._flush()

    @property
    def pending_docs(self) -> int:
        n = len(self._rows)
        for p in self._staged:
            n += pq.read_metadata(p).num_rows
        return n

    def _flush(self) -> None:
        if not self._rows:
            return
        os.makedirs(self.staging, exist_ok=True)
        self._check_staging_owner()
        arrays = {}
        for fcfg in self.schema.fields:
            arrays[fcfg.name] = _typed_column(
                fcfg, [r.get(fcfg.name) for r in self._rows],
                self._text_mode)
        path = os.path.join(self.staging,
                            f"staged-{self._flush_i:05d}.parquet")
        pq.write_table(pa.table(arrays), path)
        self._staged.append(path)
        self._flush_i += 1
        self._rows = []

    def commit_opstamp(self) -> int:
        """Monotonically increasing commit stamp (``IndexWriter.
        getCommitOpstamp``, ``core/IndexWriter.java:164``); -1 before the
        first commit. Persisted beside the staged doc store, so it
        survives writer reopen AND the merge generation swap (the
        swapped-in index's own txlog restarts from version 0)."""
        p = os.path.join(self.staging, ".opstamp")
        try:
            with open(p) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def _bump_opstamp(self) -> int:
        from tantivy4java_ray.state.manifest import atomic_write_bytes
        v = self.commit_opstamp() + 1
        atomic_write_bytes(os.path.join(self.staging, ".opstamp"),
                           str(v).encode())
        return v

    # -- deletes ------------------------------------------------------------
    def delete_documents(self, field: str, value) -> None:
        """Stage a delete-by-term, applied at the next ``commit()``
        (reference ``IndexWriter.deleteDocuments(field, value)``,
        ``core/IndexWriter.java:153-178`` — tombstones at merge,
        opstamp-ordered: only docs added BEFORE the delete match)."""
        from tantivy4java_ray.query import Query
        self._delete_queries.append((Query.term(field, value),
                                     self._pending_adds))

    def delete_documents_by_query(self, query) -> None:
        """Stage a delete-by-query for the next ``commit()``
        (``IndexWriter.deleteDocumentsByQuery``)."""
        self._delete_queries.append((query, self._pending_adds))

    def delete_all_documents(self) -> None:
        """Stage delete-everything (``IndexWriter.deleteAllDocuments``,
        opstamp-ordered like every delete)."""
        from tantivy4java_ray.query import Query
        self._delete_queries.append((Query.all(), self._pending_adds))

    # -- commit / rollback --------------------------------------------------
    def rollback(self) -> int:
        """Discard everything added since the last commit -> #docs dropped
        (``IndexWriter.rollback`` semantics: staged data never becomes
        visible). Files from PREVIOUS commits are the index's doc store
        and stay."""
        n = self.pending_docs
        self._rows = []
        for p in self._staged:
            try:
                os.unlink(p)
            except FileNotFoundError:
                pass
        self._staged = []
        self._delete_queries = []
        self._pending_adds = 0
        # the pinned TEXT shapes may have come from files just deleted;
        # re-derive from what actually survives so a rolled-back writer
        # is not stricter than a freshly reopened one
        self._pin_text_modes_from_staging()
        return n

    def _swap_generation(self, merged_dir: str, tag: str) -> None:
        """Two renames guarded by a recovery marker; a crash between
        them is repaired by ``recover_interrupted_commit``. The marker
        is fsynced (file + parent dir) BEFORE the first rename so power
        loss cannot persist the renames without the marker."""
        old = f"{self.index_dir}.old-{tag}"
        marker = f"{self.index_dir}.swap.json"
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"old": old, "merged": merged_dir,
                       "index_dir": self.index_dir}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, marker)
        dfd = os.open(os.path.dirname(os.path.abspath(marker)) or ".",
                      os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        os.rename(self.index_dir, old)
        os.rename(merged_dir, self.index_dir)
        os.unlink(marker)
        shutil.rmtree(old, ignore_errors=True)

    def commit(self):
        """Build the staged delta, merge it into the index, and apply
        staged deletes; returns the merge/build result (None with
        nothing staged or deleted).

        Delete semantics are OPSTAMP-ORDERED like the reference
        (``IndexWriter.java:164``): a delete only affects docs added
        before it was staged (plus everything already committed). Doc
        ids are append-ordered, so each staged delete carries an id
        CUTOFF (committed id space + adds staged before it) and the
        delete-merge filters its matches to ids under that cutoff."""
        from tantivy4java_ray.pipelines.build import build_index
        from tantivy4java_ray.pipelines.merge import merge_indexes
        from tantivy4java_ray import storage as st

        self._flush()
        dels = []
        if self._delete_queries:
            base_docs = 0
            if os.path.exists(os.path.join(self.index_dir,
                                           "manifest.json")):
                base_docs = int(st.read_json_any(
                    st.sjoin(self.index_dir, "manifest.json"))
                    ["meta"]["stats"]["num_docs"])
            for q, mark in self._delete_queries:
                # ('abs', c): retained from a FAILED earlier commit
                # whose adds already landed — never re-based
                dels.append((q, mark[1] if isinstance(mark, tuple)
                             else base_docs + mark))
            self._delete_queries = [(q, ("abs", c)) for q, c in dels]
        if not self._staged and not dels:
            # reference semantics: commit() always advances the opstamp,
            # even with nothing pending (getCommitOpstamp contract)
            self._bump_opstamp()
            return None
        tag = uuid.uuid4().hex[:8]
        delta_dir = f"{self.index_dir}.delta-{tag}"
        exists = os.path.exists(os.path.join(self.index_dir,
                                             "manifest.json"))
        res = None
        if self._staged:
            if not exists:
                res = build_index(list(self._staged), self.index_dir,
                                  self.schema, num_shards=self.num_shards)
                exists = True
            else:
                from tantivy4java_ray import storage as st
                # the delta MUST be built with the base index's own
                # config — num_shards alone is not enough: a default-
                # config delta would lack dl__/_phash_ columns the
                # merged config promises (crashing every scored query)
                # and salt hot terms under ids the readers never probe
                base_meta = st.read_json_any(
                    st.sjoin(self.index_dir, "manifest.json"))["meta"]
                base_cfg = base_meta.get("config") or {}
                nsh = base_meta["plan"]["num_shards"]
                merged_dir = f"{self.index_dir}.merged-{tag}"
                try:
                    build_index(
                        list(self._staged), delta_dir, self.schema,
                        num_shards=nsh,
                        exact_fieldnorms=base_cfg.get(
                            "exact_fieldnorms", False),
                        hot_salts=base_cfg.get("hot_salts", 4),
                        phash_fields=tuple(
                            base_cfg.get("phash_fields") or ()),
                        bm25_k1=(base_cfg.get("bm25") or {}).get("k1", 1.2),
                        bm25_b=(base_cfg.get("bm25") or {}).get("b", 0.75))
                    res = merge_indexes([self.index_dir, delta_dir],
                                        merged_dir)
                    self._swap_generation(merged_dir, tag)
                finally:
                    # a failure between build and swap must not leak
                    # index-sized .delta-*/.merged-* dirs (no recovery
                    # path cleans them without a swap marker)
                    shutil.rmtree(delta_dir, ignore_errors=True)
                    if os.path.exists(merged_dir):
                        shutil.rmtree(merged_dir, ignore_errors=True)
            # committed staged files STAY in place: the index's
            # partitions reference them as the doc store (parquet-
            # companion contract); clear the list as soon as the adds
            # phase lands so a failure in the delete phase below cannot
            # re-merge (duplicate) or rollback-unlink committed files
            self._staged = []
            self._pending_adds = 0
        if dels and exists:
            deld_dir = f"{self.index_dir}.merged-d{tag}"
            try:
                res = merge_indexes([self.index_dir], deld_dir,
                                    delete_queries=dels)
                self._swap_generation(deld_dir, f"d{tag}")
            finally:
                if os.path.exists(deld_dir):
                    shutil.rmtree(deld_dir, ignore_errors=True)
        self._delete_queries = []
        self._bump_opstamp()
        return res
