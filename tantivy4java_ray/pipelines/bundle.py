"""Single-file split bundles: pack an index into one ``.split`` file.

The reference's ``QuickwitSplit.convertIndex`` packs a tantivy index
into a single split with footer offsets + a hotcache so a searcher opens
it with ONE ranged read (``split/merge/QuickwitSplit.java:164-307``,
``native/src/quickwit_split/split_creation.rs``). Same layout here::

    [file bytes ...][footer JSON][footer_len u64 LE][MAGIC u32 LE]

- ``footer["files"]`` maps each index-relative path to (offset, length)
- ``footer["hotcache"]`` inlines the manifest (and any file under the
  hotcache threshold), so ``open -> search`` needs only the footer read
  plus ranged GETs for the postings actually touched

Reading is zero-change for the engine: ``SplitFileSystem`` registers the
``t4jrsplit://`` fsspec protocol, mapping ``t4jrsplit://<bundle>/<inner>``
to ranged reads inside the bundle — ``IndexReader(split_url(path))``
just works, locally or with the bundle itself on object storage.
"""

from __future__ import annotations

import base64
import io
import json
import re
import struct

import numpy as np

from tantivy4java_ray import storage as st

MAGIC = 0x54345253  # "T4RS"
#: files at most this size are inlined into the footer hotcache
HOTCACHE_MAX = 64 * 1024
#: always hotcached regardless of size (needed to open the index)
HOT_ALWAYS = ("manifest.json",)


def bundle_index(index_dir: str, out_path: str, *,
                 include_txlog: bool = False,
                 hotcache_max: int = HOTCACHE_MAX) -> dict:
    """Pack ``index_dir`` (path or URL) into one ``out_path`` bundle.

    Returns the footer dict. ``_partials`` (build intermediates) are
    always excluded; the txlog is lineage, included on request."""
    files = []
    for rel in st.swalk_files(index_dir):
        top = rel.split("/", 1)[0]
        if top == "_partials":
            continue
        if top == "txlog" and not include_txlog:
            continue
        if rel == "checksums.json":
            # the integrity sidecar describes the DIRECTORY form (its
            # file set differs from the bundle's); a packed bundle is
            # one object whose integrity is its own single-file sidecar
            # (integrity.write_checksums on the .split path)
            continue
        base = rel.split("/")[-1]
        # both temp conventions: '.tmpXXX' prefixes and the atomic
        # writers' 'name.tmp-<pid>' suffixes (storage.py) — leftovers
        # from a crashed write must never be packed
        if base.startswith(".tmp") or ".tmp-" in base:
            continue
        files.append(rel)

    # stream file-by-file to a temp object then rename into place — the
    # bundle is index-sized, buffering it (twice) in memory would OOM
    # the driver on the multi-GB splits this feature targets
    import os
    offsets: dict[str, list[int]] = {}
    hotcache: dict[str, str] = {}
    parent = os.path.dirname(out_path)
    if parent:
        st.smakedirs(parent)
    # pid+uuid tmp (storage._tmp_name): pids collide across cluster nodes
    tmp = st._tmp_name(out_path)
    chunk = 8 << 20
    try:
        with st.sopen(tmp, "wb") as out:
            pos = 0
            for rel in files:
                src = st.sjoin(index_dir, rel)
                # offsets use bytes ACTUALLY written, not a stat that
                # could be stale on remote filesystems
                written = 0
                with st.sopen(src, "rb") as f:
                    if rel in HOT_ALWAYS or st.ssize(src) <= hotcache_max:
                        data = f.read()
                        out.write(data)
                        written = len(data)
                        hotcache[rel] = base64.b64encode(data).decode()
                    else:
                        while True:
                            data = f.read(chunk)
                            if not data:
                                break
                            out.write(data)
                            written += len(data)
                offsets[rel] = [pos, written]
                pos += written
            footer = {"version": 1, "files": offsets, "hotcache": hotcache,
                      "num_files": len(files)}
            fbytes = json.dumps(footer).encode()
            out.write(fbytes)
            out.write(struct.pack("<QI", len(fbytes), MAGIC))
    except BaseException:
        try:
            fs, p = st.fs_for(tmp)
            (os.unlink(p) if fs is None else fs.rm(p))
        except OSError:
            pass
        raise
    st.sreplace(tmp, out_path)
    # a SplitFileSystem instance in this process may hold the REPLACED
    # bundle's footer/blob (fsspec instance cache lives forever): purge,
    # or the rebuilt bundle would be sliced with the old footer offsets
    _evict_split_caches(out_path)
    return footer


def _evict_split_caches(bundle_path: str) -> None:
    import os
    ap = (bundle_path if st.is_url(bundle_path)
          else os.path.abspath(bundle_path))
    try:
        import fsspec
        fs = fsspec.filesystem("t4jrsplit")
    except (ImportError, ValueError):
        return
    for cache in (getattr(fs, "_footers", None) or {},
                  getattr(fs, "_blobs", None) or {}):
        for key in [k for k in cache if k == ap or k == bundle_path]:
            cache.pop(key, None)


def read_bundle_footer(path: str) -> dict:
    """Two ranged reads: 12-byte trailer, then the footer JSON."""
    size = st.ssize(path)
    blob = st.blob_open(path)
    if blob is None or size < 12:
        raise ValueError(f"{path!r} is not a t4jr split bundle "
                         f"(empty or truncated: {size} bytes)")
    trailer = bytes(blob[size - 12:size])
    flen, magic = struct.unpack("<QI", trailer)
    if magic != MAGIC:
        raise ValueError(f"{path!r} is not a t4jr split bundle "
                         f"(bad magic {magic:#x})")
    if flen > size - 12:
        # a corrupt trailer must fail cleanly, not wrap the slice start
        # negative and json-parse arbitrary bytes
        raise ValueError(f"{path!r} is not a t4jr split bundle "
                         f"(footer length {flen} exceeds file size {size})")
    footer = json.loads(bytes(blob[size - 12 - flen:size - 12]))
    return footer


def split_url(bundle_path: str) -> str:
    """URL under which ``IndexReader`` opens a bundle directly."""
    import os
    register_split_protocol()
    if not st.is_url(bundle_path):
        bundle_path = os.path.abspath(bundle_path)
    return f"t4jrsplit://{bundle_path}"


_REGISTERED = False


def register_split_protocol() -> None:
    global _REGISTERED
    if _REGISTERED:
        return
    import fsspec
    fsspec.register_implementation("t4jrsplit", SplitFileSystem,
                                   clobber=True)
    _REGISTERED = True


def _qualify(bundle: str) -> str:
    """Restore the leading '/' the parse stripped from local paths; ANY
    fsspec URL (s3/gs/az/abfs/hdfs/...) passes through untouched — a
    protocol whitelist here would break bundles on every other store."""
    if not st.is_url(bundle):
        bundle = "/" + bundle
    return bundle


#: positive probe results only — a failed probe must NOT be cached, the
#: bundle may be created later in the same process
_PROBE_CACHE: dict[str, tuple[str, str]] = {}


def _probe_split(path: str) -> tuple[str, str]:
    """No '*.split' component: find the longest prefix that is an
    existing FILE (the bundle may be named anything from the CLI)."""
    import os
    hit = _PROBE_CACHE.get(path)
    if hit is not None:
        return hit
    parts = path.split("/")
    for i in range(len(parts), 0, -1):
        cand = _qualify("/".join(parts[:i]))
        try:
            fs, p = st.fs_for(cand)
            isfile = (os.path.isfile(p) if fs is None else fs.isfile(p))
            if isfile and st.ssize(cand) > 0:
                out = (cand, "/".join(parts[i:]))
                if len(_PROBE_CACHE) < 4096:
                    _PROBE_CACHE[path] = out
                return out
        except (FileNotFoundError, OSError, ValueError):
            continue
    return _qualify(path), ""


def _parse(path: str) -> tuple[str, str]:
    """'<bundle>/<inner>' -> (bundle, inner). The bundle ends at the
    first path COMPONENT named ``*.split`` (substring matching would cut
    '/data.splits/x.split' inside 'data.splits'); bundles with any other
    name resolve by probing for the longest existing-file prefix."""
    path = path.lstrip("/")
    for m in re.finditer(r"[^/]+", path):
        if m.group(0).endswith(".split"):
            return (_qualify(path[:m.end()]),
                    path[m.end():].lstrip("/"))
    return _probe_split(path)


#: members at most this size are materialized whole on open; larger ones
#: get a lazy ranged reader (the bundle blob's page cache / local memmap
#: absorbs the per-read cost)
_OPEN_EAGER_MAX = 8 << 20


class _RangedReader(io.RawIOBase):
    """Seekable read-only file over one bundled member, backed by ranged
    reads into the bundle blob."""

    def __init__(self, sfs: "SplitFileSystem", bundle: str, inner: str,
                 size: int):
        self._sfs, self._bundle, self._inner = sfs, bundle, inner
        self._size, self._pos = size, 0

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def seek(self, offset: int, whence: int = 0) -> int:
        base = (0, self._pos, self._size)[whence]
        self._pos = max(0, min(base + offset, self._size))
        return self._pos

    def tell(self) -> int:
        return self._pos

    def readinto(self, b) -> int:
        n = min(len(b), self._size - self._pos)
        if n <= 0:
            return 0
        data = self._sfs._read(self._bundle, self._inner, self._pos,
                               self._pos + n)
        b[:len(data)] = data
        self._pos += len(data)
        return len(data)


from fsspec import AbstractFileSystem  # noqa: E402  (import after st)


class SplitFileSystem(AbstractFileSystem):
    """Read-only fsspec filesystem over split bundles. Hotcached entries
    are served from the footer with no extra I/O; everything else is a
    ranged read into the bundle (which may itself live on object
    storage)."""

    protocol = "t4jrsplit"
    cachable = True

    def __init__(self, *args, **storage_options):
        if getattr(self, "_footers", None) is not None:
            return  # cached instance re-init
        super().__init__(*args, **storage_options)
        self._footers: dict[str, dict] = {}
        self._blobs: dict[str, object] = {}

    def _footer(self, bundle: str) -> dict:
        if bundle not in self._footers:
            self._footers[bundle] = read_bundle_footer(bundle)
        return self._footers[bundle]

    def _blob(self, bundle: str):
        if bundle not in self._blobs:
            self._blobs[bundle] = st.blob_open(bundle)
        return self._blobs[bundle]

    def _read(self, bundle: str, inner: str, start: int | None = None,
              end: int | None = None) -> bytes:
        f = self._footer(bundle)
        if inner not in f["files"]:
            raise FileNotFoundError(f"{inner!r} not in bundle {bundle!r}")
        off, length = f["files"][inner]
        # fsspec cat_file contract: negative offsets are end-relative
        # (start=-12 reads the trailer) — without this translation the
        # arithmetic below silently returned the PREVIOUS bundled
        # file's bytes
        s = 0 if start is None else (start + length if start < 0
                                     else min(start, length))
        e = length if end is None else (end + length if end < 0
                                        else min(end, length))
        s, e = max(0, s), max(0, e)
        if inner in f["hotcache"]:
            data = base64.b64decode(f["hotcache"][inner])
            return data if start is None and end is None else data[s:e]
        if e <= s:
            return b""
        return bytes(self._blob(bundle)[off + s:off + e])

    # -- AbstractFileSystem surface ----------------------------------------
    def exists(self, path, **kw) -> bool:
        bundle, inner = _parse(self._strip_protocol(path))
        try:
            f = self._footer(bundle)
        except (FileNotFoundError, ValueError, OSError):
            return False
        if not inner:
            return True
        return (inner in f["files"]
                or any(k.startswith(inner + "/") for k in f["files"]))

    def size(self, path) -> int:
        bundle, inner = _parse(self._strip_protocol(path))
        try:
            return self._footer(bundle)["files"][inner][1]
        except KeyError:
            # fsspec consumers catch FileNotFoundError, not KeyError
            raise FileNotFoundError(path) from None

    def cat_file(self, path, start=None, end=None, **kw) -> bytes:
        bundle, inner = _parse(self._strip_protocol(path))
        return self._read(bundle, inner, start, end)

    def _open(self, path, mode="rb", **kw):
        if "w" in mode or "a" in mode:
            raise OSError("split bundles are immutable (read-only fs)")
        bundle, inner = _parse(self._strip_protocol(path))
        f = self._footer(bundle)
        if inner not in f["files"]:
            raise FileNotFoundError(f"{inner!r} not in bundle {bundle!r}")
        length = f["files"][inner][1]
        if inner in f["hotcache"] or length <= _OPEN_EAGER_MAX:
            return io.BytesIO(self._read(bundle, inner))
        # large members (multi-GB doc-store parquet) stream by ranged
        # reads — materializing them whole would OOM exactly the scale
        # the streaming bundle WRITER exists for
        return io.BufferedReader(
            _RangedReader(self, bundle, inner, length))

    def info(self, path, **kw):
        bundle, inner = _parse(self._strip_protocol(path))
        f = self._footer(bundle)
        if inner in f["files"]:
            return {"name": self._strip_protocol(path), "type": "file",
                    "size": f["files"][inner][1]}
        if self.isdir(path):
            return {"name": self._strip_protocol(path),
                    "type": "directory", "size": 0}
        raise FileNotFoundError(path)

    def ls(self, path, detail=False, **kw):
        bundle, inner = _parse(self._strip_protocol(path))
        f = self._footer(bundle)
        pref = inner.rstrip("/") + "/" if inner else ""
        names = sorted({k[len(pref):].split("/")[0]
                        for k in f["files"] if k.startswith(pref)})
        full = [f"{bundle}/{pref}{n}" for n in names]
        if detail:
            # correct types: fsspec walkers only descend into entries
            # typed 'directory'
            out = []
            for n, name in zip(full, names):
                key = f"{pref}{name}"
                if key in f["files"]:
                    out.append({"name": n, "type": "file",
                                "size": f["files"][key][1]})
                else:
                    out.append({"name": n, "type": "directory", "size": 0})
            return out
        return full

    def find(self, path, **kw):
        bundle, inner = _parse(self._strip_protocol(path))
        f = self._footer(bundle)
        pref = inner.rstrip("/") + "/" if inner else ""
        return sorted(f"{bundle}/{k}" for k in f["files"]
                      if k.startswith(pref))

    def isdir(self, path) -> bool:
        bundle, inner = _parse(self._strip_protocol(path))
        f = self._footer(bundle)
        return inner == "" or any(k.startswith(inner.rstrip("/") + "/")
                                  for k in f["files"])

    def makedirs(self, path, exist_ok=True):
        raise OSError("split bundles are immutable (read-only fs)")
