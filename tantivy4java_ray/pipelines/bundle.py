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
        if rel.split("/")[-1].startswith(".tmp"):
            continue
        files.append(rel)

    buf = io.BytesIO()
    offsets: dict[str, list[int]] = {}
    hotcache: dict[str, str] = {}
    for rel in files:
        with st.sopen(st.sjoin(index_dir, rel), "rb") as f:
            data = f.read()
        offsets[rel] = [buf.tell(), len(data)]
        buf.write(data)
        if rel in HOT_ALWAYS or len(data) <= hotcache_max:
            hotcache[rel] = base64.b64encode(data).decode()
    footer = {"version": 1, "files": offsets, "hotcache": hotcache,
              "num_files": len(files)}
    fbytes = json.dumps(footer).encode()
    buf.write(fbytes)
    buf.write(struct.pack("<QI", len(fbytes), MAGIC))
    st.write_bytes_atomic(buf.getvalue(), out_path)
    return footer


def read_bundle_footer(path: str) -> dict:
    """Two ranged reads: 12-byte trailer, then the footer JSON."""
    size = st.ssize(path)
    blob = st.blob_open(path)
    trailer = bytes(blob[size - 12:size])
    flen, magic = struct.unpack("<QI", trailer)
    if magic != MAGIC:
        raise ValueError(f"{path!r} is not a t4jr split bundle "
                         f"(bad magic {magic:#x})")
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


def _parse(path: str) -> tuple[str, str]:
    """'<bundle>/<inner>' -> (bundle, inner); bundle ends at '.split'."""
    path = path.lstrip("/")
    if ".split" in path:
        i = path.index(".split") + len(".split")
        bundle, inner = path[:i], path[i:].lstrip("/")
    else:
        bundle, inner = path, ""
    if not bundle.startswith(("s3://", "gs://", "az://", "file://",
                              "memory://", "http")):
        bundle = "/" + bundle
    return bundle, inner


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
        s = 0 if start is None else min(start, length)
        e = length if end is None else min(end, length)
        if inner in f["hotcache"] and start is None and end is None:
            return base64.b64decode(f["hotcache"][inner])
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
        return self._footer(bundle)["files"][inner][1]

    def cat_file(self, path, start=None, end=None, **kw) -> bytes:
        bundle, inner = _parse(self._strip_protocol(path))
        return self._read(bundle, inner, start, end)

    def _open(self, path, mode="rb", **kw):
        if "w" in mode or "a" in mode:
            raise OSError("split bundles are immutable (read-only fs)")
        bundle, inner = _parse(self._strip_protocol(path))
        data = self._read(bundle, inner)
        return io.BytesIO(data)

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
            return [{"name": n, "type": "file"} for n in full]
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
