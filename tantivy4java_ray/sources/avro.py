"""Minimal Avro Object Container File reader (pure Python + zlib).

Implements the public Avro 1.x spec — container header, per-block
deflate/null codecs, and schema-driven binary decoding (zigzag varints,
strings/bytes/fixed, unions, arrays, maps, enums, nested records) — just
enough to read Iceberg manifest lists and manifest files
(``iceberg/IcebergTableReader.java:111-503`` reads the same structures
through the Java Avro library). Logical types are surfaced as their
underlying primitives.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"


class AvroError(ValueError):
    pass


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise AvroError("unexpected EOF")
        self.pos += n
        return b

    def read_long(self) -> int:
        """Zigzag-encoded variable-length integer (bounds-checked: a
        truncated buffer raises AvroError like every other read path,
        and a malformed run of continuation bytes cannot spin past the
        10-byte maximum of a 64-bit varint)."""
        shift = 0
        acc = 0
        while True:
            if self.pos >= len(self.buf):
                raise AvroError("unexpected EOF")
            if shift > 63:
                raise AvroError("varint too long")
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_str(self) -> str:
        return self.read_bytes().decode()

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _decode(r: _Reader, schema: Any) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) != b"\x00"
        if t in ("int", "long"):
            return r.read_long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read_bytes()
        if t == "string":
            return r.read_str()
        raise AvroError(f"unknown type {t!r}")
    if isinstance(schema, list):  # union: branch index then value
        idx = r.read_long()
        if idx < 0 or idx >= len(schema):
            raise AvroError(f"bad union branch {idx}")
        return _decode(r, schema[idx])
    t = schema["type"]
    if t in ("record", "error"):
        return {f["name"]: _decode(r, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_str()
                out[k] = _decode(r, schema["values"])
        return out
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(schema["size"])
    # logical types / named refs wrap the underlying type
    return _decode(r, t)


def _resolve_named(schema: Any, names: dict, ns: str | None = None) -> Any:
    """Inline previously-defined named types (records referenced by
    name later in the schema — common in Iceberg manifests).

    Namespace-aware per the Avro spec: a named type registers under its
    FULLNAME (``namespace.name``; a dotted ``name`` is already full, an
    absent ``namespace`` inherits the enclosing one) plus its short name
    and any ``aliases`` — Java Avro writers reference types by fullname
    (``ns.r2``), which a short-name-only registry cannot resolve. A
    string reference without dots resolves against the most tightly
    enclosing namespace first, then the null namespace."""
    if isinstance(schema, str):
        # enclosing-namespace fullname FIRST (Avro spec resolution
        # order): the bare short-name registry is global and a later
        # same-short-name type in another namespace overwrites it
        if ns and "." not in schema and f"{ns}.{schema}" in names:
            return names[f"{ns}.{schema}"]
        if schema in names:
            return names[schema]
        return schema
    if isinstance(schema, list):
        return [_resolve_named(s, names, ns) for s in schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "error", "enum", "fixed"):
            nm = schema.get("name")
            my_ns, keys = ns, []
            if nm:
                if "." in nm:
                    my_ns, _short = nm.rsplit(".", 1)
                    keys = [nm, _short]
                else:
                    my_ns = schema.get("namespace", ns)
                    keys = ([f"{my_ns}.{nm}"] if my_ns else []) + [nm]
                for a in schema.get("aliases", ()):
                    keys.append(a if "." in a else
                                (f"{my_ns}.{a}" if my_ns else a))
            if t in ("record", "error"):
                out = dict(schema)
                for k in keys:
                    names[k] = out  # register before fields (recursion)
                out["fields"] = [
                    {**f, "type": _resolve_named(f["type"], names, my_ns)}
                    for f in schema["fields"]]
                for k in keys:
                    names[k] = out
                return out
            for k in keys:
                names[k] = schema
            return schema
        out = {k: _resolve_named(v, names, ns) if k in ("type", "items",
                                                        "values") else v
               for k, v in schema.items()}
        return out
    return schema


def read_avro_file(path_or_bytes) -> tuple[dict | str | list, list[dict]]:
    """-> (schema, records) for an Avro object container file."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        from tantivy4java_ray.storage import sopen
        with sopen(str(path_or_bytes), "rb") as f:
            data = f.read()
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise AvroError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_str()
            meta[k] = r.read_bytes()
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported avro codec {codec!r} "
                        f"(null/deflate implemented)")
    schema = _resolve_named(json.loads(meta["avro.schema"].decode()), {})
    sync = r.read(16)
    records: list[Any] = []
    while not r.at_end():
        count = r.read_long()
        nbytes = r.read_long()
        payload = r.read(nbytes)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(br, schema))
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch")
    return schema, records


def write_avro_file(schema: dict, records: list, codec: str = "deflate"
                    ) -> bytes:
    """Test-support encoder (same spec subset as the reader)."""
    import os

    def enc_long(n: int) -> bytes:
        u = (n << 1) ^ (n >> 63)
        u &= (1 << 64) - 1
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        return bytes(out)

    def enc_str(s: str) -> bytes:
        b = s.encode()
        return enc_long(len(b)) + b

    def enc(v, sch) -> bytes:
        if isinstance(sch, str):
            if sch == "null":
                return b""
            if sch == "boolean":
                return b"\x01" if v else b"\x00"
            if sch in ("int", "long"):
                return enc_long(v)
            if sch == "double":
                return struct.pack("<d", v)
            if sch == "string":
                return enc_str(v)
            if sch == "bytes":
                return enc_long(len(v)) + v
            raise AvroError(sch)
        if isinstance(sch, list):
            for i, br in enumerate(sch):
                tag = br if isinstance(br, str) else br.get("type")
                if v is None and br == "null":
                    return enc_long(i)
                if v is not None and br != "null":
                    return enc_long(i) + enc(v, br)
            raise AvroError("no union branch")
        t = sch["type"]
        if t == "record":
            return b"".join(enc(v[f["name"]], f["type"])
                            for f in sch["fields"])
        if t == "array":
            if not v:
                return enc_long(0)
            return (enc_long(len(v))
                    + b"".join(enc(x, sch["items"]) for x in v)
                    + enc_long(0))
        if t == "map":
            if not v:
                return enc_long(0)
            return (enc_long(len(v))
                    + b"".join(enc_str(k) + enc(x, sch["values"])
                               for k, x in v.items())
                    + enc_long(0))
        raise AvroError(t)

    body = b"".join(enc(rec, schema) for rec in records)
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        body = comp.compress(body) + comp.flush()
    sync = os.urandom(16)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(enc_long(len(meta)))
    for k, v in meta.items():
        out.write(enc_str(k))
        out.write(enc_long(len(v)) + v)
    out.write(enc_long(0))
    out.write(sync)
    out.write(enc_long(len(records)))
    out.write(enc_long(len(body)))
    out.write(body)
    out.write(sync)
    return out.getvalue()
