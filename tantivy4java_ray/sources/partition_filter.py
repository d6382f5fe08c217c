"""Partition filter DSL — read-side predicate pushdown.

Mirrors the reference's ``filter/PartitionFilter.java:53-140``
(eq/notEq/in/gt/gte/lt/lte/isNull/isNotNull composed with and/or),
compiled to a ``pyarrow.dataset`` expression usable by
``ray.data.read_parquet(filter=...)`` / ``pyarrow.dataset`` scanners so
only matching row groups leave storage.

Each filter also carries a JSON-serializable AST
(``to_json``/``from_json`` round-trip), matching the reference's
cross-process filter shipping (the expression object itself does not
serialize portably).
"""

from __future__ import annotations

import base64
import datetime as _dt
import json
from typing import Any

import pyarrow.compute as pc
import pyarrow.dataset as pads


def _json_default(v):
    """Tagged encodings for the value types a partition filter commonly
    carries but JSON cannot (timestamps on ``warc_ts``, binary keys,
    numpy scalars) — otherwise ``to_json`` raises on exactly the
    filters the fixture invites."""
    import numpy as np
    if isinstance(v, np.datetime64):
        v = v.astype("datetime64[us]").item()
    elif isinstance(v, np.generic):
        return v.item()
    if isinstance(v, _dt.datetime):
        return {"$ts": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"$date": v.isoformat()}
    if isinstance(v, (bytes, bytearray)):
        return {"$b64": base64.b64encode(bytes(v)).decode()}
    raise TypeError(f"partition-filter value {v!r} ({type(v).__name__}) "
                    f"is not JSON-serializable")


def _json_hook(d: dict):
    if len(d) == 1:
        if "$ts" in d:
            return _dt.datetime.fromisoformat(d["$ts"])
        if "$date" in d:
            return _dt.date.fromisoformat(d["$date"])
        if "$b64" in d:
            return base64.b64decode(d["$b64"])
    return d


class PartitionFilter:
    def __init__(self, expr, ast: list):
        self._expr = expr
        self._ast = ast

    # -- leaf factories ------------------------------------------------------
    @staticmethod
    def eq(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) == value, ["eq", col, value])

    @staticmethod
    def not_eq(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) != value,
                               ["not_eq", col, value])

    @staticmethod
    def is_in(col: str, values: list) -> "PartitionFilter":
        return PartitionFilter(pc.field(col).isin(values),
                               ["is_in", col, list(values)])

    @staticmethod
    def gt(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) > value, ["gt", col, value])

    @staticmethod
    def gte(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) >= value, ["gte", col, value])

    @staticmethod
    def lt(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) < value, ["lt", col, value])

    @staticmethod
    def lte(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) <= value, ["lte", col, value])

    @staticmethod
    def is_null(col: str) -> "PartitionFilter":
        return PartitionFilter(pc.field(col).is_null(), ["is_null", col])

    @staticmethod
    def is_not_null(col: str) -> "PartitionFilter":
        return PartitionFilter(~pc.field(col).is_null(),
                               ["is_not_null", col])

    # -- composition ---------------------------------------------------------
    def and_(self, other: "PartitionFilter") -> "PartitionFilter":
        return PartitionFilter(self._expr & other._expr,
                               ["and", self._ast, other._ast])

    def or_(self, other: "PartitionFilter") -> "PartitionFilter":
        return PartitionFilter(self._expr | other._expr,
                               ["or", self._ast, other._ast])

    def __and__(self, other):
        return self.and_(other)

    def __or__(self, other):
        return self.or_(other)

    def to_expression(self):
        """-> pyarrow.dataset.Expression for read_parquet(filter=...)."""
        return self._expr

    def to_json(self) -> str:
        """JSON AST, round-trippable via ``from_json`` (the reference
        ships the filter as JSON across processes). Timestamps, dates,
        bytes and numpy scalars are encoded with ``$ts``/``$date``/
        ``$b64`` tags."""
        return json.dumps(self._ast, default=_json_default)

    #: leaf factory names from_json may dispatch to — NEVER raw getattr
    #: (a malformed/hostile AST could invoke arbitrary class attributes,
    #: e.g. ["scan", path] would perform file I/O during deserialization)
    _JSON_OPS = frozenset(("eq", "not_eq", "is_in", "gt", "gte", "lt",
                           "lte", "is_null", "is_not_null"))

    @staticmethod
    def from_json(text: str) -> "PartitionFilter":
        def build(node: list) -> "PartitionFilter":
            op, *args = node
            if op in ("and", "or"):
                left, right = build(args[0]), build(args[1])
                return left.and_(right) if op == "and" else \
                    left.or_(right)
            if op not in PartitionFilter._JSON_OPS:
                raise ValueError(f"unknown partition-filter op {op!r}")
            return getattr(PartitionFilter, op)(*args)

        return build(json.loads(text, object_hook=_json_hook))

    def scan(self, paths, columns: list[str] | None = None):
        """Filtered pyarrow table (row-group pruning via the expression)."""
        ds = pads.dataset(paths, format="parquet")
        return ds.to_table(filter=self._expr, columns=columns)
