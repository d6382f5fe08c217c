"""Partition filter DSL — read-side predicate pushdown.

Mirrors the reference's ``filter/PartitionFilter.java:53-140``
(eq/notEq/in/gt/gte/lt/lte/isNull/isNotNull composed with and/or),
compiled to a ``pyarrow.dataset`` expression usable by
``ray.data.read_parquet(filter=...)`` / ``pyarrow.dataset`` scanners so
only matching row groups leave storage.
"""

from __future__ import annotations

from typing import Any

import pyarrow.compute as pc
import pyarrow.dataset as pads


class PartitionFilter:
    def __init__(self, expr):
        self._expr = expr

    # -- leaf factories ------------------------------------------------------
    @staticmethod
    def eq(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) == value)

    @staticmethod
    def not_eq(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) != value)

    @staticmethod
    def is_in(col: str, values: list) -> "PartitionFilter":
        return PartitionFilter(pc.field(col).isin(values))

    @staticmethod
    def gt(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) > value)

    @staticmethod
    def gte(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) >= value)

    @staticmethod
    def lt(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) < value)

    @staticmethod
    def lte(col: str, value: Any) -> "PartitionFilter":
        return PartitionFilter(pc.field(col) <= value)

    @staticmethod
    def is_null(col: str) -> "PartitionFilter":
        return PartitionFilter(pc.field(col).is_null())

    @staticmethod
    def is_not_null(col: str) -> "PartitionFilter":
        return PartitionFilter(~pc.field(col).is_null())

    # -- composition ---------------------------------------------------------
    def and_(self, other: "PartitionFilter") -> "PartitionFilter":
        return PartitionFilter(self._expr & other._expr)

    def or_(self, other: "PartitionFilter") -> "PartitionFilter":
        return PartitionFilter(self._expr | other._expr)

    def __and__(self, other):
        return self.and_(other)

    def __or__(self, other):
        return self.or_(other)

    def to_expression(self):
        """-> pyarrow.dataset.Expression for read_parquet(filter=...)."""
        return self._expr

    def to_json(self) -> str:
        """Serialized form (the reference ships the filter as JSON)."""
        return str(self._expr)

    def scan(self, paths, columns: list[str] | None = None):
        """Filtered pyarrow table (row-group pruning via the expression)."""
        ds = pads.dataset(paths, format="parquet")
        return ds.to_table(filter=self._expr, columns=columns)
