"""Index schema: field types, per-field options, Arrow-schema inference.

Mirrors the semantics of the reference's ``SchemaBuilder`` / ``Schema``
(``src/main/java/io/indextables/tantivy4java/core/SchemaBuilder.java:60-416``,
``core/Schema.java:106-216``) and its Arrow->index type mapping
(``native/src/parquet_companion/schema_derivation.rs:486-495``), but is a
plain Python dataclass validated against a ``pyarrow.Schema`` — no native
schema object exists in this engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import Any

import pyarrow as pa


class FieldType(str, Enum):
    """Field types, matching the reference's ``core/FieldType.java:26-36``."""

    TEXT = "text"          # tokenized full text
    STRING = "string"      # exact-match keyword (raw tokenizer)
    INTEGER = "integer"    # i64
    UNSIGNED = "unsigned"  # u64
    FLOAT = "float"        # f64
    BOOLEAN = "boolean"
    DATE = "date"          # timestamp[us]
    BYTES = "bytes"
    FACET = "facet"        # hierarchical path "/a/b/c"
    JSON = "json"
    IP_ADDR = "ip_addr"


#: index options for text fields (``SchemaBuilder.java:114-124``).
INDEX_OPTIONS = ("basic", "freq", "position")


@dataclass
class FieldConfig:
    name: str
    type: FieldType
    stored: bool = False       # retrievable from the doc store (we use
    #                            parquet-companion mode: the source parquet IS
    #                            the store — indexing.rs:210 precedent)
    indexed: bool = True
    fast: bool = False         # columnar doc-values (range queries, aggs)
    tokenizer: str = "default"  # analyzer name for TEXT fields
    index_option: str = "position"  # basic | freq | position
    fieldnorms: bool = True    # store quantized doc length for BM25

    def __post_init__(self) -> None:
        self.type = FieldType(self.type)
        if self.index_option not in INDEX_OPTIONS:
            raise ValueError(f"bad index_option {self.index_option!r}")
        if self.type is FieldType.STRING:
            self.tokenizer = "raw"
            self.index_option = "basic"

    def to_dict(self) -> dict[str, Any]:
        d = self.__dict__.copy()
        d["type"] = self.type.value
        return d

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "FieldConfig":
        return cls(**d)


@dataclass
class IndexSchema:
    """An explicit, fixed field list (reference: ``core/Schema.java``)."""

    fields: list[FieldConfig] = dc_field(default_factory=list)

    # -- builder-style API mirroring SchemaBuilder.addTextField etc. --------
    def add_text_field(self, name: str, *, stored: bool = False,
                       tokenizer: str = "default",
                       index_option: str = "position",
                       fast: bool = False,
                       fieldnorms: bool = True) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.TEXT, stored=stored,
                                       tokenizer=tokenizer,
                                       index_option=index_option, fast=fast,
                                       fieldnorms=fieldnorms))
        return self

    def add_string_field(self, name: str, *, stored: bool = False,
                         fast: bool = False) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.STRING, stored=stored,
                                       fast=fast))
        return self

    def add_integer_field(self, name: str, *, stored: bool = False,
                          indexed: bool = True, fast: bool = True) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.INTEGER, stored=stored,
                                       indexed=indexed, fast=fast))
        return self

    def add_unsigned_field(self, name: str, **kw: Any) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.UNSIGNED,
                                       fast=kw.pop("fast", True), **kw))
        return self

    def add_float_field(self, name: str, *, stored: bool = False,
                        indexed: bool = True, fast: bool = True) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.FLOAT, stored=stored,
                                       indexed=indexed, fast=fast))
        return self

    def add_boolean_field(self, name: str, **kw: Any) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.BOOLEAN,
                                       fast=kw.pop("fast", True), **kw))
        return self

    def add_date_field(self, name: str, *, stored: bool = False,
                       indexed: bool = True, fast: bool = True) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.DATE, stored=stored,
                                       indexed=indexed, fast=fast))
        return self

    def add_bytes_field(self, name: str, **kw: Any) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.BYTES, **kw))
        return self

    def add_facet_field(self, name: str, **kw: Any) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.FACET, **kw))
        return self

    def add_json_field(self, name: str, **kw: Any) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.JSON, **kw))
        return self

    def add_ip_addr_field(self, name: str, **kw: Any) -> "IndexSchema":
        self.fields.append(FieldConfig(name, FieldType.IP_ADDR,
                                       fast=kw.pop("fast", True), **kw))
        return self

    # -- introspection (Schema.getFieldNames / getFieldInfo) ----------------
    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def get_field(self, name: str) -> FieldConfig:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def __contains__(self, name: str) -> bool:
        return any(f.name == name for f in self.fields)

    @property
    def text_fields(self) -> list[FieldConfig]:
        return [f for f in self.fields if f.type is FieldType.TEXT]

    @property
    def indexed_token_fields(self) -> list[FieldConfig]:
        """Fields whose values go through the term dictionary."""
        return [f for f in self.fields
                if f.indexed and f.type in (FieldType.TEXT, FieldType.STRING,
                                            FieldType.FACET, FieldType.JSON,
                                            FieldType.IP_ADDR)]

    @property
    def fast_fields(self) -> list[FieldConfig]:
        return [f for f in self.fields if f.fast]

    def to_dict(self) -> dict[str, Any]:
        return {"fields": [f.to_dict() for f in self.fields]}

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "IndexSchema":
        return cls(fields=[FieldConfig.from_dict(f) for f in d["fields"]])

    def validate_arrow(self, arrow_schema: pa.Schema) -> None:
        """Every indexed field must exist in the input Arrow schema."""
        names = set(arrow_schema.names)
        missing = [f.name for f in self.fields if f.name not in names]
        if missing:
            raise ValueError(f"schema fields missing from input: {missing}")


#: Arrow -> index type mapping; exactly the reference's table at
#: ``native/src/parquet_companion/schema_derivation.rs:486-495``.
def _map_arrow_type(t: pa.DataType) -> FieldType | None:
    if pa.types.is_boolean(t):
        return FieldType.BOOLEAN
    if pa.types.is_unsigned_integer(t):
        return FieldType.UNSIGNED
    if pa.types.is_integer(t):
        return FieldType.INTEGER
    if pa.types.is_floating(t) or pa.types.is_decimal128(t):
        return FieldType.FLOAT
    if pa.types.is_decimal256(t):
        return FieldType.STRING
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return FieldType.STRING
    if (pa.types.is_binary(t) or pa.types.is_large_binary(t)
            or pa.types.is_fixed_size_binary(t)):
        # FixedSizeBinary(_) => Bytes in the reference table too
        return FieldType.BYTES
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return FieldType.DATE
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_map(t) or pa.types.is_struct(t)):
        return FieldType.JSON
    return None


def infer_index_schema(arrow_schema: pa.Schema,
                       *,
                       text_fields: tuple[str, ...] = (),
                       skip_fields: tuple[str, ...] = (),
                       tokenizer_overrides: dict[str, str] | None = None,
                       ) -> IndexSchema:
    """Derive an IndexSchema from a pyarrow schema.

    ``text_fields`` promote string columns from exact-match STRING to
    tokenized TEXT (the reference does this with per-field tokenizer
    overrides at schema-derivation time, ``schema_derivation.rs:122-345``).
    """
    tokenizer_overrides = tokenizer_overrides or {}
    schema = IndexSchema()
    for f in arrow_schema:
        if f.name in skip_fields:
            continue
        ft = _map_arrow_type(f.type)
        if ft is None:
            continue
        if f.name in text_fields and ft is FieldType.STRING:
            schema.add_text_field(
                f.name, tokenizer=tokenizer_overrides.get(f.name, "default"))
        else:
            fast = ft in (FieldType.INTEGER, FieldType.UNSIGNED,
                          FieldType.FLOAT, FieldType.BOOLEAN, FieldType.DATE,
                          FieldType.STRING)
            schema.fields.append(FieldConfig(f.name, ft, fast=fast))
    return schema
