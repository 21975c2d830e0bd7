"""Singer JSON Schema (draft-7) -> Spark ``StructType`` translator.

Pure driver-side functions mirroring the reference's schema builder
(reference target_parquet/sinks.py:21-69) with the two schema bugs fixed:

- BUG-1 (reference sinks.py:47-48): only ``anyOf[0]`` was inspected, so the
  null variant in ``anyOf[1:]`` was dropped and ``None`` silently became
  ``0.0``.  Here *all* anyOf variants contribute nullability and the first
  non-null variant contributes the type.
- BUG-3 (reference sinks.py:58-65 vs 80-81): the schema path resolved fuzzy
  union types by priority ``boolean > string > first`` while the value path
  took ``types[0]``, crashing on ``["number","string"]``.  Here
  :func:`resolve_type` is the single resolution used by both the schema
  translator and the coercion expressions (coerce.py).

Type lattice (reference sinks.py:27-43, SURVEY §1.2):

    null                 -> StringType  (all-null column; Spark cannot write
                                         NullType to Parquet, the reference's
                                         pa.null() could — documented deviation)
    number               -> DoubleType
    integer              -> LongType
    boolean              -> BooleanType
    string + date-time   -> TimestampType   (ms precision at the sink)
    anything else        -> StringType      (arrays/objects as JSON strings)

Nullability (reference sinks.py:51): nullable iff the type set contains
``null``/``array``/``object`` or ``format == "date-time"`` (date-times are
force-nullable because parse failures become null).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

__all__ = [
    "ResolvedField",
    "resolve_property",
    "resolve_type",
    "build_struct_field",
    "json_schema_to_struct",
    "widen_field",
    "widen_versions",
]

_SPARK_TYPES: dict[str, T.DataType] = {
    "number": T.DoubleType(),
    "integer": T.LongType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
}


def _as_type_list(types: Any) -> list[str]:
    """Normalize a JSON-Schema ``type`` (str | list | missing) to a list."""
    if types is None:
        # Missing type defaults to ["string","null"] (reference sinks.py:49).
        return ["string", "null"]
    if isinstance(types, str):
        return [types]
    return list(types)


def resolve_type(types: list[str]) -> str:
    """Fuzzy (union) type resolution: ``boolean > string > first element``.

    Mirrors reference sinks.py:56-65 and is used for BOTH the schema and the
    value-coercion path (BUG-3 fix).  ``types`` must already have ``"null"``
    removed.
    """
    if not types:
        return "string"
    if len(types) == 1:
        return types[0]
    if "boolean" in types:
        return "boolean"
    if "string" in types:
        return "string"
    return types[0]


@dataclass
class ResolvedField:
    """A fully resolved Singer property: everything coerce.py needs."""

    name: str
    type_id: str  # one of: null number integer boolean string array object ...
    format: str | None
    nullable: bool
    spark_type: T.DataType = field(init=False)

    def __post_init__(self) -> None:
        if self.type_id == "string" and self.format == "date-time":
            self.spark_type = T.TimestampType()
        else:
            self.spark_type = _SPARK_TYPES.get(self.type_id, T.StringType())

    @property
    def struct_field(self) -> T.StructField:
        return T.StructField(self.name, self.spark_type, self.nullable)


def resolve_property(name: str, prop: dict) -> ResolvedField:
    """Resolve one JSON-Schema property dict to a :class:`ResolvedField`.

    anyOf handling (BUG-1 fix): nullability is the union over all variants;
    the type comes from the first variant that is not pure-null.
    """
    fmt = prop.get("format")
    if "anyOf" in prop:
        variants = [v for v in prop["anyOf"] if isinstance(v, dict)]
        any_null = any("null" in _as_type_list(v.get("type")) for v in variants)
        chosen: dict = {}
        for v in variants:
            non_null = [t for t in _as_type_list(v.get("type")) if t != "null"]
            if non_null:
                chosen = v
                break
        types = _as_type_list(chosen.get("type")) if chosen else ["null"]
        fmt = chosen.get("format", fmt)
        nullable = (
            any_null
            or any(t in ("null", "array", "object") for t in types)
            or fmt == "date-time"
        )
    else:
        types = _as_type_list(prop.get("type"))
        nullable = (
            any(t in ("null", "array", "object") for t in types)
            or fmt == "date-time"
        )

    non_null = [t for t in types if t != "null"]
    type_id = resolve_type(non_null) if non_null else "null"
    if type_id == "null":
        # Spark cannot write NullType parquet columns; an all-null string
        # column is the faithful readable equivalent (deviation noted above).
        return ResolvedField(name, "null", fmt, True)
    return ResolvedField(name, type_id, fmt, nullable)


def build_struct_field(name: str, prop: dict) -> T.StructField:
    """Property dict -> ``StructField`` (reference build_pyarrow_field, sinks.py:46-69)."""
    return resolve_property(name, prop).struct_field


def json_schema_to_struct(
    schema: dict,
    fixed_headers: list[str] | None = None,
) -> T.StructType:
    """Full Singer SCHEMA -> ``StructType``.

    ``fixed_headers`` implements the per-stream column allow-list projection
    (P1, reference sinks.py:147-153): when given, only listed properties are
    kept, in schema declaration order.
    """
    props = schema.get("properties", {})
    fields = [
        build_struct_field(k, v)
        for k, v in props.items()
        if fixed_headers is None or k in fixed_headers
    ]
    return T.StructType(fields)


def resolve_schema(
    schema: dict,
    fixed_headers: list[str] | None = None,
) -> list[ResolvedField]:
    """Like :func:`json_schema_to_struct` but keeps coercion metadata."""
    props = schema.get("properties", {})
    return [
        resolve_property(k, v)
        for k, v in props.items()
        if fixed_headers is None or k in fixed_headers
    ]


def widen_field(a: ResolvedField, b: ResolvedField) -> ResolvedField | None:
    """Common supertype of one column across two schema versions, or
    ``None`` when the resolved Spark types already agree.

    The reference crashes on mid-stream type changes (BUG-4 family); this
    engine's contract is "never emit an unreadable directory", and
    parquet ``mergeSchema`` cannot reconcile conflicting column types —
    so conflicting versions WIDEN at write time: integer+number -> number
    (lossless numeric widening), anything else -> string (the universal
    supertype of this type lattice; every scalar has a canonical string
    form and nested values are already JSON text).  The widened field is
    nullable — one version's records may lack the column entirely."""
    if a.spark_type == b.spark_type:
        return None
    ids = {a.type_id, b.type_id}
    if ids == {"integer", "number"} and a.format is None and b.format is None:
        return ResolvedField(a.name, "number", None, True)
    return ResolvedField(a.name, "string", None, True)


def widen_versions(
    field_lists: list[list[ResolvedField]],
) -> dict[str, ResolvedField]:
    """Fold :func:`widen_field` over every version's resolved fields:
    returns {column -> widened field} for exactly the columns whose type
    conflicts somewhere in the version history."""
    seen: dict[str, ResolvedField] = {}
    overrides: dict[str, ResolvedField] = {}
    for fields in field_lists:
        for f in fields:
            prev = seen.get(f.name)
            if prev is None:
                seen[f.name] = f
                continue
            w = widen_field(prev, f)
            if w is not None:
                overrides[f.name] = w
                seen[f.name] = w
    return overrides
