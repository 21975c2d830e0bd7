"""JSON-Schema draft-7 record validation as SQL predicates (V1-V4, SURVEY §2).

The reference validates each record through a customized jsonschema
validator (reference target_parquet/validator.py:51-89) with three relaxed
keywords, swallowing failures unless ``strict_validation`` is set
(reference sinks.py:131-139).

Spark-first design: the common keyword subset compiles to ONE boolean
Column predicate evaluated JVM-side inside codegen — validation becomes a
Catalyst filter instead of a per-record Python call.  The full draft-7
keyword set ($ref / if / allOf / dependencies / patternProperties ...) is
available through a vectorized fallback UDF built on the ``jsonschema``
library (import-gated), replicating the reference's relaxations:

- ``multipleOf`` with a float divisor NEVER fails: the reference's check
  ``round(q, f) != round(q, f)`` (reference validator.py:15) is identically
  False, so float multipleOf is a no-op; integer divisors use ``%``.
- ``exclusiveMaximum``/``exclusiveMinimum`` apply only to numeric instances
  and are skipped for boolean bounds (reference validator.py:23-48).

Null/missing values pass the compiled predicates (SQL semantics); the
reference's jsonschema would fail e.g. ``enum`` on null — full-fidelity
behavior lives in the UDF fallback.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from target_parquet_spark.schema import resolve_property

__all__ = ["compile_predicate", "jsonschema_error_udf", "ValidationMode"]


class ValidationMode:
    """V4: strict -> fail the job on any invalid record; lenient (default)
    -> the raw record passes through untouched (reference sinks.py:136-139
    returns the unvalidated record on failure)."""

    STRICT = "strict"
    LENIENT = "lenient"


def _numeric(raw: Column) -> Column:
    return raw.try_cast("double")


def _property_predicate(name: str, prop: dict, raw: Column) -> list[Column]:
    """Compile one property's keywords to null-tolerant boolean Columns."""
    preds: list[Column] = []
    rf = resolve_property(name, prop)
    num = _numeric(raw)

    if "enum" in prop:
        vals = [str(v) for v in prop["enum"]]
        preds.append(raw.isNull() | raw.isin(vals))
    if "const" in prop:
        preds.append(raw.isNull() | (raw == str(prop["const"])))
    if "pattern" in prop:
        preds.append(raw.isNull() | raw.rlike(prop["pattern"]))
    if "minLength" in prop:
        preds.append(raw.isNull() | (F.length(raw) >= int(prop["minLength"])))
    if "maxLength" in prop:
        preds.append(raw.isNull() | (F.length(raw) <= int(prop["maxLength"])))
    if "minimum" in prop and not isinstance(prop["minimum"], bool):
        preds.append(num.isNull() | (num >= float(prop["minimum"])))
    if "maximum" in prop and not isinstance(prop["maximum"], bool):
        preds.append(num.isNull() | (num <= float(prop["maximum"])))
    if "exclusiveMinimum" in prop and not isinstance(prop["exclusiveMinimum"], bool):
        preds.append(num.isNull() | (num > float(prop["exclusiveMinimum"])))
    if "exclusiveMaximum" in prop and not isinstance(prop["exclusiveMaximum"], bool):
        preds.append(num.isNull() | (num < float(prop["exclusiveMaximum"])))
    if "multipleOf" in prop:
        d = prop["multipleOf"]
        if isinstance(d, int) and not isinstance(d, bool):
            # Integer divisor: plain modulo (reference validator.py:17).
            preds.append(num.isNull() | (num % F.lit(float(d)) == 0.0))
        # Float divisor: always passes (reference validator.py:12-15).
    if rf.type_id in ("number", "integer"):
        # A non-empty, non-castable value violates "type".
        preds.append(raw.isNull() | (raw == "") | num.isNotNull())
    return preds


def compile_predicate(schema: dict, source_col: str = "record") -> Column:
    """Compile the stream's JSON Schema to one is-valid boolean Column.

    Covers: enum, const, pattern, min/maxLength, minimum/maximum,
    exclusiveMinimum/Maximum (draft-7 numeric form), integer multipleOf,
    required, and numeric type-checks.  Returns ``lit(True)`` when the
    schema carries no compilable constraints.
    """
    preds: list[Column] = []
    for name, prop in schema.get("properties", {}).items():
        if not isinstance(prop, dict):
            continue
        raw = F.col(f"{source_col}.`{name}`")
        preds.extend(_property_predicate(name, prop, raw))
    for req in schema.get("required", []):
        preds.append(F.col(f"{source_col}.`{req}`").isNotNull())
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _build_relaxed_validator(schema: dict):
    """Construct a draft-7 validator with the reference's three relaxations
    (behavioral parity with reference validator.py:8-48; fresh code)."""
    from jsonschema import validators
    from jsonschema.exceptions import ValidationError

    def multiple_of(validator, db, instance, _schema):
        if not validator.is_type(instance, "number"):
            return
        if isinstance(db, float):
            return  # float multipleOf never fails (see module docstring)
        if instance % db:
            yield ValidationError(f"{instance!r} is not a multiple of {db!r}")

    def excl_max(validator, maximum, instance, _schema):
        if not validator.is_type(instance, "number") or isinstance(maximum, bool):
            return
        if instance >= maximum:
            yield ValidationError(f"{instance!r} >= exclusiveMaximum {maximum!r}")

    def excl_min(validator, minimum, instance, _schema):
        if not validator.is_type(instance, "number") or isinstance(minimum, bool):
            return
        if instance <= minimum:
            yield ValidationError(f"{instance!r} <= exclusiveMinimum {minimum!r}")

    from jsonschema import Draft7Validator

    cls = validators.extend(
        Draft7Validator,
        {
            "multipleOf": multiple_of,
            "exclusiveMaximum": excl_max,
            "exclusiveMinimum": excl_min,
        },
    )
    return cls(schema, format_checker=None)


def jsonschema_error_udf(schema: dict):
    """Full-fidelity draft-7 validation as an Arrow-vectorized pandas UDF.

    Takes the raw RECORD JSON text column; returns the first validation
    error message, or null when valid.  Use only when the stream schema uses
    keywords the compiled predicate can't express — the predicate path is
    the hot path.  Returns ``None`` if the jsonschema library is absent.
    """
    try:
        import jsonschema  # noqa: F401
    except ImportError:
        return None

    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NB: module uses `from __future__ import annotations`, so inline hints
    # on the inner function would be strings pandas_udf cannot resolve (pd
    # is not in module globals); attach real class objects instead.
    def _validate(raw):
        validator = _build_relaxed_validator(schema)

        def check(txt):
            if txt is None:
                return None
            try:
                rec = json.loads(txt)
            except Exception as e:  # malformed payload text
                return f"unparseable record: {e}"
            err = next(iter(validator.iter_errors(rec)), None)
            return err.message if err is not None else None

        return raw.map(check)

    _validate.__annotations__ = {"raw": pd.Series, "return": pd.Series}
    return pandas_udf(_validate, returnType="string")
