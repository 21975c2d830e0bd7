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

__all__ = ["compile_predicate", "resolve_refs", "jsonschema_error_udf", "ValidationMode"]


class ValidationMode:
    """V4: strict -> fail the job on any invalid record; lenient (default)
    -> the raw record passes through untouched (reference sinks.py:136-139
    returns the unvalidated record on failure)."""

    STRICT = "strict"
    LENIENT = "lenient"


def _numeric(raw: Column) -> Column:
    return raw.try_cast("double")


def _and_all(preds: list[Column]) -> Column:
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _or_any(preds: list[Column]) -> Column:
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def _branch_type(prop: dict) -> str | None:
    """Declared type of a combinator branch / items subschema — first
    non-null entry of the ``type`` keyword (no fuzzy resolution: branches
    are anonymous, so resolve_property's name-based heuristics don't
    apply)."""
    t = prop.get("type")
    if isinstance(t, list):
        nn = [x for x in t if x != "null"]
        t = nn[0] if nn else None
    return t


def _type_pred(type_id: str | None, raw: Column, num: Column) -> list[Column]:
    if type_id == "integer":
        # draft-7: int-valued floats ARE integers (3.0 passes, 3.5 fails)
        return [raw.isNull() | (raw == "") | (num.isNotNull() & (num == F.floor(num)))]
    if type_id == "number":
        return [raw.isNull() | (raw == "") | num.isNotNull()]
    return []


# --- draft-7 `format` compilation (r6, VERDICT #4) -------------------------
# The reference disables format checking outright (reference
# sinks.py:129 passes format_checker=None), so PARITY is format-off:
# compile_predicate ignores `format` unless the caller opts in with
# check_formats=True.  Opting in runs a driver-side walk that stamps
# every supported format node with _FORMAT_MARKER — a synthetic key the
# recursive keyword compiler picks up wherever subschemas re-enter it
# (items / combinators / patternProperties / propertyNames), so the
# opt-in needs no flag-threading through the recursion.
#
# Semantics are the draft-7 spec forms with two documented seams:
# - raw capture erases scalar provenance, so a NUMERIC instance under a
#   format-constrained property is checked as its text (draft-7 format
#   only applies to strings and would pass it) — same provenance seam
#   as type-only combinator branches;
# - `regex` (Python-re validity) and the exotic iri/idn-* forms stay
#   permissive: there is no JVM-side check that matches Python's re
#   dialect.  With the flag OFF the fallback set is remote-$ref only.
_FORMAT_MARKER = "x-format-compiled"

_RFC3339_DATE = r"\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])"
_RFC3339_TIME = (
    r"([01]\d|2[0-3]):[0-5]\d:([0-5]\d|60)(\.\d+)?"
    r"([Zz]|[+-]([01]\d|2[0-3]):[0-5]\d)"
)


def _fmt_date(raw: Column) -> Column:
    # regex pins the shape; try_to_date (null, never an ANSI throw, on
    # an impossible calendar date like 2024-02-30) pins month lengths.
    return raw.rlike(f"^{_RFC3339_DATE}$") & F.try_to_date(
        raw, "yyyy-MM-dd"
    ).isNotNull()


def _fmt_datetime(raw: Column) -> Column:
    return raw.rlike(f"^{_RFC3339_DATE}[Tt]{_RFC3339_TIME}$") & F.try_to_date(
        F.substring(raw, 1, 10), "yyyy-MM-dd"
    ).isNotNull()


_FORMAT_PREDS = {
    "date": _fmt_date,
    "date-time": _fmt_datetime,
    "time": lambda raw: raw.rlike(f"^{_RFC3339_TIME}$"),
    "email": lambda raw: raw.rlike(r"^[^@\s]+@[^@\s]+$"),
    "hostname": lambda raw: raw.rlike(
        r"^[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
        r"(\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*\.?$"
    )
    & (F.length(raw) <= 253),
    "ipv4": lambda raw: raw.rlike(
        r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
        r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
    ),
    # full 8-group form, or exactly one "::" compression with valid
    # groups on each side (approximation: no embedded-IPv4 tail forms)
    "ipv6": lambda raw: raw.rlike(
        r"^([0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){7}"
        r"|([0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4})*)?"
        r"::([0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4})*)?)$"
    ),
    "uuid": lambda raw: raw.rlike(
        r"^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}"
        r"-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$"
    ),
    "uri": lambda raw: raw.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:\S*$"),
    "uri-reference": lambda raw: raw.rlike(r"^\S*$"),
    "json-pointer": lambda raw: raw.rlike(r"^(/([^/~]|~[01])*)*$"),
}


def inject_format_markers(schema):
    """Driver-side walk stamping every supported ``format`` node with
    the compiled marker.  Pure rewrite — the original ``format`` key is
    untouched (the UDF fallback still sees it, and unsupported formats
    stay unconstrained/permissive)."""
    if isinstance(schema, dict):
        out = {k: inject_format_markers(v) for k, v in schema.items()}
        if isinstance(out.get("format"), str) and out["format"] in _FORMAT_PREDS:
            out[_FORMAT_MARKER] = out["format"]
        return out
    if isinstance(schema, list):
        return [inject_format_markers(v) for v in schema]
    return schema


def _keyword_preds(prop: dict, raw: Column, type_id: str | None) -> list[Column]:
    """Compile one value subschema's keywords to null-tolerant boolean
    Columns.  Recursive: combinator branches and ``items`` subschemas
    re-enter with the same machinery, so arbitrarily nested
    allOf/anyOf/oneOf/not/items trees compile to one Catalyst tree."""
    preds: list[Column] = []
    num = _numeric(raw)

    def _literal_match(values: list) -> Column | None:
        """Raw-capture match for enum/const literals.  JSON spells
        booleans 'true'/'false' (str(True) is 'True' — comparing that
        against the raw capture false-rejected every valid record);
        numbers compare NUMERICALLY (draft-7: 1 == 1.0, and the raw
        text '1.0' never equals '1').  Object/array literals are not
        canonicalizable against raw text -> permissive (None)."""
        strs = [v for v in values if isinstance(v, str)]
        bools = [v for v in values if isinstance(v, bool)]
        nums = [
            float(v)
            for v in values
            if isinstance(v, (int, float)) and not isinstance(v, bool)
        ]
        others = [
            v
            for v in values
            if not isinstance(v, (str, bool, int, float))
            and v is not None
        ]
        if others:
            return None
        branches = []
        if strs:
            branches.append(raw.isin(strs))
        if bools:
            branches.append(
                raw.isin(["true" if b else "false" for b in bools])
            )
        if nums:
            branches.append(num.isin(nums))
        return _or_any(branches) if branches else None

    if "enum" in prop:
        m = _literal_match(list(prop["enum"]))
        if m is not None:
            preds.append(raw.isNull() | m)
    if "const" in prop:
        m = _literal_match([prop["const"]])
        if m is not None:
            preds.append(raw.isNull() | m)
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
    fmt = prop.get(_FORMAT_MARKER)
    if fmt in _FORMAT_PREDS:
        preds.append(raw.isNull() | _FORMAT_PREDS[fmt](raw))
    preds.extend(_type_pred(type_id, raw, num))

    # -- array keywords: the raw capture holds the JSON array TEXT; parse
    # it to array<string> (elements keep their raw scalar text, objects
    # their JSON) and compile element subschemas through forall/exists.
    # Non-array text parses to null -> passes, matching jsonschema's
    # is_type guard (array keywords skip non-array instances).
    _ARRAY_KEYS = ("items", "minItems", "maxItems", "contains", "uniqueItems",
                   "additionalItems")
    if any(k in prop for k in _ARRAY_KEYS):
        arr = F.from_json(raw, "array<string>")
        guard = raw.isNull() | arr.isNull()
        if "minItems" in prop:
            preds.append(guard | (F.size(arr) >= int(prop["minItems"])))
        if "maxItems" in prop:
            preds.append(guard | (F.size(arr) <= int(prop["maxItems"])))
        if prop.get("uniqueItems") is True:
            preds.append(guard | (F.size(F.array_distinct(arr)) == F.size(arr)))
        # NB: F.forall/F.exists infer the lambda's ARITY from its Python
        # signature, so closures must bind subschemas via a factory, never
        # via default args (a 2-param lambda would be called with 2 cols).
        def _sub_pred(s):
            return lambda e: _and_all(_keyword_preds(s, e, _branch_type(s)))

        items = prop.get("items")
        if isinstance(items, dict):
            preds.append(guard | F.forall(arr, _sub_pred(items)))
        elif isinstance(items, list):
            # Tuple form (r5): each index validates against its own
            # subschema.  F.get is null out-of-bounds (never an ANSI
            # error), and the inner preds are null-tolerant, so a
            # shorter array passes — draft-7's absent-item semantics.
            for i, sub in enumerate(items):
                if not isinstance(sub, dict):
                    continue
                el = F.get(arr, i)
                preds.append(
                    guard | _and_all(_keyword_preds(sub, el, _branch_type(sub)))
                )
            ai = prop.get("additionalItems")
            if ai is False:
                preds.append(guard | (F.size(arr) <= len(items)))
            elif isinstance(ai, dict):
                rest = F.slice(
                    arr,
                    len(items) + 1,
                    F.greatest(F.size(arr) - len(items), F.lit(0)),
                )
                preds.append(guard | F.forall(rest, _sub_pred(ai)))
        if isinstance(prop.get("contains"), dict):
            sub = prop["contains"]
            preds.append(
                guard
                | F.exists(
                    arr,
                    lambda e: _and_all(_keyword_preds(sub, e, _branch_type(sub))),
                )
            )

    # -- combinators (null value passes, matching the per-keyword guards)
    for sub in prop.get("allOf", []):
        preds.extend(_keyword_preds(sub, raw, _branch_type(sub) or type_id))
    if prop.get("anyOf"):
        branches = [
            _and_all(_keyword_preds(sub, raw, _branch_type(sub)))
            for sub in prop["anyOf"]
        ]
        preds.append(raw.isNull() | _or_any(branches))
    if prop.get("oneOf"):
        cnt = None
        for sub in prop["oneOf"]:
            b = F.when(
                _and_all(_keyword_preds(sub, raw, _branch_type(sub))), 1
            ).otherwise(0)
            cnt = b if cnt is None else cnt + b
        preds.append(raw.isNull() | (cnt == 1))
    if isinstance(prop.get("not"), dict):
        sub = prop["not"]
        preds.append(
            raw.isNull() | ~_and_all(_keyword_preds(sub, raw, _branch_type(sub)))
        )
    return preds


def _property_predicate(name: str, prop: dict, raw: Column) -> list[Column]:
    """Compile one named property (top level: the declared type comes from
    the same fuzzy resolution the schema/coercion path uses)."""
    rf = resolve_property(name, prop)
    return _keyword_preds(prop, raw, rf.type_id)


def load_ref_registry(path: str) -> dict[str, dict]:
    """Load a pre-fetched remote-$ref registry from a JSON file of
    ``{url: schema_document}`` — the CLI plumbing for ``ref_registry``
    (VERDICT r8 #7: the r8 registry was a dict-valued config a ``--config``
    JSON file could not naturally carry next to large schema documents;
    ``ref_registry_path`` points at a sidecar file instead).  Strictly
    validated at startup: a malformed registry must fail the run loudly,
    not silently leave every remote ref permissive."""
    import json as _json

    with open(path) as fh:
        reg = _json.load(fh)
    if not isinstance(reg, dict):
        raise ValueError(
            f"ref_registry_path {path!r}: expected a JSON object of "
            f"{{url: schema_document}}, got {type(reg).__name__}"
        )
    for url, doc in reg.items():
        if not url.startswith(("http://", "https://")):
            raise ValueError(
                f"ref_registry_path {path!r}: key {url!r} is not an "
                f"http(s) URL"
            )
        if not isinstance(doc, dict):
            raise ValueError(
                f"ref_registry_path {path!r}: entry {url!r} is not a "
                f"schema document (got {type(doc).__name__})"
            )
    return reg


def resolve_refs(
    schema: dict,
    base_dir: str | None = None,
    registry: dict[str, dict] | None = None,
) -> dict:
    """Driver-side expansion of ``$ref`` pointers so the compiled path
    covers referenced subschemas.  Draft-7 semantics: siblings next to
    ``$ref`` are ignored — the node is replaced by the (recursively
    expanded) target.  Depth-capped: a cyclic reference stops expanding
    and the remaining ``$ref`` node compiles permissive (the UDF
    fallback validates cycles with full fidelity).

    Two ref classes resolve (r6 closes VERDICT #4's second half):

    - LOCAL pointers (``#/definitions/...`` / ``#/$defs/...`` / any
      ``#/`` path) — resolved against the current document root.
    - LOCAL-FILE refs (``other.json``, ``schemas/common.json#/defs/x``,
      ``file://...``) — resolved against ``base_dir`` (the schema
      file's own directory, supplied by the caller); the loaded
      document becomes the root for ITS internal refs, and its
      directory the base for its own file refs (chained includes).

    Remote refs (``http(s)://``) are NEVER fetched.  With ``registry``
    (r8, VERDICT r7 #6 — a pre-fetched ``{url: schema_document}`` store,
    opt-in exactly like ``base_dir``) they resolve OFFLINE: the ref's
    fragment-free URL is looked up in the store, the fragment is a JSON
    pointer into that document, the document's own ``#/`` refs resolve
    against itself, and its RELATIVE refs resolve against its URL
    (urljoin) back into the store — chained remote includes work with
    zero network.  URLs absent from the store stay permissive, same as
    before (anything unreadable never false-rejects)."""
    import json as _json
    import os as _os
    from urllib.parse import urljoin as _urljoin

    def load_registry_ref(ref: str, base_url: str | None):
        """(document, fragment, its_base_url) for a registry-resolved
        remote ref, or None when no registry / not present."""
        if not registry:
            return None
        if not ref.startswith(("http://", "https://")):
            if base_url is None:
                return None  # relative ref outside any remote document
            ref = _urljoin(base_url, ref)
        url, frag = (ref.split("#", 1) + [""])[:2]
        doc = registry.get(url)
        if not isinstance(doc, dict):
            return None
        return doc, ("#" + frag if frag else "#"), url

    def resolve_pointer(root: dict, frag: str):
        if frag in ("", "#"):
            return root
        if not frag.startswith("#/"):
            return None
        node = root
        for part in frag[2:].split("/"):
            part = part.replace("~1", "/").replace("~0", "~")
            if not isinstance(node, dict) or part not in node:
                return None
            node = node[part]
        return node

    def load_file_ref(ref: str, bdir: str | None):
        """(document, fragment, its_base_dir) for a local-file ref, or
        None when the ref is remote/unreadable/not a file.

        ALL file refs — absolute paths and ``file://`` URLs included —
        are gated on ``bdir`` being non-None (ADVICE r6): a caller who
        never opted into filesystem resolution via ``ref_base_dir``
        must not have schemas direct the compiler to read arbitrary
        readable JSON; such refs stay permissive, like remote ones."""
        if bdir is None:
            return None
        if ref.startswith(("http://", "https://")):
            return None
        path, frag = (ref.split("#", 1) + [""])[:2]
        if path.startswith("file://"):
            path = path[len("file://"):]
        if not path:
            return None
        if not _os.path.isabs(path):
            path = _os.path.join(bdir, path)
        try:
            with open(path) as fh:
                doc = _json.load(fh)
        except (OSError, ValueError):
            return None
        if not isinstance(doc, dict):
            return None
        return doc, ("#" + frag if frag else "#"), _os.path.dirname(path)

    def walk(node, root, bdir, burl, depth):
        if depth > 32:
            return node
        if isinstance(node, dict):
            ref = node.get("$ref")
            if isinstance(ref, str):
                if ref.startswith("#"):
                    target = resolve_pointer(root, ref)
                    if isinstance(target, dict):
                        return walk(target, root, bdir, burl, depth + 1)
                    return {}  # unresolvable pointer: permissive
                # Inside a registry document, relative refs belong to its
                # URL space; at the top level, file refs win (existing
                # ref_base_dir behavior) and only http(s) tries the store.
                if burl is None:
                    loaded = load_file_ref(ref, bdir)
                    if loaded is not None:
                        doc, frag, fdir = loaded
                        target = resolve_pointer(doc, frag)
                        if isinstance(target, dict):
                            return walk(target, doc, fdir, None, depth + 1)
                remote = load_registry_ref(ref, burl)
                if remote is not None:
                    doc, frag, furl = remote
                    target = resolve_pointer(doc, frag)
                    if isinstance(target, dict):
                        return walk(target, doc, None, furl, depth + 1)
                return {}  # remote-unregistered/unreadable: permissive
            return {
                k: walk(v, root, bdir, burl, depth + 1)
                for k, v in node.items()
            }
        if isinstance(node, list):
            return [walk(v, root, bdir, burl, depth + 1) for v in node]
        return node

    return walk(schema, schema, base_dir, None, 0)


def _raw_object_preds(schema: dict, raw_json_col: str) -> list[Column]:
    """Object-shape keywords that need the UNDECLARED keys of the raw
    record text — compiled over ``json_object_keys`` (JVM-side, null on
    malformed JSON -> permissive, matching the per-keyword null guards):
    min/maxProperties, propertyNames, patternProperties (r5),
    additionalProperties=false (with patternProperties widening the
    legal key set)."""
    preds: list[Column] = []
    pattern_props = schema.get("patternProperties")
    needs = (
        "minProperties" in schema
        or "maxProperties" in schema
        or isinstance(schema.get("propertyNames"), dict)
        or schema.get("additionalProperties") is False
        or isinstance(pattern_props, dict)
    )
    if not needs:
        return preds
    keys = F.json_object_keys(F.col(raw_json_col))
    guard = keys.isNull()
    if "minProperties" in schema:
        preds.append(guard | (F.size(keys) >= int(schema["minProperties"])))
    if "maxProperties" in schema:
        preds.append(guard | (F.size(keys) <= int(schema["maxProperties"])))
    if isinstance(schema.get("propertyNames"), dict):
        sub = schema["propertyNames"]
        preds.append(
            guard
            | F.forall(
                keys, lambda k: _and_all(_keyword_preds(sub, k, "string"))
            )
        )
    if isinstance(pattern_props, dict):
        # patternProperties (r5): every key matching the regex must have a
        # value satisfying the subschema.  The map<string,string> capture
        # preserves the raw-capture convention (scalar text; nested
        # subtrees as their JSON serialization), so the value predicates
        # reuse the exact machinery of declared properties.  Malformed
        # JSON parses to null -> permissive, matching the other guards.
        m = F.from_json(F.col(raw_json_col), "map<string,string>")
        mguard = m.isNull()

        # Single-arg closures via a factory: F.forall infers lambda arity
        # from the Python signature, so default-arg binding breaks it.
        def _entry_pred(p, s):
            return lambda e: ~e["key"].rlike(p) | _and_all(
                _keyword_preds(s, e["value"], _branch_type(s))
            )

        for pat, sub in pattern_props.items():
            if not isinstance(sub, dict):
                continue
            preds.append(
                mguard | F.forall(F.map_entries(m), _entry_pred(pat, sub))
            )
    if schema.get("additionalProperties") is False:
        declared = list(schema.get("properties", {}).keys())
        pats = list(pattern_props.keys()) if isinstance(pattern_props, dict) else []

        def _legal(k):
            branches = [k.isin(declared)] if declared else []
            branches += [k.rlike(p) for p in pats]
            return _or_any(branches)

        preds.append(guard | F.forall(keys, _legal))
    return preds


def _addr(
    name: str,
    source_col: str,
    declared: frozenset,
    raw_json_col: str | None,
) -> Column | None:
    """Address one property's raw value.  Declared properties read from
    the parsed struct; UNDECLARED names (legal in draft-7 — `required`,
    `dependencies` and combinator branches may reference properties the
    top-level schema never declares) fall back to ``get_json_object``
    over the raw record text, which yields the same raw-capture
    semantics (scalar text; null for missing AND for JSON null).
    Referencing an undeclared field used to build F.col against a
    struct field that does not exist — an AnalysisException that crashed
    the whole run.  Returns None (compile permissive) when the name is
    undeclared and no raw column is available."""
    if name in declared:
        return F.col(f"{source_col}.`{name}`")
    if raw_json_col is not None:
        safe = name.replace("'", "\\'")
        return F.get_json_object(F.col(raw_json_col), f"$['{safe}']")
    return None


def _object_preds(
    schema: dict,
    source_col: str,
    raw_json_col: str | None = None,
    declared: frozenset | None = None,
) -> list[Column]:
    """Object-level compilation: properties + required + combinators +
    dependencies + if/then/else, recursing into subschemas against the
    same record struct.  ``raw_json_col`` (when the caller has the raw
    record text) additionally compiles the object-shape keywords; the
    combinator recursion keeps both it and ``declared`` (the top-level
    struct's field names) — every branch describes the SAME object
    instance."""
    if declared is None:
        declared = frozenset(schema.get("properties", {}).keys())
    preds: list[Column] = []
    for name, prop in schema.get("properties", {}).items():
        if not isinstance(prop, dict):
            continue
        raw = _addr(name, source_col, declared, raw_json_col)
        if raw is None:
            continue
        preds.extend(_property_predicate(name, prop, raw))
    for req in schema.get("required", []):
        ref = _addr(req, source_col, declared, raw_json_col)
        if ref is not None:
            preds.append(ref.isNotNull())
    if raw_json_col is not None:
        preds.extend(_raw_object_preds(schema, raw_json_col))

    for sub in schema.get("allOf", []):
        preds.extend(_object_preds(sub, source_col, raw_json_col, declared))
    if schema.get("anyOf"):
        preds.append(
            _or_any(
                [
                    _and_all(
                        _object_preds(sub, source_col, raw_json_col, declared)
                    )
                    for sub in schema["anyOf"]
                ]
            )
        )
    if schema.get("oneOf"):
        cnt = None
        for sub in schema["oneOf"]:
            b = F.when(
                _and_all(
                    _object_preds(sub, source_col, raw_json_col, declared)
                ),
                1,
            ).otherwise(0)
            cnt = b if cnt is None else cnt + b
        preds.append(cnt == 1)
    if isinstance(schema.get("not"), dict):
        preds.append(
            ~_and_all(
                _object_preds(
                    schema["not"], source_col, raw_json_col, declared
                )
            )
        )

    for key, dep in (schema.get("dependencies") or {}).items():
        trig_ref = _addr(key, source_col, declared, raw_json_col)
        if trig_ref is None:
            continue  # trigger not addressable -> permissive
        trigger = trig_ref.isNotNull()
        if isinstance(dep, list):
            refs = [_addr(d, source_col, declared, raw_json_col) for d in dep]
            need = _and_all(
                [r.isNotNull() for r in refs if r is not None]
            )
        elif isinstance(dep, dict):
            need = _and_all(
                _object_preds(dep, source_col, raw_json_col, declared)
            )
        else:
            continue
        preds.append(~trigger | need)

    if isinstance(schema.get("if"), dict):
        cond = _and_all(
            _object_preds(schema["if"], source_col, raw_json_col, declared)
        )
        then_p = (
            _and_all(
                _object_preds(
                    schema["then"], source_col, raw_json_col, declared
                )
            )
            if isinstance(schema.get("then"), dict)
            else F.lit(True)
        )
        else_p = (
            _and_all(
                _object_preds(
                    schema["else"], source_col, raw_json_col, declared
                )
            )
            if isinstance(schema.get("else"), dict)
            else F.lit(True)
        )
        preds.append(F.when(cond, then_p).otherwise(else_p))
    return preds


def compile_predicate(
    schema: dict,
    source_col: str = "record",
    raw_json_col: str | None = None,
    declared_cols: list[str] | None = None,
    check_formats: bool = False,
    ref_base_dir: str | None = None,
    ref_registry: dict[str, dict] | None = None,
) -> Column:
    """Compile the stream's JSON Schema to one is-valid boolean Column.

    Covers (r3, VERDICT #3): enum, const, pattern, min/maxLength,
    minimum/maximum, exclusiveMinimum/Maximum (draft-7 numeric form),
    integer multipleOf, required, numeric/integer type-checks, the array
    family (items, contains, minItems, maxItems, uniqueItems), the
    combinators allOf / anyOf / oneOf / not at both property and object
    level, dependencies (property- and schema-form), and if/then/else —
    all as ONE Catalyst boolean tree.  Returns ``lit(True)`` when the
    schema carries no compilable constraints.

    r3 additions: local ``$ref`` pointers are expanded DRIVER-SIDE before
    compilation (resolve_refs — draft-7 sibling-ignoring semantics,
    cycle-capped), and when the caller supplies ``raw_json_col`` (the raw
    record text) the object-shape keywords compile too via
    ``json_object_keys``: minProperties / maxProperties / propertyNames /
    ``additionalProperties: false``.

    r5 additions (VERDICT r4 #4): ``patternProperties`` (map-capture +
    ``map_entries``/``forall`` — and it now widens the legal key set of
    ``additionalProperties: false`` instead of disabling it), tuple-form
    ``items``, and ``additionalItems`` (false -> length cap; schema ->
    ``forall`` over the tuple tail).  Pattern matching uses ``rlike``
    (unanchored search, same as jsonschema's ``re.search``).

    r6 additions (VERDICT r5 #4): ``check_formats=True`` compiles the
    draft-7 built-in ``format`` values (date, date-time, time, email,
    hostname, ipv4, ipv6, uuid, uri, uri-reference, json-pointer) —
    default OFF for reference parity (the reference disables format
    checking via format_checker=None, reference sinks.py:129); and
    ``ref_base_dir`` resolves local-FILE ``$ref``s (``common.json#/x``)
    against the schema's own directory, chained includes included.

    r8 addition (VERDICT r7 #6): ``ref_registry`` — a pre-fetched
    ``{url: schema_document}`` store — resolves REMOTE ``http(s)://``
    $refs offline (nothing is ever fetched); see :func:`resolve_refs`.

    Remaining UDF-only keywords (remote $refs absent from the registry,
    plus format with the parity-default flag off) are simply not
    constrained by the compiled path — it is strictly PERMISSIVE on
    them, never false-rejecting.  One raw-capture limit:
    scalar provenance is erased (JSON ``"3"`` and ``3`` both capture as
    text '3'), so combinator branches discriminated ONLY by ``type``
    cannot be told apart — discriminate branches by value constraints,
    or use the UDF fallback (tests/test_validation_matrix.py pins both
    the agreement surface and these documented seams).
    """
    schema = resolve_refs(schema, base_dir=ref_base_dir, registry=ref_registry)
    if check_formats:
        schema = inject_format_markers(schema)
    # ``declared_cols`` is the ACTUAL struct's field list when the caller
    # projects (fixed_headers can drop a constrained property — its
    # schema-derived name must then address the raw JSON, not a struct
    # field that does not exist).
    declared = (
        frozenset(declared_cols)
        if declared_cols is not None
        else frozenset(schema.get("properties", {}).keys())
    )
    preds = _object_preds(schema, source_col, raw_json_col, declared)
    return _and_all(preds) if preds else F.lit(True)


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
