"""Property-based tests (hypothesis) — the reference had none (SURVEY §5).

Two layers:
- pure driver-side invariants of the schema translator, hammered with
  random JSON-Schema property dicts;
- equivalence of the two record-decode paths (vectorized JVM expressions
  vs exact-compat pandas) on the value domain where their semantics are
  defined to agree.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from target_parquet_spark.schema import resolve_property, resolve_type

TYPE_NAMES = ["null", "number", "integer", "boolean", "string", "array", "object"]

type_entry = st.sampled_from(TYPE_NAMES)
type_value = st.one_of(
    st.none(),
    type_entry,
    st.lists(type_entry, min_size=1, max_size=4),
)
prop_dict = st.fixed_dictionaries(
    {},
    optional={
        "type": type_value,
        "format": st.sampled_from([None, "date-time", "email"]),
    },
)


def _types_of(prop):
    t = prop.get("type")
    if t is None:
        return ["string", "null"]
    return [t] if isinstance(t, str) else list(t)


@given(prop_dict)
def test_resolve_property_invariants(prop):
    rf = resolve_property("f", prop)
    types = _types_of(prop)
    # nullability: any null/array/object variant or date-time format forces it
    if "null" in types or "array" in types or "object" in types:
        assert rf.nullable
    if prop.get("format") == "date-time" and rf.type_id == "string":
        assert rf.nullable and rf.spark_type == T.TimestampType()
    # resolved type comes from the declared non-null set (BUG-3: single path)
    non_null = [t for t in types if t != "null"]
    if non_null:
        assert rf.type_id == resolve_type(non_null)
        if "boolean" in non_null:
            assert rf.type_id == "boolean"
        elif "string" in non_null:
            assert rf.type_id == "string"
    else:
        assert rf.type_id == "null" and rf.nullable


@given(st.lists(type_entry.filter(lambda t: t != "null"), min_size=1, max_size=4))
def test_resolve_type_total_and_member(types):
    got = resolve_type(types)
    assert got in types  # never invents a type


anyof_variant = st.fixed_dictionaries({}, optional={"type": type_value})


@given(st.lists(anyof_variant, min_size=1, max_size=3))
def test_anyof_nullability_union(variants):
    """BUG-1 fix: a null ANYWHERE in anyOf makes the field nullable."""
    rf = resolve_property("f", {"anyOf": variants})
    if any("null" in _types_of(v) for v in variants):
        assert rf.nullable


# ---------------------------------------------------------------------------
# decode-path equivalence (JVM vectorized vs exact-compat pandas)
# ---------------------------------------------------------------------------

# Values on which both paths are defined to agree per type (SURVEY §2 C4-C10;
# the known divergences — Python str(True)/"true", float repr — are pinned
# separately in tests/test_target_integration.py).
scalar_by_type = {
    "integer": st.one_of(
        st.none(), st.integers(min_value=-(2**53), max_value=2**53), st.just("")
    ),
    "number": st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.integers(min_value=-(2**53), max_value=2**53),
        st.just(""),
    ),
    "boolean": st.one_of(st.none(), st.booleans(), st.just("")),
    "string": st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=40,
        ),
    ),
}

record_case = st.sampled_from(list(scalar_by_type)).flatmap(
    lambda tid: st.tuples(st.just(tid), scalar_by_type[tid])
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(record_case, min_size=1, max_size=8))
def test_decode_paths_agree(spark, cases):
    from target_parquet_spark.io.singer_source import (
        decode_records_exact,
        decode_records_jvm,
    )
    from target_parquet_spark.schema import resolve_schema

    schema = {
        "type": "object",
        "properties": {
            f"c{i}": {"type": [tid, "null"]} for i, (tid, _v) in enumerate(cases)
        },
    }
    fields = resolve_schema(schema)
    rec = {f"c{i}": v for i, (_t, v) in enumerate(cases)}
    from pyspark.sql import functions as F

    from target_parquet_spark.io.singer_source import raw_record_struct

    records = spark.createDataFrame(
        [(json.dumps(rec),)], "record_json string"
    ).withColumn("_rec", F.from_json(F.col("record_json"), raw_record_struct(fields)))

    jvm = decode_records_jvm(records, fields).collect()[0].asDict()
    exact = decode_records_exact(records, fields).collect()[0].asDict()

    for i, (tid, _v) in enumerate(cases):
        a, b = jvm[f"c{i}"], exact[f"c{i}"]
        if tid == "number" and a is not None:
            assert b is not None and abs(a - b) <= 1e-9 * max(1.0, abs(a))
        else:
            assert a == b, f"{tid}: jvm={a!r} exact={b!r}"


# ---------------------------------------------------------------------------
# compiled validation predicate vs jsonschema fallback equivalence
# ---------------------------------------------------------------------------

# Keyword/value generators restricted to the domain where the compiled
# predicate and draft-7 jsonschema are defined to agree: non-null values of
# the declared type (divergences — null handling, cross-type enum — are
# documented in validation.py and pinned by the integration tests).
num_keywords = st.fixed_dictionaries(
    {},
    optional={
        "minimum": st.integers(-50, 50),
        "maximum": st.integers(-50, 50),
        "exclusiveMinimum": st.integers(-50, 50),
        "exclusiveMaximum": st.integers(-50, 50),
        "multipleOf": st.integers(1, 9),
    },
)
str_keywords = st.fixed_dictionaries(
    {},
    optional={
        "minLength": st.integers(0, 6),
        "maxLength": st.integers(0, 10),
        "pattern": st.sampled_from(["^a", "b$", "c", "^[ab]+$"]),
        "enum": st.lists(st.sampled_from(["a", "b", "ab", "cc"]), min_size=1, max_size=3),
    },
)

validation_case = st.one_of(
    st.tuples(
        st.just("number"),
        num_keywords,
        st.one_of(st.integers(-60, 60), st.floats(-60, 60, allow_nan=False)),
    ),
    st.tuples(
        st.just("integer"),
        num_keywords,
        st.integers(-60, 60),
    ),
    st.tuples(
        st.just("string"),
        str_keywords,
        st.text(alphabet="abc", max_size=8),
    ),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(validation_case, min_size=1, max_size=3))
def test_compiled_predicate_matches_jsonschema(spark, cases):
    from pyspark.sql import functions as F

    from target_parquet_spark.io.singer_source import raw_record_struct
    from target_parquet_spark.schema import resolve_schema
    from target_parquet_spark.validation import (
        _build_relaxed_validator,
        compile_predicate,
    )

    schema = {
        "type": "object",
        "properties": {
            f"x{i}": {"type": tid, **kw} for i, (tid, kw, _v) in enumerate(cases)
        },
    }
    record = {f"x{i}": v for i, (_t, _k, v) in enumerate(cases)}

    fields = resolve_schema(schema)
    df = spark.createDataFrame(
        [(json.dumps(record),)], "record_json string"
    ).withColumn("_rec", F.from_json(F.col("record_json"), raw_record_struct(fields)))
    compiled = df.select(
        compile_predicate(schema, source_col="_rec").alias("ok")
    ).collect()[0].ok

    ref_ok = next(iter(_build_relaxed_validator(schema).iter_errors(record)), None) is None
    assert compiled == ref_ok, f"schema={schema} record={record}"


# ---------------------------------------------------------------------------
# connected components vs a union-find reference
# ---------------------------------------------------------------------------

edge = st.tuples(
    st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)
)


def _uf_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    # canonical label = min node of the component
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in parent}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(edge, min_size=1, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    """The distributed label-prop fixpoint must equal a sequential
    union-find on arbitrary graphs (chains, cycles, self-loops, stars,
    parallel edges)."""
    from target_parquet_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


# ---------------------------------------------------------------------------
# interval join vs brute-force pairing
# ---------------------------------------------------------------------------

iv_event = st.tuples(
    st.integers(min_value=0, max_value=3),        # key
    st.integers(min_value=0, max_value=10_000),   # epoch seconds
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(iv_event, min_size=1, max_size=25),
    st.lists(iv_event, min_size=1, max_size=25),
)
def test_interval_join_matches_bruteforce(spark, lefts, rights):
    """Banded equi-join == the quadratic definition: same key, right ts
    strictly after left, within the band."""
    import datetime as dt

    from pyspark.sql import functions as F

    from target_parquet_spark.operators.asof import interval_join

    def ts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    ldf = spark.createDataFrame(
        [(i, k, ts(s)) for i, (k, s) in enumerate(lefts)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, ts(s)) for i, (k, s) in enumerate(rights)],
        "rid long, k long, ts timestamp",
    )
    got = sorted(
        (r.lid, r.rid_right)
        for r in interval_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts", upper="1 hour"
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, (lk, ls) in enumerate(lefts)
        for ri, (rk, rs) in enumerate(rights)
        if lk == rk and ls < rs <= ls + 3600
    )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(edge, min_size=1, max_size=30))
def test_pagerank_invariants_on_symmetric_graphs(spark, edges):
    """On a symmetrized graph (no dangling nodes): ranks are positive,
    sum to ~1, and every node gets at least the teleport floor."""
    from target_parquet_spark.operators.graph import pagerank

    sym = list({(u, v) for u, v in edges}) + [
        (v, u) for u, v in {(u, v) for u, v in edges}
    ]
    df = spark.createDataFrame(sym, "src long, dst long")
    rows = pagerank(df, iters=4).collect()
    n = len(rows)
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-9
    floor = 0.15 / n
    assert all(r.rank >= floor - 1e-12 for r in rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(iv_event, min_size=1, max_size=25),
    st.lists(iv_event, min_size=1, max_size=25),
)
def test_asof_both_directions_match_bruteforce(spark, lefts, rights):
    """Union+window as-of == the quadratic definition, both directions:
    backward takes the latest right at-or-before, forward the earliest
    right at-or-after (ties on ts resolved to the matching side in both,
    with the right row's value disambiguated by the quadratic argmax on
    (ts, rid))."""
    import datetime as dt

    from target_parquet_spark.operators.asof import asof_join

    def ts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    ldf = spark.createDataFrame(
        [(i, k, ts(s)) for i, (k, s) in enumerate(lefts)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, k, ts(s)) for i, (k, s) in enumerate(rights)],
        "rid long, k long, ts timestamp",
    )
    for direction in ("backward", "forward"):
        got = {
            r.lid: r.ts_right
            for r in asof_join(
                ldf, rdf, on="k", left_ts="ts", right_ts="ts",
                direction=direction,
            ).collect()
        }
        want = {}
        for li, (lk, ls) in enumerate(lefts):
            if direction == "backward":
                cands = [rs for (rk, rs) in rights if rk == lk and rs <= ls]
                want[li] = ts(max(cands)) if cands else None
            else:
                cands = [rs for (rk, rs) in rights if rk == lk and rs >= ls]
                want[li] = ts(min(cands)) if cands else None
        assert got == want


# ---------------------------------------------------------------------------
# round-3 operator properties
# ---------------------------------------------------------------------------


@given(
    h=st.integers(min_value=0, max_value=(1 << 56) - 1),
    flips=st.sets(st.integers(min_value=0, max_value=55), max_size=3),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_phash_banding_pigeonhole(spark, h, flips):
    """Pigeonhole guarantee of 4-band banding: any pair within 3 bit
    flips shares at least one untouched 14-bit band, so it MUST surface
    as a candidate and pass hamming <= 3 verification."""
    from target_parquet_spark.operators.multimodal import phash_near_dup_pairs

    h2 = h
    for b in flips:
        h2 ^= 1 << b
    df = spark.createDataFrame(
        [(0, h), (1, h2)], "media_id long, phash long"
    )
    pairs = phash_near_dup_pairs(
        df, bands=4, band_bits=14, max_hamming=3
    ).collect()
    assert len(pairs) == 1
    assert pairs[0]["hamming"] == len(flips)


@given(
    values=st.lists(
        st.floats(min_value=0.01, max_value=1e6, allow_nan=False),
        min_size=20,
        max_size=60,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hdr_bin_quantile_error_bound(spark, values):
    """The log-binned estimate is within one 1.1-factor bin of the true
    quantile for ANY positive distribution — the sketch's contract."""
    import math

    from pyspark.sql import functions as F

    from target_parquet_spark.queries_r4 import hdr_bin

    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = sorted(
        r["b"]
        for r in df.select(hdr_bin(F.col("v")).alias("b")).collect()
    )
    # CDF-read estimate for p50 from the bin counts
    k = math.ceil(0.5 * len(got))
    est = 1.1 ** (got[k - 1] + 0.5)
    true = sorted(values)[k - 1]
    assert est / true < 1.1 * 1.001 and true / est < 1.1 * 1.001


@given(seed=st.integers(min_value=0, max_value=2**31))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sequence_packing_order_invariant(spark, seed, tmp_path_factory):
    """Packing is keyed on md5 order inside hash shards, so the SAME
    corpus in any row order produces the identical packing report."""
    import random

    from pyspark.sql import functions as F

    from target_parquet_spark.queries import QUERIES

    rng = random.Random(seed)
    docs = [
        (i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(5, 60))))
        for i in range(80)
    ]
    out = str(tmp_path_factory.mktemp("pack"))
    base = spark.createDataFrame(docs, "doc_id long, text string")
    shuffled = spark.createDataFrame(
        sorted(docs, key=lambda d: rng.random()), "doc_id long, text string"
    )
    results = []
    for df in (base, shuffled):
        (
            df.withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("s"))
            .withColumn("n_chars", F.length("text"))
            .write.mode("overwrite")
            .parquet(f"{out}/documents.parquet")
        )
        results.append(
            tuple(QUERIES["sample_sequence_packing"](spark, out).collect()[0])
        )
    assert results[0] == results[1]


# ---------------------------------------------------------------------------
# round-4: content-defined chunking properties
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [11, 29])
def test_cdc_chunks_conservation_and_locality(spark, tmp_path_factory, seed):
    """Random-corpus properties the oracle gate cannot see (the shift-
    robustness/locality property has its own fixed-corpus test,
    tests/test_r6.py::test_cdc_chunks_shift_robustness):
    - chunk counts match the independent hashlib recomputation;
    - conservation: n_chunks * avg_chunk_tokens recovers the doc's token
      count exactly (every token lands in exactly one chunk);
    - duplicated-chunk counts match the reference computed over the
      whole engine-doubled corpus (originals + truncated copies)."""
    import random

    from pyspark.sql import functions as F

    import target_parquet_spark.queries_r6  # noqa: F401  (registers queries)
    from target_parquet_spark.queries import QUERIES
    from test_r6 import _py_chunks as py_chunks

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(200)]
    docs = []
    for i in range(12):
        toks = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(8, 80))]
        docs.append((i, " ".join(toks)))
    out = str(tmp_path_factory.mktemp("cdc"))
    (
        spark.createDataFrame(docs, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    got = {
        r["doc_id"]: r for r in QUERIES["dedup_cdc_chunks"](spark, out).collect()
    }

    # reference chunking over the ENGINE-DOUBLED corpus (the query
    # appends a truncated copy of every doc at doc_id + 1_000_000)
    ref_chunks = {}
    for doc_id, text in docs:
        toks = text.lower().split()
        ref_chunks[doc_id] = py_chunks(toks)
        ref_chunks[doc_id + 1_000_000] = py_chunks(toks[:-2])
    from collections import Counter

    docs_per_chunk = Counter()
    for did, chunks in ref_chunks.items():
        for c in set(chunks):
            docs_per_chunk[c] += 1

    for doc_id, text in docs:
        toks = text.lower().split()
        ref = ref_chunks[doc_id]
        r = got[doc_id]
        assert r["n_chunks"] == len(ref)
        # conservation: total tokens recovered from the report
        assert round(r["n_chunks"] * r["avg_chunk_tokens"]) == len(toks)
        # duplicated-chunk count agrees with the cross-corpus reference
        exp_dup = sum(1 for c in ref if docs_per_chunk[c] >= 2)
        assert r["n_dup_chunks"] == exp_dup, doc_id
