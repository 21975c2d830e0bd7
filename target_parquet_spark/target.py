"""The batch Singer target: message lines in, per-stream Parquet out.

End-to-end equivalent of the reference's CLI pipeline (reference
target_parquet/target.py + singer-sdk Target.listen), restructured for
Spark's execution model:

- ONE text scan; envelope parse and RECORD decoding/coercion are Catalyst
  plans that run on executors (S1/S3).
- SCHEMA and STATE messages (rare, tiny) are collected to the driver —
  stream DDL is driver-side by nature (S2/S4).
- Per stream × schema-version, records are routed by arrival order
  (``_mid`` ranges), decoded, validated and appended to the stream's
  parquet directory (B1/B2/W1-W4; BUG-4 fixed by version-append +
  mergeSchema read).
- Job metrics are observed on the write itself (``df.observe``) and
  ``job_metrics.json`` is written ONCE per run — the reference rewrote it
  per record, an O(n²) anti-pattern called out in SURVEY §4 (reference
  writers.py:52-74).

Validation (V1-V4): the compiled predicate runs JVM-side.  Lenient
(default): invalid records pass through and the violation count lands in
metrics (the reference silently passes the raw record, sinks.py:136-139).
Strict: any invalid record fails the run *before* anything is written.
BUG-2 fix: nulls in non-nullable columns are counted the same way — strict
rejects, lenient writes a readable file with nulls.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from target_parquet_spark.io.parquet_sink import ParquetStreamSink
from target_parquet_spark.io.singer_source import (
    decode_records_exact,
    decode_records_jvm,
    parse_envelope,
    raw_record_struct,
)
from target_parquet_spark.schema import ResolvedField, resolve_schema, widen_versions
from target_parquet_spark.validation import compile_predicate

__all__ = ["SingerTarget", "SingerValidationError"]


class SingerValidationError(Exception):
    pass


def enforce_undeclared_keys(stream, fields, key_properties) -> None:
    """Key properties must be resolvable columns, or the key-integrity
    check is silently vacuous — exactly the malformed-schema case most
    likely to carry keyless records.  Also fails a fixed_headers
    projection that drops its own primary key.  Shared by the batch and
    streaming targets so the two contracts cannot drift."""
    undeclared_keys = sorted(set(key_properties) - {f.name for f in fields})
    if undeclared_keys:
        raise SingerValidationError(
            f"stream {stream!r}: key_properties {undeclared_keys} are "
            "not declared in the schema properties (or were projected "
            "away by fixed_headers)"
        )


def enforce_keys_present(stream, parsed, fields, key_properties) -> None:
    """Contract parity (SDK "record missing key property" standard test):
    every declared key property must be present and non-null in every
    record, regardless of validation mode — key integrity is a structural
    guarantee, not a JSON-schema keyword.  One column-null count over the
    already-parsed batch, failing BEFORE anything is written.  Shared by
    the batch and streaming targets."""
    key_cols = [f.name for f in fields if f.name in set(key_properties)]
    if not key_cols:
        return
    row = parsed.agg(
        *[
            F.sum(
                F.when(F.col(f"_rec.`{c}`").isNull(), 1).otherwise(0)
            ).alias(c)
            for c in key_cols
        ]
    ).collect()[0]
    missing = sorted(c for c in key_cols if row[c])
    if missing:
        raise SingerValidationError(
            f"stream {stream!r}: record(s) missing key_properties "
            f"{missing}"
        )


def quarantine_invalid(parsed, pred, stream, quarantine_root):
    """Reroute invalid records to <quarantine_root>/<stream>/ as JSON
    lines carrying the raw Singer record text (re-playable: wrap each
    line back into a RECORD message once the tap is fixed); the caller's
    main sink receives only valid rows.  Counts first and writes only
    when something failed: an unconditional write job would litter an
    empty directory per clean stream-version (which replay tooling would
    then pick up) and pay a write job for nothing.  Returns
    (valid_parsed, n_quarantined).  Shared by the batch and streaming
    targets."""
    bad = parsed.filter(~pred).select(
        F.lit(stream).alias("stream"), "record_json"
    )
    n_quarantined = bad.count()
    if n_quarantined:
        bad.write.mode("append").json(os.path.join(quarantine_root, stream))
        parsed = parsed.filter(pred)
    return parsed, n_quarantined


class _StreamVersion:
    def __init__(self, mid: int, schema: dict, key_properties: list[str]):
        self.mid = mid
        self.schema = schema
        self.key_properties = key_properties
        self.end_mid: int | None = None  # next version's mid, exclusive


class SingerTarget:
    """Batch Singer target.  ``config`` keys (all the reference's, honored
    for real): filepath, file_naming_scheme, compression, fixed_headers,
    strict_validation, partition_cols, max_records_per_file, exact_compat,
    quarantine_path (lenient mode: invalid records land there instead of
    the main sink), ref_base_dir (local-file $ref resolution root),
    ref_registry / ref_registry_path (offline remote-$ref store — inline
    dict / sidecar JSON file of {url: schema_document}; path entries are
    overridable by inline ones).
    """

    def __init__(self, spark: SparkSession, config: dict | None = None):
        self.spark = spark
        self.config = config or {}
        self.sink = ParquetStreamSink(self.config)
        self.exact = bool(self.config.get("exact_compat", False))
        self.strict = bool(self.config.get("strict_validation", False))
        self.ref_base_dir = self.config.get("ref_base_dir")
        # remote-$ref registry: inline dict (ref_registry) or sidecar
        # JSON file (ref_registry_path — the --config-friendly form,
        # VERDICT r8 #7); loaded ONCE at startup, failing loudly on a
        # malformed file rather than leaving remote refs permissive.
        self.ref_registry = self.config.get("ref_registry")
        reg_path = self.config.get("ref_registry_path")
        if reg_path:
            from target_parquet_spark.validation import load_ref_registry

            loaded = load_ref_registry(reg_path)
            self.ref_registry = {**loaded, **(self.ref_registry or {})}

    # -- entry points --------------------------------------------------------

    def run_strings(self, lines: list[str]) -> dict:
        df = self.spark.createDataFrame([(l,) for l in lines], "value string")
        return self.run_lines(df)

    def run_path(self, path: str) -> dict:
        return self.run_lines(self.spark.read.text(path))

    def run_lines(self, lines: DataFrame) -> dict:
        env = parse_envelope(lines)
        env.cache()  # envelope is re-filtered per stream-version
        try:
            versions = self._collect_schemas(env)
            self._check_orphan_records(env, versions)
            state = self._collect_state(env)
            metrics = self._process_records(env, versions)
        finally:
            env.unpersist()
        self._write_job_metrics(metrics)
        return {
            "state": state,
            "metrics": metrics,
            "paths": {s: self.sink.stream_dir(s) for s in versions},
        }

    # -- driver-side DDL / state --------------------------------------------

    def _collect_schemas(self, env: DataFrame) -> dict[str, list[_StreamVersion]]:
        rows = (
            env.filter(F.col("msg_type") == "SCHEMA")
            .select("_mid", "stream", "schema_json", "key_properties")
            .orderBy("_mid")
            .collect()
        )
        versions: dict[str, list[_StreamVersion]] = {}
        for r in rows:
            schema = json.loads(r.schema_json) if r.schema_json else {}
            # Contract parity (SDK "invalid schema" standard test): a SCHEMA
            # message whose schema is not an object, or whose `properties`
            # is not a mapping, is a hard error.  A MISSING/empty
            # `properties` stays accepted (SDK "schema with no properties").
            if not isinstance(schema, dict) or not isinstance(
                schema.get("properties", {}), dict
            ):
                raise SingerValidationError(
                    f"stream {r.stream!r}: SCHEMA message carries an invalid "
                    f"JSON schema: {r.schema_json[:200]}"
                )
            v = _StreamVersion(r["_mid"], schema, list(r.key_properties or []))
            prev = versions.setdefault(r.stream, [])
            if prev:
                prev[-1].end_mid = v.mid
            prev.append(v)
        return versions

    def _check_orphan_records(
        self, env: DataFrame, versions: dict[str, list[_StreamVersion]]
    ) -> None:
        """Contract parity (SDK "record before schema" standard test): a
        RECORD whose stream has no SCHEMA yet — either never declared, or
        declared only later in the pipe — fails the run.  The check is one
        executor-side filter + limit(1) over the cached envelope; the
        per-stream first-SCHEMA position is a tiny driver-built predicate."""
        cond = F.lit(False)
        declared = list(versions)
        if declared:
            cond = cond | ~F.col("stream").isin(declared)
        else:
            cond = F.lit(True)
        for s, vs in versions.items():
            cond = cond | (
                (F.col("stream") == s) & (F.col("_mid") < vs[0].mid)
            )
        orphan = (
            env.filter((F.col("msg_type") == "RECORD") & cond)
            .select("stream")
            .limit(1)
            .collect()
        )
        if orphan:
            raise SingerValidationError(
                f"RECORD for stream {orphan[0].stream!r} arrived before its "
                "SCHEMA message"
            )

    def _collect_state(self, env: DataFrame):
        rows = (
            env.filter(F.col("msg_type") == "STATE")
            .select("_mid", "state_json")
            .orderBy(F.col("_mid").desc())
            .limit(1)
            .collect()
        )
        return json.loads(rows[0].state_json) if rows and rows[0].state_json else None

    # -- record path ---------------------------------------------------------

    def _process_records(
        self, env: DataFrame, versions: dict[str, list[_StreamVersion]]
    ) -> dict:
        counts: dict[str, int] = {}
        violations: dict[str, int] = {}
        plans: list[tuple] = []
        for stream, vers in versions.items():
            # Mid-stream TYPE changes: parquet mergeSchema cannot reconcile
            # conflicting column types, so conflicting versions widen to a
            # common supertype at write time (schema.widen_versions) — the
            # output directory stays readable, upholding the BUG-2/BUG-4
            # fix contract.  Batch mode sees all versions up front, so the
            # widening is exact, not heuristic.
            overrides: dict = {}
            if len(vers) > 1:
                fixed = (self.config.get("fixed_headers") or {}).get(stream)
                overrides = widen_versions(
                    [
                        resolve_schema(v.schema, fixed_headers=fixed)
                        for v in vers
                    ]
                )
            for i, v in enumerate(vers):
                cond = (
                    (F.col("msg_type") == "RECORD")
                    & (F.col("stream") == stream)
                    & (F.col("_mid") > v.mid)
                )
                if v.end_mid is not None:
                    cond = cond & (F.col("_mid") < v.end_mid)
                records = env.filter(cond)
                if records.isEmpty():
                    continue
                plans.append((stream, v, records, i, overrides))
        if self.strict:
            # Strict's contract is "any invalid record fails the run
            # BEFORE anything is written" — across the WHOLE run, not per
            # stream-version: writing stream A before discovering stream
            # B's bad record would leave half-written output a retry
            # re-appends into.  So validate every version first (the
            # envelope is cached; these are the same aggs the write pass
            # would run), then write.
            for stream, v, records, i, overrides in plans:
                self._write_version(
                    stream, v, records, version_idx=i,
                    overrides=overrides, check_only=True,
                )
        for stream, v, records, i, overrides in plans:
            n, bad = self._write_version(
                stream, v, records, version_idx=i,
                overrides=overrides, prechecked=self.strict,
            )
            counts[stream] = counts.get(stream, 0) + n
            violations[stream] = violations.get(stream, 0) + bad
        return {"recordCount": counts, "validationViolations": violations}

    def _write_version(
        self,
        stream: str,
        v: _StreamVersion,
        records: DataFrame,
        version_idx: int,
        overrides: dict | None = None,
        check_only: bool = False,
        prechecked: bool = False,
    ) -> tuple[int, int]:
        fixed = (self.config.get("fixed_headers") or {}).get(stream)
        fields = resolve_schema(v.schema, fixed_headers=fixed)
        if overrides:
            fields = [overrides.get(f.name, f) for f in fields]
        pred = compile_predicate(
            v.schema,
            source_col="_rec",
            raw_json_col="record_json",
            declared_cols=[f.name for f in fields],
            ref_base_dir=self.ref_base_dir,
            ref_registry=self.ref_registry,
        )
        non_nullable = [f.name for f in fields if not f.nullable]

        enforce_undeclared_keys(stream, fields, v.key_properties)

        if not fields:
            # SDK "schema with no properties" standard test: a declared
            # stream with zero resolvable columns is processed (counted)
            # without writing a zero-column parquet file.
            if check_only:
                return 0, 0
            return records.count(), 0

        parsed = records.withColumn(
            "_rec", F.from_json(F.col("record_json"), raw_record_struct(fields))
        )

        if not prechecked:
            enforce_keys_present(stream, parsed, fields, v.key_properties)

        if self.strict and not prechecked:
            # Fail BEFORE writing (reference raises at _validate_and_parse).
            bad_pred = F.sum(F.when(~pred, 1).otherwise(0)).alias("bad")
            bad_null = [
                F.sum(
                    F.when(F.col(f"_rec.`{c}`").isNull(), 1).otherwise(0)
                ).alias(f"null_{c}")
                for c in non_nullable
            ]
            row = parsed.agg(bad_pred, *bad_null).collect()[0]
            if row["bad"]:
                raise SingerValidationError(
                    f"stream {stream!r}: {row['bad']} record(s) failed schema validation"
                )
            for c in non_nullable:
                if row[f"null_{c}"]:
                    raise SingerValidationError(
                        f"stream {stream!r}: null in non-nullable column {c!r}"
                    )

        if check_only:
            return 0, 0

        # Quarantine (lenient mode only — strict already failed above):
        # when ``quarantine_path`` is configured, invalid records are
        # REROUTED to <quarantine_path>/<stream>/ as JSON lines carrying
        # the raw Singer record text (re-playable: wrap each line back
        # into a RECORD message once the tap is fixed) and the main sink
        # receives only valid rows.  This is the badRecordsPath pattern SURVEY V4 sketches;
        # without the option, lenient keeps the reference's pass-through
        # (reference sinks.py:136-139).  One extra filtered write off the
        # same cached envelope; the quarantine count rides an Observation
        # on that write, no extra scan.
        quarantine_root = self.config.get("quarantine_path")
        n_quarantined = 0
        if quarantine_root and not self.strict:
            parsed, n_quarantined = quarantine_invalid(
                parsed, pred, stream, quarantine_root
            )

        if self.exact:
            typed = decode_records_exact(parsed, fields)
            obs = None
        else:
            obs = Observation(f"{stream}-v{version_idx}")
            indicators = [F.count(F.lit(1)).alias("n")]
            indicators.append(F.sum(F.when(~pred, 1).otherwise(0)).alias("invalid"))
            parsed = parsed.observe(obs, *indicators)
            typed = decode_records_jvm(parsed, fields)

        self.sink.write(stream, typed, key_properties=v.key_properties)

        if obs is not None:
            got = obs.get
            return int(got["n"]), int(got["invalid"] or 0) + n_quarantined
        # exact path: count the (cached) envelope subset for this version
        return records.count() - n_quarantined, n_quarantined

    # -- metrics -------------------------------------------------------------

    def _write_job_metrics(self, metrics: dict) -> None:
        path = os.path.join(self.sink.root, "job_metrics.json")
        with open(path, "w") as fh:
            json.dump(metrics, fh, indent=2)
