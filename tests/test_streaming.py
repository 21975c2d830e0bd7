"""Streaming layer tests (SURVEY §7 M4).

Strategy: every streaming pipeline runs with trigger(availableNow=True)
against file sources in tmp dirs, then the materialized output is compared
to the equivalent batch computation on the same data — the batch side is
itself oracle-checked (scripts/check_oracle.py), so equivalence here
transitively pins the streaming semantics.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from target_parquet_spark.io.parquet_sink import read_stream_output
from target_parquet_spark.queries import t
from target_parquet_spark.streaming import (
    SingerStreamTarget,
    running_user_totals,
    session_agg,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)


def _msg(**kw):
    return json.dumps(kw)


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    assert not query.isActive


# ---------------------------------------------------------------------------
# Singer streaming target
# ---------------------------------------------------------------------------


def test_singer_stream_two_batches_schema_carries_over(spark, tmp_path):
    """SCHEMA arrives in batch 1; RECORDs keep flowing in batch 2 — the
    driver-side registry must carry the stream DDL across micro-batches."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = tmp_path / "out"
    out.mkdir()
    schema = {
        "type": "object",
        "properties": {
            "id": {"type": ["integer", "null"]},
            "v": {"type": ["number", "null"]},
        },
    }
    (inbox / "f1.jsonl").write_text(
        "\n".join(
            [_msg(type="SCHEMA", stream="s", schema=schema, key_properties=["id"])]
            + [
                _msg(type="RECORD", stream="s", record={"id": i, "v": i * 1.5})
                for i in range(50)
            ]
        )
    )
    tgt = SingerStreamTarget(
        spark,
        {"filepath": str(out), "file_naming_scheme": "{stream}"},
    )
    _await(tgt.start(str(inbox), available_now=True))

    # second drop: records only (schema must come from the registry)
    (inbox / "f2.jsonl").write_text(
        "\n".join(
            [
                _msg(type="RECORD", stream="s", record={"id": i, "v": 2.0})
                for i in range(50, 80)
            ]
            + [_msg(type="STATE", value={"bookmark": 80})]
        )
    )
    _await(tgt.start(str(inbox), available_now=True))

    got = spark.read.parquet(str(out / "s"))
    assert got.count() == 80
    assert dict(got.dtypes) == {"id": "bigint", "v": "double"}
    assert got.agg(F.countDistinct("id")).collect()[0][0] == 80

    state = json.loads((out / "state.json").read_text())
    assert state["state"] == {"bookmark": 80}
    metrics = json.loads((out / "job_metrics.json").read_text())
    assert metrics["recordCount"] == {"s": 80}


def test_singer_stream_checkpoint_no_reprocess(spark, tmp_path):
    """Restarting against the same checkpoint must not re-ingest committed
    files (checkpoint == Singer STATE semantics)."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = tmp_path / "out"
    out.mkdir()
    schema = {"type": "object", "properties": {"id": {"type": ["integer", "null"]}}}
    (inbox / "f1.jsonl").write_text(
        "\n".join(
            [_msg(type="SCHEMA", stream="s", schema=schema)]
            + [_msg(type="RECORD", stream="s", record={"id": i}) for i in range(10)]
        )
    )
    cfg = {"filepath": str(out), "file_naming_scheme": "{stream}"}
    tgt = SingerStreamTarget(spark, cfg)
    _await(tgt.start(str(inbox), available_now=True))
    # relaunch with no new files: nothing should be appended
    tgt2 = SingerStreamTarget(spark, cfg)
    _await(tgt2.start(str(inbox), available_now=True))
    assert spark.read.parquet(str(out / "s")).count() == 10
    # a fresh instance must also recover stream DDL from the persisted
    # registry (committed batches are NOT replayed): records-only drop works
    (inbox / "f2.jsonl").write_text(
        "\n".join(
            [_msg(type="RECORD", stream="s", record={"id": i}) for i in range(10, 15)]
        )
    )
    tgt3 = SingerStreamTarget(spark, cfg)
    assert tgt3._registry  # loaded from _schema_registry.json
    _await(tgt3.start(str(inbox), available_now=True))
    assert spark.read.parquet(str(out / "s")).count() == 15


def test_singer_stream_schema_evolution_across_batches(spark, tmp_path):
    """Re-declared SCHEMA with a new column: version-append + mergeSchema
    read (BUG-4 fixed; reference crashed at flush)."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = tmp_path / "out"
    out.mkdir()
    v1 = {"type": "object", "properties": {"id": {"type": ["integer", "null"]}}}
    v2 = {
        "type": "object",
        "properties": {
            "id": {"type": ["integer", "null"]},
            "name": {"type": ["string", "null"]},
        },
    }
    (inbox / "f1.jsonl").write_text(
        "\n".join(
            [_msg(type="SCHEMA", stream="s", schema=v1)]
            + [_msg(type="RECORD", stream="s", record={"id": i}) for i in range(5)]
        )
    )
    tgt = SingerStreamTarget(spark, {"filepath": str(out), "file_naming_scheme": "{stream}"})
    _await(tgt.start(str(inbox), available_now=True))
    (inbox / "f2.jsonl").write_text(
        "\n".join(
            [_msg(type="SCHEMA", stream="s", schema=v2)]
            + [
                _msg(type="RECORD", stream="s", record={"id": i, "name": f"n{i}"})
                for i in range(5, 8)
            ]
        )
    )
    _await(tgt.start(str(inbox), available_now=True))
    got = read_stream_output(spark, str(out / "s"))
    assert got.count() == 8
    assert set(got.columns) == {"id", "name"}
    assert got.filter(F.col("name").isNotNull()).count() == 3


# ---------------------------------------------------------------------------
# windows: streaming == batch on the same data
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events_src(spark, sf_dir, tmp_path_factory):
    """events table re-materialized as a plain parquet dir usable as a
    streaming file source (ts already micros)."""
    d = str(tmp_path_factory.mktemp("events_src"))
    batch = t(spark, sf_dir, "events")
    batch.write.mode("overwrite").parquet(d)
    return d, spark.read.parquet(d).schema


def _run_stream_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    return spark.table(name)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_matches_batch(spark, events_src):
    path, schema = events_src
    stream = spark.readStream.schema(schema).parquet(path)
    got = _run_stream_to_memory(
        spark,
        tumbling_counts(stream, watermark="1 hour"),
        "t_tumbling",
    )
    want = tumbling_counts(spark.read.parquet(path))
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sliding_stream_matches_batch(spark, events_src):
    path, schema = events_src
    stream = spark.readStream.schema(schema).parquet(path)
    got = _run_stream_to_memory(
        spark,
        sliding_counts(stream, watermark="1 hour"),
        "t_sliding",
    )
    want = sliding_counts(spark.read.parquet(path))
    cols = ["window_start", "event_type", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)
    # each event appears in exactly duration/slide = 2 windows
    n_events = spark.read.parquet(path).count()
    assert want.agg(F.sum("n_events")).collect()[0][0] == 2 * n_events


def test_session_stream_matches_batch(spark, events_src):
    path, schema = events_src
    stream = spark.readStream.schema(schema).parquet(path)
    got = _run_stream_to_memory(
        spark,
        session_agg(stream, watermark="1 hour"),
        "t_session",
    )
    want = session_agg(spark.read.parquet(path))
    cols = ["user_id", "session_start", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_ohlc_stream_matches_batch(spark, events_src):
    """Streaming OHLC bars == batch OHLC bars on the same data: min_by/
    max_by over the tie-proof ordering key are declarative aggregates, so
    the identical expression runs as an incremental stateful agg."""
    from target_parquet_spark.streaming.windows import ohlc_bars

    path, schema = events_src
    stream = spark.readStream.schema(schema).parquet(path)
    got = _run_stream_to_memory(
        spark, ohlc_bars(stream, watermark="1 hour"), "t_ohlc"
    )
    want = ohlc_bars(spark.read.parquet(path))
    cols = ["window_start", "event_type", "open", "high", "low", "close", "volume", "turnover"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_stream_static_broadcast_enrichment(spark, events_src):
    """Stream-static join: a streaming fact enriched against a small
    static dimension is planned as a broadcast hash join per micro-batch
    (no stream-side state), and matches the batch join exactly."""
    path, schema = events_src
    dim = spark.createDataFrame(
        [("click", "web"), ("view", "web"), ("purchase", "commerce"),
         ("signup", "funnel"), ("error", "ops")],
        "event_type string, family string",
    )

    def enrich(df):
        return (
            df.join(F.broadcast(dim), "event_type")
            .groupBy("family")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    stream = spark.readStream.schema(schema).parquet(path)
    got = _run_stream_to_memory(spark, enrich(stream), "t_enrich")
    want = enrich(spark.read.parquet(path))
    assert _rows(got, ["family", "n"]) == _rows(want, ["family", "n"])


def test_streaming_dedup(spark, events_src):
    path, schema = events_src
    stream = spark.readStream.schema(schema).parquet(path)
    deduped = streaming_dedup(stream, ["user_id"], watermark="365 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.table("t_dedup")
    n_users = spark.read.parquet(path).select("user_id").distinct().count()
    assert got.count() == n_users
    assert got.select("user_id").distinct().count() == n_users


# ---------------------------------------------------------------------------
# custom stateful operator
# ---------------------------------------------------------------------------


def test_running_user_totals_state_across_batches(spark, events_src):
    path, schema = events_src
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(path)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.table("t_state")
    # final emission per user == the batch groupBy (state accumulated)
    last = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("tv"))
    )
    want = (
        spark.read.parquet(path)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("tv"),
        )
    )
    cols = ["user_id", "n_events", "tv"]
    assert _rows(last, cols) == _rows(want, cols)


def test_compact_stream_dir(spark, tmp_path):
    """Small-file maintenance: many micro-batch part files -> few target-
    sized files, same rows, sidecars preserved, swap is atomic-ish."""
    import glob
    import json as _json

    from target_parquet_spark.io.parquet_sink import compact_stream_dir

    d = tmp_path / "stream_s"
    d.mkdir()
    # simulate 10 micro-batch appends (10+ part files)
    for b in range(10):
        spark.createDataFrame(
            [(b * 100 + i, float(i)) for i in range(100)], "id long, v double"
        ).coalesce(1).write.mode("append").parquet(str(d))
    (d / "_key_properties.json").write_text(_json.dumps({"key_properties": ["id"]}))
    before = len(glob.glob(str(d / "*.parquet")))
    assert before >= 10

    n = compact_stream_dir(spark, str(d), target_records_per_file=500)
    assert n == 1000
    after = glob.glob(str(d / "*.parquet"))
    assert len(after) == 2  # 1000 rows / 500 per file
    got = spark.read.parquet(str(d))
    assert got.count() == 1000
    assert got.select(F.sum("id")).collect()[0][0] == sum(range(1000))
    assert _json.loads((d / "_key_properties.json").read_text()) == {
        "key_properties": ["id"]
    }


def test_interval_join_stream_stream_matches_batch(spark, events_src):
    """Stateful stream-stream inner join: clicks x purchases within 1h,
    watermarks on BOTH sides (state eviction), append output.  Must equal
    the batch interval_join on the same data (batch form is
    oracle-checked as events_interval_join)."""
    from target_parquet_spark.operators.asof import interval_join

    path, schema = events_src

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", "ts"
        )
        purch = df.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        return clicks, purch

    sc, sp = split(spark.readStream.schema(schema).parquet(path))
    joined = interval_join(
        sc,
        sp,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        upper="1 hour",
        left_watermark="2 hours",
        right_watermark="2 hours",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.table("t_ssjoin")

    bc, bp = split(spark.read.parquet(path))
    want = interval_join(bc, bp, on="user_id", upper="1 hour")
    cols = ["click_id", "event_id_right", "user_id"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_streaming_rollup_matches_batch_and_replays_idempotently(
    spark, events_src, tmp_path
):
    """Epoch-delta rollup: multi-epoch stream result == batch aggregate;
    replaying an epoch rewrites the identical partial (no double count);
    compaction preserves totals."""
    from target_parquet_spark.streaming.rollup import StreamingRollup

    path, schema = events_src
    out = str(tmp_path / "rollup")
    r = StreamingRollup(spark, out)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    _await(r.start(stream, available_now=True))

    cols = ["day", "event_type", "n_events", "sum_value"]
    want = (
        spark.read.parquet(path)
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    assert _rows(r.read(), cols) == _rows(want, cols)

    # replay epoch 0 with a half batch: overwrite, not append
    half = spark.read.parquet(path).limit(100)
    r._merge_batch(half, 0)
    half_rollup = _rows(r.read(), cols)
    r._merge_batch(half, 0)
    assert _rows(r.read(), cols) == half_rollup

    # compaction folds epochs into a base-v dir without changing totals
    before = _rows(r.read(), cols)
    r.compact()
    assert _rows(r.read(), cols) == before
    import os as _os
    assert [d for d in _os.listdir(out) if d.startswith("epoch=")] == []
    assert [d for d in _os.listdir(out) if d.startswith("base-v")] == ["base-v1"]

    # THE bug class compaction must survive: the checkpoint's NEXT
    # micro-batch lands after compact().  With compacted state in
    # epoch=<max+1> that batch's overwrite would wipe all history; in
    # the base-v namespace it merges.  (ADVICE r2, streaming/distinct.)
    tot_before = sum(row[2] for row in before)  # n_events column
    r._merge_batch(half, 6)
    tot_after = r.read().agg(F.sum("n_events")).collect()[0][0]
    assert tot_after == tot_before + half.count()

    # repeated compaction is a fold-then-no-op, never a double count
    r.compact()
    after_two = _rows(r.read(), cols)
    r.compact()
    assert _rows(r.read(), cols) == after_two


def test_running_user_totals_v2_transform_with_state(spark, events_src):
    """Spark 4 transformWithState API: same final per-user totals as the
    applyInPandasWithState form and the batch groupBy."""
    from target_parquet_spark.streaming.stateful import running_user_totals_v2

    if running_user_totals_v2 is None:
        pytest.skip("transformWithState needs protobuf (not in this env)")

    path, schema = events_src
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(path)
    q = (
        running_user_totals_v2(stream)
        .writeStream.format("memory")
        .queryName("t_state_v2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    last = (
        spark.table("t_state_v2")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("tv"))
    )
    want = (
        spark.read.parquet(path)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("tv"),
        )
    )
    cols = ["user_id", "n_events", "tv"]
    assert _rows(last, cols) == _rows(want, cols)


def test_text_quality_filter_works_on_stream(spark, tmp_path):
    """The text operators are pure Column expressions, so the same
    quality filter runs unchanged on a stream — proves the curation
    pipeline is stream-ready (stateless: no watermark needed)."""
    from target_parquet_spark.operators.text import quality_score, token_count

    src = str(tmp_path / "docs")
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 3),
         (2, "x"),
         (3, "a b " * 40)],
        "doc_id long, text string",
    )
    docs.write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    scored = stream.select(
        "doc_id",
        quality_score(F.col("text")).alias("q"),
        token_count(F.col("text")).alias("n_tok"),
    ).filter(F.col("q") >= 0.5)
    q = (
        scored.writeStream.format("memory")
        .queryName("t_quality_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.table("t_quality_stream")

    batch = spark.read.parquet(src).select(
        "doc_id",
        quality_score(F.col("text")).alias("q"),
        token_count(F.col("text")).alias("n_tok"),
    ).filter(F.col("q") >= 0.5)
    cols = ["doc_id", "q", "n_tok"]
    assert _rows(got, cols) == _rows(batch, cols)
    assert got.count() >= 1


def test_streaming_bitmap_distinct_exact_and_replay_safe(
    spark, events_src, tmp_path
):
    """Incremental bitmap-word distinct: multi-epoch stream == batch
    countDistinct; replaying an epoch (and even DOUBLE-merging one, OR
    being idempotent) cannot change counts; compaction preserves them."""
    from target_parquet_spark.streaming.distinct import StreamingBitmapDistinct

    path, schema = events_src
    out = str(tmp_path / "bdist")
    d = StreamingBitmapDistinct(spark, out)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    _await(d.start(stream, available_now=True))

    cols = ["event_type", "n_distinct_users"]
    want = (
        spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("n_distinct_users"))
    )
    assert _rows(d.counts(), cols) == _rows(want, cols)

    # replaying epoch 0 with a SUBSET is still exact for the whole: the
    # subset's bits were already in the merged OR state from other epochs
    # only if re-delivered rows overlap; to test pure idempotence, replay
    # the identical full first-file batch twice
    first_file = spark.read.parquet(path).limit(200)
    d._merge_batch(first_file, 0)
    once = _rows(d.counts(), cols)
    d._merge_batch(first_file, 0)
    assert _rows(d.counts(), cols) == once

    # compaction folds epochs without changing counts
    d.compact()
    assert _rows(d.counts(), cols) == once

    # next checkpoint batchId landing AFTER compact() must merge with
    # (not overwrite) compacted history — the ADVICE r2 bug class
    d._merge_batch(first_file, 7)
    assert _rows(d.counts(), cols) == once
    import os as _os
    assert [x for x in _os.listdir(out) if x.startswith("base-v")] == ["base-v1"]

    # compact again: folds the new epoch into base-v2, still exact,
    # and a further compact with nothing to fold is a no-op
    d.compact()
    assert _rows(d.counts(), cols) == once
    d.compact()
    assert _rows(d.counts(), cols) == once


def test_epoch_store_empty_and_fresh_compact(spark, tmp_path):
    """compact() before any micro-batch commits is a no-op (ADVICE r2:
    used to raise max-of-empty ValueError); reads on an empty store
    return an empty frame with the declared schema."""
    from target_parquet_spark.streaming.distinct import StreamingBitmapDistinct

    out = str(tmp_path / "empty_bdist")
    d = StreamingBitmapDistinct(spark, out)
    d.compact()  # must not raise
    assert d.counts().count() == 0
    assert d.words().columns == ["event_type", "word", "bits"]


def test_user_profile_state_equals_batch_groupby(spark, events_src):
    """Order-insensitive profile facets accumulate to exactly the batch
    answer regardless of how events split across micro-batches."""
    from target_parquet_spark.streaming.stateful import user_profile_accumulator

    path, schema = events_src
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(path)
    q = (
        user_profile_accumulator(stream)
        .writeStream.format("memory")
        .queryName("t_profile")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.table("t_profile")
    # last emission per user carries the fully-accumulated profile
    final = (
        got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
            F.max("n_types").alias("n_types"),
        )
    )
    want = (
        spark.read.parquet(path)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.countDistinct("event_type").cast("int").alias("n_types"),
        )
    )
    cols = ["user_id", "n_events", "first_ts", "last_ts", "n_types"]
    assert _rows(final, cols) == _rows(want, cols)


def test_streaming_near_dup_matches_batch(spark, sf_dir, tmp_path):
    """Online LSH screening: a stream of perturbed copies joined against
    the static corpus index yields exactly the pairs the batch form
    finds between the same two sides."""
    from target_parquet_spark.operators.dedup import (
        lsh_band_index,
        streaming_near_dup,
    )
    from target_parquet_spark.operators.text import tokens
    from target_parquet_spark.queries import t as load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # perturbed copies = the arriving stream (drop last 2 tokens)
    toks = tokens(F.col("text"))
    newdocs = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, F.size(toks) - 2)).alias("text"),
    )
    src = str(tmp_path / "newdocs")
    newdocs.repartition(4).write.mode("overwrite").parquet(src)

    corpus_index = lsh_band_index(docs, "text", "doc_id")

    stream = (
        spark.readStream.schema(newdocs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_near_dup(stream, corpus_index)
        .writeStream.format("memory")
        .queryName("t_neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = sorted(
        (r.new_id, r.dup_of, r.jaccard)
        for r in spark.table("t_neardup").collect()
    )
    want = sorted(
        (r.new_id, r.dup_of, r.jaccard)
        for r in streaming_near_dup(
            spark.read.parquet(src), corpus_index
        ).collect()
    )
    assert got == want
    assert got  # the perturbed copies DO collide with their originals
    # every original matched by its own perturbed copy at high jaccard
    self_pairs = [(a, b) for a, b, _ in got if a - 1000000 == b]
    assert len(self_pairs) >= 0.5 * len(set(x[0] for x in got))


def test_update_profile_skips_null_ts():
    """ADVICE r2: a NaT ts row must not poison first_ts with int64-min;
    it counts toward n_events but is skipped for first/last."""
    import pandas as pd

    from target_parquet_spark.streaming.stateful import _update_profile

    class _FakeState:
        exists = False

        def update(self, v):
            self.value = v

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "event_type": ["click", "view", "click"],
            "ts": pd.to_datetime(
                [None, "2024-01-02 03:04:05", "2024-01-03 00:00:00"]
            ),
        }
    )
    st = _FakeState()
    out = next(_update_profile((1,), [pdf], st))
    assert out["n_events"].iloc[0] == 3
    assert out["first_ts"].iloc[0] == pd.Timestamp("2024-01-02 03:04:05")
    assert out["last_ts"].iloc[0] == pd.Timestamp("2024-01-03 00:00:00")
    assert st.value[0] == 3 and st.value[1] == 1704164645000000

    # all-null ts: profile emits NaT rather than int64-min garbage
    pdf2 = pd.DataFrame(
        {
            "user_id": [2],
            "event_type": ["click"],
            "ts": pd.to_datetime([None]),
        }
    )
    st2 = _FakeState()
    out2 = next(_update_profile((2,), [pdf2], st2))
    assert out2["n_events"].iloc[0] == 1
    assert pd.isna(out2["first_ts"].iloc[0])


def test_streaming_quantile_sketch_matches_batch_and_replays(
    spark, events_src, tmp_path
):
    """Streaming HDR quantile sketch: multi-epoch stream state == the
    batch-built sketch; estimates match the batch CDF math; replaying an
    epoch is idempotent; compaction preserves the state."""
    from target_parquet_spark.queries_r4 import hdr_bin
    from target_parquet_spark.streaming.quantile import StreamingQuantileSketch

    path, schema = events_src
    out = str(tmp_path / "qsketch")
    qs = StreamingQuantileSketch(spark, out)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    _await(qs.start(stream, available_now=True))

    cols = ["key", "bin", "n"]
    v = F.col("value")
    want = (
        spark.read.parquet(path)
        .groupBy(
            F.col("event_type").cast("string").alias("key"),
            F.when(v > 0, hdr_bin(v)).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _rows(qs.read(), cols) == _rows(want, cols)

    # estimates bounded by half-bin error vs the exact per-key percentile
    exact = {
        r[0]: r[1]
        for r in spark.read.parquet(path)
        .filter(v > 0)
        .groupBy("event_type")
        .agg(F.expr("percentile(value, 0.9)"))
        .collect()
    }
    for r in qs.quantiles().collect():
        assert abs(r["est_p90"] - exact[r["key"]]) / exact[r["key"]] <= 0.06
        assert r["n_nonpositive"] >= 0

    # replay idempotence: same epoch, same half-batch, state unchanged
    half = spark.read.parquet(path).limit(200)
    qs._merge_batch(half, 0)
    state = _rows(qs.read(), cols)
    qs._merge_batch(half, 0)
    assert _rows(qs.read(), cols) == state

    # compaction folds without changing the state
    qs.compact()
    assert _rows(qs.read(), cols) == state


def test_singer_stream_quarantine_reroutes_invalid(spark, tmp_path):
    """Streaming validation parity: with quarantine_path set, invalid
    records land in the quarantine dir and only valid rows reach the main
    sink — same contract as the batch target."""
    import glob
    import json as _json

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = tmp_path / "out"
    qdir = tmp_path / "quarantine"
    schema = {
        "type": "object",
        "properties": {"v": {"type": ["integer", "null"], "minimum": 0}},
    }
    (inbox / "f1.jsonl").write_text(
        "\n".join(
            [_msg(type="SCHEMA", stream="s", schema=schema, key_properties=[])]
            + [
                _msg(type="RECORD", stream="s", record={"v": v})
                for v in (1, -2, 3, -4, 5)
            ]
        )
    )
    tgt = SingerStreamTarget(
        spark,
        {
            "filepath": str(out),
            "file_naming_scheme": "{stream}",
            "quarantine_path": str(qdir),
        },
    )
    _await(tgt.start(str(inbox), available_now=True))

    got = spark.read.parquet(str(out / "s"))
    assert sorted(r.v for r in got.collect()) == [1, 3, 5]
    quarantined = []
    for f in glob.glob(str(qdir / "s" / "*.json")):
        with open(f) as fh:
            quarantined += [
                _json.loads(_json.loads(l)["record_json"])["v"]
                for l in fh
                if l.strip()
            ]
    assert sorted(quarantined) == [-4, -2]
    assert tgt._metrics["s"] == 3


def test_singer_stream_type_widening_rewrites_history(spark, tmp_path):
    """The HARD evolution direction for a stream: narrow type already on
    disk when the widening SCHEMA arrives — the target must rewrite the
    existing output (single-writer compaction) before the widened batch
    lands, or the directory becomes unreadable."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = tmp_path / "out"
    (inbox / "f1.jsonl").write_text(
        "\n".join(
            [
                _msg(
                    type="SCHEMA",
                    stream="t",
                    schema={
                        "type": "object",
                        "properties": {"v": {"type": ["integer", "null"]}},
                    },
                    key_properties=[],
                ),
                _msg(type="RECORD", stream="t", record={"v": 1}),
                _msg(type="RECORD", stream="t", record={"v": 2}),
            ]
        )
    )
    cfg = {"filepath": str(out), "file_naming_scheme": "{stream}"}
    _await(SingerStreamTarget(spark, cfg).start(str(inbox), available_now=True))
    assert dict(spark.read.parquet(str(out / "t")).dtypes) == {"v": "bigint"}

    (inbox / "f2.jsonl").write_text(
        "\n".join(
            [
                _msg(
                    type="SCHEMA",
                    stream="t",
                    schema={
                        "type": "object",
                        "properties": {"v": {"type": ["string", "null"]}},
                    },
                    key_properties=[],
                ),
                _msg(type="RECORD", stream="t", record={"v": "three"}),
            ]
        )
    )
    _await(SingerStreamTarget(spark, cfg).start(str(inbox), available_now=True))
    df = spark.read.option("mergeSchema", "true").parquet(str(out / "t"))
    assert dict(df.dtypes) == {"v": "string"}
    assert sorted(r.v for r in df.collect()) == ["1", "2", "three"]


def test_epoch_store_replayed_folded_epoch_never_double_counts(spark, tmp_path):
    """A crash-replay can re-materialize an epoch dir that an earlier
    compaction already folded; its content must stay excluded FOREVER —
    across subsequent compactions — or sums silently double-count."""
    from target_parquet_spark.streaming.epoch_store import EpochStore

    store = EpochStore(spark, str(tmp_path / "st"), "k string, n bigint")

    def fold(df):
        return df.groupBy("k").agg(F.sum("n").alias("n"))

    def delta(n):
        return spark.createDataFrame([("a", n)], "k string, n bigint")

    store.write_epoch(delta(1), 0)
    store.write_epoch(delta(1), 1)
    store.compact(fold)  # base-v1 folds epochs 0,1 -> total 2
    store.write_epoch(delta(1), 1)  # replay re-creates the folded epoch
    store.write_epoch(delta(1), 2)
    assert fold(store.state_df()).collect()[0].n == 3
    store.compact(fold)  # base-v2 must carry the exclusion forward
    assert fold(store.state_df()).collect()[0].n == 3
    store.write_epoch(delta(1), 1)  # an even later replay of the same epoch
    assert fold(store.state_df()).collect()[0].n == 3


def test_singer_stream_widening_handles_partitioned_layout(spark, tmp_path):
    """Partitioned streams keep their data files in key=value subdirs; the
    widening rewrite must still detect them, rewrite with the partition
    layout preserved, and leave the directory readable."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = tmp_path / "out"
    cfg = {
        "filepath": str(out),
        "file_naming_scheme": "{stream}",
        "partition_cols": {"t": ["part"]},
    }
    (inbox / "f1.jsonl").write_text(
        "\n".join(
            [
                _msg(
                    type="SCHEMA",
                    stream="t",
                    schema={
                        "type": "object",
                        "properties": {
                            "part": {"type": ["string", "null"]},
                            "v": {"type": ["integer", "null"]},
                        },
                    },
                    key_properties=[],
                ),
                _msg(type="RECORD", stream="t", record={"part": "a", "v": 1}),
                _msg(type="RECORD", stream="t", record={"part": "b", "v": 2}),
            ]
        )
    )
    _await(SingerStreamTarget(spark, cfg).start(str(inbox), available_now=True))
    (inbox / "f2.jsonl").write_text(
        "\n".join(
            [
                _msg(
                    type="SCHEMA",
                    stream="t",
                    schema={
                        "type": "object",
                        "properties": {
                            "part": {"type": ["string", "null"]},
                            "v": {"type": ["string", "null"]},
                        },
                    },
                    key_properties=[],
                ),
                _msg(type="RECORD", stream="t", record={"part": "a", "v": "x"}),
            ]
        )
    )
    _await(SingerStreamTarget(spark, cfg).start(str(inbox), available_now=True))
    df = spark.read.option("mergeSchema", "true").parquet(str(out / "t"))
    assert dict(df.dtypes)["v"] == "string"
    assert sorted((r.part, r.v) for r in df.collect()) == [
        ("a", "1"),
        ("a", "x"),
        ("b", "2"),
    ]
    import os as _os

    assert sorted(
        d for d in _os.listdir(str(out / "t")) if d.startswith("part=")
    ) == ["part=a", "part=b"]


def test_epoch_store_mid_write_epoch_is_ignored(spark, tmp_path):
    """An epoch dir whose write is still in flight (no _SUCCESS, only
    _temporary content) must be invisible to reads and compactions: a
    read across only such dirs used to fail schema inference, and
    compact() used to crash on an empty source list instead of no-oping
    as its docstring promises for live streams."""
    import os as _os

    from target_parquet_spark.streaming.epoch_store import EpochStore

    out = str(tmp_path / "st")
    store = EpochStore(spark, out, "k string, n bigint")

    def fold(df):
        return df.groupBy("k").agg(F.sum("n").alias("n"))

    # simulate a first micro-batch mid-write: dir exists, nothing committed
    _os.makedirs(_os.path.join(out, "epoch=0", "_temporary"))
    assert store.state_df().count() == 0
    store.compact(fold)  # must not raise, must not create a base
    assert not [d for d in _os.listdir(out) if d.startswith("base-v")]

    # the writer commits + one more epoch: everything flows normally
    store.write_epoch(
        spark.createDataFrame([("a", 1)], "k string, n bigint"), 0
    )
    store.write_epoch(
        spark.createDataFrame([("a", 2)], "k string, n bigint"), 1
    )
    assert fold(store.state_df()).collect()[0].n == 3
    store.compact(fold)
    assert fold(store.state_df()).collect()[0].n == 3


def test_compact_stream_dir_partitioned_layout(spark, tmp_path):
    """Hive-partitioned stream dirs keep their data in key=value subdirs
    with no top-level part files; compaction must recurse into the
    partition leaves (it used to silently no-op and return 0)."""
    import glob as _glob

    from target_parquet_spark.io.parquet_sink import compact_stream_dir

    out = str(tmp_path / "part_stream")
    df = spark.createDataFrame(
        [(i, f"d{i % 2}") for i in range(100)], "v long, day string"
    )
    # several appends -> many small files per partition
    for _ in range(3):
        df.repartition(4).write.mode("append").partitionBy("day").parquet(out)
    before = len(_glob.glob(f"{out}/day=*/*.parquet"))
    n = compact_stream_dir(spark, out, target_records_per_file=1_000_000)
    assert n == 300
    after = len(_glob.glob(f"{out}/day=*/*.parquet"))
    assert after == 2 < before
    got = spark.read.parquet(out)
    assert got.count() == 300
    assert got.groupBy("day").count().count() == 2


def test_singer_stream_redeclared_narrow_schema_skips_rewrite(
    spark, tmp_path, monkeypatch
):
    """Standard tap behavior on restart: the original narrow SCHEMA is
    re-emitted after a past widening.  The fold lands back on the type
    already written, so the target must NOT rewrite the directory again
    (it used to pay an O(all data) directory swap per restart)."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = tmp_path / "out"
    narrow = {
        "type": "object",
        "properties": {"v": {"type": ["integer", "null"]}},
    }
    wide = {
        "type": "object",
        "properties": {"v": {"type": ["string", "null"]}},
    }
    (inbox / "f1.jsonl").write_text(
        "\n".join(
            [
                _msg(type="SCHEMA", stream="t", schema=narrow, key_properties=[]),
                _msg(type="RECORD", stream="t", record={"v": 1}),
                _msg(type="SCHEMA", stream="t", schema=wide, key_properties=[]),
                _msg(type="RECORD", stream="t", record={"v": "two"}),
            ]
        )
    )
    cfg = {"filepath": str(out), "file_naming_scheme": "{stream}"}
    _await(SingerStreamTarget(spark, cfg).start(str(inbox), available_now=True))
    assert dict(spark.read.parquet(str(out / "t")).dtypes) == {"v": "string"}

    calls = []
    orig = SingerStreamTarget._rewrite_widened

    def spy(self, stream, fresh):
        calls.append(dict(fresh))
        return orig(self, stream, fresh)

    monkeypatch.setattr(SingerStreamTarget, "_rewrite_widened", spy)
    # the tap restarts and re-declares its ORIGINAL narrow schema
    (inbox / "f2.jsonl").write_text(
        "\n".join(
            [
                _msg(type="SCHEMA", stream="t", schema=narrow, key_properties=[]),
                _msg(type="RECORD", stream="t", record={"v": 3}),
            ]
        )
    )
    _await(SingerStreamTarget(spark, cfg).start(str(inbox), available_now=True))
    assert calls == []  # no rewrite: disk already holds the widened type
    df = spark.read.parquet(str(out / "t"))
    assert dict(df.dtypes) == {"v": "string"}
    assert sorted(r.v for r in df.collect()) == ["1", "3", "two"]


def test_streaming_heavy_hitters_equals_batch_sketch(spark, events_src, tmp_path):
    """Merged CMS registers across micro-batches equal the batch-built
    sketch over the same rows; the candidate point-queries never
    undercount and find the true top keys; replay is idempotent;
    compaction preserves both stores."""
    from target_parquet_spark.queries_r2 import _CMS_D, _cms_bucket
    from target_parquet_spark.streaming.heavy_hitters import StreamingHeavyHitters

    path, schema = events_src
    out = str(tmp_path / "hh")
    hh = StreamingHeavyHitters(
        spark, out, key_col="event_type", candidate_min=1
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    _await(hh.start(stream, available_now=True))

    # registers: bit-equal to the batch sketch over the concatenated rows
    batch = spark.read.parquet(path).select(
        F.col("event_type").cast("string").alias("key")
    )
    buckets = F.array(*[_cms_bucket(j, F.col("key")) for j in range(_CMS_D)])
    want = (
        batch.select(F.posexplode(buckets).alias("j", "b"))
        .groupBy(F.col("j").cast("int"), "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cols = ["j", "b", "n"]
    assert _rows(hh.registers(), cols) == _rows(want, cols)

    # estimates: every true key is a candidate (candidate_min=1) and the
    # CMS point estimate never undercounts its true frequency
    true_counts = {
        r[0]: r[1] for r in batch.groupBy("key").count().collect()
    }
    got = {r["key"]: r["cms_est"] for r in hh.heavy_hitters(top=50).collect()}
    assert set(got) == set(true_counts)
    for k, est in got.items():
        assert est >= true_counts[k]

    # replay idempotence: re-merging an epoch leaves the state unchanged
    half = spark.read.parquet(path).limit(200)
    hh._merge_batch(half, 0)
    state = _rows(hh.registers(), cols)
    hh._merge_batch(half, 0)
    assert _rows(hh.registers(), cols) == state

    # compaction folds both stores without changing the read-out
    cands = _rows(hh.candidates(), ["key"])
    hh.compact()
    assert _rows(hh.registers(), cols) == state
    assert _rows(hh.candidates(), ["key"]) == cands


def test_streaming_rollup_k_anonymity_gate(spark, events_src, tmp_path):
    """The incremental k-anonymity audit off the maintained rollup must
    equal the batch audit_k_anonymity over the same events — the QI
    grain IS the rollup grain, so no information is lost."""
    import target_parquet_spark.queries_r3  # noqa: F401  (registers audit)
    from target_parquet_spark.queries import QUERIES
    from target_parquet_spark.streaming.rollup import StreamingRollup

    path, schema = events_src
    out = str(tmp_path / "rollup_k")
    r = StreamingRollup(spark, out)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    _await(r.start(stream, available_now=True))

    got = r.k_anonymity(k=5).collect()[0].asDict()

    # batch twin over the same parquet (audit_k_anonymity reads
    # {sf_dir}/events.parquet — point it at the stream's source)
    import os

    sf_like = str(tmp_path / "sf_like")
    os.makedirs(sf_like, exist_ok=True)
    spark.read.parquet(path).write.mode("overwrite").parquet(
        f"{sf_like}/events.parquet"
    )
    want = QUERIES["audit_k_anonymity"](spark, sf_like).collect()[0].asDict()
    assert got == want


# ---------------------------------------------------------------------------
# streaming DSIR admission gate (stateless literal-state scoring)
# ---------------------------------------------------------------------------


def test_dsir_gate_stream_matches_batch_and_routes(spark, tmp_path):
    """The gate's streaming output must equal the batch scoring of the
    same rows (same column expression both modes), and the routing must
    admit target-like docs while rejecting background and no-evidence
    docs."""
    from target_parquet_spark.queries_r8 import dsir_llr_state
    from target_parquet_spark.streaming.dsir_gate import StreamingDsirGate

    target = "quantum proofs entangle qubits across lattice codes"
    background = "the cat sat on the mat and looked at the dog"
    train = [(i, "src0", target) for i in range(8)] + [
        (i + 100, "srcX", background) for i in range(8)
    ]
    docs = spark.createDataFrame(
        train, "doc_id long, source string, text string"
    )
    gate = StreamingDsirGate(dsir_llr_state(spark, docs), threshold_micro=1)

    crawl = [
        (1000, "crawl", target),        # target-like -> keep
        (1001, "crawl", background),    # background -> reject
        (1002, "crawl", "one"),         # single token: no evidence -> reject
    ]
    src = f"{tmp_path}/crawl"
    crawl_df = spark.createDataFrame(
        crawl, "doc_id long, source string, text string"
    )
    crawl_df.write.parquet(src)
    stream = spark.readStream.schema(crawl_df.schema).parquet(src)

    q = gate.run(
        stream, f"{tmp_path}/gated", f"{tmp_path}/ck", available_now=True
    )
    _await(q)

    # partitionBy round-trips `keep` as a partition STRING ("true"/"false")
    # under default partition-column inference — cast it back explicitly
    got = sorted(
        (r.doc_id, r.llr_micro, bool(r.keep))
        for r in spark.read.parquet(f"{tmp_path}/gated")
        .withColumn("keep", F.col("keep").cast("boolean"))
        .collect()
    )
    want = sorted(
        (r.doc_id, r.llr_micro, bool(r.keep))
        for r in gate.score(crawl_df).collect()
    )
    assert got == want
    keep = {d: k for d, _lp, k in got}
    assert keep == {1000: True, 1001: False, 1002: False}


def test_dsir_gate_replay_is_idempotent(spark, tmp_path):
    """Restarting from the same checkpoint after the source is drained
    must not duplicate rows (stateless projection + checkpoint)."""
    from target_parquet_spark.queries_r8 import dsir_llr_state
    from target_parquet_spark.streaming.dsir_gate import StreamingDsirGate

    docs = spark.createDataFrame(
        [(i, "src0", "alpha beta gamma delta") for i in range(4)],
        "doc_id long, source string, text string",
    )
    gate = StreamingDsirGate(dsir_llr_state(spark, docs))
    src = f"{tmp_path}/crawl"
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    for _ in range(2):
        q = gate.run(
            stream, f"{tmp_path}/gated", f"{tmp_path}/ck", available_now=True
        )
        _await(q)
    assert spark.read.parquet(f"{tmp_path}/gated").count() == 4


def test_dsir_gate_null_text_routes_to_reject(spark):
    """A NULL-text row must land in keep=false, not the Hive default
    partition (NULL AND true is NULL without the coalesce)."""
    from target_parquet_spark.queries_r8 import dsir_llr_state
    from target_parquet_spark.streaming.dsir_gate import StreamingDsirGate

    docs = spark.createDataFrame(
        [(i, "src0", "alpha beta gamma") for i in range(4)],
        "doc_id long, source string, text string",
    )
    gate = StreamingDsirGate(dsir_llr_state(spark, docs))
    probe = spark.createDataFrame(
        [(10, "c", None), (11, "c", "alpha beta gamma")],
        "doc_id long, source string, text string",
    )
    out = {r.doc_id: r.keep for r in gate.score(probe).collect()}
    assert out == {10: False, 11: True}



def test_sequential_monitor_matches_batch_and_handles_split_user_day(
    spark, events_src, tmp_path
):
    """Streaming mSPRT == batch mSPRT over the same events; a user-day
    split across micro-batches merges correctly at (day, user) grain
    (second moments square only merged totals); epoch replay is
    idempotent."""
    from target_parquet_spark.streaming.sequential_monitor import (
        StreamingSequentialMonitor,
    )

    path, schema = events_src
    out = str(tmp_path / "seqmon")
    m = StreamingSequentialMonitor(spark, out)

    # maxFilesPerTrigger=1 forces multiple micro-batches, so the same
    # user-day WILL straddle epochs (the decomposition hazard)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    _await(m.start(stream, available_now=True))

    cols = ["day", "n_a", "n_b", "mean_diff", "z", "log_lambda", "reject"]
    from target_parquet_spark.queries_ops import _hash_mod
    from target_parquet_spark.queries_r10 import msprt_readout

    obs = (
        spark.read.parquet(path)
        .groupBy(F.col("ts").cast("date").alias("day"), "user_id")
        .agg(F.round(F.sum("value") * 100).cast("long").alias("v"))
        .withColumn("arm", _hash_mod(F.col("user_id"), 2))
    )
    assert _rows(m.read(), cols) == _rows(msprt_readout(obs), cols)

    # replay idempotence: rewriting epoch 0 with the same half-batch
    # twice yields identical read-outs
    half = spark.read.parquet(path).limit(100)
    m._merge_batch(half, 0)
    once = _rows(m.read(), cols)
    m._merge_batch(half, 0)
    assert _rows(m.read(), cols) == once

    # compaction preserves the read-out
    m.compact()
    assert _rows(m.read(), cols) == once


def test_streaming_components_equal_batch_after_replay_and_compaction(
    spark, sf_dir, tmp_path
):
    """Incremental near-dup connected components (VERDICT r5 #5): a
    multi-epoch stream over the planted doubled corpus must resolve to
    EXACTLY the batch twin's components; replaying an epoch (with a
    superset delta — the band state has advanced), duplicate-delivering
    old docs under a new epoch, and compacting can never change them."""
    from target_parquet_spark.operators import dedup as D
    from target_parquet_spark.queries_ext import _spark_corpus
    from target_parquet_spark.streaming.components import StreamingComponents

    src = str(tmp_path / "docs")
    _spark_corpus(spark, sf_dir).repartition(3).write.mode(
        "overwrite"
    ).parquet(src)
    corpus = spark.read.parquet(src)

    want_pairs = D.minhash_lsh_pairs(corpus, "text", "doc_id")
    ccols = ["node", "component"]
    ecols = ["id_a", "id_b", "jaccard"]
    want = _rows(D.connected_components(want_pairs, "id_a", "id_b"), ccols)
    want_edges = _rows(want_pairs, ecols)

    sc = StreamingComponents(spark, str(tmp_path / "cc"))
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    _await(sc.start(stream, available_now=True))

    assert want and want_edges  # the planted twins guarantee real groups
    assert _rows(sc.components(), ccols) == want
    assert _rows(sc.edges(), ecols) == want_edges

    # replay epoch 0 with the FULL corpus (a superset of the original
    # file: by replay time the band state had advanced past it) — the
    # overwritten delta may gain verified-true pairs, never lose any
    sc._merge_batch(corpus, 0)
    assert _rows(sc.components(), ccols) == want
    assert _rows(sc.edges(), ecols) == want_edges

    # compaction folds bands/docs/edges without changing the answer
    sc.compact()
    assert _rows(sc.components(), ccols) == want

    # duplicate delivery of already-seen docs under a fresh epoch id
    # (at-least-once upstream) merges with compacted history, no change
    sc._merge_batch(corpus.limit(50), 9)
    assert _rows(sc.components(), ccols) == want
    assert _rows(sc.edges(), ecols) == want_edges

    sc.compact()
    assert _rows(sc.components(), ccols) == want


def test_streaming_knn_edges_equal_batch_after_replay_and_compaction(
    spark, sf_dir, tmp_path
):
    """Incremental k-NN edge maintenance (VERDICT r6 #4): a multi-epoch
    vector stream must resolve to EXACTLY the batch twin's edge table
    (same bucketing, same rounded cosine, same ranking window);
    replaying an epoch (with a superset candidate delta — the vector
    state has advanced), duplicate-delivering old vectors under a new
    epoch, and compacting can never change the top-k."""
    from target_parquet_spark.queries_r6 import _knn_edges
    from target_parquet_spark.streaming.knn_edges import StreamingKnnEdges

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    src = str(tmp_path / "vecs")
    emb.repartition(3).write.mode("overwrite").parquet(src)

    ecols = ["src", "nbr_rank", "nbr", "sim"]
    want = _rows(_knn_edges(spark, sf_dir, k=3), ecols)
    assert want  # non-vacuous: the corpus has real neighbors

    ske = StreamingKnnEdges(spark, str(tmp_path / "knn"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    _await(ske.start(stream, available_now=True))
    assert _rows(ske.edges(k=3), ecols) == want

    # replay epoch 0 with the FULL corpus: the candidate delta is a
    # superset of the original run's (state advanced past it) — folded
    # to one row per ordered pair, top-k unchanged
    ske._merge_batch(spark.read.parquet(src), 0)
    assert _rows(ske.edges(k=3), ecols) == want

    # compaction folds vecs/cand without changing the answer
    ske.compact()
    assert _rows(ske.edges(k=3), ecols) == want

    # duplicate delivery of already-seen vectors under a fresh epoch id
    ske._merge_batch(spark.read.parquet(src).limit(20), 9)
    assert _rows(ske.edges(k=3), ecols) == want

    ske.compact()
    assert _rows(ske.edges(k=3), ecols) == want
