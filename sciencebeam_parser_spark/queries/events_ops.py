"""Event-stream operators in batch form (SURVEY §2B streaming rows).

Structured Streaming itself is exercised in ``streaming/`` (tests run real
``readStream`` pipelines); the queries here are the *batch-equivalent* plans
of the same windowed aggregations, so they are oracle-checkable. The Spark
builders use the native window operators (``F.window``, ``F.session_window``)
— identical expressions work under ``readStream`` with a watermark.
"""
from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries.registry import events_ts_unit, register, table
from sciencebeam_parser_spark.utils import checkpoint_big


def _finish_memory_sink(spark: SparkSession, name: str) -> DataFrame:
    """Detach a finished memory-sink result from the streaming machinery.

    Collects the sink table eagerly, drops the temp view, and returns the
    rows as a local DataFrame. A terminated streaming run otherwise keeps
    its sink rows registered and its state-store bookkeeping alive in the
    shared JVM — residue that measurably slows later batch queries in a
    long suite.
    """
    tbl = spark.table(name)
    schema = tbl.schema
    rows = tbl.collect()
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet with ``ts`` normalized to TIMESTAMP
    at microsecond precision — the streaming twin of ``registry.table``.

    The file-stream source needs a user-supplied schema, so the physical
    unit in the parquet footer dictates it: NANOS must be read as long
    (legacy conf) and rebuilt via ``timestamp_micros(ns div 1000)`` —
    integer division, matching DuckDB's truncation; MICROS reads as
    TIMESTAMP_NTZ and casts (session tz is pinned UTC).
    """
    import os

    from pyspark.sql import types as T

    unit = events_ts_unit(os.path.join(sf_dir, "events.parquet"))
    ts_type = T.LongType() if unit == "ns" else T.TimestampNTZType()
    spark.conf.set(
        "spark.sql.legacy.parquet.nanosAsLong", "true" if unit == "ns" else "false"
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    events_path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(events_path):
        # directory layout (cluster writer output): stream the dataset
        # dir itself — the glob filter below would silently match no
        # leaf files and yield an empty stream
        stream = spark.readStream.schema(schema).parquet(events_path)
    else:
        # single-file testdata layout: the file source wants a
        # directory, so stream sf_dir filtered down to the one file
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if unit == "ns":
        return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def _stream_checkpoint_dir() -> str:
    """A fresh per-query checkpoint dir on the fastest local medium.

    Spark's fallback temp checkpoint lands in java.io.tmpdir (/tmp —
    spinning/virtual disk here); state-store commits write one delta file
    per partition per batch there, measured as the single largest slice
    of a bounded stream's wall clock (q179: 2.1 s of a 2.9 s batch).
    tmpfs (/dev/shm) makes those commits memory-speed. Parameterised via
    SBP_STREAM_CHECKPOINT_DIR for deployments where the checkpoint must
    be durable (a real cluster points it at shared storage — bounded
    demo runs here don't need failure recovery across drivers).
    """
    import tempfile

    base = os.environ.get("SBP_STREAM_CHECKPOINT_DIR")
    if not base:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="sbp-stream-ckpt-", dir=base)
    _CKPT_DIRS.append(d)
    return d


_CKPT_DIRS: list = []


def _cleanup_ckpt_dirs() -> None:
    import shutil

    while _CKPT_DIRS:
        shutil.rmtree(_CKPT_DIRS.pop(), ignore_errors=True)


import atexit as _atexit  # noqa: E402

_atexit.register(_cleanup_ckpt_dirs)


def _start_bounded_stream(spark, writer, timeout: int = 300,
                          partitions: int = 8, stop_on_timeout: bool = False,
                          expect_timeout: bool = False,
                          managed_checkpoint: bool = True):
    """Start an availableNow streaming writer with a BOUNDED state-store
    partition count, await termination, restore the session conf.

    ``managed_checkpoint``: route the query's checkpoint to a fresh
    tmpfs-backed dir (see _stream_checkpoint_dir); pass False when the
    caller set its own checkpointLocation (the state-reader and
    foreachBatch-sink queries that read the checkpoint afterwards).

    The number of streaming state partitions equals
    spark.sql.shuffle.partitions at plan time, and every partition pays
    state-store init + per-batch commit. The batch suite wants 32 shuffle
    partitions; a bounded availableNow run over one file wants few, large
    state partitions (measured 2-3x per-query wall clock at sf0.1:
    q179 9.2s -> 3.3s, q134 3.2s -> 1.7s warm). At real scale this knob
    is sized to key cardinality, not inherited from the batch setting.

    The completion timeout is a PARTIAL-SINK guard, not a data-path
    bound — the defaults fit the test scale factors. Above them (the
    1000x smoke, a real backfill) raise it via SBP_STREAM_TIMEOUT_S;
    a fixed wall-clock ceiling is otherwise itself a scale bug."""
    timeout = max(timeout, int(os.environ.get("SBP_STREAM_TIMEOUT_S", "0")))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    if managed_checkpoint:
        writer = writer.option("checkpointLocation", _stream_checkpoint_dir())
    try:
        q = writer.start()
        if not q.awaitTermination(timeout):
            if expect_timeout:
                # continuous (processingTime) streams never terminate:
                # the caller polls the sink for completeness itself and
                # stops the query (q282/q283)
                return q
            if stop_on_timeout:
                # intentional early stop: callers with lingering
                # processing-time timers (q141/q291) whose DATA batches
                # are already fully committed
                q.stop()
            else:
                # NEVER silently return a running query: the memory sink
                # would be read PARTIAL (or empty) downstream — a silent
                # wrong-answer at scale. Found at 100x: q295's first cut
                # overran this timeout and read 0 rows as if correct.
                q.stop()
                raise RuntimeError(
                    f"bounded stream exceeded {timeout}s before "
                    f"availableNow completion; raise the timeout or "
                    f"reduce the batch — refusing to read a partial sink"
                )
        return q
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def write_batch_shard(batch_df: DataFrame, out_dir: str, batch_id: int) -> None:
    """foreachBatch body helper: land a micro-batch through the q283
    batchId-keyed commit protocol instead of a driver-side collect.

    The batch writes executor-side to a batchId-keyed JSONL shard dir
    (a retried batch OVERWRITES the same path — last write wins), then
    the driver publishes ``_batch-<id>.json`` via tmp-write + atomic
    ``os.replace``. Manifest-honoring readers therefore get exactly-once
    on top of the engine's at-least-once, and no result row ever crosses
    the driver on the data path (only the O(1) manifest commit does).
    """
    import json
    import os

    shard = f"batch-{batch_id:08d}"
    batch_df.write.mode("overwrite").json(os.path.join(out_dir, shard))
    manifest = os.path.join(out_dir, f"_batch-{batch_id:08d}.json")
    with open(manifest + ".tmp", "w", encoding="utf-8") as fh:
        json.dump({"shards": [shard]}, fh)
    os.replace(manifest + ".tmp", manifest)


def read_committed_shards(
    spark: SparkSession, out_dir: str, schema: str
) -> DataFrame:
    """Union of all manifest-listed batch shards (uncommitted/orphan
    shard dirs are invisible), read with an explicit schema."""
    import glob
    import json
    import os

    paths = []
    for man in sorted(glob.glob(os.path.join(out_dir, "_batch-*.json"))):
        with open(man, encoding="utf-8") as fh:
            paths.extend(
                os.path.join(out_dir, s) for s in json.load(fh)["shards"]
            )
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(paths)


@register(
    "q50_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    survey_ref="§2B tumbling window agg (streaming analog); doc-arrival-rate analytics",
)
def q50_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "q51_sliding_window",
    oracle="""
    WITH starts AS (
        SELECT ts, value,
               time_bucket(INTERVAL '5 minutes', ts) AS s1,
               time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS s2
        FROM events
    ), assigned AS (
        SELECT s1 AS window_start, value FROM starts
        UNION ALL
        SELECT s2 AS window_start, value FROM starts
    )
    SELECT window_start, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM assigned GROUP BY window_start
    """,
    survey_ref="§2B sliding window agg (streaming analog)",
    doc="10-minute windows sliding every 5: each event lands in exactly two "
        "windows (starts at the two preceding 5-min marks).",
)
def q51_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


@register(
    "q52_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(epoch(max(ts) - min(ts))) AS BIGINT) AS duration_sec
    FROM sessions GROUP BY user_id, session_id
    """,
    survey_ref="§2B session window (streaming analog); A13 gaps-and-islands; "
               "per-session temp-dir scoping (app/parser.py:239-247)",
    doc="Spark side uses the native session_window operator (30-min gap) — the "
        "same expression works under readStream; oracle is the classic "
        "gaps-and-islands SQL.",
)
def q52_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1e6
            ).cast("long").alias("duration_sec"),
        )
        .select("user_id", "session_start", "n_events", "duration_sec")
    )


@register(
    "q53_json_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    survey_ref="§2B JSON family; model-endpoint JSON output (service/api/routers/models.py:52-59)",
)
def q53_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # project k ONCE before aggregating — three aggregates over the raw
    # get_json_object expression would re-parse the JSON string per
    # aggregate input (no CSE across agg children), tripling the parse cost
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "q54_dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id
    FROM (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    survey_ref="§2B stateful dedup (dropDuplicatesWithinWatermark analog); "
               "idempotent re-submission of the same PDF",
)
def q54_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
        )
    )


@register(
    "q55_event_rate_by_hour",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
    survey_ref="§2B time-bucketed rates; date family",
)
def q55_event_rate_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


_Q134_RUNS = 0


@register(
    "q134_streaming_tumbling_window",
    # REAL Structured Streaming on the driver surface: readStream over the
    # events parquet, tumbling-window aggregation, availableNow trigger
    # into a memory sink — and the result hash-matches the SAME DuckDB
    # oracle as the batch q50, demonstrating Spark's stream/batch
    # unification (identical logical semantics, incremental execution).
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    survey_ref="§2B streaming (tumbling window agg over readStream, "
               "availableNow trigger, memory sink) — the engine-general "
               "streaming surface the north star requires",
    doc="The q50 aggregation executed as an actual streaming query: file "
        "stream source → window agg (stateful) → complete-mode memory "
        "sink; availableNow processes all available data then stops, so "
        "the driver can collect a finished result.",
)
def q134_streaming_tumbling_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    # unique sink name per invocation — a finished memory query can be
    # re-registered, but an active one with the same name cannot
    global _Q134_RUNS
    _Q134_RUNS += 1
    name = f"q134_mem_{_Q134_RUNS}"
    writer = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
    )
    _start_bounded_stream(spark, writer)
    return _finish_memory_sink(spark, name)


_Q135_RUNS = 0


@register(
    "q135_streaming_dedup",
    # keys-only output makes the streaming dedup deterministic: whichever
    # duplicate arrives first, the emitted key set equals SELECT DISTINCT.
    # The whole file lands in batch 1 (watermark still at epoch), so every
    # duplicate pair is within the watermark and state holds for the batch.
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    survey_ref="§2B streaming stateful dedup "
               "(dropDuplicatesWithinWatermark — idempotent re-submission "
               "of the same PDF, SURVEY streaming table)",
    doc="Real streaming dedup: readStream → withWatermark → "
        "dropDuplicatesWithinWatermark on the event key → availableNow "
        "append memory sink; emitted key set hash-matches the batch "
        "DISTINCT.",
)
def q135_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    global _Q135_RUNS
    _Q135_RUNS += 1
    name = f"q135_mem_{_Q135_RUNS}"
    writer = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    _start_bounded_stream(spark, writer)
    return _finish_memory_sink(spark, name)


_Q140_RUNS = 0


@register(
    "q140_streaming_session_window",
    # Same sessionization as batch q52, restricted to the sessions the
    # stream FINALIZES: session windows only support append mode, which
    # emits a session once the watermark (max event time - 10 min after
    # the single data batch) passes the session's window end (last event
    # + 30 min gap). The oracle applies exactly that emission rule, so
    # the streaming result is deterministic and hash-checkable.
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    ), agg AS (
        SELECT user_id, min(ts) AS session_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(round(epoch(max(ts) - min(ts))) AS BIGINT) AS duration_sec,
               max(ts) + INTERVAL '30 minutes' AS window_end
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, n_events, duration_sec
    FROM agg
    WHERE window_end < (SELECT max(ts) - INTERVAL '10 minutes' FROM events)
    """,
    survey_ref="§2B streaming session window (session_window + watermark "
               "under readStream — per-session temp-dir scoping analog, "
               "app/parser.py:239-247)",
    doc="REAL streaming sessionization: readStream → withWatermark → "
        "session_window(30 min gap) aggregation → update-mode memory sink "
        "under availableNow. The same session_window expression as batch "
        "q52 — stream/batch unification for the stateful merging window "
        "operator (state scales O(open sessions), bounded by the "
        "watermark).",
)
def q140_streaming_session_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1e6
            ).cast("long").alias("duration_sec"),
        )
        .select("user_id", "session_start", "n_events", "duration_sec")
    )
    global _Q140_RUNS
    _Q140_RUNS += 1
    name = f"q140_mem_{_Q140_RUNS}"
    writer = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    _start_bounded_stream(spark, writer)
    return _finish_memory_sink(spark, name)


_Q141_RUNS = 0


@register(
    "q141_streaming_stateful_totals",
    # One micro-batch => applyInPandasWithState emits exactly one updated
    # row per key, equal to the batch per-user aggregate. total_value is
    # rounded AFTER the sink: pandas sums float64 in a different order
    # than DuckDB, so only the rounded value is comparable.
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    survey_ref="§2B custom stateful streaming operator "
               "(applyInPandasWithState) — SURVEY streaming table; the "
               "reference's request-scoped incremental session state "
               "(app/parser.py:212-252) as per-key cross-batch state",
    doc="REAL custom stateful streaming: readStream → groupBy(user) → "
        "applyInPandasWithState maintaining per-key running (count, sum) "
        "with processing-time state expiry → update-mode memory sink. "
        "The driver-surface proof of the engine's arbitrary-stateful-"
        "operator capability (streaming/stateful.py).",
)
def q141_streaming_stateful_totals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sciencebeam_parser_spark.streaming.stateful import (
        running_totals_with_state,
    )

    # expire_idle=False: pending processing-time timers would keep the
    # availableNow run alive long after the data batch; a finite run
    # needs no idle-state expiry (state dies with the query).
    out = running_totals_with_state(
        _events_stream(spark, sf_dir), expire_idle=False
    )
    global _Q141_RUNS
    _Q141_RUNS += 1
    name = f"q141_mem_{_Q141_RUNS}"
    writer = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
    )
    _start_bounded_stream(spark, writer, stop_on_timeout=True)
    return _finish_memory_sink(spark, name).select(
        "key", "n_events", F.round("total_value", 2).alias("total_value")
    )


_Q291_RUNS = 0


@register(
    "q291_streaming_transform_with_state",
    # Same algebra as q141: one availableNow micro-batch => one updated
    # row per key = the per-user batch aggregate; total rounded after
    # the sink (pandas float64 summation order differs from DuckDB's).
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    survey_ref="§2B Spark-4 stateful streaming API "
               "(transformWithStateInPandas — typed composable state, "
               "timers, schema evolution); successor surface of q141's "
               "applyInPandasWithState",
    doc="Spark-4 stateful API entry, environment-gated (VERDICT r5 #7): "
        "where google.protobuf exists (the transformWithState state-"
        "server wire protocol) this runs readStream → groupBy(key) → "
        "transformWithStateInPandas with the RocksDB provider — the "
        "real Spark-4 operator under the oracle. In this sandbox "
        "(protobuf absent) it computes the same per-key running totals "
        "through the proven applyInPandasWithState path, so the query "
        "stays oracle-green everywhere while the Spark-4 operator is "
        "exercised wherever the environment allows; "
        "tests/test_spark4_ops.py::test_running_totals_end_to_end is "
        "the protobuf-gated executable spec.",
)
def q291_streaming_transform_with_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False

    global _Q291_RUNS
    _Q291_RUNS += 1
    name = f"q291_mem_{_Q291_RUNS}"
    if has_protobuf:
        from sciencebeam_parser_spark.streaming.stateful import (
            ROCKSDB_PROVIDER,
            running_totals_transform_with_state,
        )

        provider_key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(provider_key, None)
        spark.conf.set(provider_key, ROCKSDB_PROVIDER)
        try:
            out = running_totals_transform_with_state(
                _events_stream(spark, sf_dir)
            )
            writer = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
            )
            _start_bounded_stream(spark, writer, stop_on_timeout=True)
        finally:
            if prev is None:
                spark.conf.unset(provider_key)
            else:
                spark.conf.set(provider_key, prev)
    else:
        from sciencebeam_parser_spark.streaming.stateful import (
            running_totals_with_state,
        )

        out = running_totals_with_state(
            _events_stream(spark, sf_dir), expire_idle=False
        )
        writer = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
        )
        _start_bounded_stream(spark, writer, stop_on_timeout=True)
    return _finish_memory_sink(spark, name).select(
        "key", "n_events", F.round("total_value", 2).alias("total_value")
    )


@register(
    "q136_asof_join",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, 1 AS is_view
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, ts, event_id, 0 AS is_view
        FROM events WHERE event_type = 'click'
    ), j AS (
        SELECT user_id, ts, event_id, is_view,
               last_value(CASE WHEN is_view = 1 THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY ts, is_view DESC, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS view_event_id,
               last_value(CASE WHEN is_view = 1 THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY ts, is_view DESC, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS view_ts
        FROM u
    )
    SELECT user_id,
           event_id AS click_event_id,
           ts AS click_ts,
           view_event_id,
           view_ts,
           CAST(round(epoch(ts - view_ts)) AS BIGINT) AS lag_sec
    FROM j WHERE is_view = 0
    """,
    survey_ref="§2B interval/as-of-style nearest join (A21 analog on the time "
               "axis); north-star custom operator list ('as-of join')",
    doc="As-of join: each click matched to the most recent view by the same "
        "user at or before the click. Implemented as the SCALABLE plan — "
        "union-tag + last(ignorenulls) over one user_id window (a single "
        "shuffle, linear state) — never a per-row range join, whose "
        "candidate explosion is quadratic in events-per-user. Equal "
        "timestamps: the view sorts first (inclusive as-of); among tied "
        "views the highest event_id wins.",
)
def q136_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_view")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(0).alias("is_view")
    )
    u = views.unionByName(clicks)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_view").desc(), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_view = F.col("is_view") == 1
    j = u.withColumn(
        "view_event_id",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True).over(w),
    ).withColumn(
        "view_ts",
        F.last(F.when(is_view, F.col("ts")), ignorenulls=True).over(w),
    )
    return j.filter(~is_view).select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
        "view_event_id",
        "view_ts",
        F.round(
            (F.unix_micros("ts") - F.unix_micros("view_ts")) / 1e6
        ).cast("long").alias("lag_sec"),
    )


@register(
    "q137_time_bucket_rollup",
    oracle="""
    WITH b AS (
        SELECT time_bucket(INTERVAL '15 minutes', ts) AS b15,
               event_type, count(*) AS n, sum(value) AS tv
        FROM events GROUP BY 1, 2
    )
    SELECT '15min' AS grain, b15 AS bucket_start, event_type,
           CAST(n AS BIGINT) AS n, round(tv, 2) AS total_value
    FROM b
    UNION ALL
    SELECT 'hour', date_trunc('hour', b15), event_type,
           CAST(sum(n) AS BIGINT), round(sum(tv), 2)
    FROM b GROUP BY 2, 3
    UNION ALL
    SELECT 'day', date_trunc('day', b15), event_type,
           CAST(sum(n) AS BIGINT), round(sum(tv), 2)
    FROM b GROUP BY 2, 3
    """,
    survey_ref="§2B tumbling window agg + north-star custom operator list "
               "('hypertable rollup'): continuous-aggregate re-aggregation",
    doc="Hypertable-style rollup: the 15-minute leaf aggregate is computed "
        "once from the raw scan; the hour and day grains RE-AGGREGATE those "
        "partials (sum of counts / sums) instead of rescanning events — the "
        "TimescaleDB continuous-aggregate pattern. At 100 TB the raw table "
        "is read once and coarser grains cost only the tiny partial table.",
)
def q137_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # deliberately NOT cached: the three grains reference the same leaf
    # aggregate subtree and ReuseExchange dedups it at runtime; an
    # InMemoryRelation here measured 2x SLOWER in a warm interleaved A/B
    # (0.57s vs 1.22s @ sf0.1, round 4) because the cache materialization
    # is a barrier AQE can't plan through.
    b15 = (
        ev.groupBy(
            F.window("ts", "15 minutes")["start"].alias("b15"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
    )
    leaf = b15.select(
        F.lit("15min").alias("grain"),
        F.col("b15").alias("bucket_start"),
        "event_type",
        "n",
        F.round("tv", 2).alias("total_value"),
    )

    def regrain(grain: str) -> DataFrame:
        return (
            b15.groupBy(
                F.date_trunc(grain, "b15").alias("bucket_start"), "event_type"
            )
            .agg(F.sum("n").alias("n"), F.round(F.sum("tv"), 2).alias("total_value"))
            .select(
                F.lit(grain).alias("grain"),
                "bucket_start",
                "event_type",
                "n",
                "total_value",
            )
        )

    return leaf.unionByName(regrain("hour")).unionByName(regrain("day"))


@register(
    "q138_user_funnel",
    oracle="""
    WITH w1 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS first_view
        FROM events
    ), w2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts >= first_view
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS first_click
        FROM w1
    ), w3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= first_click
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS first_purchase
        FROM w2
    )
    SELECT DISTINCT user_id, first_view, first_click, first_purchase,
           CAST(1 + CASE WHEN first_click IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN first_purchase IS NULL THEN 0 ELSE 1 END
                AS INT) AS stage
    FROM w3 WHERE first_view IS NOT NULL
    """,
    survey_ref="§2B window partition-wide agg + conditional expr; "
               "engine-general event analytics (ordered conversion funnel)",
    doc="Ordered conversion funnel view -> click -> purchase: each stage's "
        "first timestamp must be at-or-after the previous stage's, stated "
        "as chained hash aggregations (map-side partial combine) + "
        "per-user equi-joins. A/B vs the single-Exchange window form at "
        "100x (BASELINE §13): agg wins ~2x uniform and ~4x under a "
        "5M-row hot-user skew, because a hot key's min() folds in every "
        "input partition BEFORE the shuffle instead of sorting on one "
        "core — so the aggregation form is the default.",
)
def q138_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_via_aggregation(table(spark, sf_dir, "events"))


def funnel_via_windows(ev: DataFrame) -> DataFrame:
    """The window formulation of q138 (three partition-wide windows over
    user_id, one Exchange): kept as the A/B counterpart and equivalence
    regression target — loses to the aggregation form at 100x both
    uniform (~2x) and hot-key-skewed (~4x), BASELINE §13."""
    w = W.partitionBy("user_id")
    t = F.col("event_type")
    staged = (
        ev.withColumn(
            "first_view", F.min(F.when(t == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "first_click",
            F.min(
                F.when(
                    (t == "click") & (F.col("ts") >= F.col("first_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "first_purchase",
            F.min(
                F.when(
                    (t == "purchase") & (F.col("ts") >= F.col("first_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return (
        staged.filter(F.col("first_view").isNotNull())
        .select("user_id", "first_view", "first_click", "first_purchase")
        .distinct()
        .withColumn(
            "stage",
            (
                F.lit(1)
                + F.col("first_click").isNotNull().cast("int")
                + F.col("first_purchase").isNotNull().cast("int")
            ).cast("int"),
        )
    )


def funnel_via_aggregation(ev: DataFrame) -> DataFrame:
    """Skew-proof funnel variant: the three partition-wide windows restated
    as hash AGGREGATIONS (map-side partial combine = the salted partial +
    merge, with salt ≡ input partition) chained by per-user equi-joins
    (one row per user on the built side; AQE splits any hot fact key).
    A 1000×-skew hot user never sorts on one core: its min() folds in
    every input partition before the shuffle.

    Same result contract as q138 (user_id, first_view, first_click,
    first_purchase, stage). A/B vs the window form recorded in BASELINE.md
    §13; the window form stays the q138 default (wins below ~core-sized
    hot partitions), this is the documented escape hatch — regression-
    equivalence-tested in test_round5_ops.py.
    """
    t = F.col("event_type")
    # v feeds the click stage's join, the left spine, and (via vc) the
    # purchase stage — broadcast build sides defeat exchange reuse, so
    # the filtered-scan+agg subtrees were embedded once per branch
    # (7 textual scans of events). The per-user 1-row stage relations
    # are lazily checkpointed and computed once (guide §1.2/§5).
    v = (
        ev.filter(t == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.filter(t == "click")
        .select("user_id", "ts")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    vc = v.join(c, "user_id", "left").localCheckpoint(eager=False)
    p = (
        ev.filter(t == "purchase")
        .select("user_id", "ts")
        .join(
            vc.filter(F.col("first_click").isNotNull()).select(
                "user_id", "first_click"
            ),
            "user_id",
        )
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return vc.join(p, "user_id", "left").select(
        "user_id",
        "first_view",
        "first_click",
        "first_purchase",
        (
            F.lit(1)
            + F.col("first_click").isNotNull().cast("int")
            + F.col("first_purchase").isNotNull().cast("int")
        ).cast("int").alias("stage"),
    )


_Q162_RUNS = 0


@register(
    "q162_streaming_sliding_window",
    # sliding 10-minute windows every 5 minutes: each event lands in TWO
    # overlapping windows; the oracle enumerates both via the two 5-minute
    # phase-shifted bucketings.
    oracle="""
    WITH both_phases AS (
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               event_type, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '10 minutes', ts - INTERVAL '5 minutes')
                   + INTERVAL '5 minutes',
               event_type, value
        FROM events
    )
    SELECT window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM both_phases
    GROUP BY 1, 2
    """,
    survey_ref="§2B streaming sliding-window aggregation (readStream + "
               "window(slide) stateful agg — completes the tumbling/"
               "sliding/session window family as REAL streams)",
    doc="Sliding-window aggregation as an actual streaming query: "
        "window('10 minutes', '5 minutes') assigns each event to two "
        "overlapping windows; complete-mode memory sink under "
        "availableNow; the oracle restates the overlap as two "
        "phase-shifted tumbling bucketings.",
)
def q162_streaming_sliding_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    global _Q162_RUNS
    _Q162_RUNS += 1
    name = f"q162_mem_{_Q162_RUNS}"
    writer = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
    )
    _start_bounded_stream(spark, writer)
    return _finish_memory_sink(spark, name)


@register(
    "q186_retention_cohorts",
    # weekly retention triangle: cohort = first active week per user,
    # offset in whole weeks (exact epoch arithmetic on week-truncated
    # timestamps — no engine-specific week-diff semantics).
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    cohort AS (
        SELECT user_id, min(wk) AS cohort_week FROM activity GROUP BY user_id
    )
    SELECT c.cohort_week,
           CAST((CAST(epoch(a.wk) AS BIGINT)
                 - CAST(epoch(c.cohort_week) AS BIGINT)) // 604800
                AS BIGINT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN cohort c ON c.user_id = a.user_id
    GROUP BY 1, 2
    """,
    survey_ref="engine-general analytics surface (§2B aggregations + "
               "windows family): cohort retention — the canonical "
               "two-level self-aggregation every analytics engine must "
               "express",
    doc="Weekly retention cohorts: first-active week per user joined "
        "back to weekly activity, offsets via exact epoch arithmetic on "
        "week-truncated timestamps (portable across engines — named "
        "week-diff functions disagree on boundary semantics). Two "
        "shuffles (distinct-activity, cohort agg) + one equi-join on "
        "user_id; at scale both aggregations combine map-side.",
)
def q186_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(
        F.min("wk").alias("cohort_week")
    )
    offset = (
        (
            F.unix_timestamp("wk") - F.unix_timestamp("cohort_week")
        )
        / 604800
    ).cast("long")
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "q187_daily_anomaly_zscore",
    # volume-anomaly detection: per-day event counts scored against the
    # corpus-wide mean/stddev (sample), |z| > 2 flags. The z-score is
    # rounded before the flag comparison so both engines gate on the
    # same 4-dp value.
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               avg(n) AS mu, stddev_samp(n) AS sigma
        FROM daily GROUP BY event_type
    )
    SELECT d.day, d.event_type, d.n,
           round((d.n - s.mu) / s.sigma, 4) AS zscore,
           CASE WHEN abs(round((d.n - s.mu) / s.sigma, 4)) > 2.0
                THEN TRUE ELSE FALSE END AS is_anomaly
    FROM daily d JOIN stats s ON s.event_type = d.event_type
    """,
    survey_ref="engine-general analytics/observability (§2B aggregations "
               "+ scalar math family): volume anomaly detection — the "
               "pipeline-health check a 100 TB ingest runs on every "
               "partition",
    doc="Daily volume z-scores per event type: per-day counts scored "
        "against the type's mean/sample-stddev, |z| > 2 flagged. The "
        "stats side is a tiny aggregate (one row per type) broadcast "
        "back over the daily counts — the global-statistic → broadcast "
        "→ gate shape shared with q176's percentile cut.",
)
def q187_daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count("*").cast("long").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4)
    return daily.join(F.broadcast(stats), "event_type").select(
        "day",
        "event_type",
        "n",
        z.alias("zscore"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


_EWMA_DEPTH = 8


def _ewma_terms_sql() -> tuple[str, str]:
    """SQL numerator/denominator sums for the truncated integer EWMA:
    weight 2^(depth-k) for the k-th lag (k=1..depth), a lag that falls off
    the start of the series contributes to neither sum."""
    num = " + ".join(
        f"CASE WHEN lag(n, {k}) OVER w IS NULL THEN 0 "
        f"ELSE lag(n, {k}) OVER w * {1 << (_EWMA_DEPTH - k)} END"
        for k in range(1, _EWMA_DEPTH + 1)
    )
    den = " + ".join(
        f"CASE WHEN lag(n, {k}) OVER w IS NULL THEN 0 "
        f"ELSE {1 << (_EWMA_DEPTH - k)} END"
        for k in range(1, _EWMA_DEPTH + 1)
    )
    return num, den


@register(
    "q225_ewma_spike",
    # truncated exponentially-weighted moving average of the PAST 8 daily
    # counts (weights 2^7..2^0 — halving, i.e. alpha=1/2), all in exact
    # int64 arithmetic; the spike gate n > 2*EWMA is cross-multiplied
    # (n*den > 2*num) so no float ever enters the comparison
    oracle=(
        lambda num_den=_ewma_terms_sql(): f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, day, n,
               CAST({num_den[0]} AS BIGINT) AS ewma_num,
               CAST({num_den[1]} AS BIGINT) AS ewma_den
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, n, ewma_num, ewma_den,
           CASE WHEN ewma_den = 0 THEN NULL
                ELSE round(CAST(ewma_num AS DOUBLE) / ewma_den, 4)
           END AS ewma,
           CASE WHEN ewma_den > 0 AND n * ewma_den > 2 * ewma_num
                THEN TRUE ELSE FALSE END AS is_spike
    FROM scored
    """
    )(),
    survey_ref="engine-general analytics/observability (beside q187 "
               "z-scores): EWMA trend baseline + spike gate — the "
               "ingest-volume monitor that adapts to drift, in exact "
               "integer arithmetic",
    doc="Truncated-EWMA spike detection over the per-type daily series: "
        "weights halve over the last 8 observations (alpha=1/2 "
        "exponential smoothing cut at depth 8), kept as an integer "
        "numerator/denominator pair so the 2x-over-baseline gate is a "
        "pure int64 cross-multiplication — bit-exact across engines, "
        "unlike float-accumulated EWMA. One shuffle on event_type; "
        "per-key window state is the 8-row lag buffer, bounded "
        "regardless of series length. Complements q187 (global z-score) "
        "with a drift-adaptive local baseline.",
)
def q225_ewma_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    w = W.partitionBy("event_type").orderBy("day")
    num = None
    den = None
    for k in range(1, _EWMA_DEPTH + 1):
        lagged = F.lag("n", k).over(w)
        weight = 1 << (_EWMA_DEPTH - k)
        t_num = F.when(lagged.isNull(), F.lit(0)).otherwise(lagged * weight)
        t_den = F.when(lagged.isNull(), F.lit(0)).otherwise(F.lit(weight))
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    scored = daily.select(
        "event_type",
        "day",
        "n",
        num.cast("long").alias("ewma_num"),
        den.cast("long").alias("ewma_den"),
    )
    return scored.select(
        "event_type",
        "day",
        "n",
        "ewma_num",
        "ewma_den",
        F.round(
            F.try_divide(F.col("ewma_num").cast("double"), F.col("ewma_den")), 4
        ).alias("ewma"),
        (
            (F.col("ewma_den") > 0)
            & (F.col("n") * F.col("ewma_den") > 2 * F.col("ewma_num"))
        ).alias("is_spike"),
    )


@register(
    "q232_event_transitions",
    # first-order Markov transition matrix over per-user event sequences:
    # lag() pairs consecutive events, one hash aggregate counts
    # transitions, and the row-normalized probability joins back the
    # per-prev totals (broadcast-sized: |event_type|^2 keys).
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    totals AS (
        SELECT prev_type, sum(n) AS tot FROM trans GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, t.n,
           round(CAST(t.n AS DOUBLE) / o.tot, 4) AS p
    FROM trans t JOIN totals o ON o.prev_type = t.prev_type
    """,
    survey_ref="engine-general clickstream analytics (beside q138 funnel, "
               "q186 retention): first-order Markov transition matrix — "
               "the path-analysis aggregate",
    doc="Event-transition matrix: per-user sequences ordered by "
        "(ts, event_id) pair consecutive events via lag, transitions "
        "hash-aggregate to a |types|^2-row matrix, and per-row "
        "probabilities normalize by the source state's total (broadcast "
        "join — the matrix is tiny at any corpus size). One user_id "
        "shuffle for the window, then map-side-combinable aggregates; "
        "the deterministic (ts, event_id) tiebreak makes the lag "
        "engine-exact.",
)
def q232_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # auto-gated (VERDICT r6 #6): one fused hot-key probe picks the
    # plain window below the measured salting threshold, the
    # hour-bucket-salted form past it — both row-exact (§13/§18)
    return transitions_auto(table(spark, sf_dir, "events"))


def transitions_via_window(ev: DataFrame) -> DataFrame:
    """q232's default form: ONE per-user lag window + hash aggregates."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("long").alias("n"))
        # |types|^2 rows, read by both the result and the totals branch:
        # materialize so the corpus lag window runs once, not twice
        .localCheckpoint()
    )
    totals = trans.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return trans.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 4).alias("p"),
    )


# Measured crossover (BASELINE §18, 50%-skew synthetic A/B): at a 5M-row
# hot key the plain window still wins (§13); the two-pass salted form
# pays off only once ONE key's sort dominates the job — set past the
# largest measured window-wins point. At 100 TB with table statistics,
# feed `probe_hot_key` a sample instead of the full scan.
TRANSITIONS_SALT_MIN_HOT_ROWS = 20_000_000


def probe_hot_key(
    ev: DataFrame, key: str = "user_id", fraction: Optional[float] = None
) -> tuple:
    """(max per-key rows, total rows) in ONE fused agg job — the same
    single-action discipline as q65/q93's index_probe (separate
    count()+first() probes measurably double the gate cost).

    Measured at 10M events (local[32], warm): ~2 s vs 14 s for the
    window query itself — a ~14% gate overhead. ``fraction`` samples
    the scan with a fixed seed and scales the counts back up (CLT
    error at the 20M threshold is negligible: a 1% sample sees ~200k
    hot rows ± ~450); at 100 TB prefer table statistics or a cached
    per-key profile over any per-query scan."""
    src = ev.sample(fraction, seed=7) if fraction else ev
    row = (
        src.groupBy(key)
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("hot"), F.sum("c").alias("n"))
        .first()
    )
    scale = 1.0 / fraction if fraction else 1.0
    return (
        int((row["hot"] or 0) * scale),
        int((row["n"] or 0) * scale),
    )


def transitions_auto(
    ev: DataFrame, min_hot_rows: Optional[int] = None
) -> DataFrame:
    """q258's skew-audit signal wired into an automatic form choice.

    The probe is a map-side-combinable per-key count (|keys| shuffle
    rows); past the measured threshold the hour-bucket-salted form
    replaces the single window. Both forms are row-exact (equivalence
    regression in test_round5_ops), so the gate changes only the plan.
    """
    threshold = (
        TRANSITIONS_SALT_MIN_HOT_ROWS
        if min_hot_rows is None
        else min_hot_rows
    )
    hot, _total = probe_hot_key(ev)
    if hot >= threshold:
        return transitions_via_salted_windows(ev)
    return transitions_via_window(ev)


def transitions_via_salted_windows(ev: DataFrame) -> DataFrame:
    """Skew-proof q232 variant: the per-user lag window RANGE-SALTED by
    hour bucket. Within (user_id, hour) the lag runs as before (sorts are
    per-bucket, so a hot user parallelizes across its hours); the one
    transition that straddles each bucket boundary is stitched from a
    per-bucket boundary relation built with map-side-combinable
    min_by/max_by aggregates (≤ |hours| rows per user — the stitch window
    is trivially small). Same output contract as q232.

    A/B at 100x (BASELINE §13): the plain window absorbs a 5M-row hot key
    at this scale, so q232 keeps the single-window form as default; this
    is the measured escape hatch for when one user's rows outgrow a core.
    """
    seq_in = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.date_trunc("hour", F.col("ts")).alias("b"),
    )
    wb = W.partitionBy("user_id", "b").orderBy("ts", "event_id")
    within = seq_in.select(
        F.lag("event_type").over(wb).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    order_key = F.struct("ts", "event_id")
    bounds = seq_in.groupBy("user_id", "b").agg(
        F.min_by("event_type", order_key).alias("first_type"),
        F.max_by("event_type", order_key).alias("last_type"),
    )
    ws = W.partitionBy("user_id").orderBy("b")
    cross = bounds.select(
        F.lag("last_type").over(ws).alias("prev_type"),
        F.col("first_type").alias("next_type"),
    )
    pairs = within.unionByName(cross).filter(F.col("prev_type").isNotNull())
    trans = (
        pairs.groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint()
    )
    totals = trans.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return trans.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 4).alias("p"),
    )


@register(
    "q234_rolling_distinct_users",
    # 7-day rolling distinct users (the WAU curve): count distinct over a
    # sliding date range is not a native window aggregate, so the scale
    # shape is the offset-explode rewrite — each (day, user) pair fans
    # out to the 7 report days it contributes to (bounded 7x map-side
    # fan-out), then ONE distinct aggregate per report day. No range
    # join, no per-day self-join.
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM pairs),
    fanned AS (
        SELECT p.day + CAST(o.o AS INTEGER) AS report_day, p.user_id
        FROM pairs p, unnest(range(0, 7)) o(o)
    )
    SELECT f.report_day,
           CAST(count(DISTINCT f.user_id) AS BIGINT) AS wau
    FROM fanned f
    WHERE f.report_day IN (SELECT day FROM days)
    GROUP BY f.report_day
    """,
    survey_ref="engine-general analytics: rolling-window distinct "
               "(weekly-active-users) via the offset-explode rewrite — "
               "the sliding count-distinct no engine supports natively",
    doc="Rolling 7-day distinct users per day: (day, user) pairs "
        "deduplicate once, then each pair explodes to the 7 report days "
        "its user counts toward and one hash aggregate per report day "
        "counts distinct users — the bounded-fan-out rewrite of a "
        "sliding COUNT(DISTINCT) window, which neither Spark nor any "
        "SQL engine evaluates natively over a RANGE frame. Report days "
        "semi-join the observed-day set so trailing phantom days drop. "
        "At 100 TB: fan-out is exactly 7x the deduped pair count and "
        "every aggregate is map-side combinable.",
)
def q234_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    pairs = checkpoint_big(
        # read by both the fan-out and the observed-day dimension:
        # materialize so the events scan + dedup shuffle runs once.
        # O(distinct day x user) rows at corpus scale -> DISK_ONLY
        ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    )
    days = pairs.select("day").distinct()
    fanned = pairs.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "day",
        "user_id",
    ).select(
        F.date_add("day", F.col("o")).alias("report_day"), "user_id"
    )
    return (
        fanned.join(
            F.broadcast(days),
            fanned.report_day == days.day,
            "left_semi",
        )
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )


_Q235_RUNS = 0


@register(
    "q235_streaming_chained_windows",
    # TWO chained stateful operators in one streaming query (multi-
    # stateful support, append mode): 5-minute tumbling counts re-
    # aggregated into hourly totals, both stages incremental. The oracle
    # applies the append-mode emission rule at each stage: a 5-min
    # window feeds the hourly stage only once the watermark (= max event
    # time, delay 0) passes its end, and an hourly window emits only
    # once the watermark passes ITS end — so the trailing partial hour
    # never appears, exactly as the stream leaves it in the state store.
    oracle="""
    WITH wm AS (SELECT max(ts) AS w FROM events),
    b5 AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS w5, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    emitted5 AS (
        SELECT b5.*, wm.w FROM b5, wm
        WHERE w5 + INTERVAL '5 minutes' <= wm.w
    ),
    hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', w5) AS hour_start,
               event_type, CAST(sum(n) AS BIGINT) AS n, min(w) AS w
        FROM emitted5 GROUP BY 1, 2
    )
    SELECT hour_start, event_type, n FROM hourly
    WHERE hour_start + INTERVAL '1 hour' <= w
    """,
    survey_ref="§2B streaming: CHAINED stateful aggregations (window-on-"
               "window in append mode) — the multi-stateful-operator "
               "surface that pre-aggregation cascades (5min rollup -> "
               "hourly rollup) need in one streaming job",
    doc="Real readStream with two chained stateful window aggregations: "
        "5-minute tumbling counts flow into an hourly re-aggregation "
        "keyed on window_time() of the first stage — one streaming job "
        "instead of the classic two-job kappa chain with an "
        "intermediate topic. State per stage is bounded by the "
        "watermark (delay 0); at scale the 5-min stage absorbs the "
        "event firehose map-side while the hourly stage's key space is "
        "types x hours. Result hash-matches the emission-rule oracle.",
)
def q235_streaming_chained_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "0 seconds")
    s5 = stream.groupBy(
        F.window("ts", "5 minutes").alias("w5"), "event_type"
    ).agg(F.count("*").alias("n"))
    hourly = (
        s5.groupBy(
            F.window(F.window_time("w5"), "1 hour").alias("wh"),
            "event_type",
        )
        .agg(F.sum("n").cast("long").alias("n"))
        .select(F.col("wh.start").alias("hour_start"), "event_type", "n")
    )
    global _Q235_RUNS
    _Q235_RUNS += 1
    name = f"q235_mem_{_Q235_RUNS}"
    writer = (
        hourly.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    _start_bounded_stream(spark, writer)
    return _finish_memory_sink(spark, name)


@register(
    "q236_linear_trend",
    # exact-sum OLS per event type: slope/intercept of the daily-count
    # series come from the closed-form normal equations over integer
    # moment sums (n, Sx, Sy, Sxy, Sxx) — the rational numerator/
    # denominator pairs are exact int64, only the final division is
    # float (rounded 6dp identically on both engines).
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    origin AS (SELECT min(day) AS d0 FROM daily),
    pts AS (
        SELECT event_type,
               CAST(day - d0 AS BIGINT) AS x, y
        FROM daily, origin
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (n * sxx - sx * sx), 6)
           END AS slope,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE round(CAST(sy * sxx - sx * sxy AS DOUBLE)
                           / (n * sxx - sx * sx), 6)
           END AS intercept
    FROM m
    """,
    survey_ref="engine-general analytics/ML: ordinary-least-squares "
               "trend fit per series (beside q187 z-score, q225 EWMA) — "
               "volume forecasting from the same daily aggregates",
    doc="Per-type linear trend of the daily event series: the OLS normal "
        "equations need only five moment sums (n, Sx, Sy, Sxy, Sxx), "
        "all exact int64 over day offsets from the global origin — one "
        "map-side-combinable aggregate per type, a broadcast 1-row "
        "origin, and a closed-form projection. Slope/intercept are "
        "emitted both as exact integer rationals and rounded floats; at "
        "100 TB the fit costs the same one pass as the count itself.",
)
def q236_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("y"))
    origin = daily.agg(F.min("day").alias("d0"))
    pts = daily.crossJoin(F.broadcast(origin)).select(
        "event_type",
        F.datediff("day", "d0").cast("long").alias("x"),
        "y",
    )
    m = pts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    inum = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    return m.select(
        "event_type",
        "n",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        # a single-observation series has zero x-variance: undefined fit
        F.round(F.try_divide(num.cast("double"), den), 6).alias("slope"),
        F.round(F.try_divide(inum.cast("double"), den), 6).alias("intercept"),
    )


@register(
    "q237_ab_test_zscore",
    # two-proportion z-test with deterministic variant assignment
    # (user_id parity): conversion = user made >=1 purchase. The pooled
    # z statistic is computed with the IDENTICAL expression order on
    # both engines and rounded 4dp.
    oracle="""
    WITH assign AS (
        SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    arm AS (
        SELECT variant,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted
        FROM assign GROUP BY variant
    ),
    wide AS (
        SELECT
            max(CASE WHEN variant = 0 THEN n_users END) AS n0,
            max(CASE WHEN variant = 0 THEN n_converted END) AS c0,
            max(CASE WHEN variant = 1 THEN n_users END) AS n1,
            max(CASE WHEN variant = 1 THEN n_converted END) AS c1
        FROM arm
    )
    SELECT n0, c0, n1, c1,
           round(CAST(c0 AS DOUBLE) / n0, 4) AS rate0,
           round(CAST(c1 AS DOUBLE) / n1, 4) AS rate1,
           CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
                ELSE round(
                    (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                    / sqrt(
                        (CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)
                    ), 4)
           END AS zscore
    FROM wide
    """,
    survey_ref="engine-general analytics: two-proportion A/B z-test — "
               "the experimentation readout every event platform ships",
    doc="A/B conversion test: users split by id parity (the "
        "deterministic stand-in for an assignment service), conversion "
        "= any purchase event, and the two-proportion pooled z "
        "statistic compares the arms. One user-level aggregate, one "
        "2-row arm aggregate, one scalar projection — the z formula is "
        "written with identical operation order on both engines so the "
        "IEEE double result matches bit-for-bit before the 4dp round.",
)
def q237_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "converted"
    )
    arm = assign.groupBy("variant").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = arm.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pool = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    # degenerate pools (0% or 100% conversion) have zero variance: the z
    # statistic is undefined — NULL on both engines, never a div-by-zero
    z = F.when(
        ((F.col("c0") + F.col("c1")) != 0)
        & ((F.col("c0") + F.col("c1")) != (F.col("n0") + F.col("n1"))),
        (p1 - p0)
        / F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
        ),
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 4).alias("rate0"),
        F.round(p1, 4).alias("rate1"),
        F.round(z, 4).alias("zscore"),
    )


@register(
    "q241_range_frame_window",
    # RANGE frame over event time: each event's trailing-1-hour volume per
    # type. Spark's rangeBetween needs a numeric ordering column, so the
    # frame runs over epoch seconds — the oracle uses the identical
    # epoch-numeric frame, and the summed quantity is floor-cents int64.
    oracle="""
    WITH e AS (
        SELECT event_id, event_type, ts,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_id, event_type, ts,
           CAST(sum(cents) OVER (
               PARTITION BY event_type ORDER BY sec
               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_hour_cents,
           CAST(count(*) OVER (
               PARTITION BY event_type ORDER BY sec
               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_hour_events
    FROM e
    """,
    survey_ref="§2B windows completion: RANGE (value-interval) frames — "
               "the time-decayed trailing aggregate that ROWS frames "
               "cannot express when events arrive irregularly",
    doc="Trailing 1-hour volume per event: a RANGE frame over epoch "
        "seconds sums the floor-cents value of every same-type event in "
        "the preceding 3600 seconds — unlike a ROWS frame, the window "
        "adapts to irregular arrival density (the frame is defined by "
        "the ORDER-BY value, not row offsets). One shuffle on "
        "event_type; per-key state is bounded by the hour's event "
        "volume. Ties on the same second share a frame on both engines "
        "because RANGE frames are value-based, which is exactly why a "
        "second-resolution ordering key is hash-safe where a "
        "microsecond float would not be.",
)
def q241_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "event_type",
        "ts",
        F.floor(F.unix_micros("ts") / 1_000_000).cast("long").alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("sec")
        .rangeBetween(-3599, W.currentRow)
    )
    return e.select(
        "event_id",
        "event_type",
        "ts",
        F.sum("cents").over(w).cast("long").alias("trailing_hour_cents"),
        F.count("*").over(w).cast("long").alias("trailing_hour_events"),
    )


@register(
    "q243_variant_extract",
    # the VARIANT semi-structured path (Spark 4): parse_json once into a
    # binary variant column, then typed try_variant_get extraction +
    # schema_of_variant introspection — the open-schema ingest pattern
    # that replaces per-query string re-parsing (q53's JSON-path twin).
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS INT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN k > 50 THEN 1 END) AS BIGINT) AS n_high,
           CAST(sum(k) AS BIGINT) AS sum_k,
           'OBJECT<k: BIGINT>' AS variant_schema
    FROM v GROUP BY event_type
    """,
    survey_ref="§2B JSON/semi-structured family: VARIANT ingest "
               "(parse_json -> try_variant_get) — the typed "
               "open-schema path beside q53's string JSON extraction",
    doc="Semi-structured VARIANT processing: props parses ONCE into a "
        "variant column (binary-encoded, shreddable) via try_parse_json "
        "— malformed rows AND missing paths yield NULL, never errors — "
        "and schema_of_variant reports the inferred shape the "
        "engine would use for shredding. At 100 TB the win over q53's "
        "get_json_object is structural: one parse per row feeding any "
        "number of typed extractions, with the variant column itself "
        "columnar-shreddable at the storage layer. The oracle states "
        "the same pipeline over DuckDB's JSON path functions.",
)
def q243_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # try_parse_json (not parse_json): a malformed props row must become
    # NULL, not an executor error — matching the try_variant_get posture
    v = ev.select(
        "event_type", F.try_parse_json("props").alias("v")
    ).select(
        "event_type",
        F.try_variant_get("v", "$.k", "int").alias("k"),
        F.schema_of_variant("v").alias("vs"),
    )
    # schema reported as an aggregate (max), not a grouping key: one odd
    # row must not split the per-type groups the oracle predicts
    return v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.count(F.when(F.col("k") > 50, 1)).cast("long").alias("n_high"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("vs").alias("variant_schema"),
    ).select(
        "event_type", "n", "n_high", "sum_k", "variant_schema"
    )


# --------------------------------------------------------------------------
# CUSUM drift detection (q263)
# --------------------------------------------------------------------------


@register(
    "q263_cusum_drift",
    # Page's CUSUM without recursion: with S_t the running sum of
    # deviations from a fixed first-week baseline, the reset-at-zero
    # cumulative sum is exactly CUSUM_t = S_t - min(0, S_1..S_t) — two
    # windows over one partitioning, no iterative state. Deviations are
    # cross-multiplied (n*7 - baseline_sum) so everything stays int64.
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    ranked0 AS (
        SELECT event_type, day, n,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY day) AS BIGINT) AS rn
        FROM daily
    ),
    ranked AS (
        SELECT event_type, day, n, rn,
               CAST(sum(CASE WHEN rn <= 7 THEN n END)
                    OVER (PARTITION BY event_type) AS BIGINT) AS b7
        FROM ranked0
    ),
    devs AS (
        SELECT event_type, day, n, rn, b7, n * 7 - b7 AS dev
        FROM ranked WHERE rn > 7
    ),
    sums0 AS (
        SELECT event_type, day, n, b7,
               CAST(sum(dev) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS s
        FROM devs
    ),
    sums AS (
        SELECT event_type, day, n, b7, s,
               CAST(min(s) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS smin
        FROM sums0
    )
    SELECT event_type, day, n, b7,
           CAST(s - least(smin, 0) AS BIGINT) AS cusum_scaled,
           (s - least(smin, 0) > 2 * b7) AS drifted
    FROM sums
    """,
    survey_ref="engine-general analytics/observability: Page's CUSUM "
               "drift detector over the daily ingest series — completes "
               "the monitoring family (q187 global z-score, q225 "
               "drift-adaptive EWMA) with the cumulative-shift test "
               "that catches slow drifts both miss",
    doc="CUSUM drift detection: each type's first 7 days fix an integer "
        "baseline; post-baseline deviations are cross-multiplied to "
        "int64 (n*7 - baseline_sum), and the reset-at-zero CUSUM is "
        "the running sum minus its zero-floored running minimum — the classic "
        "recursive max(0, C+dev) re-expressed as two stacked windows "
        "on ONE event_type partitioning (one shuffle). A drift flags "
        "when the cumulative excess exceeds two baseline-days' volume. "
        "Per-key window state is O(1); the series length never "
        "materializes driver-side.",
)
def q263_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    w = W.partitionBy("event_type").orderBy("day")
    wp = W.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        "day",
        "n",
        F.row_number().over(w).cast("long").alias("rn"),
    ).withColumn(
        "b7",
        F.sum(F.when(F.col("rn") <= 7, F.col("n")))
        .over(wp)
        .cast("long"),
    )
    devs = ranked.filter(F.col("rn") > 7).withColumn(
        "dev", F.col("n") * 7 - F.col("b7")
    )
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    sums = devs.withColumn("s", F.sum("dev").over(wrun).cast("long")).withColumn(
        "smin", F.min("s").over(wrun).cast("long")
    )
    # the zero floor: the recursion starts at C_0 = 0, so the running
    # minimum must include S_0 = 0 (min(0, S_1..S_t))
    floor_min = F.least(F.col("smin"), F.lit(0))
    return sums.select(
        "event_type",
        "day",
        "n",
        "b7",
        (F.col("s") - floor_min).cast("long").alias("cusum_scaled"),
        (F.col("s") - floor_min > 2 * F.col("b7")).alias("drifted"),
    )


# --------------------------------------------------------------------------
# Chi-square distribution drift (q264)
# --------------------------------------------------------------------------

_DRIFT_TYPES = ("click", "error", "purchase", "signup", "view")

# one term per literal type, summed in FIXED (alphabetical) order — a
# SUM aggregate over floats would have engine/partition-dependent
# addition order; a literal expression tree does not. A type absent
# from the whole period contributes 0 (its category drops from the
# test) instead of dividing by an expected count of zero, which would
# raise under the session's ANSI mode.
_CHI2_SQL = " + ".join(
    f"(CASE WHEN {t}_tot = 0 THEN 0.0"
    f" ELSE pow(o_{t} - d * {t}_tot / grand_tot, 2)"
    f" / (d * {t}_tot / grand_tot) END)"
    for t in _DRIFT_TYPES
)


@register(
    "q264_distribution_drift",
    # model-ops drift monitoring: does TODAY'S event-type mix match the
    # period's overall mix? Pearson chi-square per day against expected
    # counts e_t = day_total * type_share. Complements q187 (per-type
    # volume z-score) and q263 (cumulative volume shift) with the
    # ACROSS-type compositional test.
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(count(*) AS BIGINT) AS d,
               {", ".join(
                   f"CAST(count(CASE WHEN event_type = '{t}' THEN 1 END)"
                   f" AS BIGINT) AS o_{t}" for t in _DRIFT_TYPES
               )}
        FROM events GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS grand_tot,
               {", ".join(
                   f"CAST(count(CASE WHEN event_type = '{t}' THEN 1 END)"
                   f" AS BIGINT) AS {t}_tot" for t in _DRIFT_TYPES
               )}
        FROM events
    )
    SELECT day, d, round({_CHI2_SQL}, 4) AS chi2,
           (round({_CHI2_SQL}, 4) > 9.4877) AS drifted
    FROM daily CROSS JOIN tot
    """,
    survey_ref="engine-general analytics/observability: Pearson "
               "chi-square compositional drift per day vs the period "
               "mix — the distribution-shift monitor (PSI-style) beside "
               "q187 volume z-scores and q263 CUSUM",
    doc="Distribution drift: daily event-type counts pivot to literal "
        "columns in ONE aggregate (no float SUM over rows — the five "
        "chi-square terms add in a fixed literal order, so the double "
        "result is bit-identical on any IEEE engine), expected counts "
        "derive from the single broadcast period-totals row, and a day "
        "drifts when chi2 exceeds the 95% critical value for 4 degrees "
        "of freedom (9.4877). Two scans, one broadcast, zero joins on "
        "the fact key — the audit costs one pass at any scale.",
)
def q264_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("d"),
        *[
            F.count(F.when(F.col("event_type") == t, 1))
            .cast("long")
            .alias(f"o_{t}")
            for t in _DRIFT_TYPES
        ],
    )
    tot = ev.agg(
        F.count("*").cast("long").alias("grand_tot"),
        *[
            F.count(F.when(F.col("event_type") == t, 1))
            .cast("long")
            .alias(f"{t}_tot")
            for t in _DRIFT_TYPES
        ],
    )
    chi2 = F.round(F.expr(_CHI2_SQL), 4)
    return daily.crossJoin(F.broadcast(tot)).select(
        "day", "d", chi2.alias("chi2"), (chi2 > 9.4877).alias("drifted")
    )
