"""Event-stream operators in batch form (SURVEY §2B streaming rows).

Structured Streaming itself is exercised in ``streaming/`` (tests run real
``readStream`` pipelines); the queries here are the *batch-equivalent* plans
of the same windowed aggregations, so they are oracle-checkable. The Spark
builders use the native window operators (``F.window``, ``F.session_window``)
— identical expressions work under ``readStream`` with a watermark.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries.registry import register, table


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
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
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
    from pyspark.sql import types as T

    # events.parquet stores TIMESTAMP(NANOS): with the nanosAsLong legacy
    # conf the streaming source reads ts as long; rebuild micros exactly
    # like registry.table so the oracle agrees
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # the file-stream source lists a DIRECTORY; point it at sf_dir with a
    # glob filter so only the events file streams in
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
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
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


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
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    global _Q135_RUNS
    _Q135_RUNS += 1
    name = f"q135_mem_{_Q135_RUNS}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
