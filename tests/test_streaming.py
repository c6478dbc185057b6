"""Structured Streaming tests: run real readStream pipelines from a file
source into a memory sink and assert on results.
"""
import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sciencebeam_parser_spark.streaming import (
    sessionized_counts,
    stream_dedup,
    tumbling_counts,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def write_events_json(tmp_path, rows):
    path = tmp_path / "events"
    path.mkdir()
    with open(path / "part-0.json", "w") as f:
        for ts, user, etype, value in rows:
            f.write(
                json.dumps(
                    {"ts": ts, "user_id": user, "event_type": etype, "value": value}
                )
                + "\n"
            )
    return str(path)


def run_to_memory(spark, stream_df, name, timeout=60):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return spark.table(name)


class TestStreamingWindows:
    def test_tumbling_counts_from_file_stream(self, spark, tmp_path):
        src = write_events_json(
            tmp_path,
            [
                ("2024-01-01 00:01:00", 1, "click", 1.0),
                ("2024-01-01 00:05:00", 2, "click", 2.0),
                ("2024-01-01 00:12:00", 1, "view", 3.0),
            ],
        )
        stream = spark.readStream.schema(EVENTS_SCHEMA).json(src)
        assert stream.isStreaming
        out = run_to_memory(
            spark, tumbling_counts(stream), "tumbling_test"
        ).collect()
        by_window = {(str(r["window_start"]), r["event_type"]): r["n"] for r in out}
        assert by_window[("2024-01-01 00:00:00", "click")] == 2
        assert by_window[("2024-01-01 00:10:00", "view")] == 1

    def test_session_window_stream(self, spark, tmp_path):
        src = write_events_json(
            tmp_path,
            [
                ("2024-01-01 00:00:00", 1, "click", 1.0),
                ("2024-01-01 00:10:00", 1, "click", 1.0),  # same session (<30m gap)
                ("2024-01-01 02:00:00", 1, "click", 1.0),  # new session
            ],
        )
        stream = spark.readStream.schema(EVENTS_SCHEMA).json(src)
        out = run_to_memory(
            spark, sessionized_counts(stream), "session_test"
        ).collect()
        sessions = sorted((str(r["session_start"]), r["n_events"]) for r in out)
        assert sessions == [
            ("2024-01-01 00:00:00", 2),
            ("2024-01-01 02:00:00", 1),
        ]

    def test_stream_dedup(self, spark, tmp_path):
        src = write_events_json(
            tmp_path,
            [
                ("2024-01-01 00:00:00", 1, "click", 1.0),
                ("2024-01-01 00:01:00", 1, "click", 2.0),  # dup key within watermark
                ("2024-01-01 00:02:00", 2, "click", 3.0),
            ],
        )
        stream = spark.readStream.schema(EVENTS_SCHEMA).json(src)
        deduped = stream_dedup(stream)
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        out = spark.table("dedup_test").collect()
        assert len(out) == 2
        assert sorted(r["user_id"] for r in out) == [1, 2]

    def test_foreach_batch_sink(self, spark, tmp_path):
        src = write_events_json(
            tmp_path, [("2024-01-01 00:00:00", 1, "click", 1.0)]
        )
        stream = spark.readStream.schema(EVENTS_SCHEMA).json(src)
        seen = []

        def handle(batch_df, batch_id):
            seen.append((batch_id, batch_df.count()))

        q = (
            tumbling_counts(stream)
            .writeStream.foreachBatch(handle)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        assert seen and seen[0][1] == 1


class TestStatefulOperator:
    def test_running_totals_with_state(self, spark, tmp_path):
        from sciencebeam_parser_spark.streaming.stateful import (
            running_totals_with_state,
        )

        src = write_events_json(
            tmp_path,
            [
                ("2024-01-01T10:00:00Z", 1, "open", 2.0),
                ("2024-01-01T10:01:00Z", 1, "open", 3.0),
                ("2024-01-01T10:02:00Z", 2, "open", 5.0),
            ],
        )
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA).json(src)
        )
        out = running_totals_with_state(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        rows = {
            r.key: (r.n_events, r.total_value)
            for r in spark.table("running_totals").collect()
        }
        assert rows == {"1": (2, 5.0), "2": (1, 5.0)}


class TestManifestSinkProtocol:
    """q150/q295 foreachBatch results go through the q283 batchId-keyed
    manifest commit, not a driver-side collect (VERDICT r6 #4)."""

    def test_foreach_batch_builders_never_collect(self):
        import inspect

        from sciencebeam_parser_spark.queries import curation_ops, layout_ops

        for fn in (
            layout_ops.q150_streaming_foreach_batch,
            curation_ops.q295_streaming_lsh_dedup,
            curation_ops.q296_streaming_dedup_index_growth,
        ):
            assert ".collect()" not in inspect.getsource(fn), fn.__name__

    def test_retried_batch_overwrites_shard(self, spark, tmp_path):
        from sciencebeam_parser_spark.queries.events_ops import (
            read_committed_shards,
            write_batch_shard,
        )

        out = str(tmp_path / "sink")
        first = spark.createDataFrame([(1, "a")], "id long, v string")
        write_batch_shard(first, out, 0)
        # at-least-once: the engine re-runs batch 0 with the same data
        # semantics — last write wins, no duplicate rows
        write_batch_shard(first, out, 0)
        write_batch_shard(
            spark.createDataFrame([(2, "b")], "id long, v string"), out, 1
        )
        back = read_committed_shards(spark, out, "id long, v string")
        assert sorted((r["id"], r["v"]) for r in back.collect()) == [
            (1, "a"),
            (2, "b"),
        ]

    def test_uncommitted_shard_invisible(self, spark, tmp_path):
        import os

        from sciencebeam_parser_spark.queries.events_ops import (
            read_committed_shards,
            write_batch_shard,
        )

        out = str(tmp_path / "sink2")
        write_batch_shard(
            spark.createDataFrame([(1, "a")], "id long, v string"), out, 0
        )
        # crashed attempt: shard written, manifest never published
        spark.createDataFrame([(9, "z")], "id long, v string").write.json(
            os.path.join(out, "batch-orphan")
        )
        back = read_committed_shards(spark, out, "id long, v string")
        assert [r["id"] for r in back.collect()] == [1]

    def test_empty_dir_returns_empty_with_schema(self, spark, tmp_path):
        from sciencebeam_parser_spark.queries.events_ops import (
            read_committed_shards,
        )

        out = str(tmp_path / "empty")
        back = read_committed_shards(spark, out, "id long, v string")
        assert back.count() == 0
        assert back.columns == ["id", "v"]
