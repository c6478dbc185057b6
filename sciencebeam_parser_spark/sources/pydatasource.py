"""Custom Python data source (``pyspark.sql.datasource``, the Spark 4
DataSource API): a JSONL corpus-shard reader with one input partition per
shard file.

This is the *engine-extension* source surface: where ``spark.read.json``
hardcodes the JVM reader, a Python DataSource lets the engine ingest a
format only Python can parse (proprietary shard layouts, scientific
formats) while keeping Spark's partition-parallel scan: ``partitions()``
enumerates splits on the driver, ``read(partition)`` runs on executors —
one Arrow-batched task per shard file.

Reference anchor: the reference's sources are child-process wrappers
around exactly this kind of one-file-at-a-time parser
(``external/pdfalto/wrapper.py``); the DataSource API is its Spark-native
generalization.
"""
from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class JsonlShardDataSource(DataSource):
    """Reads the hive-partitioned JSONL layout the q174 shard sink writes
    (``.../source=<shard>/part-*.json``), recovering the partition column
    from the directory name like a catalog scan would."""

    @classmethod
    def name(cls) -> str:
        return "sbp_jsonl_shards"

    def schema(self) -> str:
        return "doc_id bigint, lang string, source string, n_chars bigint"

    def reader(self, schema) -> "JsonlShardReader":
        return JsonlShardReader(self.options)


class JsonlShardReader(DataSourceReader):
    def __init__(self, options) -> None:
        self._root = options["path"]

    def partitions(self):
        # driver-side split enumeration: one InputPartition per shard
        # file — the task granularity a 100 TB layout wants (files are
        # already sized by the writer; no sub-file splitting needed for
        # line-delimited JSON at shard granularity)
        import glob
        import os

        files = sorted(
            glob.glob(
                os.path.join(self._root, "**", "*.json"), recursive=True
            )
        )
        return [InputPartition(f) for f in files]

    def read(self, partition):
        # executor-side: parse one shard file; the hive-style directory
        # name carries the partition column the writer factored out —
        # URL-unescape it and map the hive null sentinel back to NULL,
        # exactly as a catalog scan decodes partition values
        import json
        import re
        from urllib.parse import unquote

        path = partition.value
        m = re.search(r"source=([^/]+)[/\\]", path)
        src = unquote(m.group(1)) if m else None
        if src == "__HIVE_DEFAULT_PARTITION__":
            src = None
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                yield (d.get("doc_id"), d.get("lang"), src, d.get("n_chars"))


_REGISTERED_APPS: set = set()


def register_python_datasource(spark) -> None:
    """Idempotently register the data source with the session."""
    app_id = spark.sparkContext.applicationId
    if app_id in _REGISTERED_APPS:
        return
    spark.dataSource.register(JsonlShardDataSource)
    _REGISTERED_APPS.add(app_id)
