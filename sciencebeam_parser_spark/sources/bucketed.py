"""Bucketed-table layout helpers (SURVEY §2B scans; BASELINE scale posture).

At 100 TB the dominant shuffle is the big-big equi-join (tokens ⋈ labels,
entities ⋈ parsed rewrites — SURVEY §2A A12/A14/A27). Pre-bucketing both
sides on the join key removes that exchange entirely: Spark records the
bucket spec in the catalog, and a join of two tables bucketed into the
same count on the same key compiles to a zero-Exchange sort-merge join
(sortBy additionally removes the per-task sort). The same layout makes
groupBy(key) aggregation exchange-free.

This is the cluster-side analog of the repartition(doc_id) used by the
pandas-UDF stages: pay the partitioning once at write time, reuse it in
every downstream join/agg. tests/test_bucketing.py pins the
zero-Exchange plan shape.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist `df` as an external parquet table bucketed (and optionally
    sorted) on `bucket_col`. Bucket count should match or evenly divide the
    partner tables' count for exchange-free joins."""
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    spark.read.parquet(path) would lose it — the spec lives in the
    catalog, not the files)."""
    return spark.table(table)


__all__ = ["write_bucketed", "read_bucketed"]
