"""Bucketed-layout plan gates: the 100 TB co-located-join strategy
(BASELINE scale posture) must actually remove exchanges."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sciencebeam_parser_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)


def _final_plan(df) -> str:
    df.collect()  # finalize AQE on the SAME df
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    a = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("w")
    )
    write_bucketed(a, "bt_a", str(tmp_path / "bt_a"), bucket_col="doc_id", n_buckets=4)
    write_bucketed(b, "bt_b", str(tmp_path / "bt_b"), bucket_col="doc_id", n_buckets=4)
    yield "bt_a", "bt_b"
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


class TestBucketedLayout:
    def test_join_has_no_exchange(self, spark, bucketed_pair):
        ta, tb = bucketed_pair
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = read_bucketed(spark, ta).join(
                read_bucketed(spark, tb), "doc_id"
            )
            plan = _final_plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_agg_on_bucket_key_has_no_exchange(self, spark, bucketed_pair):
        ta, _ = bucketed_pair
        agg = read_bucketed(spark, ta).groupBy("doc_id").agg(
            F.sum("v").alias("sv")
        )
        plan = _final_plan(agg)
        assert "Exchange" not in plan

    def test_plain_parquet_read_loses_bucketing(self, spark, bucketed_pair, tmp_path):
        # the spec lives in the catalog: reading the files directly must
        # NOT be assumed co-located (documents why read_bucketed exists)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.read.parquet(str(tmp_path / "bt_a"))
            b = spark.read.parquet(str(tmp_path / "bt_b"))
            plan = _final_plan(a.join(b, "doc_id"))
            assert "Exchange" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
