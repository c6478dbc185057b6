#!/usr/bin/env python
"""Round-4 warm A/B probes for the three round-3 one-shot bench outliers
(q97 citation matching, q137 rollup cache, q138 funnel).

Protocol (BASELINE.md §3): one session, q01 warm-up, then N interleaved
runs per variant; report per-variant min/median. Interleaving cancels the
box's slow drift; min is the best estimate of intrinsic cost on a noisy
shared VM.

Usage: python tools/ab_probe_r4.py [sf_dir] [reps]
"""
from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from sciencebeam_parser_spark.queries import REGISTRY  # noqa: E402
from sciencebeam_parser_spark.queries.registry import table  # noqa: E402
from sciencebeam_parser_spark.session import get_spark  # noqa: E402


def q137_no_cache(spark, sf_dir):
    """q137 with the 15-min partial aggregate NOT cached — relies on
    ReuseExchange to dedup the three reads of the leaf aggregate."""
    ev = table(spark, sf_dir, "events")
    b15 = ev.groupBy(
        F.window("ts", "15 minutes")["start"].alias("b15"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
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
            .agg(
                F.sum("n").alias("n"),
                F.round(F.sum("tv"), 2).alias("total_value"),
            )
            .select(
                F.lit(grain).alias("grain"),
                "bucket_start",
                "event_type",
                "n",
                "total_value",
            )
        )

    return leaf.unionByName(regrain("hour")).unionByName(regrain("day"))


def q97_unfused(spark, sf_dir):
    """q97 with stages 1 and 2 as the reference's sequential
    run-then-anti-join chain (the pre-round-3 shape)."""
    from sciencebeam_parser_spark.operators.ref_matching import (
        normalized_key,
        normalized_key_tokens,
        token_prefix_key,
    )
    from sciencebeam_parser_spark.queries import matching_ops as mo

    cits, tgts = mo._q97_fixture(spark, sf_dir)

    def last_per_key(df, keycol):
        w = W.partitionBy("doc_id", keycol).orderBy(F.desc("target_seq"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    cit = cits.select("doc_id", "citation_id", "text")
    tgt = tgts.select("doc_id", "content_id", "text", "target_seq")

    # stage 1: exact key
    t1 = last_per_key(
        tgt.withColumn("_k", normalized_key(F.col("text"))).filter(
            F.length("_k") > 0
        ),
        "_k",
    ).select("doc_id", "_k", "content_id")
    c1 = cit.withColumn("_k", normalized_key(F.col("text")))
    m1 = c1.join(t1, ["doc_id", "_k"]).select(
        "doc_id", "citation_id", F.col("content_id").alias("target_content_id")
    )

    # stage 2: prefix key over remainder
    rem1 = cit.join(m1, ["doc_id", "citation_id"], "left_anti")
    t2 = last_per_key(
        tgt.withColumn("_k", token_prefix_key(F.col("text"))).filter(
            F.length("_k") > 0
        ),
        "_k",
    ).select("doc_id", "_k", "content_id")
    c2 = rem1.withColumn("_k", token_prefix_key(F.col("text")))
    m2 = c2.join(t2, ["doc_id", "_k"]).select(
        "doc_id", "citation_id", F.col("content_id").alias("target_content_id")
    )

    # stage 3: plurality vote over remainder (same as production)
    rem2 = rem1.join(m2, ["doc_id", "citation_id"], "left_anti")
    tgt_tokens = tgt.select(
        "doc_id",
        "content_id",
        F.explode(normalized_key_tokens(F.col("text"))).alias("tok"),
    )
    cit_tokens = rem2.select(
        "doc_id",
        "citation_id",
        F.explode(normalized_key_tokens(F.col("text"))).alias("tok"),
    )
    votes = (
        cit_tokens.join(tgt_tokens, ["doc_id", "tok"])
        .groupBy("doc_id", "citation_id", "content_id")
        .agg(F.count("*").alias("n_votes"))
    )
    w = W.partitionBy("doc_id", "citation_id").orderBy(
        F.desc("n_votes"), F.asc("content_id")
    )
    ranked = votes.select(
        "*",
        F.row_number().over(w).alias("_rn"),
        F.max("n_votes").over(W.partitionBy("doc_id", "citation_id")).alias("_max_v"),
    )
    tied = (
        ranked.filter(F.col("n_votes") == F.col("_max_v"))
        .groupBy("doc_id", "citation_id")
        .agg(F.count("*").alias("_n_top"))
    )
    m3 = (
        ranked.filter(F.col("_rn") == 1)
        .join(tied, ["doc_id", "citation_id"])
        .filter(F.col("_n_top") == 1)
        .select(
            "doc_id",
            "citation_id",
            F.col("content_id").alias("target_content_id"),
        )
    )
    matched = m1.unionByName(m2).unionByName(m3)
    return (
        cit.select("doc_id", "citation_id")
        .join(matched, ["doc_id", "citation_id"], "left")
        .select("doc_id", "citation_id", "target_content_id")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    variants = {
        "q97_fused": lambda: REGISTRY["q97_citation_matching"].build(spark, sf_dir),
        "q97_unfused": lambda: q97_unfused(spark, sf_dir),
        "q137_cached": lambda: REGISTRY["q137_time_bucket_rollup"].build(spark, sf_dir),
        "q137_nocache": lambda: q137_no_cache(spark, sf_dir),
        "q138": lambda: REGISTRY["q138_user_funnel"].build(spark, sf_dir),
    }

    # warm-up
    REGISTRY["q01_pricing_summary"].build(spark, sf_dir).collect()

    times: dict = {k: [] for k in variants}
    for rep in range(reps):
        for name, build in variants.items():
            spark.catalog.clearCache()
            t0 = time.time()
            n = build().count()
            dt = time.time() - t0
            times[name].append(dt)
            print(f"rep{rep} {name}: {dt:.2f}s rows={n}", flush=True)
    print("\n=== summary (min / median over %d reps) ===" % reps)
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.2f}s median={statistics.median(ts):.2f}s")


if __name__ == "__main__":
    main()
