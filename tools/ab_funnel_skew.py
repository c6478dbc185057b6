#!/usr/bin/env python
"""A/B the two funnel formulations under hot-key skew (VERDICT r5 #6).

Builds (or reuses) a skewed events table — 50% of all events reassigned to
ONE user — at the given replication scale, then interleaves warm reps of:

  window: q138's three partition-wide windows (one Exchange, but the hot
          user's rows co-locate on one core)
  agg:    funnel_via_aggregation (hash aggs with map-side partial combine
          + per-user equi-joins — the salted partial/merge escape hatch)

Usage: python tools/ab_funnel_skew.py [events_src_dir] [reps]
       events_src_dir defaults to /tmp/scale_smoke_sf10 (100x of sf0.1).
"""
from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sciencebeam_parser_spark.session import get_spark  # noqa: E402
from sciencebeam_parser_spark.queries.events_ops import (  # noqa: E402
    funnel_via_aggregation,
    funnel_via_windows,
)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_smoke_sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    skew_dir = os.path.join("/tmp", "skew_" + os.path.basename(src))
    spark = get_spark("ab-funnel-skew")
    spark.sparkContext.setLogLevel("ERROR")

    out = os.path.join(skew_dir, "events.parquet")
    if not os.path.exists(out):
        ev = spark.read.parquet(os.path.join(src, "events.parquet"))
        hot = ev.agg(F.min("user_id")).first()[0]
        # events with even event_id -> the hot user (50% of all rows)
        skewed = ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % 2 == 0, F.lit(hot)).otherwise(
                F.col("user_id")
            ),
        )
        skewed.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    print(f"skewed events: {n} rows at {out}", flush=True)

    def run_window():
        ev = spark.read.parquet(out)
        return funnel_via_windows(ev).count()

    def run_agg():
        ev = spark.read.parquet(out)
        return funnel_via_aggregation(ev).count()

    # correctness first: both formulations must agree exactly
    w_df = funnel_via_windows(spark.read.parquet(out))
    a_df = funnel_via_aggregation(spark.read.parquet(out))
    diff = w_df.exceptAll(a_df).count() + a_df.exceptAll(w_df).count()
    print(f"formulation diff rows: {diff}", flush=True)

    results = {"window": [], "agg": []}
    run_window(); run_agg()  # warm both
    for r in range(reps):
        for label, fn in (("window", run_window), ("agg", run_agg)):
            t0 = time.time()
            rows = fn()
            dt = time.time() - t0
            results[label].append(round(dt, 2))
            print(f"rep{r} {label}: {dt:.2f}s rows={rows}", flush=True)
    for label, ts in results.items():
        print(f"{label}: min={min(ts)} median={sorted(ts)[len(ts)//2]} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
