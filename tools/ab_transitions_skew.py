#!/usr/bin/env python
"""Find the hot-key size where the salted transitions form beats the
plain window (VERDICT r6 #6) — the threshold for transitions_auto.

Generates synthetic 50%-skew events tables (ONE user owns half of all
rows, the rest spread over 100k users; timestamps span ~90 days so the
hour-bucket salt has ~2k+ buckets to spread the hot key over), then
interleaves warm reps of:

  window: transitions_via_window  (one per-user lag window — the hot
          user's rows sort on one core)
  salted: transitions_via_salted_windows (per-(user, hour) lag +
          boundary stitch — two passes, fully parallel)

Usage: python tools/ab_transitions_skew.py [hot_sizes_csv] [reps]
       default hot sizes: 5000000,20000000,40000000  (total = 2x hot)
"""
from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sciencebeam_parser_spark.session import get_spark  # noqa: E402
from sciencebeam_parser_spark.queries.events_ops import (  # noqa: E402
    transitions_via_salted_windows,
    transitions_via_window,
)

SPAN_S = 90 * 24 * 3600  # ~90 days -> ~2160 hour buckets
BASE_EPOCH = 1_700_000_000
TYPES = ["view", "click", "cart", "purchase", "refund"]


def gen(spark, out: str, n_hot: int) -> None:
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    shutil.rmtree(out, ignore_errors=True)
    total = 2 * n_hot
    df = spark.range(total).select(
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(100_000)) + 1)
        .cast("long")
        .alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in TYPES]),
            (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        F.timestamp_seconds(
            F.lit(BASE_EPOCH) + F.pmod(F.col("id") * 37, F.lit(SPAN_S))
        ).alias("ts"),
        F.col("id").alias("event_id"),
    )
    df.write.mode("overwrite").parquet(out)


def main():
    hot_sizes = [
        int(x)
        for x in (
            sys.argv[1] if len(sys.argv) > 1 else "5000000,20000000,40000000"
        ).split(",")
    ]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("ab-transitions-skew")
    spark.sparkContext.setLogLevel("ERROR")

    for n_hot in hot_sizes:
        out = f"/tmp/ab_trans_skew_{n_hot}"
        gen(spark, out, n_hot)
        ev = spark.read.parquet(out)
        n = ev.count()
        print(f"== hot={n_hot:,} total={n:,} at {out}", flush=True)

        # row-exactness at the smallest size only (exceptAll at 40M rows
        # costs more than the measurement itself)
        if n_hot == min(hot_sizes):
            w_df = transitions_via_window(ev)
            s_df = transitions_via_salted_windows(ev)
            diff = w_df.exceptAll(s_df).count() + s_df.exceptAll(w_df).count()
            print(f"   formulation diff rows: {diff}", flush=True)

        def run(form):
            ev2 = spark.read.parquet(out)
            df = (
                transitions_via_window(ev2)
                if form == "window"
                else transitions_via_salted_windows(ev2)
            )
            return df.count()

        results = {"window": [], "salted": []}
        run("window"); run("salted")  # warm
        for r in range(reps):
            for form in ("window", "salted"):
                t0 = time.time()
                rows = run(form)
                dt = time.time() - t0
                results[form].append(round(dt, 2))
                print(f"   rep{r} {form}: {dt:.2f}s rows={rows}", flush=True)
        for form, ts in results.items():
            print(
                f"   hot={n_hot:,} {form}: min={min(ts)} "
                f"median={sorted(ts)[len(ts) // 2]} all={ts}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
