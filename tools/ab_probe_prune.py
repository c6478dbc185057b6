#!/usr/bin/env python
"""A/B the band-store probe's stats pruning at 100x (VERDICT r7 #3).

Builds the append-only band index from the 100x corpus (500k docs,
~2M band rows across n_batches versioned appends + one compaction),
then times, warm and interleaved (3 reps each, min reported):

  full:    the UNPRUNED probe — left_semi against every manifest entry
           (the r7 shape: O(index) read per increment)
  pruned:  AppendOnlyBandStore.probe — one fused agg computes the
           increment's per-band hash envelope; entries for untouched
           bands / non-overlapping footer-stat ranges are never read

over two increments:

  all-bands:  a typical micro-batch emitting rows in every band
              (pruning keeps hash-range skipping only)
  one-band:   an increment touching 1 of 4 bands (the partition-prune
              case the per-band cell layout exists for)

Usage: python tools/ab_probe_prune.py [docs_dir] [n_batches] [compact]
       docs_dir default /tmp/scale_smoke_sf10 (100x), n_batches 10,
       compact 1|0 (0 = probe the FRAGMENTED pre-compaction index —
       the streaming steady state between OPTIMIZE passes, where entry
       pruning saves the most footer/scan work)
"""
from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sciencebeam_parser_spark.session import get_spark  # noqa: E402


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_smoke_sf10"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    do_compact = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    spark = get_spark("ab-probe-prune")
    spark.sparkContext.setLogLevel("ERROR")

    from sciencebeam_parser_spark.operators.band_store import (
        AppendOnlyBandStore,
    )
    from sciencebeam_parser_spark.queries.text_ops import _minhash_signature

    docs = spark.read.parquet(os.path.join(src, "documents.parquet")).select(
        "doc_id", "text"
    )

    def to_bands(d):
        sig = _minhash_signature(d)
        band_cols = [
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        ":", *[F.col(f"m{4 * b + i}") for i in range(4)]
                    )
                ).alias("band_hash"),
            )
            for b in range(4)
        ]
        return sig.select(
            "doc_id", F.explode(F.array(*band_cols)).alias("band")
        ).select("doc_id", "band.band_idx", "band.band_hash")

    root = "/tmp/ab_probe_prune_store"
    shutil.rmtree(root, ignore_errors=True)
    store = AppendOnlyBandStore(spark, root=root, compact_every=0)
    t0 = time.time()
    for k in range(n_batches):
        bands = to_bands(
            docs.filter(F.pmod("doc_id", F.lit(n_batches)) == k)
        ).localCheckpoint()
        store.append(bands, k)
    if do_compact:
        store.compact()
    print(
        f"built: {len(store.entries())} entries, "
        f"{sum(store.rows_written_per_append)} band rows, "
        f"{time.time() - t0:.1f}s",
        flush=True,
    )

    increment = to_bands(
        docs.filter(F.pmod("doc_id", F.lit(997)) == 0)
    ).localCheckpoint()
    one_band = increment.filter(F.col("band_idx") == 0).localCheckpoint()
    increment.count(), one_band.count()  # materialize before timing

    def probe_full(bands_df):
        return (
            bands_df.join(
                store.read_index(), ["band_idx", "band_hash"], "left_semi"
            )
            .select("doc_id")
            .distinct()
            .count()
        )

    def probe_pruned(bands_df):
        return store.probe(bands_df).count()

    arms = {
        "all-bands full": lambda: probe_full(increment),
        "all-bands pruned": lambda: probe_pruned(increment),
        "one-band full": lambda: probe_full(one_band),
        "one-band pruned": lambda: probe_pruned(one_band),
    }
    for fn in arms.values():  # warm-up pass, untimed
        fn()
    times = {name: [] for name in arms}
    for _rep in range(3):  # interleaved warm reps
        for name, fn in arms.items():
            t = time.time()
            n = fn()
            times[name].append(time.time() - t)
    for name, ts in times.items():
        print(
            f"{name}: min={min(ts):.2f}s reps={[round(x, 2) for x in ts]}",
            flush=True,
        )
    print(
        f"entries scanned (pruned probes, last 6): "
        f"{list(zip(store.probe_entries_scanned, store.probe_entries_total))[-6:]}",
        flush=True,
    )
    store.cleanup()
    spark.stop()


if __name__ == "__main__":
    main()
