#!/usr/bin/env python
"""A/B the q296 band-index maintenance shapes at 100x (VERDICT r6 #1).

Replays the 100x corpus (500k docs) as B deterministic micro-batches
through the incremental-dedup loop and times, PER BATCH and separately:

  probe:        the left_semi collision lookup (both arms pay this)
  maintenance:  OLD  = union -> distinct -> localCheckpoint of the FULL
                       merged index (the r6 accumulator shape)
                NEW  = AppendOnlyBandStore.append (batchId-keyed shard +
                       manifest commit; periodic bin-pack compaction)

The claim under test: OLD maintenance cost grows ~linearly with batch
number (quadratic total), NEW stays O(batch) with an amortized
compaction spike every compact_every batches.

Usage: python tools/ab_band_index.py [docs_dir] [n_batches]
       docs_dir default /tmp/scale_smoke_sf10 (100x), n_batches 25
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
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark("ab-band-index")
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

    def batch_df(k):
        return docs.filter(F.pmod("doc_id", F.lit(n_batches)) == k)

    results = {}

    # ---- OLD shape: accumulate + full re-distinct per batch -------------
    t_old_probe, t_old_maint = [], []
    index = None
    for k in range(n_batches):
        bands = to_bands(batch_df(k)).localCheckpoint()
        t0 = time.time()
        if index is not None:
            bands.join(
                index, ["band_idx", "band_hash"], "left_semi"
            ).select("doc_id").distinct().count()
        t1 = time.time()
        new_bands = bands.select("band_idx", "band_hash")
        merged = (
            new_bands if index is None else index.unionByName(new_bands)
        )
        prev = index
        index = merged.distinct().localCheckpoint()
        if prev is not None:
            prev.unpersist()
        t2 = time.time()
        t_old_probe.append(round(t1 - t0, 2))
        t_old_maint.append(round(t2 - t1, 2))
        print(
            f"old  b{k:02d} probe={t1 - t0:.2f}s maint={t2 - t1:.2f}s",
            flush=True,
        )
    results["old"] = (t_old_probe, t_old_maint)
    index.unpersist()

    # ---- NEW shape: append-only store + periodic compaction -------------
    root = "/tmp/ab_band_store"
    shutil.rmtree(root, ignore_errors=True)
    store = AppendOnlyBandStore(spark, root=root, compact_every=8)
    t_new_probe, t_new_maint = [], []
    for k in range(n_batches):
        bands = to_bands(batch_df(k)).localCheckpoint()
        t0 = time.time()
        store.probe(bands).count()
        t1 = time.time()
        store.append(bands, k)
        t2 = time.time()
        t_new_probe.append(round(t1 - t0, 2))
        t_new_maint.append(round(t2 - t1, 2))
        print(
            f"new  b{k:02d} probe={t1 - t0:.2f}s maint={t2 - t1:.2f}s",
            flush=True,
        )
    results["new"] = (t_new_probe, t_new_maint)

    for arm, (probe, maint) in results.items():
        print(
            f"{arm}: probe_total={sum(probe):.1f}s "
            f"maint_total={sum(maint):.1f}s "
            f"maint_first5={maint[:5]} maint_last5={maint[-5:]}",
            flush=True,
        )
    print(
        f"store stats: appends={store.rows_written_per_append[:3]}... "
        f"compactions={store.n_compactions} "
        f"rows_compacted={store.rows_compacted}",
        flush=True,
    )
    store.cleanup()
    spark.stop()


if __name__ == "__main__":
    main()
