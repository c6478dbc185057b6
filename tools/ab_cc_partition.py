"""Warm interleaved A/B: connected_components sym partitioning.

Variant A = status quo (sym checkpointed with whatever partitioning the
distinct left); variant B = sym hash-partitioned by the per-round join
key (b) before the checkpoint, so LogicalRDD's preserved partitioning
elides the sym-side shuffle in every propagation round.

Usage: python tools/ab_cc_partition.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from sciencebeam_parser_spark.operators.graph import connected_components  # noqa: E402
from sciencebeam_parser_spark.queries import REGISTRY  # noqa: E402
from sciencebeam_parser_spark.queries.text_ops import (  # noqa: E402
    q62_dedup_minhash_lsh_pairs,
)
from sciencebeam_parser_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_smoke_sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JIT + page cache
    REGISTRY["q01_pricing_summary"].build(spark, sf_dir).count()
    pairs = q62_dedup_minhash_lsh_pairs(spark, sf_dir).localCheckpoint()
    print("pairs:", pairs.count(), flush=True)

    times: dict[str, list[float]] = {"A_status_quo": [], "B_partitioned": []}
    for _ in range(reps):
        for key, flag in (("A_status_quo", False), ("B_partitioned", True)):
            t0 = time.time()
            n = connected_components(
                pairs, partition_by_neighbor=flag
            ).count()
            times[key].append(round(time.time() - t0, 2))
            print(key, times[key][-1], "rows", n, flush=True)
    for key, ts in times.items():
        print(key, "min", min(ts), "median", sorted(ts)[len(ts) // 2])


if __name__ == "__main__":
    main()
