#!/usr/bin/env python
"""General warm interleaved probe for any registered queries.

Protocol (BASELINE.md §3): one session, a q01 warm-up, then N
interleaved reps per query; report per-query min/median. Interleaving
cancels the box's slow drift; the min is the best estimate of intrinsic
cost on a noisy shared VM. Use this before trusting (or acting on) any
one-shot bench number.

Usage: python tools/ab_probe.py SF_DIR REPS QUERY [QUERY...]
       python tools/ab_probe.py /root/testdata/sf0.1 3 q215_ivf_trained_index
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from sciencebeam_parser_spark.queries import REGISTRY  # noqa: E402
from sciencebeam_parser_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("ab_probe", master="local[32]", shuffle_partitions=32)
    REGISTRY["q01_pricing_summary"].build(spark, sf_dir).count()  # warm-up
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:  # interleaved: one rep of each per round
            t0 = time.time()
            REGISTRY[n].build(spark, sf_dir).count()
            times[n].append(time.time() - t0)
    for n in names:
        ts = times[n]
        print(
            f"{n}: min={min(ts):.2f}s median={statistics.median(ts):.2f}s "
            f"runs={[round(t, 2) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
