#!/usr/bin/env python
"""Warm-isolated noop probes: for each named query, build+noop-write 3 times
in one session (after a warm-up rep) and print min/median. Usage:

    python tools/probe_warm.py <sf_dir> <query> [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sciencebeam_parser_spark.queries import REGISTRY  # noqa: E402
from sciencebeam_parser_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("probe")
    REGISTRY["q01_pricing_summary"].build(spark, sf_dir).count()
    for name in names:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        reps = []
        for i in range(4):
            t0 = time.time()
            df = q.build(spark, sf_dir)
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception:
                df.count()
            reps.append(time.time() - t0)
            spark.catalog.clearCache()
        timed = sorted(reps[1:])
        print(
            f"PROBE {name} first={reps[0]:.2f} min={timed[0]:.2f} "
            f"med={timed[1]:.2f} max={timed[2]:.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
