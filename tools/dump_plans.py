#!/usr/bin/env python
"""Dump ``explain('formatted')`` for named queries to plans/<round>/ files.

Usage:

    python tools/dump_plans.py <sf_dir> <round_dir> <suffix> <query> [...]

Writes ``plans/<round_dir>/<query>_<suffix>.txt`` for each query.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sciencebeam_parser_spark.queries import REGISTRY  # noqa: E402
from sciencebeam_parser_spark.session import get_spark  # noqa: E402


def main():
    sf_dir, round_dir, suffix = sys.argv[1:4]
    names = sys.argv[4:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
