#!/usr/bin/env python
"""Version-sensitivity risk sweep over registered queries (VERDICT r5 #2).

For every oracle-backed query, inspect the RESULT surface (the only thing
the driver hashes) at a small sf and flag the two channel classes that can
drift across engine versions even when the algebra is identical:

* float-risk: double/float output columns whose oracle text has no
  ``round(`` — bitwise float formatting is the classic cross-engine trap.
* long-string-risk: string output columns with max length > threshold at
  sf0.001 — long assembled strings (string_agg/array_join chains) are the
  q124/q127 suspect class; short enum-ish strings are safe.

Construct classes themselves (regexp, hex casts, //, list lambdas,
string_agg ORDER BY) are all driver-proven-green by r5 sampled exemplars,
so the sweep targets output channels, not syntax.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sciencebeam_parser_spark.queries import REGISTRY  # noqa: E402
from sciencebeam_parser_spark.session import get_spark  # noqa: E402

LONG_STRING = 64


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("risk-sweep")
    from pyspark.sql import functions as F

    n_flagged = 0
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        if q.oracle is None:
            continue
        try:
            df = q.build(spark, sf_dir)
        except Exception as e:
            print(f"ERR   {name}: {e}")
            continue
        flags = []
        float_cols = [
            f.name for f in df.schema.fields
            if f.dataType.typeName() in ("double", "float")
        ]
        if float_cols and "round(" not in q.oracle.lower():
            flags.append(f"float-no-round:{float_cols}")
        str_cols = [
            f.name for f in df.schema.fields
            if f.dataType.typeName() == "string"
        ]
        if str_cols:
            try:
                aggs = [F.max(F.length(c)).alias(c) for c in str_cols]
                row = df.agg(*aggs).first()
                longs = [
                    c for c in str_cols
                    if row[c] is not None and row[c] > LONG_STRING
                ]
                if longs:
                    flags.append(f"long-string:{longs}")
            except Exception as e:
                flags.append(f"len-check-err:{e}")
        if flags:
            n_flagged += 1
            print(f"FLAG  {name}: {'; '.join(flags)}")
    print(f"{n_flagged} flagged")
    spark.stop()


if __name__ == "__main__":
    main()
