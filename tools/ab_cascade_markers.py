#!/usr/bin/env python
"""Marker-bearing cascade probe (round 9, VERDICT #1).

The bench corpus's mock vocabulary produces ZERO citation markers, so the
no-marker short-circuit hides the fuzzy-matcher subtree at bench scale. This
probe relabels the first body tokens of every document as a figure marker +
figure entity, forcing the marker-present path (match_content_ids) to build
and execute over the full corpus — the plan/timing surface a real marker-
bearing corpus would pay.

Usage: python tools/ab_cascade_markers.py <sf_dir> [plan_out.txt]
Prints the node-count summary and 1 warm-up + 3 timed noop reps.
"""
from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.plans.cascade import run_fulltext_cascade
from sciencebeam_parser_spark.queries.pipeline_ops import _mock_labeled_tokens
from sciencebeam_parser_spark.session import get_spark


def marker_bearing_labels(labels):
    """Relabel each doc's first five BODY-region fulltext tokens as
    figure_marker (2 tokens) + figure (3 tokens). The body gate must match
    the mock segmentation rule ((seq-1)*10 in [n*3, n*7)) — labels on
    front/back tokens are dropped by the cascade's region join and would
    leave the corpus marker-free (the short-circuit this probe exists to
    bypass)."""
    ft = labels.filter(F.col("model_name") == "fulltext").withColumn(
        "_n", F.count("*").over(W.partitionBy("doc_id"))
    )
    scaled = (F.col("token_seq") - 1) * 10
    ft = ft.withColumn(
        "_body", (scaled >= F.col("_n") * 3) & (scaled < F.col("_n") * 7)
    )
    w = W.partitionBy("doc_id", "_body").orderBy("token_seq")
    ft = ft.withColumn("_rn", F.row_number().over(w))
    relabeled = ft.withColumn(
        "label",
        F.when(~F.col("_body"), F.col("label"))
        .when(F.col("_rn") == 1, "B-<figure_marker>")
        .when(F.col("_rn") == 2, "I-<figure_marker>")
        .when(F.col("_rn") == 3, "B-<figure>")
        .when(F.col("_rn").isin(4, 5), "I-<figure>")
        .otherwise(F.col("label")),
    ).drop("_rn", "_n", "_body")
    return labels.filter(F.col("model_name") != "fulltext").unionByName(relabeled)


def main():
    sf_dir = sys.argv[1]
    plan_out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("ab_cascade_markers")
    toks, labels = _mock_labeled_tokens(spark, sf_dir)
    labels = marker_bearing_labels(labels).localCheckpoint()
    toks = toks.localCheckpoint()

    def build():
        return run_fulltext_cascade(toks, labels)

    df = build()
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    counts = {
        k: len(re.findall(k, txt))
        for k in [
            "Exchange",
            "Scan parquet",
            "BroadcastExchange",
            "Window",
            "SortMergeJoin",
            "BroadcastHashJoin",
            "HashAggregate",
            "Generate",
        ]
    }
    print("PLAN", counts, "plan_bytes=", len(txt), flush=True)
    if plan_out:
        with open(plan_out, "w") as f:
            f.write(txt)

    reps = []
    for i in range(4):
        spark.catalog.clearCache()
        t0 = time.time()
        d = build()
        d.write.format("noop").mode("overwrite").save()
        reps.append(time.time() - t0)
        print(f"rep{i} {reps[-1]:.2f}s", flush=True)
    timed = sorted(reps[1:])
    print(f"MARKER_CASCADE first={reps[0]:.2f} min={timed[0]:.2f} med={timed[1]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
