"""Exact global row_number / ntile over a total order, with a
scale-parameterised execution mode (guide §2: a global rank's
single-partition window is THE unscalable operator once the ranked
relation outgrows one task).

Mode comes from the session conf ``spark.sbp.globalRank.mode`` (falling
back to the env var ``SBP_GLOBAL_RANK_MODE``, default ``auto``):

* ``single`` — the plain unpartitioned window. One partition carries
  the whole relation; correct and CHEAPEST while that relation is small
  (every consumer here ranks an aggregated one-row-per-document /
  per-user / per-order relation, which fits one task at bench scale).
* ``two-phase`` — the production form: range-repartition by the order
  columns, rank within each partition in parallel, then add
  per-partition row-count offsets (one O(#partitions)-row driver
  collect — control-plane, like the graph convergence probe). Output is
  IDENTICAL for any total order (the order columns must be tie-broken,
  which every consumer's oracle already requires for determinism);
  pinned by tests/test_global_rank.py over every consumer's relation.
* ``auto`` (default) — pick by the optimizer's size estimate of the
  ranked relation: ``single`` while the estimate is at or under
  ``spark.sbp.globalRank.autoThresholdBytes`` (default 256 MB — well
  inside one task's sort budget), ``two-phase`` above it, or whenever
  the estimate is unavailable (scale-safe). No deployment has to know
  a conf for the single-partition window to disappear at scale; the
  bench-scale consumers estimate 0.2–13 MB, so their plans are
  byte-identical to explicit ``single`` (pinned in the tests).

ntile(n) derives from the global row number and the total count with
Spark's exact bucket-size rule (first ``total % n`` buckets get one
extra row), so two-phase ntile matches the built-in bit-for-bit.
"""
from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


_AUTO_THRESHOLD_DEFAULT = 256 * 1024 * 1024


def _mode(df: DataFrame) -> str:
    try:
        conf = df.sparkSession.conf
        mode = conf.get(
            "spark.sbp.globalRank.mode",
            os.environ.get("SBP_GLOBAL_RANK_MODE", "auto"),
        )
    except Exception:  # pragma: no cover - conf access always works
        return "single"
    if mode != "auto":
        return mode
    try:
        threshold = int(
            conf.get(
                "spark.sbp.globalRank.autoThresholdBytes",
                str(_AUTO_THRESHOLD_DEFAULT),
            )
        )
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        return "two-phase" if est > threshold else "single"
    except Exception:
        # no usable estimate: assume the relation is big — two-phase is
        # correct at every size, single is only correct-and-cheap when small
        return "two-phase"


def with_global_rank(
    df: DataFrame,
    order_cols,
    *,
    out: str = "rnk",
    ntile_n: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``out`` = global row_number (or ntile(ntile_n)) over the
    total order ``order_cols``. All input columns pass through."""
    order_cols = list(order_cols)
    if _mode(df) != "two-phase":
        w = W.orderBy(*order_cols)
        col = (
            F.ntile(ntile_n).over(w)
            if ntile_n is not None
            else F.row_number().over(w)
        )
        return df.withColumn(out, col)

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # materialize the range layout ONCE: the counts pass and the rank
    # pass must see the same partitioning
    s = (
        df.repartitionByRange(p, *order_cols)
        .withColumn("_gpid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = sorted(
        (r["_gpid"], r["c"])
        for r in s.groupBy("_gpid").agg(F.count("*").alias("c")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for k, c in counts:
        offsets[k] = acc
        acc += c
    total = acc
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    w = W.partitionBy("_gpid").orderBy(*order_cols)
    rn = (
        F.row_number().over(w)
        + F.coalesce(off_map[F.col("_gpid")], F.lit(0))
    ).cast("int")
    if ntile_n is None:
        return df_out(s, rn.alias(out))
    rn_col = rn.cast("long")
    q, r = divmod(total, ntile_n)
    boundary = r * (q + 1)
    if q == 0:
        bucket = rn_col.cast("int")
    else:
        bucket = (
            F.when(
                rn_col <= boundary,
                F.floor((rn_col - 1) / (q + 1)) + 1,
            )
            .otherwise(r + F.floor((rn_col - 1 - boundary) / q) + 1)
            .cast("int")
        )
    return df_out(s, bucket.alias(out))


def df_out(s: DataFrame, col: Column) -> DataFrame:
    return s.select("*", col).drop("_gpid")


def with_global_cumsum(
    df: DataFrame,
    order_cols,
    sums: dict,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach exact running sums over the total order ``order_cols``:
    ``sums`` maps output column -> input column. Same mode gate as
    ``with_global_rank``; the two-phase form adds per-partition PARTIAL
    SUMS (not counts) as the offsets."""
    order_cols = list(order_cols)
    if _mode(df) != "two-phase":
        w = W.orderBy(*order_cols).rowsBetween(W.unboundedPreceding, 0)
        out = df
        for out_col, in_col in sums.items():
            out = out.withColumn(out_col, F.sum(in_col).over(w))
        return out

    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    s = (
        df.repartitionByRange(p, *order_cols)
        .withColumn("_gpid", F.spark_partition_id())
        .localCheckpoint()
    )
    partials = sorted(
        (r["_gpid"], tuple(r[f"_s_{c}"] for c in sums.values()))
        for r in s.groupBy("_gpid")
        .agg(
            *[
                F.sum(in_col).alias(f"_s_{in_col}")
                for in_col in sums.values()
            ]
        )
        .collect()
    )
    offsets: dict[int, tuple] = {}
    acc = [0] * len(sums)
    for k, vals in partials:
        offsets[k] = tuple(acc)
        acc = [a + (v or 0) for a, v in zip(acc, vals)]
    w = W.partitionBy("_gpid").orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, 0
    )
    out = s
    for i, (out_col, in_col) in enumerate(sums.items()):
        off_map = F.create_map(
            *[
                F.lit(x)
                for k, vals in offsets.items()
                for x in (k, vals[i])
            ]
        ) if offsets else F.create_map()
        out = out.withColumn(
            out_col,
            F.sum(in_col).over(w)
            + F.coalesce(off_map[F.col("_gpid")], F.lit(0)),
        )
    return out.drop("_gpid")
