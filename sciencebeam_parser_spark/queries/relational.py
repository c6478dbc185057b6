"""Relational operator surface (SURVEY §2B) over the synthetic TPC-H-ish
tables. Every query has a DuckDB oracle; all are deterministic up to row
order (full tiebreaks on window orderings, rounded double aggregates).

Spark-first notes (scale):
* Aggregations express as groupBy().agg() → Catalyst plans partial (map-side)
  aggregation automatically; no driver-side loops anywhere.
* Small dims (region/nation/supplier) are explicitly broadcast — at 100 TB
  the fact tables shuffle once on their join keys only where unavoidable.
* Filters are plain column predicates so they push into the parquet scans.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries.registry import register, table


def _r2(c):
    return F.round(c, 2)


# --------------------------------------------------------------------------
# Aggregation / scan / filter
# --------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS count_order,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_discount), 2) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="§2B hash agg; A8 doc-level aggregates",
    doc="TPC-H Q1-style pricing summary: scan+filter+hash agg with partial "
        "aggregation (map-side combine) — the A8 font-stats pattern.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r2(F.sum(disc_price)).alias("sum_disc_price"),
            _r2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r2(F.avg("l_quantity")).alias("avg_qty"),
            _r2(F.avg("l_discount")).alias("avg_disc"),
        )
    )


@register(
    "q02_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="§2B count(distinct); A22 page-dimension cardinality",
)
def q02_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q03_mode_top1",
    oracle="""
    WITH counted AS (
        SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
    )
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY c_mktsegment
            ORDER BY n DESC, o_orderpriority ASC) AS rn
        FROM counted
    ) WHERE rn = 1
    """,
    survey_ref="§2B mode/top-1 by count; A22 most-common page dimension, A20 plurality vote",
    doc="Mode via count + row_number with deterministic tie-break (count desc, "
        "value asc) — the graphic_provider.py:107-108 Counter.most_common analog.",
)
def q03_mode_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    counted = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_mktsegment", F.col("o_orderpriority").alias("mode_priority"), "n")
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@register(
    "q10_shipping_priority",
    oracle="""
    WITH rev AS (
        SELECT l_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
    )
    SELECT l_orderkey, o_orderdate, revenue
    FROM (SELECT *, row_number() OVER (
              ORDER BY revenue DESC, l_orderkey ASC) AS rn FROM rev)
    WHERE rn <= 10
    """,
    survey_ref="§2B sort-merge/broadcast joins + top-k; A28 cascade joins",
    doc="TPC-H Q3-style 3-way join + agg + deterministic top-10.",
)
def q10_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )
    # the rank column is dropped from the output, so the global
    # row_number window (Exchange SinglePartition + full sort of the
    # aggregated relation) is equivalent to a deterministic top-k —
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # heaps, no single-partition shuffle, same 10 rows (total order)
    return rev.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(
        10
    ).select("l_orderkey", "o_orderdate", "revenue")


@register(
    "q11_broadcast_dim_join",
    oracle="""
    SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    survey_ref="§2B broadcast hash join; A2 font-map join, A16 dispatch table",
)
def q11_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    dim = F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    return (
        cust.join(dim, cust.c_nationkey == dim.n_nationkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            _r2(F.sum("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "q12_left_outer_join",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    survey_ref="§2B left outer join; A20 unmatched citation stays null",
)
def q12_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _r2(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total_spent"),
        )
    )


@register(
    "q13_left_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_totalprice > 400000
    )
    """,
    survey_ref="§2B left semi join; A14 label-filtered view, A7 gazetteer membership",
)
def q13_left_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q14_left_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 300000
    )
    """,
    survey_ref="§2B left anti join; A21 unmatched-remainder chain, A26 token masking",
)
def q14_left_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "q15_theta_join",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM supplier
    JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
    survey_ref="§2B theta/range join; A21 bbox distance, A26 containment",
    doc="Non-equi join bounded by an equi key (nation) — the partition-bounded "
        "theta-join pattern used for bbox matching.",
)
def q15_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = supp.join(
        cust,
        (supp.s_nationkey == cust.c_nationkey) & (supp.s_acctbal > cust.c_acctbal),
    ).join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    return joined.groupBy("n_name").agg(F.count("*").alias("n_pairs"))


@register(
    "q16_cross_join",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    """,
    survey_ref="§2B cross join (bounded); A21 all-pairs bbox distances",
)
def q16_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "region").alias("a")
    b = table(spark, sf_dir, "region").alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") != F.col("b.r_regionkey"))
        .select(F.col("a.r_name").alias("r1"), F.col("b.r_name").alias("r2"))
    )


@register(
    "q17_self_join",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT a.l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                   AND a.l_linenumber < b.l_linenumber
                   AND a.l_partkey = b.l_partkey
    """,
    survey_ref="§2B self-join; A9 repetitive-pattern count joined back",
)
def q17_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
        & (F.col("a.l_partkey") == F.col("b.l_partkey")),
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("a.l_orderkey").alias("n_orders"),
    )


@register(
    "q18_nearest_join",
    oracle="""
    SELECT s_suppkey, c_custkey AS nearest_custkey,
           round(abs(s_acctbal - c_acctbal), 2) AS dist
    FROM (
        SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal,
               row_number() OVER (
                   PARTITION BY s_suppkey
                   ORDER BY abs(s_acctbal - c_acctbal) ASC, c_custkey ASC) AS rn
        FROM supplier JOIN customer ON s_nationkey = c_nationkey
        WHERE abs(s_acctbal - c_acctbal) <= 500.0
    ) WHERE rn = 1
    """,
    survey_ref="§2B interval/as-of nearest join; A21 nearest-graphic under threshold",
    doc="Nearest-neighbor under a distance threshold with best-match-wins — "
        "exactly the graphic_matching.py:138-156 semantics: bounded candidate "
        "join (equi key), distance filter, row_number()=1 with tie-break.",
)
def q18_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    dist = F.abs(F.col("s_acctbal") - F.col("c_acctbal"))
    cand = (
        supp.join(cust, supp.s_nationkey == cust.c_nationkey)
        .filter(dist <= 500.0)
    )
    w = W.partitionBy("s_suppkey").orderBy(dist.asc(), F.col("c_custkey").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "s_suppkey",
            F.col("c_custkey").alias("nearest_custkey"),
            _r2(dist).alias("dist"),
        )
    )


@register(
    "q19_interval_containment_join",
    oracle="""
    WITH buckets AS (
        SELECT * FROM (VALUES
            ('tiny', 0.0, 10.0), ('small', 10.0, 20.0),
            ('medium', 20.0, 35.0), ('large', 35.0, 1e9)
        ) AS t(bucket_name, lo, hi)
    )
    SELECT bucket_name, CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem JOIN buckets
      ON l_quantity >= lo AND l_quantity < hi
    GROUP BY bucket_name
    """,
    survey_ref="§2B range/containment predicates; A26 bbox containment",
)
def q19_interval_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    buckets = spark.createDataFrame(
        [("tiny", 0.0, 10.0), ("small", 10.0, 20.0),
         ("medium", 20.0, 35.0), ("large", 35.0, 1e9)],
        "bucket_name string, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(buckets),
            (li.l_quantity >= buckets.lo) & (li.l_quantity < buckets.hi),
        )
        .groupBy("bucket_name")
        .agg(F.count("*").alias("n"), _r2(F.sum("l_quantity")).alias("qty"))
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@register(
    "q20_window_lag_lead",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderkey,
           round(o_totalprice - prev_price, 2) AS delta_prev,
           round(next_price - o_totalprice, 2) AS delta_next
    FROM seq
    """,
    survey_ref="§2B lag/lead; A7 previous-token font features, A10 indentation",
)
def q20_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _r2(F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
        _r2(F.lead("o_totalprice").over(w) - F.col("o_totalprice")).alias("delta_next"),
    )


@register(
    "q21_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_spend,
           CAST(row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS BIGINT) AS order_idx
    FROM orders
    """,
    survey_ref="§2B running sum + row_number; A13 BIO numbering, A17 char offsets, A19 ids",
)
def q21_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _r2(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0))).alias(
            "running_spend"
        ),
        F.row_number().over(w).cast("long").alias("order_idx"),
    )


@register(
    "q22_window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    survey_ref="§2B top-k per group; A21 best-match selection",
)
def q22_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "q23_window_partition_agg",
    oracle="""
    SELECT l_partkey, l_orderkey, l_linenumber,
           round(l_quantity / max(l_quantity) OVER (PARTITION BY l_partkey), 6)
               AS qty_vs_max,
           round(max(l_extendedprice) OVER (PARTITION BY l_partkey)
                 - min(l_extendedprice) OVER (PARTITION BY l_partkey), 2)
               AS price_spread
    FROM lineitem
    """,
    survey_ref="§2B partition-wide agg window; A8 relative font size, A7 position bins",
)
def q23_window_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_partkey")
    return li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") / F.max("l_quantity").over(w), 6).alias("qty_vs_max"),
        _r2(F.max("l_extendedprice").over(w) - F.min("l_extendedprice").over(w)).alias(
            "price_spread"
        ),
    )


@register(
    "q24_window_first_last",
    oracle="""
    SELECT DISTINCT l_orderkey,
           first_value(l_shipdate) OVER w AS first_ship,
           last_value(l_shipdate) OVER (
               PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_ship
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber)
    """,
    survey_ref="§2B first/last in group; A9 first line of block",
)
def q24_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    return li.select(
        "l_orderkey",
        F.first("l_shipdate").over(w).alias("first_ship"),
        F.last("l_shipdate")
        .over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("last_ship"),
    ).distinct()


# --------------------------------------------------------------------------
# Sorts / limits / top-k
# --------------------------------------------------------------------------

@register(
    "q30_global_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
    FROM (
        SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
               row_number() OVER (
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
                            l_partkey) AS rn
        FROM lineitem
    ) WHERE rn <= 20
    """,
    survey_ref="§2B global sort + limit; A21 sorted()[0]",
    doc="Global deterministic top-k. Spark plans this as TakeOrderedAndProject "
        "(no full sort shuffle) when expressed as orderBy().limit().",
)
def q30_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
        .orderBy(
            F.desc("l_extendedprice"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
            F.asc("l_partkey"),
        )
        .limit(20)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@register(
    "q31_union",
    oracle="""
    SELECT nationkey, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    survey_ref="§2B union all; A22 candidate ∪ successor pages, MergedTextLookUp",
)
def q31_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp).groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "q32_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    survey_ref="§2B except/difference; A22 candidate pages minus bitmap pages",
)
def q32_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract = EXCEPT DISTINCT (exceptAll keeps multiplicity, which differs)
    return cust.subtract(supp)


@register(
    "q33_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    survey_ref="§2B intersect",
)
def q33_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "q34_distinct",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    survey_ref="§2B distinct/dedup; A9/A22 set() semantics",
)
def q34_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube
# --------------------------------------------------------------------------

@register(
    "q35_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
               AS grp_id,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    survey_ref="§2B rollup; hierarchy stats per (doc, page, block)",
)
def q35_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("grp_id"),
        _r2(F.sum("l_quantity")).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q36_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
               AS grp_id,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    survey_ref="§2B cube",
)
def q36_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("long").alias("grp_id"),
        F.count("*").alias("n"),
        _r2(F.sum("o_totalprice")).alias("total"),
    )


@register(
    "q37_grouping_sets",
    # explicit GROUPING SETS (neither rollup nor cube): one sheet per
    # orderstatus, one per shipmode-like priority, and the grand total —
    # compiles to the same single-scan Expand as q35/q36, so no extra
    # passes over the fact table at any scale.
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS grp_id,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    survey_ref="§2B grouping sets (engine-general aggregation surface "
               "alongside rollup/cube)",
)
def q37_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("q37_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority)
                    AS BIGINT) AS grp_id,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM q37_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------

@register(
    "q40_string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lower_name,
           upper(p_brand) AS upper_brand,
           substr(p_name, 1, 4) AS prefix4,
           CAST(length(p_name) AS BIGINT) AS name_len,
           trim(concat(p_brand, ' ', p_type)) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           replace(p_type, ' ', '_') AS type_underscored,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CAST(levenshtein(p_brand, 'Brand#11') AS BIGINT) AS lev_to_11,
           translate(p_brand, '#', '-') AS brand_dashed,
           upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2)) AS type_initcap
    FROM part
    """,
    survey_ref="§2B string family; A7 features, A17 parsers, A20 normalization",
)
def q40_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lower_name"),
        F.upper("p_brand").alias("upper_brand"),
        F.substring("p_name", 1, 4).alias("prefix4"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.col("p_brand"), F.lit(" "), F.col("p_type"))).alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.regexp_replace("p_type", " ", "_").alias("type_underscored"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("consonants"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).cast("long").alias("lev_to_11"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.concat(
            F.upper(F.substring("p_type", 1, 1)),
            F.lower(F.expr("substring(p_type, 2)")),
        ).alias("type_initcap"),
    )


@register(
    "q41_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           round(pow(1 + l_discount, 2), 6) AS disc_sq,
           round(abs(l_extendedprice - 30000.0), 2) AS abs_delta,
           round(least(l_quantity, 25.0), 2) AS capped_qty,
           round(greatest(l_tax, l_discount), 2) AS max_rate
    FROM lineitem
    """,
    survey_ref="§2B math family; A7 position bins, A21 euclidean distance",
)
def q41_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(1 + F.col("l_discount"), 2), 6).alias("disc_sq"),
        _r2(F.abs(F.col("l_extendedprice") - 30000.0)).alias("abs_delta"),
        _r2(F.least(F.col("l_quantity"), F.lit(25.0))).alias("capped_qty"),
        _r2(F.greatest(F.col("l_tax"), F.col("l_discount"))).alias("max_rate"),
    )


@register(
    "q42_case_when_binning",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS balance_bin,
           CAST(floor(c_custkey * 10.0 / 1501) AS BIGINT) AS pos_bin,
           CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY 1, 2
    """,
    survey_ref="§2B conditional expr; A7 categorical features + linear-scaling bins",
    doc="when/otherwise chains + the feature_linear_scaling_int bin expr "
        "(reference models/data.py:118-128).",
)
def q42_case_when_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    balance_bin = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    pos_bin = F.floor(F.col("c_custkey") * 10.0 / 1501).cast("long")
    return (
        cust.select(balance_bin.alias("balance_bin"), pos_bin.alias("pos_bin"))
        .groupBy("balance_bin", "pos_bin")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q43_date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderdate >= make_date(1996, 1, 1)
    GROUP BY 1, 2, 3
    """,
    survey_ref="§2B date family; A17 year extraction (citation/extract.py:153-162)",
)
def q43_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderdate") >= F.make_date(F.lit(1996), F.lit(1), F.lit(1)))
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
        )
        .agg(F.count("*").alias("n"), _r2(F.sum("o_totalprice")).alias("total"))
    )


@register(
    "q44_array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                           FOR x IN embedding]), 4) AS sq_norm,
           round(list_sum([CAST(x AS DOUBLE) FOR x IN embedding[1:8]]), 4)
               AS head_sum,
           CAST(len([x FOR x IN embedding IF x > 0]) AS INT) AS n_positive
    FROM embeddings
    """,
    survey_ref="§2B array family; token lists, A18 entity-type sets",
    doc="array transform/filter/aggregate — Spark F.transform/F.filter/"
        "F.aggregate are the flatMap-tree-op analogs (semantic_document.py:114-126).",
)
def q44_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    head = F.aggregate(
        F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(sq, 4).alias("sq_norm"),
        F.round(head, 4).alias("head_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "q45_collect_list_sorted",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_custkey
    """,
    survey_ref="§2B collect_list/collect_set; line text assembly (layout_document.py:500-509)",
    doc="Ordered list assembly rendered to a canonical string (sorted) so the "
        "order-insensitive hash compares deterministically.",
)
def q45_collect_list_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_list("o_orderkey")), ",").alias("order_keys"),
        F.count("*").alias("n"),
    )


@register(
    "q46_map_functions",
    oracle="""
    WITH per_font AS (
        SELECT CAST(o_orderkey % 50 AS BIGINT) AS doc_id,
               'f' || (o_orderkey % 3) AS font_family,
               CAST(count(*) AS BIGINT) AS n
        FROM orders WHERE o_orderkey % 7 = 0
        GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_fonts,
           string_agg(font_family, ',' ORDER BY font_family) AS families,
           CAST(max(CASE WHEN font_family = 'f0' THEN n END) AS BIGINT)
               AS f0_count,
           CAST(sum(n) AS BIGINT) AS total
    FROM per_font GROUP BY doc_id
    """,
    survey_ref="§2B scalar map family (font map A2, attrs map §1.2, "
               "text_by_content_id A20)",
    doc="Map column surface: per-doc font histogram built with "
        "map_from_entries, then size / sorted map_keys / element_at / "
        "aggregated map_values — the font_by_id_map join pattern of the "
        "ALTO source (A2). The oracle states the same results relationally "
        "(map internals aren't portable across engines; the VALUES are).",
)
def q46_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    per_font = o.select(
        (F.col("o_orderkey") % 50).cast("long").alias("doc_id"),
        F.concat(F.lit("f"), (F.col("o_orderkey") % 3).cast("string")).alias(
            "font_family"
        ),
    ).groupBy("doc_id", "font_family").agg(F.count("*").alias("n"))
    mapped = per_font.groupBy("doc_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("font_family", "n")))
        ).alias("font_map")
    )
    return mapped.select(
        "doc_id",
        F.size("font_map").alias("n_fonts"),
        F.array_join(F.array_sort(F.map_keys("font_map")), ",").alias(
            "families"
        ),
        F.element_at("font_map", "f0").alias("f0_count"),
        F.aggregate(
            F.map_values("font_map"), F.lit(0).cast("long"), lambda s, x: s + x
        ).alias("total"),
    )


@register(
    "q47_percentile_stats",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS q1,
           round(quantile_cont(l_quantity, 0.5), 6) AS median,
           round(quantile_cont(l_quantity, 0.75), 6) AS q3,
           round(stddev_samp(l_quantity), 6) AS sd,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ref="§2B aggregations (engine-general ordered-statistic "
               "surface; complements count/min/max/avg/sum)",
    doc="Exact interpolated percentiles (Spark `percentile` ≡ DuckDB "
        "quantile_cont: both linear interpolation over the sorted group) "
        "+ sample stddev, rounded to 6 dp so cross-engine float summation "
        "order can't flip the hash. At scale percentile is a sort-based "
        "agg per group — the shuffle keys on the group column.",
)
def q47_percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q3"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd"),
        F.count("*").alias("n"),
    )


@register(
    "q48_salted_skew_join",
    oracle="""
    WITH dim AS (
        SELECT o_orderkey % 50 AS k,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    ),
    fact AS (
        SELECT l_orderkey % 50 AS k, l_quantity FROM lineitem
    )
    SELECT fact.k,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty,
           max(n_orders) AS n_orders
    FROM fact JOIN dim ON fact.k = dim.k
    GROUP BY fact.k
    """,
    survey_ref="§2B joins / SURVEY §4 skew handling (salting); BASELINE "
               "scale posture",
    doc="Explicit salted join: the fact side gets a row-local salt, the "
        "dim side is exploded once per salt, the join keys on (k, salt) — "
        "a hot key spreads over n_salts shuffle partitions instead of "
        "landing on one executor. The result multiset is invariant to the "
        "salt, so the oracle is the plain join. (AQE skew-split is the "
        "no-code first choice; this is the fallback it can't always "
        "cover.)",
)
def q48_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 50).alias("k"), "l_quantity"
    )
    dim = (
        table(spark, sf_dir, "orders")
        .groupBy((F.col("o_orderkey") % 50).alias("k"))
        .agg(F.count("*").alias("n_orders"))
    )
    joined = salted_join(li, dim, "k", n_salts=8)
    return joined.groupBy("k").agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").cast("long").alias("total_qty"),
        F.max("n_orders").alias("n_orders"),
    )


@register(
    "q49_pivot",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS purchase
    FROM events GROUP BY 1
    """,
    survey_ref="§2A A15 label-keyed multi-way split as a columnar pivot "
               "(one pass, all buckets as columns); engine-general "
               "relational surface",
    doc="Pivot event counts per hour into one column per event type — the "
        "columnar form of A15's one-pass bucketing. The value list is "
        "EXPLICIT, so Spark skips the extra distinct-values job and the "
        "plan is a single groupBy with conditional aggregates (map-side "
        "combinable; identical shape to the oracle's FILTER clauses).",
)
def q49_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .pivot("event_type", ["view", "click", "purchase"])
        .count()
        .na.fill(0, ["view", "click", "purchase"])
    )


@register(
    "q56_unpivot",
    oracle="""
    SELECT o_orderkey, metric, value FROM (
        SELECT o_orderkey, 'totalprice' AS metric,
               round(o_totalprice, 2) AS value
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'custkey',
               CAST(o_custkey AS DOUBLE)
        FROM orders
    )
    WHERE value IS NOT NULL
    """,
    survey_ref="§2A A16's stack/unpivot shape (the mock-label fixture uses "
               "the same stack operator); engine-general melt surface",
    doc="Unpivot (melt) two order measures into (metric, value) rows via "
        "the native unpivot operator — a pure one-pass Expand, no shuffle; "
        "the inverse of q49's pivot.",
)
def q56_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot(
        ["o_orderkey"],
        ["totalprice", "custkey"],
        "metric",
        "value",
    )


@register(
    "q246_local_supplier_volume",
    # the TPC-H Q5 shape: a 6-table join chain where customer and
    # supplier must share a nation, filtered to one region and a date
    # year. Catalyst orders the joins and broadcasts every dimension;
    # revenue is exact integer cents (floor(price*100) scaled by
    # (100 - floor(discount*100))) so the rollup is engine-exact.
    oracle="""
    SELECT n.n_name,
           CAST(sum(
               CAST(floor(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(floor(l.l_discount * 100) AS BIGINT))
           ) AS BIGINT) AS revenue_scaled,
           CAST(count(*) AS BIGINT) AS n_items
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s
      ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1999-01-01'
    GROUP BY n.n_name
    """,
    survey_ref="§2B joins capstone: the 6-table local-supplier-volume "
               "chain (TPC-H Q5 semantics) — Catalyst join ordering + "
               "dimension broadcast cascade under one regional filter",
    doc="Local supplier volume: region -> nation -> customer -> orders "
        "-> lineitem -> supplier with the customer-and-supplier-share-"
        "a-nation condition that makes Q5 the classic join-order "
        "stressor. Declared as one logical join chain; Catalyst pushes "
        "the region/date filters to the scans, broadcasts every "
        "dimension, and leaves the single big-big join (orders x "
        "lineitem) as the only real shuffle. Revenue aggregates in "
        "exact scaled int64.",
)
def q246_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    revenue = F.floor(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.floor(F.col("l_discount") * 100).cast("long")
    )
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("long").alias("revenue_scaled"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


@register(
    "q247_decorrelated_subquery",
    # a correlated scalar subquery (orders above their customer's average
    # order value) — Catalyst decorrelates it into an aggregate + join,
    # never a per-row re-execution. The comparison is exact integer
    # cents cross-multiplied against the average's sum/count pair.
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS s,
               CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey,
           CAST(floor(o.o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders o JOIN per_cust p ON p.o_custkey = o.o_custkey
    WHERE CAST(floor(o.o_totalprice * 100) AS BIGINT) * p.c > p.s
    """,
    survey_ref="§2B optimizer surface: correlated-subquery decorrelation "
               "(orders above their customer's average) — the rewrite "
               "every analytic engine must do to avoid per-row "
               "re-execution",
    doc="Orders above their customer's average order value, written as "
        "the decorrelated form both engines plan: one per-customer "
        "aggregate joined back, with the above-average gate "
        "cross-multiplied (price*count > sum) so no float division "
        "exists at the knife-edge. On Spark this is expressed "
        "declaratively and verified against the same decorrelation in "
        "SQL; at 100 TB the aggregate and the join share one customer-"
        "key shuffle (bucketing makes it exchange-free).",
)
def q247_decorrelated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(cents).alias("s"), F.count("*").cast("long").alias("c")
    )
    return (
        o.select("o_orderkey", "o_custkey", cents.alias("price_cents"))
        .join(per_cust, "o_custkey")
        .filter(F.col("price_cents") * F.col("c") > F.col("s"))
        .select("o_orderkey", "o_custkey", "price_cents")
    )
