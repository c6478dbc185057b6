"""Data-governance operators: deletion-request purge accounting (GDPR /
right-to-be-forgotten) and k-anonymity risk auditing.

A 100 TB corpus platform is legally required to run both: targeted
deletion propagated across every table keyed by the subject, and a
re-identification audit over quasi-identifier combinations before any
dataset leaves the boundary. Both are pure relational plans — broadcast
anti-joins and hash aggregates — so they cost one pass per table at any
scale.

The reference engine has no governance layer (its unit is a single
document, app/parser.py:516-527); these extend the north-star corpus
pipeline the same way q128's PII scrub does.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries.registry import register, table

# deterministic deletion list: every 101st user — runtime-data-independent
# so both engines derive the same subjects without a side channel
_PURGE_STRIDE = 101
_K_ANON = 5


@register(
    "q230_gdpr_purge",
    # the deletion list is a small subject table; each fact table reports
    # (rows_before, rows_purged, rows_after) under a broadcast anti-join.
    # The audit unions per-table rows so one result certifies the purge.
    oracle=f"""
    WITH subjects AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % {_PURGE_STRIDE} = 0
    ),
    ev AS (
        SELECT 'events' AS table_name,
               CAST(count(*) AS BIGINT) AS rows_before,
               CAST(count(*) FILTER (
                   WHERE user_id IN (SELECT user_id FROM subjects)
               ) AS BIGINT) AS rows_purged
        FROM events
    ),
    cust AS (
        SELECT 'customer' AS table_name,
               CAST(count(*) AS BIGINT) AS rows_before,
               CAST(count(*) FILTER (
                   WHERE c_custkey IN (SELECT user_id FROM subjects)
               ) AS BIGINT) AS rows_purged
        FROM customer
    ),
    ord AS (
        SELECT 'orders' AS table_name,
               CAST(count(*) AS BIGINT) AS rows_before,
               CAST(count(*) FILTER (
                   WHERE o_custkey IN (SELECT user_id FROM subjects)
               ) AS BIGINT) AS rows_purged
        FROM orders
    )
    SELECT table_name, rows_before, rows_purged,
           rows_before - rows_purged AS rows_after
    FROM (SELECT * FROM ev UNION ALL SELECT * FROM cust
          UNION ALL SELECT * FROM ord)
    """,
    survey_ref="north-star governance family (beside q128 PII scrub): "
               "right-to-be-forgotten purge propagated across every "
               "subject-keyed table, with per-table audit counts",
    doc="GDPR deletion propagation as dataflow: a subject list (here a "
        "deterministic stride over user ids; in production the DSAR "
        "queue) broadcast-anti-joins every table keyed by the subject — "
        "events on user_id, customer on c_custkey, orders on o_custkey "
        "— and the audit row per table certifies rows_before/purged/"
        "after. Each table costs exactly one scan with a broadcast "
        "semi-join probe; nothing shuffles on the fact side, which is "
        "what makes targeted deletion tractable at 100 TB.",
)
def q230_gdpr_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    subjects = (
        ev.filter(F.col("user_id") % _PURGE_STRIDE == 0)
        # distinct alias: the events audit joins user_id against itself
        .select(F.col("user_id").alias("subject_id"))
        .distinct()
        # probed by every audited table: materialize the scan+distinct once
        .localCheckpoint()
    )

    def audit(df: DataFrame, key: str, name: str) -> DataFrame:
        # ONE scan per audited table (making the docstring's cost claim
        # literal): rows_before and rows_purged were two separate passes
        # (a bare count scan + a left_semi-probed count scan); subjects
        # is DISTINCT, so the broadcast left join is row-preserving and
        # count(subject_id) counts exactly the semi-join hits — both
        # counts now ride one scan of the fact table.
        joined = df.join(
            F.broadcast(subjects),
            df[key] == subjects.subject_id,
            "left",
        )
        return joined.agg(
            F.lit(name).alias("table_name"),
            F.count("*").cast("long").alias("rows_before"),
            F.count("subject_id").cast("long").alias("rows_purged"),
        ).select(
            "table_name",
            "rows_before",
            "rows_purged",
            (F.col("rows_before") - F.col("rows_purged")).alias(
                "rows_after"
            ),
        )

    return (
        audit(ev, "user_id", "events")
        .unionByName(audit(cust, "c_custkey", "customer"))
        .unionByName(audit(orders, "o_custkey", "orders"))
    )


@register(
    "q231_k_anonymity",
    # quasi-identifier audit: group sizes over (nation, market segment);
    # groups below k are re-identification risks. One hash aggregate +
    # a tiny summary join.
    oracle=f"""
    WITH grp AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS group_size
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, group_size,
           CASE WHEN group_size < {_K_ANON} THEN TRUE ELSE FALSE END
               AS at_risk
    FROM grp
    """,
    survey_ref="north-star governance family: k-anonymity audit over "
               "quasi-identifier combinations — the release gate that "
               "runs before any dataset export",
    doc=f"k-anonymity (k={_K_ANON}) over the (nationality, market "
        "segment) quasi-identifier pair: one map-side-combinable hash "
        "aggregate computes every equivalence-class size; classes below "
        "k are flagged as re-identification risks that a release "
        "pipeline must suppress or generalize (Sweeney 2002). The key "
        "space is the QI-combination count — small by construction — so "
        "the audit is one cheap shuffle at any corpus size.",
)
def q231_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").cast("long").alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            (F.col("group_size") < _K_ANON).alias("at_risk"),
        )
    )
