"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (omitted only for
genuinely non-SQL-expressible operators, which get a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sciencebeam_parser_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the full mock-label fulltext cascade (SURVEY §2A A28):
    segmentation regions → header/fulltext/ref-segmenter/citation models →
    BIO islands → type dispatch → id assignment → citation matching →
    validity, one config-gated DataFrame DAG, fully oracle-checked.
    """
    return REGISTRY["q88_fulltext_cascade"].build(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys match ``queries()``."""
    return {
        name: q.oracle for name, q in sorted(REGISTRY.items()) if q.oracle is not None
    }
