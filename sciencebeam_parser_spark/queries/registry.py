"""Query registry.

Each entry pairs a Spark DataFrame builder (spark, sf_dir) -> DataFrame with
an equivalent ANSI-SQL oracle string runnable by DuckDB over the same parquet
tables. The driver compares row-count, schema, and an order-insensitive
value hash — so every query here must be *deterministic up to row order*:

* every row_number/top-k window carries a full tiebreak ordering;
* double-typed aggregates are rounded (sum order varies across engines);
* no bare LIMIT without a total order.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    survey_ref: str  # SURVEY.md §2 row(s) this query exercises
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str], survey_ref: str, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name, build=fn, oracle=oracle, survey_ref=survey_ref, doc=doc
        )
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one synthetic table (filters/projections push down).

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read nanos as long (legacy conf, runtime-settable) and
    rebuild the timestamp at microsecond precision — the same truncation
    DuckDB applies, so oracles agree.
    """
    from pyspark.sql import functions as F

    df_path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(df_path)
        ts_field = df.schema["ts"]
        if ts_field.dataType.typeName() == "long":
            # integer division — double division loses precision at ~1.7e18 ns
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(df_path)
