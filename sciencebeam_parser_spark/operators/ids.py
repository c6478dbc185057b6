"""Sequential id assignment (reference utils/misc.py:1-8 ``iter_ids``:
'b0', 'b1', …, 'fig_0', 'aff0' in document order; used at
processors/fulltext/processor.py:241,256,264,419-425).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def assign_ids(
    df: DataFrame,
    *,
    prefix: str,
    partition_cols: Sequence[str] = ("doc_id",),
    order_cols: Sequence[str] = ("entity_group",),
    out_col: str = "content_id",
) -> DataFrame:
    """content_id = '<prefix><k>' with k = 0-based rank in document order."""
    w = W.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(
        out_col, F.concat(F.lit(prefix), (F.row_number().over(w) - 1).cast("string"))
    )
