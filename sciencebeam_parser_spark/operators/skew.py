"""Skew-mitigation join (SURVEY §4 / BASELINE scale posture: "skewed keys
→ salting or AQE skew-join").

AQE's skew-join split (spark.sql.adaptive.skewJoin) is the first line of
defense and needs no code. Explicit salting is the fallback when AQE can't
help: a hot key whose rows exceed one executor's memory even after split,
or a non-AQE engine. The transform:

    left:  salt = row-local value in [0, n)      (varies WITHIN a key)
    right: exploded once per salt value           (n× the small side)
    join on (key, salt)                           (hot key now n partitions)

The result multiset is exactly the plain join's — the salt only changes
the partitioning — so the DuckDB oracle for any query built on this
operator is the unsalted join.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left ⋈ right`` on column ``on`` with the hot-key rows of
    ``left`` spread across ``n_salts`` shuffle partitions.

    ``left`` is the large/skewed side; ``right`` is replicated ``n_salts``×
    (keep it the smaller side). Only inner/left joins preserve semantics
    under replication-with-salt; others raise."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # row-local salt: monotonically_increasing_id varies within every key;
    # the JOIN RESULT is invariant to the particular salt values
    salted_left = left.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        salted_left.join(salted_right, [on, "_salt"], how).drop("_salt")
    )
