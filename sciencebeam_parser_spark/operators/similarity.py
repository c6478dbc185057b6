"""Similarity search over embedding columns (north-star).

* ``cosine_topk`` — exact brute-force baseline (all-pairs within a join
  key); correct but O(n²): the oracle/verification path.
* ``add_lsh_bucket`` / ``ann_topk`` — the scale path: random-hyperplane
  LSH (sign bits of deterministic md5-derived hyperplanes) buckets vectors;
  candidates only join within a bucket. At 100 TB the bucket id is the
  shuffle key and bucket sizes bound the quadratic term; multiple
  independent bucket tables (bands) trade recall for cost.

Hyperplanes are md5-derived (hash of "plane:dim") so signatures are
reproducible in any engine — same trick as the MinHash operators.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(v) -> Column:
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_topk(embeddings: DataFrame, *, k: int = 5, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per vector (brute force)."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", _norm(F.col("v")))
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("query_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        (_dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def _hyperplane_coeff(plane: int, dim_index: Column) -> Column:
    """Deterministic pseudo-random coefficient in [-0.5, 0.5): md5 of
    'plane:dim' scaled — engine-portable (same construction works in SQL)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{plane}:"), dim_index.cast("string"))), 1, 15),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(2**60)) - 0.5


def add_lsh_bucket(
    embeddings: DataFrame,
    *,
    n_planes: int = 8,
    table: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add an integer ``bucket`` column: bit b = sign of v·hyperplane_b.
    ``table`` seeds an independent hyperplane set (multi-table LSH)."""
    v = _as_double(F.col(vec_col))
    df = embeddings.select(F.col(id_col).alias("vec_id"), v.alias("v"))
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = table * 1000 + p
        proj = F.aggregate(
            F.zip_with(
                F.col("v"),
                F.transform(
                    F.sequence(F.lit(1), F.size("v")),
                    lambda i: _hyperplane_coeff(plane, i),
                ),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket.cast("long"))


def ann_topk(
    embeddings: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing a bucket
    in ANY of ``n_tables`` independent LSH tables (multi-table LSH — the
    standard recall lever; cost grows linearly in tables, never quadratic).

    The bucket equi-join replaces the cross join — this is the plan shape
    that scales: shuffle on (table, bucket); per-bucket quadratic bounded by
    bucket size; distinct-pair dedup before scoring."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", _norm(F.col("v")))
    # candidate pairs from each table, unioned then deduped
    cand = None
    for t in range(n_tables):
        bucketed = add_lsh_bucket(
            embeddings, n_planes=n_planes, table=t, id_col=id_col, vec_col=vec_col
        ).select("vec_id", "bucket")
        a, b = bucketed.alias("a"), bucketed.alias("b")
        pairs_t = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
        )
        cand = pairs_t if cand is None else cand.unionByName(pairs_t)
    cand = cand.distinct()
    qa, qb = base.alias("qa"), base.alias("qb")
    scored = (
        cand.join(qa, F.col("query_id") == F.col("qa.vec_id"))
        .join(qb, F.col("neighbor_id") == F.col("qb.vec_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qa.v"), F.col("qb.v"))
                / (F.col("qa.norm") * F.col("qb.norm"))
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def ivf_centroids(
    embeddings: DataFrame,
    *,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seeded IVF centroids: the n_centroids vectors with the
    smallest ids. (Real deployments run k-means refinement; seeding keeps the
    partitioning engine-reproducible for the oracle, and the probe/search
    plan shape — the part that matters at scale — is identical.)"""
    return (
        embeddings.select(
            F.col(id_col).alias("cent_id"), _as_double(F.col(vec_col)).alias("cv")
        )
        .orderBy("cent_id")
        .limit(n_centroids)
        .withColumn("cnorm", _norm(F.col("cv")))
    )


def add_ivf_assignments(
    embeddings: DataFrame,
    centroids: DataFrame,
    *,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Rank centroids per vector by cosine (rounded to 6 dp for cross-engine
    determinism; ties → lower cent_id). rank 1 = the home cluster
    (inverted-file assignment); rank ≤ n_probe = probed clusters at query
    time. Centroids are a broadcast dim — the fact table never shuffles for
    assignment."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", _norm(F.col("v")))
    scored = base.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "cent_id",
        F.round(
            _dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cnorm")), 6
        ).alias("ccos"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= n_probe)
        .select("vec_id", F.col("cent_id").alias("cluster_id"), "crank")
    )


def ivf_topk(
    embeddings: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: each vector lives in its nearest-centroid
    cluster; a query probes its n_probe nearest clusters and scores exact
    cosine against their members only. The candidate join keys on
    cluster_id — the scale shuffle key; per-cluster sizes bound the
    quadratic term (the LSH-bucket analog with learned-ish partitions)."""
    cents = ivf_centroids(
        embeddings, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
    )
    assigns = add_ivf_assignments(
        embeddings, cents, n_probe=n_probe, id_col=id_col, vec_col=vec_col
    )
    members = assigns.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("member_id"), "cluster_id"
    )
    probes = assigns.select(F.col("vec_id").alias("query_id"), "cluster_id")
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", _norm(F.col("v")))
    qa, qb = base.alias("qa"), base.alias("qb")
    scored = (
        probes.join(members, "cluster_id")
        .filter(F.col("query_id") != F.col("member_id"))
        .join(qa, F.col("query_id") == F.col("qa.vec_id"))
        .join(qb, F.col("member_id") == F.col("qb.vec_id"))
        .select(
            "query_id",
            F.col("member_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qa.v"), F.col("qb.v"))
                / (F.col("qa.norm") * F.col("qb.norm")),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )
