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


def _dot_n(a, b, dim: int) -> Column:
    """Dot product unrolled to ``dim`` explicit terms. Unlike the
    aggregate/zip_with fold (interpreted per element), the unrolled sum is
    whole-stage-codegen'd; the left-to-right add order matches the fold's
    (0.0 + x0 ≡ x0), so results are bit-identical to _dot."""
    out = None
    for i in range(dim):
        term = F.get(a, i) * F.get(b, i)
        out = term if out is None else out + term
    return out


def _norm_n(v, dim: int) -> Column:
    out = None
    for i in range(dim):
        term = F.get(v, i) * F.get(v, i)
        out = term if out is None else out + term
    return F.sqrt(out)


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


def _hyperplane_coeffs(plane: int, dim: int) -> list:
    """Deterministic pseudo-random coefficients in [-0.5, 0.5): md5 of
    'plane:dim_index' scaled — engine-portable (the SQL oracle states the
    same md5 formula; dividing by 2^60, a power of two, only shifts the
    exponent, so Python's and SQL's int→double roundings agree bit-exactly).

    Computed DRIVER-SIDE once and embedded as an array literal: the
    coefficients are row-constants, and evaluating md5 per (row, plane,
    dim) — the expression-tree formulation — costs n_planes × dim hashes
    per row for identical output."""
    import hashlib

    return [
        int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[:15], 16)
        / 2.0**60
        - 0.5
        for i in range(1, dim + 1)
    ]


def _vector_dim(embeddings: DataFrame, vec_col: str) -> int:
    """Embedding width from one row (driver-side metadata probe)."""
    row = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"])


def index_probe(embeddings: DataFrame, vec_col: str) -> tuple:
    """(n_rows, dim) in ONE probe job — the broadcast-gate inputs. A
    separate count() + first() pair costs two scan jobs per build; fused
    they are one aggregate (min(size) == size, widths are uniform)."""
    row = embeddings.agg(
        F.count("*").alias("n"),
        F.min(F.size(F.col(vec_col))).alias("d"),
    ).first()
    return int(row["n"]), int(row["d"])


def add_lsh_bucket(
    embeddings: DataFrame,
    *,
    n_planes: int = 8,
    table: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = None,
) -> DataFrame:
    """Add an integer ``bucket`` column: bit b = sign of v·hyperplane_b.
    ``table`` seeds an independent hyperplane set (multi-table LSH)."""
    if dim is None:
        dim = _vector_dim(embeddings, vec_col)
    v = _as_double(F.col(vec_col))
    df = embeddings.select(F.col(id_col).alias("vec_id"), v.alias("v"))
    bucket = F.lit(0)
    for p in range(n_planes):
        coeffs = F.array(
            *[F.lit(c) for c in _hyperplane_coeffs(table * 1000 + p, dim)]
        )
        proj = F.aggregate(
            F.zip_with(F.col("v"), coeffs, lambda x, c: x * c),
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
    dim = _vector_dim(embeddings, vec_col)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", _norm_n(F.col("v"), dim))
    # ALL tables' buckets in ONE pass over the embeddings: the per-table
    # loop scanned the table 2x per LSH table (16 scans at 8 tables) and
    # unioned 8 self-joins; the bucket for table t is a pure row
    # expression, so one projection emits (vec_id, [struct(t, bucket_t)]),
    # explodes, and ONE self-join on (t, bucket) yields the same
    # "co-bucketed in ANY table" candidate set — identical after the
    # distinct that always followed.
    v = _as_double(F.col(vec_col))
    entries = []
    for t in range(n_tables):
        bucket = F.lit(0)
        for p in range(n_planes):
            coeffs = F.array(
                *[F.lit(c) for c in _hyperplane_coeffs(t * 1000 + p, dim)]
            )
            proj = F.aggregate(
                F.zip_with(F.col("v"), coeffs, lambda x, c: x * c),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
        entries.append(
            F.struct(
                F.lit(t).alias("t"), bucket.cast("long").alias("bucket")
            )
        )
    stacked = (
        embeddings.select(F.col(id_col).alias("vec_id"), v.alias("v"))
        .select("vec_id", F.explode(F.array(*entries)).alias("_tb"))
        .select("vec_id", F.col("_tb.t").alias("t"), F.col("_tb.bucket").alias("bucket"))
    )
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
        )
        .distinct()
    )
    qa, qb = base.alias("qa"), base.alias("qb")
    scored = (
        cand.join(qa, F.col("query_id") == F.col("qa.vec_id"))
        .join(qb, F.col("neighbor_id") == F.col("qb.vec_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_n(F.col("qa.v"), F.col("qb.v"), dim)
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


def _score_pairs_numpy(
    embeddings: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cosine",
) -> DataFrame:
    """Exact 6-dp cosine for candidate (query_id, neighbor_id) pairs via a
    broadcast row-normalized numpy index: only ids shuffle; each Arrow batch
    does one vectorized gather + row-wise product. This is the scoring
    pattern for every candidate-generation scheme (LSH buckets, IVF probes):
    candidates are O(n·bucket), the index is the broadcast side, and Python
    cost is one numpy op per batch — never a per-row fold.

    The broadcast index must fit executor memory — same contract as any
    broadcast dim; shard the index (join per shard, union) past that.
    This is the SMALL-INDEX fast path: ``ivf_topk`` defaults to the
    equi-join SQL scoring (``scoring="sql"``) which never collects the
    index; opt into this path only when the index provably fits."""
    spark = embeddings.sparkSession
    index_pdf = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).toPandas()
    import numpy as np

    ids_all = index_pdf["vec_id"].to_numpy(dtype="int64")
    m = np.stack(index_pdf["embedding"].to_numpy()).astype("float64")
    m_normed = m / np.linalg.norm(m, axis=1, keepdims=True)
    order = np.argsort(ids_all)
    bc = spark.sparkContext.broadcast((ids_all[order], m_normed[order]))

    def score(batches):
        import numpy as np  # noqa: F811 — executor-side import
        import pandas as pd

        sorted_ids, corpus = bc.value
        for pdf in batches:
            qi = np.searchsorted(sorted_ids, pdf["query_id"].to_numpy())
            ni = np.searchsorted(sorted_ids, pdf["neighbor_id"].to_numpy())
            cos = np.round((corpus[qi] * corpus[ni]).sum(axis=1), 6)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    out_col: cos,
                }
            )

    return pairs.mapInPandas(
        score, f"query_id long, neighbor_id long, {out_col} double"
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


def score_pairs_sql(
    embeddings: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cosine",
    dim: int = None,
) -> DataFrame:
    """Exact 6-dp cosine for candidate (query_id, neighbor_id) pairs via two
    id equi-joins against the embedding table — the scale-safe scoring
    shape: the index is never collected or broadcast whole; the shuffle is
    bounded by |candidates|, and the unrolled dot product whole-stage-
    codegens. This is the default scorer for every candidate-generation
    scheme (LSH buckets, IVF probes); ``_score_pairs_numpy`` is the opt-in
    small-index fast path."""
    if dim is None:
        dim = _vector_dim(embeddings, vec_col)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", _norm_n(F.col("v"), dim))
    qa, qb = base.alias("qa"), base.alias("qb")
    return (
        pairs.join(qa, F.col("query_id") == F.col("qa.vec_id"))
        .join(qb, F.col("neighbor_id") == F.col("qb.vec_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot_n(F.col("qa.v"), F.col("qb.v"), dim)
                / (F.col("qa.norm") * F.col("qb.norm")),
                6,
            ).alias(out_col),
        )
    )


# Size gate shared by the ANN scorers: max n_rows x dim cells an index may
# hold before the broadcast-numpy fast path is disallowed (64M float64
# cells = 512 MB, comfortably inside one executor).
MAX_BROADCAST_INDEX_CELLS = 64_000_000


def ivf_topk(
    embeddings: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scoring: str = "auto",
) -> DataFrame:
    """IVF approximate top-k: each vector lives in its nearest-centroid
    cluster; a query probes its n_probe nearest clusters and scores exact
    cosine against their members only. The candidate join keys on
    cluster_id — the scale shuffle key; per-cluster sizes bound the
    quadratic term (the LSH-bucket analog with learned-ish partitions).

    Scoring is SIZE-GATED (``scoring="auto"``): while the index fits the
    broadcast budget (n_rows x dim <= MAX_BROADCAST_INDEX_CELLS) the
    gemm-per-Arrow-batch numpy path runs (measured 4.5x faster at bench
    scale, BASELINE §15); past the gate — or with ``scoring="sql"`` — the
    equi-join SQL dot product (``score_pairs_sql``) takes over: both
    vector sides join candidates on ids, shuffle bounded by |candidates|,
    nothing collected to the driver — correct at any index size.

    Parameterization is the scale lever: candidates ~ N * n_probe * N /
    n_centroids, so n_centroids must grow ~sqrt(N) (FAISS guidance:
    4-16 x sqrt(N)) to keep per-cluster membership bounded. Measured
    (BASELINE scale smoke, 20k vectors): n_centroids=8/probe=2 24.9 s
    vs n_centroids=64/probe=4 13.0 s warm — more centroids is both
    faster AND higher-recall once N outgrows the default."""
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
    pairs = (
        probes.join(members, "cluster_id")
        .filter(F.col("query_id") != F.col("member_id"))
        .select("query_id", F.col("member_id").alias("neighbor_id"))
    )
    probed_dim = None
    if scoring == "auto":
        n_rows, probed_dim = index_probe(embeddings, vec_col)
        scoring = (
            "broadcast_numpy"
            if n_rows * probed_dim <= MAX_BROADCAST_INDEX_CELLS
            else "sql"
        )
    if scoring == "broadcast_numpy":
        scored = _score_pairs_numpy(
            embeddings, pairs, id_col=id_col, vec_col=vec_col
        )
    else:
        scored = score_pairs_sql(
            embeddings, pairs, id_col=id_col, vec_col=vec_col,
            dim=probed_dim,
        )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )
