"""Pipeline-evaluation and corpus-mixture operators: ANN recall
measurement, token-budget mixture sampling, and leakage-safe dataset
splitting.

These close the loop on the north-star LLM-data pipeline: a curation
engine must not only dedup/filter/sample but also MEASURE its own
approximations (what recall does the LSH ANN actually achieve vs the
exact baseline?), MIX sources to a token budget (the data-mixture step
that turns per-source corpora into one pretraining stream), and SPLIT
without leakage (near-duplicate documents must never straddle
train/test — the contamination failure mode q153 decontaminates after
the fact; this prevents it structurally).

Every query composes already-oracle-checked operators (q65 brute-force
top-k, q86 LSH ANN, q110 connected components) and restates the
composition in SQL, so the oracle checks the full composed DAG.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries import text_ops  # noqa: F401 — registers q65/q86/q110
from sciencebeam_parser_spark.queries.registry import REGISTRY, register, table
from sciencebeam_parser_spark.queries.text_ops import (
    _LSH_PAIRS_SQL,
    _md5_long,
    _md5_long_sql,
)

_EXACT5_SQL = REGISTRY["q65_similarity_topk"].oracle
_ANN5_SQL = REGISTRY["q86_similarity_ann_lsh"].oracle


@register(
    "q182_ann_recall_eval",
    # recall@5 of the LSH ANN against the exact brute-force top-5, per
    # query — both sides are the (already oracle-checked) q65/q86 result
    # sets, so this oracle checks the composed evaluation DAG.
    oracle=f"""
    WITH exact5 AS ({_EXACT5_SQL}),
    ann5 AS ({_ANN5_SQL}),
    hits AS (
        SELECT e.query_id, count(*) AS n_hit
        FROM exact5 e
        JOIN ann5 a ON a.query_id = e.query_id
                   AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
    )
    SELECT v.vec_id AS query_id,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(COALESCE(h.n_hit, 0) / 5.0, 2) AS recall_at_5
    FROM embeddings v LEFT JOIN hits h ON h.query_id = v.vec_id
    """,
    survey_ref="north-star similarity search: quality evaluation of the "
               "approximate path (LSH ANN q86) against the exact "
               "baseline (q65) — recall@k, the metric that justifies "
               "the bucketed plan at scale",
    doc="ANN recall@5 per query: the LSH top-5 (bucket-join plan) "
        "intersected with the exact brute-force top-5, left-joined back "
        "over all vectors so bucket-starved queries report recall 0. At "
        "100 TB this runs on a deterministic hash-sample of queries "
        "(q125 composes upstream) while the ANN serves the full corpus — "
        "the standard continuous-evaluation harness for an ANN index. "
        "On the synthetic table it measures single-table 8-plane LSH at "
        "~2-4% mean recall (256 buckets over 500 vectors leaves ~2 "
        "candidates per bucket) — the quantified argument for the "
        "multi-table index in operators/similarity.py.",
)
def q182_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.queries.text_ops import (
        q65_similarity_topk,
        q86_similarity_ann_lsh,
    )

    exact5 = q65_similarity_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann5 = q86_similarity_ann_lsh(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact5.join(ann5, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    vecs = table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("query_id")
    )
    return vecs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        F.round(F.coalesce("n_hit", F.lit(0)) / 5.0, 2).alias("recall_at_5"),
    )


def _ann_multi_candidates_sql(n_planes: int, n_tables: int) -> str:
    """Per-table LSH bucket CTEs + the unioned candidate-pair set, matching
    operators/similarity.py's seeding (plane seed = 1000*table + p)."""
    coeff = (
        "(CAST('0x' || substr(md5(CAST({seed} AS VARCHAR) || ':' "
        "|| CAST(i AS VARCHAR)), 1, 15) AS BIGINT) "
        "/ 1152921504606846976.0 - 0.5)"
    )
    ctes = []
    for t in range(n_tables):
        projs = ", ".join(
            "list_sum([v[i] * "
            + coeff.format(seed=1000 * t + p)
            + f" FOR i IN range(1, len(v)+1)]) AS proj{p}"
            for p in range(n_planes)
        )
        bucket = " + ".join(
            f"(CASE WHEN proj{p} > 0 THEN {2 ** p} ELSE 0 END)"
            for p in range(n_planes)
        )
        ctes.append(
            f"""
    proj_t{t} AS (SELECT vec_id, {projs} FROM vecs),
    bucketed_t{t} AS (
        SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket FROM proj_t{t}
    ),
    pairs_t{t} AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM bucketed_t{t} a JOIN bucketed_t{t} b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )"""
        )
    union = " UNION ".join(
        f"SELECT * FROM pairs_t{t}" for t in range(n_tables)
    )
    return ",".join(ctes) + f""",
    cand AS ({union})"""


_ANN_MULTI_PLANES = 6
_ANN_MULTI_TABLES = 4


@register(
    "q185_ann_multitable_recall",
    # same harness as q182, but the candidates come from FOUR independent
    # 6-plane LSH tables (union of per-table bucket joins) — the recall
    # lever whose payoff this query quantifies.
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
        FROM embeddings
    ),
    normed AS (
        SELECT vec_id, v, sqrt(list_sum([x*x FOR x IN v])) AS nrm FROM vecs
    ),{_ann_multi_candidates_sql(_ANN_MULTI_PLANES, _ANN_MULTI_TABLES)},
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               list_sum([a.v[i] * b.v[i] FOR i IN range(1, len(a.v)+1)])
               / (a.nrm * b.nrm) AS cos
        FROM cand c
        JOIN normed a ON a.vec_id = c.query_id
        JOIN normed b ON b.vec_id = c.neighbor_id
    ),
    ann5 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    ),
    exact5 AS ({_EXACT5_SQL}),
    hits AS (
        SELECT e.query_id, count(*) AS n_hit
        FROM exact5 e
        JOIN ann5 a ON a.query_id = e.query_id
                   AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
    )
    SELECT v.vec_id AS query_id,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(COALESCE(h.n_hit, 0) / 5.0, 2) AS recall_at_5
    FROM embeddings v LEFT JOIN hits h ON h.query_id = v.vec_id
    """,
    survey_ref="north-star similarity search: recall@k of the MULTI-table "
               "LSH index (operators/similarity.py ann_topk) — the scale "
               "path's recall lever, quantified against the exact "
               "baseline next to q182's single-table measurement",
    doc="Multi-table ANN recall@5: candidates sharing a bucket in ANY of "
        "4 independent 6-plane LSH tables, exact-cosine ranked, "
        "intersected with the brute-force top-5. Read next to q182: "
        "more tables -> linearly more candidate-join cost, "
        "super-linearly better recall — the trade a production index "
        "tunes. Plan shape: all tables' buckets computed in one pass "
        "over the embeddings, ONE self-join on (table, bucket), deduped "
        "before scoring.",
)
def q185_ann_multitable_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sciencebeam_parser_spark.operators.similarity import ann_topk
    from sciencebeam_parser_spark.queries.text_ops import q65_similarity_topk

    emb = table(spark, sf_dir, "embeddings")
    ann5 = ann_topk(
        emb, k=5, n_planes=_ANN_MULTI_PLANES, n_tables=_ANN_MULTI_TABLES
    ).select("query_id", "neighbor_id")
    exact5 = q65_similarity_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact5.join(ann5, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    vecs = emb.select(F.col("vec_id").alias("query_id"))
    return vecs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        F.round(F.coalesce("n_hit", F.lit(0)) / 5.0, 2).alias("recall_at_5"),
    )


@register(
    "q183_token_budget_mixture",
    # data-mixture sampling: per-source token budgets proportional to
    # mixture weights (integer arithmetic), filled in deterministic
    # hash-shuffled order until the budget is crossed.
    oracle="""
    WITH counts AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    weights AS (
        SELECT source, 1 + (CAST(substr(source, 4) AS INT) % 3) AS w
        FROM (SELECT DISTINCT source FROM documents)
    ),
    tot AS (SELECT sum(w) AS tot_w FROM weights),
    budgets AS (
        SELECT w.source, w.w,
               CAST((20000 * w.w) // t.tot_w AS BIGINT) AS budget
        FROM weights w CROSS JOIN tot t
    ),
    ordered AS (
        SELECT c.doc_id, c.source, c.n_tokens,
               CAST(b.w AS BIGINT) AS weight, b.budget,
               COALESCE(sum(c.n_tokens) OVER (
                   PARTITION BY c.source
                   ORDER BY md5(CAST(c.doc_id AS VARCHAR)), c.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS taken_before
        FROM counts c JOIN budgets b ON b.source = c.source
    )
    SELECT doc_id, source, weight, budget, n_tokens,
           CAST(taken_before AS BIGINT) AS token_start
    FROM ordered
    WHERE taken_before < budget
    """,
    survey_ref="north-star corpus shaping: data-mixture sampling — "
               "per-source token budgets from mixture weights, the step "
               "that turns per-domain corpora into one pretraining "
               "stream (extends q126 packing / q144 stratified sample)",
    doc="Token-budget mixture: each source gets a budget proportional to "
        "its mixture weight (integer arithmetic — no float shares), then "
        "fills it in md5-shuffled order (deterministic, re-runnable) "
        "until the running token count crosses the budget; the last doc "
        "may overshoot (take-while-below semantics). One window per "
        "source — bounded state per shard, shards fill independently, "
        "exactly how a 1000-executor mixture job lays out.",
)
def q183_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    weights = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (1 + F.expr("CAST(substring(source, 4) AS INT) % 3")).alias("w"),
        )
    )
    tot = weights.agg(F.sum("w").alias("tot_w"))
    budgets = weights.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("w").cast("long").alias("weight"),
        F.expr("(20000 * w) div tot_w").cast("long").alias("budget"),
    )
    win = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ordered = counts.join(F.broadcast(budgets), "source").withColumn(
        "taken_before",
        F.coalesce(
            F.sum("n_tokens").over(win.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long"),
    )
    return ordered.filter(F.col("taken_before") < F.col("budget")).select(
        "doc_id",
        "source",
        "weight",
        "budget",
        "n_tokens",
        F.col("taken_before").alias("token_start"),
    )


@register(
    "q184_leakage_safe_split",
    # train/valid/test split hashed on the DEDUP GROUP key, not the doc
    # key: near-duplicates (q110's connected components over LSH pairs)
    # always land in the same split. Singleton docs use their own id.
    oracle="WITH RECURSIVE " + _LSH_PAIRS_SQL + f""",
    sym AS (
        SELECT doc1 AS a, doc2 AS b FROM lsh_pairs
        UNION
        SELECT doc2 AS a, doc1 AS b FROM lsh_pairs
    ),
    reach(node, lab) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM sym)
        UNION
        SELECT s.a, r.lab FROM sym s JOIN reach r ON s.b = r.node
    ),
    comp AS (
        SELECT node AS doc_id, CAST(min(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY node
    ),
    assigned AS (
        SELECT d.doc_id,
               CAST(COALESCE(c.component_id, d.doc_id) AS BIGINT)
                   AS group_key
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, group_key,
           CAST({_md5_long_sql("CAST(group_key AS VARCHAR)")} % 100
                AS BIGINT) AS split_bucket,
           CASE
               WHEN {_md5_long_sql("CAST(group_key AS VARCHAR)")} % 100 < 80
                   THEN 'train'
               WHEN {_md5_long_sql("CAST(group_key AS VARCHAR)")} % 100 < 90
                   THEN 'valid'
               ELSE 'test'
           END AS split
    FROM assigned
    """,
    survey_ref="north-star training-data pipeline: leakage-safe "
               "train/valid/test split — hash the dedup-cluster key, not "
               "the document key (composes q110 components; structural "
               "prevention of the contamination q153 removes after the "
               "fact)",
    doc="Group-aware 80/10/10 split: documents are bucketed by the md5 of "
        "their near-dup component id (q110's min-label components over "
        "MinHash-LSH pairs; singletons key on their own id), so no "
        "near-duplicate pair can straddle train/test. Deterministic and "
        "re-runnable; at scale the component map is the (much smaller) "
        "dedup side-output and the join is a plain equi-shuffle.",
)
def q184_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.queries.text_ops import q110_dedup_clusters

    comp = q110_dedup_clusters(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id")
    assigned = docs.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", "doc_id").cast("long").alias("group_key"),
    )
    bucket = _md5_long(F.col("group_key").cast("string")) % 100
    return assigned.select(
        "doc_id",
        "group_key",
        bucket.cast("long").alias("split_bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


def _minhash_accuracy_oracle() -> str:
    from sciencebeam_parser_spark.queries.text_ops import _LSH_PAIRS_SQL

    eq = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(16)
    )
    return "WITH " + _LSH_PAIRS_SQL + f""",
    est AS (
        SELECT p.doc1, p.doc2, ({eq}) / 16.0 AS est_j
        FROM lsh_pairs p
        JOIN sig a ON a.doc_id = p.doc1
        JOIN sig b ON b.doc_id = p.doc2
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT x.doc_id AS doc1, y.doc_id AS doc2,
               CAST(count(*) AS BIGINT) AS c
        FROM sh x
        JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT e.doc1, e.doc2,
           round(e.est_j, 4) AS est_jaccard,
           round(COALESCE(i.c, 0) * 1.0
                 / (sa.n + sb.n - COALESCE(i.c, 0)), 4) AS exact_jaccard,
           round(abs(e.est_j - COALESCE(i.c, 0) * 1.0
                 / (sa.n + sb.n - COALESCE(i.c, 0))), 4) AS abs_err
    FROM est e
    JOIN sizes sa ON sa.doc_id = e.doc1
    JOIN sizes sb ON sb.doc_id = e.doc2
    LEFT JOIN inter i ON i.doc1 = e.doc1 AND i.doc2 = e.doc2
    """


@register(
    "q193_minhash_accuracy_eval",
    # the dedup-side twin of q182/q185: per LSH candidate pair, the
    # 16-component signature-agreement estimate vs the exact shingle-set
    # Jaccard, with the absolute error — quantifying what the sketch
    # trades for its one-pass O(doc) cost.
    oracle=_minhash_accuracy_oracle(),
    survey_ref="north-star dedup evaluation: MinHash estimator accuracy "
               "against exact n-gram Jaccard on the LSH candidate set "
               "(completes the measurement harness family q182/q185)",
    doc="MinHash accuracy per candidate pair: estimated Jaccard = "
        "fraction of equal signature components (k=16), exact Jaccard = "
        "|intersection|/|union| of distinct trigram shingles, plus "
        "absolute error. Exact intersections are computed ONLY on the "
        "LSH candidate pairs (inverted-index join), so the evaluation "
        "itself scales the same way the dedup does — never all-pairs.",
)
def q193_minhash_accuracy_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sciencebeam_parser_spark.queries.text_ops import (
        _minhash_signature,
        _shingle_array,
        q62_dedup_minhash_lsh_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    sig = _minhash_signature(docs)
    pairs = q62_dedup_minhash_lsh_pairs(spark, sf_dir)
    a = sig.alias("a")
    b = sig.alias("b")
    eq = sum(
        (
            F.when(F.col(f"a.m{i}") == F.col(f"b.m{i}"), 1).otherwise(0)
            for i in range(16)
        ),
        F.lit(0),
    )
    est = (
        pairs.join(a, F.col("a.doc_id") == F.col("doc1"))
        .join(b, F.col("b.doc_id") == F.col("doc2"))
        .select("doc1", "doc2", (eq / 16.0).alias("est_j"))
    )
    # distinct shingles, xxhash64-compressed for the narrow shuffle (q63's
    # trick); intersection counts are representation-independent
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.array_distinct(_shingle_array()), lambda s: F.xxhash64(s)
            )
        ).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # intersections computed ONLY for the LSH candidate pairs (what the
    # docstring always promised): the former shape self-joined the FULL
    # inverted index (every co-shingled doc pair materialized, the q63
    # blowup) and discarded the non-candidates in the final left join.
    # Anchoring the join on the candidate-pair relation bounds the
    # intermediate at |pairs| x |shingles per doc| — the evaluation now
    # scales exactly like the dedup it measures.
    shx = sh.select(F.col("doc_id").alias("doc1"), "shingle")
    shy = sh.select(F.col("doc_id").alias("doc2"), "shingle")
    inter = (
        pairs.select("doc1", "doc2")
        .join(shx, "doc1")
        .join(shy, ["doc2", "shingle"])
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc1"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc2"), F.col("n").alias("nb")
    )
    exact = (
        F.coalesce("c", F.lit(0))
        * 1.0
        / (F.col("na") + F.col("nb") - F.coalesce("c", F.lit(0)))
    )
    return (
        est.join(sa, "doc1")
        .join(sb, "doc2")
        .join(inter, ["doc1", "doc2"], "left")
        .select(
            "doc1",
            "doc2",
            F.round("est_j", 4).alias("est_jaccard"),
            F.round(exact, 4).alias("exact_jaccard"),
            F.round(F.abs(F.col("est_j") - exact), 4).alias("abs_err"),
        )
    )


@register(
    "q194_url_canonicalize",
    # Common-Crawl URL canonicalization: synthetic URLs built from the doc
    # key exercise every rule — lowercase scheme/host, strip default port,
    # drop fragment, drop utm_* params, strip trailing slash.
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'HTTPS://Example' || CAST(doc_id % 7 AS VARCHAR)
               || '.ORG:443/Path' || CAST(doc_id AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
               || CASE WHEN doc_id % 3 = 0
                       THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
        FROM documents
    ),
    stripped AS (
        SELECT doc_id, url,
               regexp_replace(url, '#.*$', '') AS no_frag
        FROM urls
    ),
    parts AS (
        SELECT doc_id, url,
               lower(regexp_extract(no_frag, '^([A-Za-z]+)://', 1))
                   AS scheme,
               lower(regexp_extract(no_frag, '^[A-Za-z]+://([^/:?]+)', 1))
                   AS host,
               regexp_replace(
                   regexp_extract(no_frag, '^[A-Za-z]+://[^/?]+([^?]*)', 1),
                   '/$', '') AS path,
               regexp_extract(no_frag, '[?](.*)$', 1) AS query
        FROM stripped
    ),
    cleaned AS (
        SELECT doc_id, url, scheme, host, path,
               array_to_string(
                   [x FOR x IN string_split(query, '&')
                    IF NOT (x LIKE 'utm_%')], '&') AS clean_q
        FROM parts
    )
    SELECT doc_id, url,
           scheme || '://' || host || path
               || CASE WHEN clean_q <> '' THEN '?' || clean_q ELSE '' END
               AS canonical_url,
           host
    FROM cleaned
    """,
    survey_ref="north-star dedup preprocessing: URL canonicalization "
               "(lowercase scheme/host, default-port strip, fragment "
               "drop, utm param removal, trailing-slash strip) — the "
               "normalization Common-Crawl-style exact URL dedup keys on",
    doc="URL canonicalization as a single codegen'd projection: regexp "
        "decomposition into scheme/host/path/query, tracking-param "
        "filter, recomposition. No shuffle — at 100 TB this runs "
        "map-side ahead of the exact-dedup groupBy keyed on the "
        "canonical URL (q60 composes downstream).",
)
def q194_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://Example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".ORG:443/Path"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 2 == 0, "/").otherwise(""),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("?utm_source=feed&id="), F.col("doc_id").cast("string")
            ),
        ).otherwise(""),
        F.when(F.col("doc_id") % 5 == 0, "#frag").otherwise(""),
    )
    base = docs.select("doc_id", url.alias("url"))
    no_frag = F.regexp_replace("url", "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(no_frag, r"^[A-Za-z]+://([^/:?]+)", 1))
    path = F.regexp_replace(
        F.regexp_extract(no_frag, r"^[A-Za-z]+://[^/?]+([^?]*)", 1), "/$", ""
    )
    query = F.regexp_extract(no_frag, r"[?](.*)$", 1)
    clean_q = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda x: ~x.startswith("utm_"),
        ),
        "&",
    )
    return base.select(
        "doc_id",
        "url",
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(clean_q != "", F.concat(F.lit("?"), clean_q)).otherwise(
                ""
            ),
        ).alias("canonical_url"),
        host.alias("host"),
    )
