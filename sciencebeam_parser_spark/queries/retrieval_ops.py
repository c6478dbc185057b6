"""Retrieval & linkage operators: BM25 keyword search, blocked record
linkage (entity resolution), triangle counting, perceptual-hash image
dedup, Count-Min heavy hitters, prefix-filtered set-similarity join,
deterministic integer k-means, and the trained-IVF ANN pipeline.

These extend the similarity/dedup family (text_ops) with the remaining
search-shaped workloads a 100 TB corpus platform runs:

* BM25 — the lexical-retrieval baseline every RAG/eval pipeline scores
  against; expressed as pure aggregates + one broadcast stats row, so the
  corpus scan is one map-side pass.
* Record linkage — dedup across *structured* records (vs text near-dup):
  blocking keys bound the candidate quadratic, features (edit distance,
  attribute agreement) score each candidate pair, a threshold decides —
  the Fellegi-Sunter shape with deterministic integer weights.
* Sorted-neighborhood (warehouse_ops q214) and prefix filtering (q211)
  are the two classic alternatives to blocking: sort adjacency bounds
  candidates at (w-1)*n under any skew; prefix filtering is LOSSLESS at
  an exact Jaccard threshold, pruning by token-universe sparsity.
* Triangle counting — the standard graph-shape statistic next to
  PageRank/components (graph_ops); oriented edge-edge join, never
  all-triples.
* aHash dedup — near-duplicate *images* via 64-bit parity signatures,
  band-bucketed so candidate generation is an equi-join (MinHash-LSH
  transplanted to hamming space).
* Count-Min — the frequency sketch beside KMV (q115) and HLL (q198):
  d tiny aggregations that merge by addition; estimates only ever
  overestimate, and the oracle accounts the error exactly.
* Integer k-means + trained IVF — the iterative-ML loop (bit-exact via
  quantized coordinates) and the ANN index it trains: cluster inverted
  file, nprobe probing, exact ranking of probed members only.

All arithmetic is integer or structurally-pinned double (shared expression
text between Spark and the DuckDB oracle), per the repo's hash discipline.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries.registry import register, table
from sciencebeam_parser_spark.utils import checkpoint_big
from sciencebeam_parser_spark.queries.text_ops import (
    _md5_long_sql,
    _MINHASH_SH_SQL,
    _words,
    _WORDS_SQL,
)

# --------------------------------------------------------------------------
# BM25 keyword retrieval
# --------------------------------------------------------------------------

_BM25_TERMS = ("dup", "vector", "join")
_BM25_K1 = "CAST(1.2 AS DOUBLE)"
_BM25_B75 = "CAST(0.75 AS DOUBLE)"


def _bm25_term_sql(t: str) -> str:
    """Per-term BM25 score with every float literal CAST to DOUBLE (bare
    decimal literals parse as DECIMAL in both engines, whose arithmetic
    is not IEEE); identical text feeds Spark's F.expr and the oracle, so
    the doubles match bit-for-bit."""
    return (
        f"ln(1 + (n_docs - df_{t} + CAST(0.5 AS DOUBLE))"
        f" / (df_{t} + CAST(0.5 AS DOUBLE)))"
        f" * (tf_{t} * CAST(2.2 AS DOUBLE))"
        f" / (tf_{t} + {_BM25_K1} * (CAST(0.25 AS DOUBLE)"
        f" + {_BM25_B75} * dl * n_docs / CAST(total_dl AS DOUBLE)))"
    )


_BM25_SCORE_SQL = " + ".join(f"({_bm25_term_sql(t)})" for t in _BM25_TERMS)


@register(
    "q197_bm25_topk",
    oracle=f"""
    WITH wd AS (
        SELECT doc_id, {_WORDS_SQL} AS w FROM documents
    ),
    tf AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
               {", ".join(
                   f"CAST(len([x FOR x IN w IF x = '{t}']) AS BIGINT)"
                   f" AS tf_{t}" for t in _BM25_TERMS
               )}
        FROM wd
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS BIGINT) AS total_dl,
               {", ".join(
                   f"CAST(count(CASE WHEN tf_{t} > 0 THEN 1 END) AS BIGINT)"
                   f" AS df_{t}" for t in _BM25_TERMS
               )}
        FROM tf
    ),
    scored AS (
        SELECT doc_id, dl, tf_dup, tf_vector, tf_join,
               round({_BM25_SCORE_SQL}, 4) AS score
        FROM tf CROSS JOIN stats
    )
    SELECT doc_id, dl, tf_dup, tf_vector, tf_join, score,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
          FROM scored)
    WHERE rnk <= 10
    """,
    survey_ref="north-star retrieval: BM25 lexical search over the corpus "
               "(the RAG/eval baseline next to q65 dense top-k and q188 "
               "chunking) — §2B aggregations + broadcast join",
    doc="BM25 top-10 for a 3-term query (k1=1.2, b=0.75): term "
        "frequencies and doc length are one map-side projection; N, "
        "avgdl and per-term document frequencies are ONE broadcast stats "
        "row (no second corpus shuffle); the score is a shared-text "
        "double expression so both engines produce identical bits. At "
        "100 TB this is scan + broadcast + TakeOrdered — no all-pairs, "
        "no inverted index needed until the query *count* grows, at "
        "which point the tf relation IS the posting-list build.",
)
def q197_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = _words("text")
    def _count_eq(term: str):
        # one-arg lambda per term (a default-arg two-arg lambda would make
        # F.filter pass the element index as the second argument)
        return F.size(F.filter(F.col("w"), lambda x: x == term))

    tf_cols = [
        _count_eq(t).cast("long").alias(f"tf_{t}") for t in _BM25_TERMS
    ]
    tf = docs.select(F.col("doc_id"), w.alias("w")).select(
        "doc_id", F.size("w").cast("long").alias("dl"), *tf_cols
    )
    stats = tf.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, 1)).cast("long").alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = tf.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "dl",
        *[f"tf_{t}" for t in _BM25_TERMS],
        F.round(F.expr(_BM25_SCORE_SQL), 4).alias("score"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject (no global sort);
    # row_number then runs on the 10 surviving rows only
    top = scored.orderBy(F.desc("score"), "doc_id").limit(10)
    return top.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.desc("score"), "doc_id")).cast("long"),
    )


# --------------------------------------------------------------------------
# Blocked record linkage (entity resolution)
# --------------------------------------------------------------------------

@register(
    "q201_record_linkage",
    oracle="""
    WITH rec AS (
        SELECT p_partkey, p_name, p_brand, p_size,
               string_split(p_name, ' ')[2] AS blk_noun
        FROM part
    ),
    cand AS (
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               a.p_name AS name_a, b.p_name AS name_b,
               levenshtein(a.p_name, b.p_name) AS name_dist,
               (a.p_brand = b.p_brand) AS brand_match
        FROM rec a JOIN rec b
          ON b.blk_noun = a.blk_noun AND b.p_size = a.p_size
         AND b.p_partkey > a.p_partkey
    )
    SELECT id_a, id_b, name_a, name_b,
           CAST(name_dist AS BIGINT) AS name_dist, brand_match,
           CAST(CASE WHEN brand_match THEN 4 ELSE 0 END
                + CASE WHEN name_dist <= 3 THEN 3
                       WHEN name_dist <= 5 THEN 1 ELSE 0 END
                AS BIGINT) AS score
    FROM cand
    WHERE (CASE WHEN brand_match THEN 4 ELSE 0 END
           + CASE WHEN name_dist <= 3 THEN 3
                  WHEN name_dist <= 5 THEN 1 ELSE 0 END) >= 5
    """,
    survey_ref="north-star structured dedup: record linkage with blocking "
               "+ feature scoring (Fellegi-Sunter shape, deterministic "
               "integer weights) — §2B self-join + levenshtein",
    doc="Entity resolution over part records: blocking on (noun, size) "
        "bounds the candidate join (never all-pairs — the same inverted-"
        "index discipline as MinHash-LSH), then each candidate pair is "
        "scored on edit distance and brand agreement with integer "
        "weights; threshold picks the linked pairs. Block sizes stay "
        "O(parts/blocks) at any scale, and skewed blocks fall to AQE "
        "skew-join handling.",
)
def q201_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    rec = part.select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_size",
        F.split("p_name", " ")[1].alias("blk_noun"),
    )
    a = rec.alias("a")
    b = rec.alias("b")
    cand = a.join(
        b,
        (F.col("b.blk_noun") == F.col("a.blk_noun"))
        & (F.col("b.p_size") == F.col("a.p_size"))
        & (F.col("b.p_partkey") > F.col("a.p_partkey")),
    ).select(
        F.col("a.p_partkey").alias("id_a"),
        F.col("b.p_partkey").alias("id_b"),
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
        .cast("long")
        .alias("name_dist"),
        (F.col("a.p_brand") == F.col("b.p_brand")).alias("brand_match"),
    )
    score = (
        F.when(F.col("brand_match"), 4).otherwise(0)
        + F.when(F.col("name_dist") <= 3, 3)
        .when(F.col("name_dist") <= 5, 1)
        .otherwise(0)
    ).cast("long")
    return cand.withColumn("score", score).filter(F.col("score") >= 5)


# --------------------------------------------------------------------------
# Triangle counting
# --------------------------------------------------------------------------

_TRI_STRIDE = 97

_TRI_EDGES_SQL = f"""
    stats AS (SELECT count(*) AS n FROM documents),
    directed AS (
        SELECT d.doc_id AS src,
               (d.doc_id + k.k * {_TRI_STRIDE}) % s.n AS dst
        FROM documents d
        CROSS JOIN stats s
        CROSS JOIN (SELECT 1 AS k UNION ALL SELECT 2 UNION ALL SELECT 3) k
        WHERE (d.doc_id + k.k * {_TRI_STRIDE}) % s.n <> d.doc_id
    ),
    edges AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM directed
    )
"""


@register(
    "q202_triangle_count",
    oracle="WITH " + _TRI_EDGES_SQL + """,
    tri AS (
        SELECT count(*) AS n_tri
        FROM edges e1
        JOIN edges e2 ON e2.a = e1.b
        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    deg AS (
        SELECT v, count(*) AS d FROM (
            SELECT a AS v FROM edges UNION ALL SELECT b FROM edges
        ) GROUP BY v
    ),
    triads AS (SELECT sum(d * (d - 1) / 2) AS n_open FROM deg)
    SELECT (SELECT CAST(n AS BIGINT) FROM stats) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(n_tri AS BIGINT) FROM tri) AS n_triangles,
           round(3.0 * (SELECT n_tri FROM tri)
                 / (SELECT n_open FROM triads), 6) AS transitivity
    """,
    survey_ref="engine-general graph statistic beside q177 PageRank and "
               "q110 components: triangle count / transitivity over the "
               "same deterministic citation graph — §2B self-joins",
    doc="Triangle counting on the synthetic citation graph (same "
        "stride-97 edges as q177): edges canonicalized a<b, then the "
        "oriented edge-edge-edge join counts each triangle exactly once "
        "— the compact-forward algorithm whose join fan-out is bounded "
        "by max degree, never all-triples. Transitivity = 3T / open "
        "triads from the degree relation. At scale the edge relation "
        "partitions on the join key and the heaviest nodes fall to AQE "
        "skew handling.",
)
def q202_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    stats = docs.agg(F.count("*").alias("n"))
    ks = spark.range(1, 4).select(F.col("id").alias("k"))
    directed = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(ks))
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") + F.col("k") * _TRI_STRIDE) % F.col("n")).alias(
                "dst"
            ),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    # referenced six times (three-way self-join, degree union, edge
    # count): checkpoint so the scan+distinct runs once, not per branch.
    # Corpus-scaled edge set -> repartition by a join endpoint + DISK_ONLY.
    edges = checkpoint_big(
        directed.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        ).distinct(),
        "a",
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count("*").alias("n_tri"))
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    triads = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("n_open")
    )
    n_nodes = stats.select(F.col("n").cast("long").alias("n_nodes"))
    n_edges = edges.agg(F.count("*").cast("long").alias("n_edges"))
    out = (
        n_nodes.crossJoin(n_edges)
        .crossJoin(tri.select(F.col("n_tri").cast("long").alias("n_triangles")))
        .crossJoin(triads)
    )
    return out.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.round(
            F.lit(3.0) * F.col("n_triangles") / F.col("n_open"), 6
        ).alias("transitivity"),
    )


# --------------------------------------------------------------------------
# Perceptual-hash (aHash) image dedup
# --------------------------------------------------------------------------

_AHASH_HAMMING_MAX = 4

# byte-BIGRAM aHash restated in SQL: one row per adjacent character
# pair, bucket = (ord(c1)*31 + ord(c2)) % 64 (documents.text is ASCII,
# so bytes == chars); bit i = parity of bucket i's count. Bigrams, not
# single bytes: text uses ~30 distinct byte values, so half the
# single-byte buckets were structurally empty — two whole bands constant
# 0 = two corpus-sized LSH buckets (the 100x smoke's 2.5e11-pair stall).
# A k-byte edit flips O(k) parities, so planted near-dups stay under
# _AHASH_HAMMING_MAX while unrelated payloads scatter ~32 bits apart;
# four 16-bit bands for overflow-free XOR.
_AHASH_SIG_SQL = """
    media AS (
        SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, text
        FROM documents
    ),
    -- byte-BIGRAM buckets (b1*31 + b2) % 64, matching the kernel: ASCII
    -- payload assumed (ord(char) == byte), one row per adjacent pair
    bytes AS (
        SELECT media_id,
               (ord(substr(text, CAST(i AS INT) + 1, 1)) * 31
                + ord(substr(text, CAST(i AS INT) + 2, 1))) % 64 AS bkt
        FROM media, unnest(range(0, len(text) - 1)) AS t(i)
    ),
    -- totals come from media, NOT a bytes aggregate: an empty payload has
    -- no bytes rows but the kernel still signs it (bands [0,0,0,0]), so
    -- the oracle must carry it too or the band join diverges
    totals AS (
        SELECT media_id, CAST(len(text) AS BIGINT) AS total FROM media
    ),
    hist AS (
        SELECT media_id, bkt, CAST(count(*) AS BIGINT) AS n
        FROM bytes GROUP BY media_id, bkt
    ),
    bits AS (
        SELECT t.media_id, g.i AS bit_i,
               CAST(COALESCE(h.n, 0) % 2 AS INT) AS bit
        FROM totals t
        CROSS JOIN (SELECT unnest(range(0, 64)) AS i) g
        LEFT JOIN hist h ON h.media_id = t.media_id AND h.bkt = g.i
    ),
    bands AS (
        SELECT media_id, CAST(bit_i // 16 AS INT) AS band_idx,
               CAST(sum(bit << (bit_i % 16)) AS BIGINT) AS band_val
        FROM bits GROUP BY media_id, bit_i // 16
    )
"""


@register(
    "q206_image_ahash_dedup",
    oracle="WITH " + _AHASH_SIG_SQL + f""",
    cand AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        FROM bands a JOIN bands b
          ON b.band_idx = a.band_idx AND b.band_val = a.band_val
         AND b.media_id > a.media_id
    ),
    sig AS (
        SELECT media_id,
               max(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
               max(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
               max(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
               max(CASE WHEN band_idx = 3 THEN band_val END) AS b3
        FROM bands GROUP BY media_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
              AS BIGINT) AS hamming
    FROM cand c
    JOIN sig x ON x.media_id = c.id_a
    JOIN sig y ON y.media_id = c.id_b
    WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
        <= {_AHASH_HAMMING_MAX}
    """,
    survey_ref="north-star multimodal dedup: perceptual-hash near-dup "
               "over a binary media column (aHash signature from the "
               "operators/multimodal.py kernel, LSH-banded hamming join "
               "— MinHash-LSH transplanted to bit space)",
    doc="Image near-dedup via average-hash: the mapInPandas kernel "
        "(ahash_images) signs each binary payload with 64 bits packed "
        "as four 16-bit bands; candidate pairs come from an equi-join "
        "on (band_idx, band_val) — any intact band buckets the pair, "
        "never an all-pairs scan — and survive iff XOR popcount across "
        "bands stays under the hamming threshold. The production "
        "kernel swaps byte histograms for decoded-pixel 8x8 averages; "
        "plumbing, banding, and verification are identical.",
)
def q206_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.multimodal import ahash_images

    docs = table(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    )
    # localCheckpoint: the signature relation is referenced on both sides
    # of the band join — without it every reference re-executes the
    # Python kernel over the full corpus (measured 10 plan copies)
    # one row per media item with the full signature in hand -> corpus-
    # scaled and wide: repartition (Python-kernel output keeps the binary
    # scan's split sizing) + DISK_ONLY
    sig = checkpoint_big(
        ahash_images(media).select(
            "media_id",
            *[F.col("bands")[j].alias(f"b{j}") for j in range(4)],
        ),
        "media_id",
    )
    # each band row carries the full signature, so ONE equi-join yields
    # candidate pairs with both sides' bits in hand — no second join
    bands = sig.select(
        "media_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band_idx", "band_val"
        ),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = sum(
        F.bit_count(F.expr(f"a.b{j} ^ b.b{j}")) for j in range(4)
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("b.band_idx") == F.col("a.band_idx"))
            & (F.col("b.band_val") == F.col("a.band_val"))
            & (F.col("b.media_id") > F.col("a.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= _AHASH_HAMMING_MAX)
    )


# --------------------------------------------------------------------------
# Count-Min sketch heavy hitters
# --------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 512


def _cms_bucket_sql(i: int, expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{i}' || ':' || {expr}), 1, 15)"
        f" AS BIGINT) % {_CMS_W}"
    )


@register(
    "q209_count_min_heavy_hitters",
    oracle=f"""
    WITH occ AS (
        SELECT w AS word FROM documents,
             unnest({_WORDS_SQL}) AS t(w)
    ),
    exact AS (SELECT word, CAST(count(*) AS BIGINT) AS exact FROM occ
              GROUP BY word),
    top AS (
        SELECT word, exact FROM exact
        ORDER BY exact DESC, word LIMIT 15
    ),
    cms AS (
        SELECT i, bucket, CAST(count(*) AS BIGINT) AS n
        FROM (
            {" UNION ALL ".join(
                f"SELECT {i} AS i, {_cms_bucket_sql(i, 'word')} AS bucket"
                f" FROM occ" for i in range(_CMS_D)
            )}
        ) GROUP BY i, bucket
    ),
    probes AS (
        SELECT t.word, t.exact, g.i,
               CASE g.i
                   {" ".join(
                       f"WHEN {i} THEN {_cms_bucket_sql(i, 't.word')}"
                       for i in range(_CMS_D)
                   )}
               END AS bucket
        FROM top t CROSS JOIN (SELECT unnest(range({_CMS_D})) AS i) g
    )
    SELECT p.word, p.exact,
           CAST(min(c.n) AS BIGINT) AS estimate,
           CAST(min(c.n) - p.exact AS BIGINT) AS overestimate
    FROM probes p JOIN cms c ON c.i = p.i AND c.bucket = p.bucket
    GROUP BY p.word, p.exact
    """,
    survey_ref="north-star corpus statistics: Count-Min sketch frequency "
               "estimates for heavy hitters (completes the sketch family "
               "beside q115 KMV and q198 HLL) — §2B aggregations",
    doc="Count-Min sketch (d=4 rows x w=512 md5 buckets) over the corpus "
        "token stream: the sketch is d tiny aggregations that merge by "
        "addition (one map-side pass at any scale); heavy-hitter "
        "estimates take the min over rows and can only OVER-estimate — "
        "the oracle verifies estimate >= exact per word, with the exact "
        "overestimate accounted. The 15 true top words probe the sketch "
        "through a broadcast join.",
)
def q209_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    occ = docs.select(F.explode(_words("text")).alias("word"))
    exact = occ.groupBy("word").agg(F.count("*").cast("long").alias("exact"))
    top = exact.orderBy(F.desc("exact"), "word").limit(15)

    def bucket(i: int, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(str(i)), col)), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    # all d sketch rows in ONE pass over the token stream: the d-way
    # union scanned + exploded the corpus once per sketch row (d=4
    # scans); each row's bucket is a pure expression of the word, so one
    # projection emits [(i, bucket)] and inline() unpacks it — the same
    # one-pass shape as the LSH table buckets (guide §1.2/§2.3).
    cms = (
        occ.select(
            F.inline(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            bucket(i, F.col("word")).alias("bucket"),
                        )
                        for i in range(_CMS_D)
                    ]
                )
            )
        )
        .groupBy("i", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )
    ks = spark.range(_CMS_D).select(F.col("id").cast("int").alias("i"))
    probes = top.crossJoin(F.broadcast(ks)).withColumn(
        "bucket",
        # CASE over i, mirroring the oracle's per-row hash choice
        F.coalesce(
            *[
                F.when(F.col("i") == i, bucket(i, F.col("word")))
                for i in range(_CMS_D)
            ]
        ),
    )
    return (
        probes.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy("word", "exact")
        .agg(F.min("n").cast("long").alias("estimate"))
        .withColumn(
            "overestimate", (F.col("estimate") - F.col("exact")).cast("long")
        )
    )


# --------------------------------------------------------------------------
# Prefix-filtered set-similarity join (PPJoin-style)
# --------------------------------------------------------------------------

_SETSIM_NUM = 3  # jaccard threshold tau = 3/5 = 0.6, kept rational so
_SETSIM_DEN = 5  # prefix lengths and the verify predicate stay integer


@register(
    "q211_setsim_prefix_join",
    # prefix length |s| - ceil(tau*|s|) + 1 with ceil(3n/5) = (3n+4)//5 —
    # integer arithmetic, no float knife edges; candidates must share a
    # PREFIX token (rarest-first global order), which is the tightest
    # filter that cannot miss a pair at the threshold
    oracle="WITH " + _MINHASH_SH_SQL + f""",
    dt AS (
        SELECT doc_id, shingle AS token FROM sh
    ),
    freq AS (
        SELECT token, count(*) AS df,
               row_number() OVER (ORDER BY count(*), token) AS rnk
        FROM dt GROUP BY token
    ),
    sized AS (
        SELECT d.doc_id, d.token, f.rnk,
               count(*) OVER (PARTITION BY d.doc_id) AS set_size,
               row_number() OVER (
                   PARTITION BY d.doc_id ORDER BY f.rnk) AS pos
        FROM dt d JOIN freq f ON f.token = d.token
    ),
    prefix AS (
        SELECT doc_id, token, set_size FROM sized
        WHERE pos <= set_size
              - (({_SETSIM_NUM} * set_size + {_SETSIM_DEN} - 1)
                 // {_SETSIM_DEN}) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.set_size AS size_a, b.set_size AS size_b
        FROM prefix a JOIN prefix b
          ON b.token = a.token AND b.doc_id > a.doc_id
    ),
    overlap AS (
        SELECT c.id_a, c.id_b, c.size_a, c.size_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM cand c
        JOIN dt ta ON ta.doc_id = c.id_a
        JOIN dt tb ON tb.doc_id = c.id_b AND tb.token = ta.token
        GROUP BY c.id_a, c.id_b, c.size_a, c.size_b
    )
    SELECT id_a, id_b,
           CAST(size_a AS BIGINT) AS size_a,
           CAST(size_b AS BIGINT) AS size_b, n_shared,
           round(CAST(n_shared AS DOUBLE)
                 / (size_a + size_b - n_shared), 4) AS jaccard
    FROM overlap
    WHERE n_shared * {_SETSIM_DEN}
          >= {_SETSIM_NUM} * (size_a + size_b - n_shared)
    """,
    survey_ref="north-star dedup: set-similarity join with prefix "
               "filtering (PPJoin family) — the exact-threshold "
               "complement to MinHash-LSH's probabilistic candidates",
    doc="Exact Jaccard>=0.6 set-similarity join over 3-gram SHINGLE "
        "sets via prefix filtering: shingles rank rarest-first globally; "
        "each doc indexes only its PREFIX (set_size - ceil(tau*set_size) "
        "+ 1 rarest shingles) — any pair at the threshold must share a "
        "prefix shingle, so the candidate join touches the small prefix "
        "relation, not the full inverted index. Verification counts "
        "shared shingles only for candidates; the threshold predicate is "
        "integer cross-multiplication (tau = 3/5). Unlike LSH this "
        "misses nothing. Shingles, not words, are the unit deliberately: "
        "prefix filtering prunes in proportion to token-universe "
        "sparsity, and word sets over a small vocabulary are degenerate "
        "(every doc shares its rare words; measured 7.1M word-set pairs "
        "vs a handful of shingle-set pairs on the same corpus).",
)
def q211_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.queries.text_ops import _shingle_array

    docs = table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id", F.explode(_shingle_array("text")).alias("token")
    ).distinct()
    freq = dt.groupBy("token").agg(F.count("*").alias("df"))
    # Rarest-first position WITHOUT a global rank: the oracle's rnk is
    # row_number() over the total order (df, token); ordering each doc's
    # tokens by rnk is therefore identical to ordering by (df, token)
    # directly. The former shape materialized that rank with a global
    # single-partition window over the entire token universe — the one
    # operator in this query that cannot scale (every distinct shingle
    # through one task). Per-doc order by (df, token) picks the same
    # prefixes with no global sort at all.
    sized = (
        dt.join(F.broadcast(freq), "token")
        .withColumn(
            "set_size", F.count("*").over(W.partitionBy("doc_id"))
        )
        .withColumn(
            "pos",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy("df", "token")
            ),
        )
    )
    prefix_len = (
        F.col("set_size")
        - F.floor(
            (_SETSIM_NUM * F.col("set_size") + (_SETSIM_DEN - 1))
            / _SETSIM_DEN
        )
        + 1
    )
    prefix = sized.filter(F.col("pos") <= prefix_len).select(
        "doc_id", "token", "set_size"
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("b.token") == F.col("a.token"))
            & (F.col("b.doc_id") > F.col("a.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .distinct()
    )
    # verification via per-pair array intersection: candidates join the
    # one-row-per-doc shingle-array relation twice and n_shared computes
    # in codegen — no exploded |cands| x |shingles| shuffle + groupBy.
    # Measured (BASELINE scale smoke, 10x / 11M candidates): exploded
    # join+agg 127 s vs array_intersect 34 s, identical 248,600 pairs.
    arrs = docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(_shingle_array("text"))).alias(
            "toks"
        ),
    )
    overlap = (
        cand.join(
            arrs.select(
                F.col("doc_id").alias("id_a"), F.col("toks").alias("ta")
            ),
            "id_a",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("id_b"), F.col("toks").alias("tb")
            ),
            "id_b",
        )
        .withColumn(
            "n_shared",
            F.size(F.array_intersect("ta", "tb")).cast("long"),
        )
        .drop("ta", "tb")
    )
    union_size = F.col("size_a") + F.col("size_b") - F.col("n_shared")
    return (
        overlap.filter(
            F.col("n_shared") * _SETSIM_DEN >= _SETSIM_NUM * union_size
        )
        .select(
            "id_a",
            "id_b",
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            "n_shared",
            F.round(
                F.col("n_shared").cast("double") / union_size, 4
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic k-means (integer arithmetic, unrolled iterations)
# --------------------------------------------------------------------------

_KM_K = 4
_KM_DIM = 64

_KM_QV_SQL = """
    qv AS (
        SELECT vec_id,
               [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                FOR x IN embedding] AS q
        FROM embeddings
    )
"""


def _km_assign_sql(cent: str, out: str) -> str:
    return f"""
    {out} AS (
        SELECT vec_id, q, cid FROM (
            SELECT v.vec_id, v.q, c.cid,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_sum([
                           (v.q[i] - c.c[i]) * (v.q[i] - c.c[i])
                           FOR i IN range(1, {_KM_DIM + 1})]), c.cid
                   ) AS rn
            FROM qv v CROSS JOIN {cent} c
        ) WHERE rn = 1
    )"""


def _km_update_sql(assign: str, out: str) -> str:
    return f"""
    {out}_u AS (
        SELECT cid, CAST(i AS INT) AS i,
               sum(q[CAST(i AS INT)]) AS s, count(*) AS n
        FROM {assign}, unnest(range(1, {_KM_DIM + 1})) t(i)
        GROUP BY cid, i
    ),
    {out} AS (
        SELECT cid,
               list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                    ORDER BY i) AS c
        FROM {out}_u GROUP BY cid
    )"""


def _km_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q array<long>) — 1e-3-quantized integer coordinates,
    localCheckpoint'ed (referenced by every Lloyd iteration)."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000).cast("long"),
        ).alias("q"),
    ).localCheckpoint()


def _km_sq_dist(qcol: str = "q", ccol: str = "c"):
    return F.aggregate(
        F.zip_with(qcol, ccol, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _centroid_update(df: DataFrame, key: str) -> DataFrame:
    """Floor-mean integer centroid per ``key`` from (key, q) rows — the
    Lloyd update step, also reused by q250's per-label centroids."""
    upd = df.select(
        key, F.posexplode("q").alias("pos", "val")
    ).groupBy(key, "pos").agg(
        F.sum("val").alias("s"), F.count("*").alias("n")
    )
    return upd.select(
        key,
        "pos",
        F.floor(F.col("s").cast("double") / F.col("n"))
        .cast("long")
        .alias("cv"),
    ).groupBy(key).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))),
            lambda st: st["cv"],
        ).alias("c")
    )


def _km_train(qv: DataFrame, k: int, iters: int = 2):
    """Lloyd's loop: returns (final assignment (vec_id, q, cid), final
    centroids (cid, c)). Init = the first k vectors by vec_id."""
    cent = qv.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("c")
    )
    assign = None
    for _ in range(iters):
        # argmin as a hash aggregate, not a sort-window: min over
        # struct(dist, cid) is lexicographic = the (dist, cid) order the
        # former row_number window used, and (dist, cid) is total (cids
        # unique), so the same centroid wins — but the aggregate gets
        # map-side partial aggregation, shuffling 1 row per vector
        # instead of k sorted candidates (guide §2.3)
        assign = (
            qv.crossJoin(F.broadcast(cent))
            .withColumn("dist", _km_sq_dist())
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cid", "q")).alias("s"))
            .select("vec_id", F.col("s.q").alias("q"), F.col("s.cid").alias("cid"))
        )
        cent = _centroid_update(assign, "cid")
    return assign, cent


@register(
    "q212_kmeans_integer",
    # Lloyd's algorithm, 2 unrolled iterations, k=4, init = the first k
    # vectors. Coordinates quantize to integers (floor(x*1000)) so every
    # distance is an exact int64 and every centroid update is
    # floor(int-sum / count) — one float division per dim whose floor is
    # engine-identical. Float k-means is NOT restatable (mean order +
    # iteration compounding); this is, bit for bit.
    oracle="WITH "
    + _KM_QV_SQL
    + ", c0 AS (SELECT vec_id AS cid, q AS c FROM qv WHERE vec_id < "
    + str(_KM_K)
    + "),"
    + _km_assign_sql("c0", "a1")
    + ","
    + _km_update_sql("a1", "c1")
    + ","
    + _km_assign_sql("c1", "a2")
    + ","
    + _km_update_sql("a2", "c2")
    + """
    SELECT a.cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(c.csum) AS BIGINT) AS centroid_sum
    FROM a2 a
    JOIN (SELECT cid, list_sum(c) AS csum FROM c2 GROUP BY cid, c) c
      ON c.cid = a.cid
    GROUP BY a.cid
    """,
    survey_ref="engine-general iterative ML: Lloyd's k-means over the "
               "embedding table (the MLlib-style clustering loop beside "
               "q177 PageRank and q93 IVF, whose coarse quantizer this "
               "IS at production scale) — §2B joins + aggregations",
    doc="Deterministic k-means (k=4, 2 unrolled Lloyd iterations) on "
        "1e-3-quantized integer coordinates: assignment is a broadcast "
        "crossJoin against the k-row centroid relation with exact int64 "
        "distances (min by (dist, cid) — ties resolve to the lowest "
        "centroid id on any engine); the update re-derives centroids "
        "from per-(cluster, dim) integer sums. Each iteration is one "
        "shuffle on the cluster key; centroids stay broadcast-sized at "
        "any corpus scale. The same loop seeds q93's IVF index.",
)
def q212_kmeans_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _km_quantize(spark, sf_dir)
    assign, cent = _km_train(qv, _KM_K, iters=2)
    csum = cent.select(
        "cid",
        F.aggregate(
            "c", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("csum"),
    )
    return (
        assign.groupBy(F.col("cid").alias("cluster_id"))
        .agg(F.count("*").cast("long").alias("n_members"))
        .join(F.broadcast(csum), F.col("cluster_id") == F.col("cid"))
        .select(
            "cluster_id",
            "n_members",
            F.col("csum").cast("long").alias("centroid_sum"),
        )
    )


# --------------------------------------------------------------------------
# Trained IVF index: k-means coarse quantizer -> probe -> exact top-k
# --------------------------------------------------------------------------

_IVF_K = 8
_IVF_NPROBE = 2
_IVF_TOPK = 5


def _ivf_probe_sql(qset: str, cent: str, out: str, nprobe: int) -> str:
    return f"""
    {out} AS (
        SELECT qid, cid FROM (
            SELECT s.qid, c.cid,
                   row_number() OVER (
                       PARTITION BY s.qid
                       ORDER BY list_sum([
                           (s.qq[i] - c.c[i]) * (s.qq[i] - c.c[i])
                           FOR i IN range(1, {_KM_DIM + 1})]), c.cid
                   ) AS rn
            FROM {qset} s CROSS JOIN {cent} c
        ) WHERE rn <= {nprobe}
    )"""


@register(
    "q215_ivf_trained_index",
    # the full train->index->query ANN pipeline in one deterministic DAG:
    # the q212 Lloyd loop (k=8 here) trains the coarse quantizer, every
    # vector lands in its final cluster, queries probe their 2 nearest
    # clusters, and exact integer distances rank the candidates.
    oracle="WITH "
    + _KM_QV_SQL
    + f", c0 AS (SELECT vec_id AS cid, q AS c FROM qv WHERE vec_id < {_IVF_K}),"
    + _km_assign_sql("c0", "a1")
    + ","
    + _km_update_sql("a1", "c1")
    + ","
    + _km_assign_sql("c1", "a2")
    + ","
    + _km_update_sql("a2", "c2")
    + ","
    + _km_assign_sql("c2", "a3")
    + f""",
    qset AS (
        SELECT vec_id AS qid, q AS qq FROM qv WHERE vec_id % 100 = 0
    ),
    {_ivf_probe_sql("qset", "c2", "probe", _IVF_NPROBE)},
    cand AS (
        SELECT p.qid, a.vec_id, a.q
        FROM probe p JOIN a3 a ON a.cid = p.cid AND a.vec_id <> p.qid
    ),
    scored AS (
        SELECT c.qid, c.vec_id,
               list_sum([(c.q[i] - s.qq[i]) * (c.q[i] - s.qq[i])
                         FOR i IN range(1, {_KM_DIM + 1})]) AS dist
        FROM cand c JOIN qset s ON s.qid = c.qid
    )
    SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rnk, vec_id,
           CAST(dist AS BIGINT) AS dist
    FROM (SELECT *, row_number() OVER (
              PARTITION BY qid ORDER BY dist, vec_id) AS rnk
          FROM scored)
    WHERE rnk <= {_IVF_TOPK}
    """,
    survey_ref="north-star similarity search capstone: the trained IVF "
               "pipeline (k-means coarse quantizer -> cluster index -> "
               "nprobe search) that q93's fixed-centroid IVF assumes "
               "exists — train/index/query as ONE deterministic DAG",
    doc="Trained-IVF ANN end-to-end: Lloyd's k-means (k=8, 2 iterations, "
        "integer arithmetic) trains the coarse quantizer; every vector "
        "joins its final cluster (the inverted file); each sampled query "
        "probes its nprobe=2 nearest centroids and ranks ONLY those "
        "clusters' members by exact int64 distance — the candidate scan "
        "is nprobe/k of the corpus. Centroids stay broadcast-sized; the "
        "inverted file partitions on cluster id, so each query's probe "
        "touches bounded partitions at any corpus scale.",
)
def q215_ivf_trained_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _km_quantize(spark, sf_dir)
    _, cent = _km_train(qv, _IVF_K, iters=2)
    cent = cent.localCheckpoint()  # reused: final assignment + probes
    # min-struct argmin (see _km_train): same winner, map-side combinable
    a3 = (
        qv.crossJoin(F.broadcast(cent))
        .withColumn("dist", _km_sq_dist())
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid", "q")).alias("s"))
        .select("vec_id", F.col("s.q").alias("q"), F.col("s.cid").alias("cid"))
    )
    qset = qv.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    wq = W.partitionBy("qid").orderBy("dist", "cid")
    probe = (
        qset.crossJoin(F.broadcast(cent))
        .withColumn("dist", _km_sq_dist("qq", "c"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select("qid", "cid")
    )
    cand = probe.join(a3, "cid").filter(F.col("vec_id") != F.col("qid"))
    scored = cand.join(qset, "qid").withColumn(
        "dist", _km_sq_dist("q", "qq")
    )
    wr = W.partitionBy("qid").orderBy("dist", "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= _IVF_TOPK)
        .select(
            F.col("qid").alias("query_id"),
            "rnk",
            "vec_id",
            F.col("dist").cast("long").alias("dist"),
        )
    )


# --------------------------------------------------------------------------
# Product quantization: per-subspace k-means -> code assignment (q226)
# --------------------------------------------------------------------------

_PQ_M = 4        # subspaces
_PQ_SUBDIM = _KM_DIM // _PQ_M
_PQ_K = 4        # codebook entries per subspace


def _pq_assign_sql(qvtab: str, cent: str, out: str, dim: int) -> str:
    """Nearest-centroid assignment WITH the distance kept (the PQ
    reconstruction error needs it); dim-parameterized twin of
    _km_assign_sql."""
    return f"""
    {out} AS (
        SELECT vec_id, q, cid, dist FROM (
            SELECT vec_id, q, cid, dist,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM (
                SELECT v.vec_id, v.q, c.cid,
                       list_sum([(v.q[i] - c.c[i]) * (v.q[i] - c.c[i])
                                 FOR i IN range(1, {dim + 1})]) AS dist
                FROM {qvtab} v CROSS JOIN {cent} c
            )
        ) WHERE rn = 1
    )"""


def _pq_update_sql(assign: str, out: str, dim: int) -> str:
    return f"""
    {out}_u AS (
        SELECT cid, CAST(i AS INT) AS i,
               sum(q[CAST(i AS INT)]) AS s, count(*) AS n
        FROM {assign}, unnest(range(1, {dim + 1})) t(i)
        GROUP BY cid, i
    ),
    {out} AS (
        SELECT cid,
               list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                    ORDER BY i) AS c
        FROM {out}_u GROUP BY cid
    )"""


def _pq_subspace_sql(m: int, src: str = "qv") -> str:
    """Train (2 Lloyd rounds) + final assign for subspace m over the
    (vec_id, q) relation ``src`` — raw vectors (q226/q228) or coarse
    residuals (q248)."""
    lo = m * _PQ_SUBDIM + 1
    hi = (m + 1) * _PQ_SUBDIM
    return f"""
    qv{m} AS (SELECT vec_id, q[{lo}:{hi}] AS q FROM {src}),
    cs{m}0 AS (SELECT vec_id AS cid, q AS c FROM qv{m} WHERE vec_id < {_PQ_K}),
    {_pq_assign_sql(f'qv{m}', f'cs{m}0', f'as{m}1', _PQ_SUBDIM)},
    {_pq_update_sql(f'as{m}1', f'cs{m}1', _PQ_SUBDIM)},
    {_pq_assign_sql(f'qv{m}', f'cs{m}1', f'as{m}2', _PQ_SUBDIM)},
    {_pq_update_sql(f'as{m}2', f'cs{m}2', _PQ_SUBDIM)},
    {_pq_assign_sql(f'qv{m}', f'cs{m}2', f'as{m}3', _PQ_SUBDIM)}"""


def _pq_codebooks(qv: DataFrame) -> DataFrame:
    """Train the _PQ_M per-subspace codebooks (the q212 Lloyd loop on each
    16-dim slice) and union them into ONE checkpointed (m, cid, c)
    relation — 16 rows, broadcast by every consumer."""
    cents = []
    for m in range(_PQ_M):
        qm = qv.select(
            "vec_id",
            F.slice("q", m * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("q"),
        )
        _, cent = _km_train(qm, _PQ_K, iters=2)
        cents.append(cent.select(F.lit(m).alias("m"), "cid", "c"))
    cent_all = cents[0]
    for c in cents[1:]:
        cent_all = cent_all.unionByName(c)
    return cent_all.localCheckpoint()


def _pq_encode(qv: DataFrame, cent_all: DataFrame) -> DataFrame:
    """Assign every vector its nearest codebook entry per subspace: one
    broadcast join + a per-(vec, subspace) top-1 window. Returns
    (vec_id, m, cid, dist)."""
    subv = qv.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("q", m * _PQ_SUBDIM + 1, _PQ_SUBDIM)
                    for m in range(_PQ_M)
                ]
            )
        ).alias("m", "sq"),
    )
    # same min-struct argmin as _km_train: identical (dist, cid) winner,
    # map-side combinable instead of a per-(vec, m) sort window
    return (
        subv.join(F.broadcast(cent_all), "m")
        .withColumn("dist", _km_sq_dist("sq", "c"))
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist", "cid")).alias("s"))
        .select(
            "vec_id", "m", F.col("s.cid").alias("cid"), F.col("s.dist").alias("dist")
        )
    )


@register(
    "q226_pq_codes",
    # product quantization: the 64-dim integer vector splits into 4
    # 16-dim subvectors; each subspace trains its own k=4 codebook with
    # the q212 Lloyd loop (2 unrolled rounds, integer arithmetic), and a
    # vector's code is its nearest codebook entry per subspace. The
    # total reconstruction error is the exact int64 sum of per-subspace
    # distances.
    oracle="WITH "
    + _KM_QV_SQL
    + ","
    + ",".join(_pq_subspace_sql(m) for m in range(_PQ_M))
    + """
    SELECT a0.vec_id,
           a0.cid AS code0, a1.cid AS code1,
           a2.cid AS code2, a3.cid AS code3,
           CAST(a0.dist + a1.dist + a2.dist + a3.dist AS BIGINT)
               AS total_err
    FROM as03 a0
    JOIN as13 a1 ON a1.vec_id = a0.vec_id
    JOIN as23 a2 ON a2.vec_id = a0.vec_id
    JOIN as33 a3 ON a3.vec_id = a0.vec_id
    """,
    survey_ref="north-star similarity search: product-quantization "
               "codebook training + encoding — the PQ half of a "
               "FAISS-style IVF-PQ index beside q215's IVF half",
    doc="Product quantization end-to-end: each of 4 subspaces trains an "
        "independent k=4 codebook (deterministic integer Lloyd rounds, "
        "same machinery as q212), then every vector is encoded as 4 "
        "code ids + its exact int64 reconstruction error. Spark shape: "
        "the 16 trained codebook rows union into ONE broadcast relation "
        "keyed by subspace; vectors explode to (vec_id, subspace, "
        "subvector) — bounded 4x fan-out — and a single broadcast join "
        "+ per-(vec, subspace) top-1 window assigns all codes in one "
        "shuffle. At 100 TB the codebooks stay KB-sized while vectors "
        "compress 64 dims -> 4 bytes, which is the point of PQ.",
)
def q226_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _km_quantize(spark, sf_dir)
    assigned = _pq_encode(qv, _pq_codebooks(qv))
    code = lambda m: F.max(F.when(F.col("m") == m, F.col("cid")))  # noqa: E731
    return assigned.groupBy("vec_id").agg(
        code(0).alias("code0"),
        code(1).alias("code1"),
        code(2).alias("code2"),
        code(3).alias("code3"),
        F.sum("dist").cast("long").alias("total_err"),
    )


# --------------------------------------------------------------------------
# IVF-PQ search: coarse probe + asymmetric-distance PQ scoring (q228)
# --------------------------------------------------------------------------


def _pq_dtab_sql(m: int) -> str:
    """Per-query distance table for subspace m: exact int64 distance from
    the query's m-th subvector to each of the k codebook entries."""
    off = m * _PQ_SUBDIM
    return f"""
    dt{m} AS (
        SELECT s.qid, {m} AS m, c.cid,
               list_sum([(s.q[{off} + i] - c.c[i]) * (s.q[{off} + i] - c.c[i])
                         FOR i IN range(1, {_PQ_SUBDIM + 1})]) AS d
        FROM qset s CROSS JOIN cs{m}2 c
    )"""


@register(
    "q228_ivfpq_search",
    # the FAISS IVF-PQ search pattern end-to-end, deterministic: the q215
    # coarse quantizer (k=8, nprobe=2) restricts candidates to 2 clusters;
    # the q226 PQ codebooks encode every vector as 4 codes; each query
    # precomputes a 4x4 distance TABLE to the codebook entries and scores
    # candidates by summing 4 table lookups (asymmetric distance, ADC)
    # instead of 64 subtractions — all int64-exact.
    oracle="WITH "
    + _KM_QV_SQL
    + f", c0 AS (SELECT vec_id AS cid, q AS c FROM qv WHERE vec_id < {_IVF_K}),"
    + _km_assign_sql("c0", "a1")
    + ","
    + _km_update_sql("a1", "c1")
    + ","
    + _km_assign_sql("c1", "a2")
    + ","
    + _km_update_sql("a2", "c2")
    + ","
    + _km_assign_sql("c2", "a3")
    + ","
    + ",".join(_pq_subspace_sql(m) for m in range(_PQ_M))
    + f""",
    qset AS (SELECT vec_id AS qid, q FROM qv WHERE vec_id % 100 = 0),
    qprobe AS (SELECT qid, q AS qq FROM qset),
    {_ivf_probe_sql("qprobe", "c2", "probe", _IVF_NPROBE)},
    {",".join(_pq_dtab_sql(m) for m in range(_PQ_M))},
    dtab AS (SELECT * FROM dt0 UNION ALL SELECT * FROM dt1
             UNION ALL SELECT * FROM dt2 UNION ALL SELECT * FROM dt3),
    codes AS (
        SELECT vec_id, 0 AS m, cid FROM as03
        UNION ALL SELECT vec_id, 1, cid FROM as13
        UNION ALL SELECT vec_id, 2, cid FROM as23
        UNION ALL SELECT vec_id, 3, cid FROM as33
    ),
    cand AS (
        SELECT p.qid, a.vec_id
        FROM probe p JOIN a3 a ON a.cid = p.cid AND a.vec_id <> p.qid
    ),
    scored AS (
        SELECT c.qid, c.vec_id, CAST(sum(d.d) AS BIGINT) AS adc_dist
        FROM cand c
        JOIN codes k ON k.vec_id = c.vec_id
        JOIN dtab d ON d.qid = c.qid AND d.m = k.m AND d.cid = k.cid
        GROUP BY c.qid, c.vec_id
    )
    SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rnk, vec_id, adc_dist
    FROM (SELECT *, row_number() OVER (
              PARTITION BY qid ORDER BY adc_dist, vec_id) AS rnk
          FROM scored)
    WHERE rnk <= {_IVF_TOPK}
    """,
    survey_ref="north-star similarity-search capstone: IVF-PQ search — "
               "coarse probe (q215) + PQ asymmetric-distance scoring "
               "(q226 codebooks), the index structure production ANN "
               "actually runs at 100 TB",
    doc="IVF-PQ approximate search: queries probe their nprobe=2 coarse "
        "clusters, then rank ONLY those clusters' members by asymmetric "
        "distance — each query precomputes a (subspace x code) distance "
        "table to the 16 codebook entries, and a candidate's score is 4 "
        "table lookups summed, never a touch of the raw 64-dim vector. "
        "Spark shape: codebooks and coarse centroids are broadcast "
        "KB-scale relations; the candidate set is nprobe/k of the "
        "corpus; scoring is an equi-join of exploded (vec, subspace, "
        "code) rows against the broadcast distance table followed by "
        "one hash aggregate — no full-width vector ever shuffles after "
        "encoding, which is exactly why PQ exists.",
)
def q228_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _km_quantize(spark, sf_dir)
    # coarse quantizer + inverted file (the q215 path)
    _, coarse = _km_train(qv, _IVF_K, iters=2)
    coarse = coarse.localCheckpoint()
    # min-struct argmin (see _km_train): same winner, map-side combinable
    inv = (
        qv.crossJoin(F.broadcast(coarse))
        .withColumn("dist", _km_sq_dist())
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).alias("s"))
        .select("vec_id", F.col("s.cid").alias("cid"))
    )
    # per-subspace PQ codebooks + encoding (shared with q226)
    cent_all = _pq_codebooks(qv)
    codes = _pq_encode(qv, cent_all).select(
        "vec_id", "m", F.col("cid").alias("code")
    )
    # queries: probe + ADC distance table
    qset = qv.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), "q"
    )
    wq = W.partitionBy("qid").orderBy("dist", "cid")
    probe = (
        qset.withColumnRenamed("q", "qq")
        .crossJoin(F.broadcast(coarse))
        .withColumn("dist", _km_sq_dist("qq", "c"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select("qid", "cid")
    )
    dtab = (
        qset.crossJoin(F.broadcast(cent_all))
        .withColumn(
            "d",
            # _km_sq_dist accepts Column expressions (zip_with does)
            _km_sq_dist(
                F.slice("q", F.col("m") * _PQ_SUBDIM + 1, F.lit(_PQ_SUBDIM)),
                F.col("c"),
            ),
        )
        .select("qid", "m", F.col("cid").alias("code"), "d")
    )
    cand = probe.join(inv, "cid").filter(F.col("vec_id") != F.col("qid"))
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(dtab), ["qid", "m", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
    )
    wr = W.partitionBy("qid").orderBy("adc_dist", "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= _IVF_TOPK)
        .select(
            F.col("qid").alias("query_id"), "rnk", "vec_id", "adc_dist"
        )
    )


# --------------------------------------------------------------------------
# Gram matrix (X^T X) over the quantized embedding block (q240)
# --------------------------------------------------------------------------

_GRAM_DIM = 8  # leading block; the full 64x64 is the same plan, more columns


@register(
    "q240_gram_matrix",
    # the distributed linear-algebra primitive under PCA/ridge/whitening:
    # X^T X computed as ONE map-side-combinable aggregate of per-row
    # products — exact int64 over the 1e-3-quantized coordinates, upper
    # triangle of the leading 8x8 block.
    oracle="WITH "
    + _KM_QV_SQL
    + f"""
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(sum(q[CAST(i AS INT)] * q[CAST(j AS INT)]) AS BIGINT) AS s
    FROM qv,
         unnest(range(1, {_GRAM_DIM + 1})) t(i),
         unnest(range(1, {_GRAM_DIM + 1})) u(j)
    WHERE j >= i
    GROUP BY i, j
    """,
    survey_ref="north-star embedding analytics: the Gram-matrix (X^T X) "
               "primitive under PCA / ridge regression / whitening — "
               "distributed linear algebra as a single partial aggregate",
    doc="Gram matrix of the embedding block: every (i<=j) upper-triangle "
        "entry is sum(x_i * x_j) over all vectors — computed as ONE "
        "aggregate projection with d(d+1)/2 sum columns, so the vectors "
        "never shuffle and every executor emits one partial row (the "
        "map-side-combine shape that makes X^T X the scalable route to "
        "PCA at 100 TB: the result is d^2 scalars regardless of corpus "
        "size). Exact int64 on the 1e-3-quantized coordinates; the "
        "column-to-row unpivot is a driver-free stack() of the single "
        "aggregate row.",
)
def q240_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _km_quantize(spark, sf_dir)
    pairs = [
        (i, j)
        for i in range(1, _GRAM_DIM + 1)
        for j in range(i, _GRAM_DIM + 1)
    ]
    aggs = [
        F.sum(F.col("q")[i - 1] * F.col("q")[j - 1]).alias(f"v{i}_{j}")
        for i, j in pairs
    ]
    row = qv.agg(*aggs)
    stack_args = ", ".join(
        f"int({i}), int({j}), v{i}_{j}" for i, j in pairs
    )
    return row.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (i, j, s)"
    ).selectExpr("i", "j", "CAST(s AS BIGINT) AS s")


# --------------------------------------------------------------------------
# Residual IVF-PQ: PQ trained on coarse residuals (q248)
# --------------------------------------------------------------------------


def _pq_rdtab_sql(m: int) -> str:
    """Per-(query, probed-cluster) distance table for subspace m over the
    query's RESIDUAL to that cluster's centroid."""
    off = m * _PQ_SUBDIM
    return f"""
    rdt{m} AS (
        SELECT r.qid, r.cid, {m} AS m, cb.cid AS code,
               list_sum([(r.rq[{off} + i] - cb.c[i])
                         * (r.rq[{off} + i] - cb.c[i])
                         FOR i IN range(1, {_PQ_SUBDIM + 1})]) AS d
        FROM qres r CROSS JOIN cs{m}2 cb
    )"""


@register(
    "q248_residual_ivfpq_search",
    # the EXACT FAISS IVF-PQ structure: PQ codebooks train on the
    # residual (vector minus its coarse centroid), which concentrates
    # the quantizer's resolution where the coarse cells leave error;
    # each query then needs one distance table PER PROBED CLUSTER (its
    # residual differs per cell). All arithmetic stays int64-exact.
    oracle="WITH "
    + _KM_QV_SQL
    + f", c0 AS (SELECT vec_id AS cid, q AS c FROM qv WHERE vec_id < {_IVF_K}),"
    + _km_assign_sql("c0", "a1")
    + ","
    + _km_update_sql("a1", "c1")
    + ","
    + _km_assign_sql("c1", "a2")
    + ","
    + _km_update_sql("a2", "c2")
    + ","
    + _km_assign_sql("c2", "a3")
    + f""",
    res AS (
        SELECT a.vec_id,
               [a.q[i] - c.c[i] FOR i IN range(1, {_KM_DIM + 1})] AS q,
               a.cid AS inv_cid
        FROM a3 a JOIN c2 c ON c.cid = a.cid
    ),
    {",".join(_pq_subspace_sql(m, src="res") for m in range(_PQ_M))},
    codes AS (
        SELECT vec_id, 0 AS m, cid FROM as03
        UNION ALL SELECT vec_id, 1, cid FROM as13
        UNION ALL SELECT vec_id, 2, cid FROM as23
        UNION ALL SELECT vec_id, 3, cid FROM as33
    ),
    qset AS (SELECT vec_id AS qid, q FROM qv WHERE vec_id % 100 = 0),
    qprobe AS (SELECT qid, q AS qq FROM qset),
    {_ivf_probe_sql("qprobe", "c2", "probe", _IVF_NPROBE)},
    qres AS (
        SELECT p.qid, p.cid,
               [s.q[i] - c.c[i] FOR i IN range(1, {_KM_DIM + 1})] AS rq
        FROM probe p
        JOIN qset s ON s.qid = p.qid
        JOIN c2 c ON c.cid = p.cid
    ),
    {",".join(_pq_rdtab_sql(m) for m in range(_PQ_M))},
    rdtab AS (SELECT * FROM rdt0 UNION ALL SELECT * FROM rdt1
              UNION ALL SELECT * FROM rdt2 UNION ALL SELECT * FROM rdt3),
    cand AS (
        SELECT p.qid, r.vec_id, r.inv_cid
        FROM probe p JOIN res r ON r.inv_cid = p.cid
        WHERE r.vec_id <> p.qid
    ),
    scored AS (
        SELECT c.qid, c.vec_id, CAST(sum(d.d) AS BIGINT) AS adc_dist
        FROM cand c
        JOIN codes k ON k.vec_id = c.vec_id
        JOIN rdtab d ON d.qid = c.qid AND d.cid = c.inv_cid
                    AND d.m = k.m AND d.code = k.cid
        GROUP BY c.qid, c.vec_id
    )
    SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rnk, vec_id, adc_dist
    FROM (SELECT *, row_number() OVER (
              PARTITION BY qid ORDER BY adc_dist, vec_id) AS rnk
          FROM scored)
    WHERE rnk <= {_IVF_TOPK}
    """,
    survey_ref="north-star similarity-search completion: RESIDUAL IVF-PQ "
               "— PQ codebooks trained on coarse residuals, per-probe "
               "distance tables; the production FAISS index verbatim",
    doc="Residual IVF-PQ search: every vector's PQ code describes its "
        "RESIDUAL to its coarse centroid (the FAISS default — residuals "
        "have ~k times less variance than raw vectors, so the same 4 "
        "codes quantize far finer), and each query builds one "
        "(subspace x code) distance table per probed cluster from its "
        "own residual in that cell. Spark shape is unchanged from q228 "
        "— codebooks and distance tables broadcast, candidates join on "
        "the inverted-file cluster key — plus one broadcast centroid "
        "join to form residuals; at 100 TB the residual subtraction is "
        "a map-side projection.",
)
def q248_residual_ivfpq_search(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    qv = _km_quantize(spark, sf_dir)
    _, coarse = _km_train(qv, _IVF_K, iters=2)
    coarse = coarse.localCheckpoint()
    # min-struct argmin (see _km_train): same winner, map-side combinable
    inv = (
        qv.crossJoin(F.broadcast(coarse))
        .withColumn("dist", _km_sq_dist())
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid", "q")).alias("s"))
        .select(
            "vec_id", F.col("s.q").alias("q"), F.col("s.cid").alias("inv_cid")
        )
    )
    # residuals: vector minus its coarse centroid (map-side projection)
    res = (
        inv.join(
            F.broadcast(coarse.select(F.col("cid").alias("inv_cid"), "c")),
            "inv_cid",
        )
        .select(
            "vec_id",
            F.zip_with("q", "c", lambda a, b: a - b).alias("q"),
            "inv_cid",
        )
        .localCheckpoint()
    )
    cent_all = _pq_codebooks(res.select("vec_id", "q"))
    codes = _pq_encode(res.select("vec_id", "q"), cent_all).select(
        "vec_id", "m", F.col("cid").alias("code")
    )
    qset = qv.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), "q"
    )
    wq = W.partitionBy("qid").orderBy("dist", "cid")
    probe = (
        qset.withColumnRenamed("q", "qq")
        .crossJoin(F.broadcast(coarse))
        .withColumn("dist", _km_sq_dist("qq", "c"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select("qid", "cid")
    )
    qres = (
        probe.join(qset, "qid")
        .join(F.broadcast(coarse), "cid")
        .select(
            "qid",
            F.col("cid").alias("pcid"),
            F.zip_with("q", "c", lambda a, b: a - b).alias("rq"),
        )
    )
    rdtab = (
        qres.crossJoin(F.broadcast(cent_all))
        .withColumn(
            "d",
            _km_sq_dist(
                F.slice("rq", F.col("m") * _PQ_SUBDIM + 1, F.lit(_PQ_SUBDIM)),
                F.col("c"),
            ),
        )
        .select("qid", "pcid", "m", F.col("cid").alias("code"), "d")
    )
    cand = (
        probe.join(
            res.select("vec_id", F.col("inv_cid").alias("cid")), "cid"
        )
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.col("cid").alias("pcid"))
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(rdtab), ["qid", "pcid", "m", "code"])
        .groupBy("qid", "vec_id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
    )
    wr = W.partitionBy("qid").orderBy("adc_dist", "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= _IVF_TOPK)
        .select(
            F.col("qid").alias("query_id"), "rnk", "vec_id", "adc_dist"
        )
    )


# --------------------------------------------------------------------------
# Per-label embedding outliers (q250)
# --------------------------------------------------------------------------

_OUTLIER_TOPK = 5


@register(
    "q250_label_outliers",
    # label-noise detection: each label's integer centroid (floor-mean
    # per dimension), exact int64 distance of every member to its own
    # centroid, top-5 farthest per label — the mislabeled-example
    # screening pass a curation pipeline runs on embedded data.
    oracle=f"""
    WITH lqv AS (
        SELECT vec_id, label,
               [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                FOR x IN embedding] AS q
        FROM embeddings
    ),
    cent_u AS (
        SELECT label, CAST(i AS INT) AS i,
               sum(q[CAST(i AS INT)]) AS s, count(*) AS n
        FROM lqv, unnest(range(1, {_KM_DIM + 1})) t(i)
        GROUP BY label, i
    ),
    cent AS (
        SELECT label,
               list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                    ORDER BY i) AS c
        FROM cent_u GROUP BY label
    ),
    scored AS (
        SELECT v.vec_id, v.label,
               list_sum([(v.q[i] - c.c[i]) * (v.q[i] - c.c[i])
                         FOR i IN range(1, {_KM_DIM + 1})]) AS dist
        FROM lqv v JOIN cent c ON c.label = v.label
    )
    SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id,
           CAST(dist AS BIGINT) AS dist
    FROM (SELECT *, row_number() OVER (
              PARTITION BY label ORDER BY dist DESC, vec_id) AS rnk
          FROM scored)
    WHERE rnk <= {_OUTLIER_TOPK}
    """,
    survey_ref="north-star embedding curation (beside q219 dim stats, "
               "q226 PQ): per-label centroid-distance outliers — the "
               "mislabeled-example screen over embedded training data",
    doc="Intra-class outlier detection: every label's centroid is the "
        "per-dimension floor-mean of its members' quantized "
        "coordinates (the q212 update step keyed by label instead of "
        "cluster), members score by exact int64 distance to their OWN "
        "centroid, and the 5 farthest per label surface for review. "
        "One (label, dim) aggregate — bounded key space |labels| x d — "
        "one broadcast centroid join back, one per-label top-k window. "
        "At 100 TB every step is map-side combinable or broadcast.",
)
def q250_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    lqv = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000).cast("long"),
        ).alias("q"),
    )
    # corpus-scaled wide rows (quantized embedding array); the centroid
    # join back is broadcast, so no key alignment needed — DISK_ONLY only
    lqv = checkpoint_big(lqv)
    cent = _centroid_update(lqv.select("label", "q"), "label")
    scored = lqv.join(F.broadcast(cent), "label").withColumn(
        "dist", _km_sq_dist()
    )
    w = W.partitionBy("label").orderBy(F.desc("dist"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _OUTLIER_TOPK)
        .select("label", "rnk", "vec_id", F.col("dist").cast("long").alias("dist"))
    )


# --------------------------------------------------------------------------
# Semantic deduplication (q254) — SemDeDup over the trained k-means index
# --------------------------------------------------------------------------

_SEMDEDUP_T = 1_400_000  # int64 sq-dist on 1e-3-quantized coords


@register(
    "q254_semdedup",
    # SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    # mark near-duplicates ONLY within each cluster — the cluster bound
    # turns a corpus-quadratic pairwise scan into per-cluster bounded
    # work. A vector is removed when any LOWER-ID cluster-mate sits
    # within the distance threshold (one-pass epsilon-ball rule; the
    # lowest id in each dense ball survives as its representative).
    oracle="WITH "
    + _KM_QV_SQL
    + f", c0 AS (SELECT vec_id AS cid, q AS c FROM qv WHERE vec_id < {_IVF_K}),"
    + _km_assign_sql("c0", "a1")
    + ","
    + _km_update_sql("a1", "c1")
    + ","
    + _km_assign_sql("c1", "a2")
    + ","
    + _km_update_sql("a2", "c2")
    + ","
    + _km_assign_sql("c2", "a3")
    + f""",
    dup AS (
        SELECT DISTINCT b.vec_id
        FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE list_sum([(a.q[i] - b.q[i]) * (a.q[i] - b.q[i])
                        FOR i IN range(1, {_KM_DIM + 1})]) <= {_SEMDEDUP_T}
    )
    SELECT cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(*) FILTER (WHERE is_dup) AS BIGINT) AS n_removed,
           CAST(count(*) FILTER (WHERE NOT is_dup) AS BIGINT) AS n_kept,
           CAST(sum(vec_id) FILTER (WHERE NOT is_dup) AS BIGINT)
               AS kept_id_sum
    FROM (SELECT a.cid, a.vec_id, d.vec_id IS NOT NULL AS is_dup
          FROM a3 a LEFT JOIN dup d ON d.vec_id = a.vec_id)
    GROUP BY cid
    """,
    survey_ref="north-star dedup capstone: SemDeDup (Abbas et al. 2023) "
               "— semantic near-dup removal via cluster-then-dedup, the "
               "embedding-space twin of q145's MinHash-LSH canonical "
               "corpus (beside q92 cosine pairs / q212 k-means)",
    doc="SemDeDup: the q212 integer Lloyd loop (k=8, 2 iterations) "
        "partitions the embedding space; pairwise exact int64 distances "
        "are computed ONLY inside each cluster (self-join co-partitioned "
        "on the cluster key — per-cluster bounded quadratic, the same "
        "scale posture as q62's LSH band buckets); a vector whose "
        "distance to any lower-id cluster-mate is <= T is removed, the "
        "ball's minimum id survives. Output is the per-cluster audit "
        "(members/removed/kept + kept-id checksum). At 100 TB, k scales "
        "with corpus size to hold cluster cardinality constant, "
        "centroids stay broadcast-sized, and the only shuffles are the "
        "cluster-key hash partitions.",
)
def q254_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _km_quantize(spark, sf_dir)
    _, cent = _km_train(qv, _IVF_K, iters=2)
    # min-struct argmin (see _km_train): same winner, map-side combinable
    a3 = (
        qv.crossJoin(F.broadcast(cent))
        .withColumn("dist", _km_sq_dist())
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid", "q")).alias("s"))
        .select("vec_id", F.col("s.q").alias("q"), F.col("s.cid").alias("cid"))
    )
    # reused: both sides of the pair join + audit. Corpus-scaled wide rows
    # (q array) -> DISK_ONLY. No repartition: the vec_id window already
    # leaves well-spread shuffle partitions, and cid is K-cardinality —
    # repartitioning by it would create K fat partitions.
    a3 = checkpoint_big(a3)
    lo = a3.select(
        F.col("cid").alias("cid_l"),
        F.col("vec_id").alias("lo_id"),
        F.col("q").alias("q_l"),
    )
    dup = (
        a3.join(
            lo,
            (F.col("cid_l") == F.col("cid"))
            & (F.col("lo_id") < F.col("vec_id")),
        )
        .filter(_km_sq_dist("q", "q_l") <= _SEMDEDUP_T)
        .select("vec_id")
        .distinct()
    )
    flagged = a3.join(
        dup.withColumn("is_dup", F.lit(True)), "vec_id", "left"
    ).select(
        "cid", "vec_id", F.coalesce("is_dup", F.lit(False)).alias("is_dup")
    )
    return flagged.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count("*").cast("long").alias("n_members"),
        F.count_if("is_dup").cast("long").alias("n_removed"),
        F.count_if(~F.col("is_dup")).cast("long").alias("n_kept"),
        F.sum(F.when(~F.col("is_dup"), F.col("vec_id")))
        .cast("long")
        .alias("kept_id_sum"),
    )


# --------------------------------------------------------------------------
# Join-size estimation via Count-Min inner product (q259)
# --------------------------------------------------------------------------


@register(
    "q259_join_size_estimate",
    # the optimizer-statistics application of the sketch family: estimate
    # |R1 join R2 on user| WITHOUT running the join, as the Count-Min
    # inner product min_i sum_b cms1[i][b] * cms2[i][b] (AMS-style; can
    # only OVER-estimate). R1 = clicks, R2 = purchases — exactly the
    # cardinality a planner needs to size q179's stream-stream join
    # state. The exact value joins the two per-key count tables.
    oracle=f"""
    WITH r1 AS (SELECT user_id FROM events WHERE event_type = 'click'),
    r2 AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
    c1 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM r1
           GROUP BY user_id),
    c2 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM r2
           GROUP BY user_id),
    exact AS (
        SELECT CAST(coalesce(sum(c1.n * c2.n), 0) AS BIGINT) AS exact
        FROM c1 JOIN c2 ON c2.user_id = c1.user_id
    ),
    cms1 AS (
        SELECT i, bucket, CAST(count(*) AS BIGINT) AS n
        FROM ({" UNION ALL ".join(
            f"SELECT {i} AS i,"
            f" {_cms_bucket_sql(i, 'CAST(user_id AS VARCHAR)')} AS bucket"
            f" FROM r1" for i in range(_CMS_D)
        )}) GROUP BY i, bucket
    ),
    cms2 AS (
        SELECT i, bucket, CAST(count(*) AS BIGINT) AS n
        FROM ({" UNION ALL ".join(
            f"SELECT {i} AS i,"
            f" {_cms_bucket_sql(i, 'CAST(user_id AS VARCHAR)')} AS bucket"
            f" FROM r2" for i in range(_CMS_D)
        )}) GROUP BY i, bucket
    ),
    prods AS (
        SELECT a.i, CAST(sum(a.n * b.n) AS BIGINT) AS inner_product
        FROM cms1 a JOIN cms2 b ON b.i = a.i AND b.bucket = a.bucket
        GROUP BY a.i
    )
    SELECT e.exact,
           CAST(min(p.inner_product) AS BIGINT) AS estimate,
           CAST(min(p.inner_product) - e.exact AS BIGINT) AS overestimate,
           CAST(CASE WHEN e.exact = 0 THEN NULL
                     ELSE (min(p.inner_product) - e.exact) * 10000 // e.exact
                END AS BIGINT) AS rel_err_bp
    FROM prods p CROSS JOIN exact e
    GROUP BY e.exact
    """,
    survey_ref="warehouse/optimizer surface: join-cardinality estimation "
               "by Count-Min inner product (the AMS join-size sketch — "
               "completes q209's point estimates with the pairwise "
               "application a CBO actually runs)",
    doc="Join-size estimation without the join: each relation folds to a "
        "d x w Count-Min sketch (one map-side aggregate per side), and "
        "the estimate is min over hash rows of the bucket-wise inner "
        "product — sketch-width work, independent of data size, with a "
        "one-sided (over-estimate) error the output accounts exactly "
        "against the true cardinality. This is how a planner sizes "
        "q179's click x purchase join state before committing to a "
        "strategy. Both sketches merge by addition, so they maintain "
        "incrementally under streaming ingest.",
)
def q259_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    r1 = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").cast("string").alias("user_id")
    )
    r2 = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").cast("string").alias("user_id")
    )
    c1 = r1.groupBy("user_id").agg(F.count("*").cast("long").alias("n1"))
    c2 = r2.groupBy("user_id").agg(F.count("*").cast("long").alias("n2"))
    exact = (
        c1.join(c2, "user_id")
        .agg(
            F.coalesce(F.sum(F.col("n1") * F.col("n2")), F.lit(0))
            .cast("long")
            .alias("exact")
        )
    )

    def bucket(i: int, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(str(i)), col)), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    def sketch(r):
        # ONE scan per relation: every row fans out to its _CMS_D
        # (hash-row, bucket) pairs via a literal array explode — the
        # union-of-rescans formulation would read the source d times
        rows = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        bucket(i, F.col("user_id")).alias("bucket"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        )
        return (
            r.select(rows.alias("rb"))
            .select("rb.i", "rb.bucket")
            .groupBy("i", "bucket")
            .agg(F.count("*").cast("long").alias("n"))
        )

    cms1 = sketch(r1)
    cms2 = sketch(r2).withColumnRenamed("n", "n2")
    prods = (
        cms1.join(cms2, ["i", "bucket"])
        .groupBy("i")
        .agg(F.sum(F.col("n") * F.col("n2")).cast("long").alias("inner_product"))
    )
    est = prods.agg(F.min("inner_product").cast("long").alias("estimate"))
    return est.crossJoin(F.broadcast(exact)).select(
        "exact",
        "estimate",
        (F.col("estimate") - F.col("exact")).cast("long").alias("overestimate"),
        # exact = 0 (disjoint key sets) must degrade to NULL, not raise
        # DIVIDE_BY_ZERO under the session's ANSI mode
        F.when(
            F.col("exact") == 0, F.lit(None).cast("long")
        )
        .otherwise(
            F.floor(
                (F.col("estimate") - F.col("exact")) * 10000 / F.col("exact")
            ).cast("long")
        )
        .alias("rel_err_bp"),
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (q262)
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_LIST_K = 10
_RRF_TOPK = 5


@register(
    "q262_hybrid_rrf_fusion",
    # hybrid search: a dense (embedding top-10) and a lexical (shared-
    # shingle top-10) ranking fuse per query by reciprocal-rank fusion —
    # score = sum over lists of floor(1e6 / (60 + rank)), exact integer.
    # RRF needs only ranks, never score calibration, which is why it is
    # the standard hybrid fusion (Cormack et al. 2009).
    oracle="WITH "
    + _KM_QV_SQL
    + ","
    + _MINHASH_SH_SQL
    + f""",
    qset AS (SELECT vec_id AS qid, q AS qq FROM qv WHERE vec_id % 100 = 0),
    dense AS (
        SELECT qid, vec_id AS id, row_number() OVER (
            PARTITION BY qid ORDER BY list_sum([
                (v.q[i] - s.qq[i]) * (v.q[i] - s.qq[i])
                FOR i IN range(1, {_KM_DIM + 1})]), v.vec_id) AS rnk
        FROM qv v CROSS JOIN qset s
        WHERE v.vec_id <> s.qid
    ),
    densetop AS (SELECT qid, id, rnk FROM dense WHERE rnk <= {_RRF_LIST_K}),
    qsh AS (SELECT doc_id AS qid, shingle FROM sh WHERE doc_id % 100 = 0),
    ov AS (
        SELECT q.qid, s.doc_id AS id, CAST(count(*) AS BIGINT) AS n_shared
        FROM qsh q JOIN sh s ON s.shingle = q.shingle AND s.doc_id <> q.qid
        GROUP BY q.qid, s.doc_id
    ),
    lextop AS (
        SELECT qid, id, rnk FROM (
            SELECT qid, id, row_number() OVER (
                PARTITION BY qid ORDER BY n_shared DESC, id) AS rnk
            FROM ov
        ) WHERE rnk <= {_RRF_LIST_K}
    ),
    contrib AS (
        SELECT qid, id, 1000000 // ({_RRF_K} + rnk) AS c,
               1 AS in_d, 0 AS in_l
        FROM densetop
        UNION ALL
        SELECT qid, id, 1000000 // ({_RRF_K} + rnk), 0, 1 FROM lextop
    ),
    fused AS (
        SELECT qid, id, CAST(sum(c) AS BIGINT) AS rrf_scaled,
               CAST(max(in_d) AS BIGINT) AS in_dense,
               CAST(max(in_l) AS BIGINT) AS in_lexical
        FROM contrib GROUP BY qid, id
    )
    SELECT qid AS query_id, CAST(rn AS BIGINT) AS fused_rank,
           id AS doc_id, rrf_scaled, in_dense, in_lexical
    FROM (SELECT *, row_number() OVER (
              PARTITION BY qid ORDER BY rrf_scaled DESC, id) AS rn
          FROM fused)
    WHERE rn <= {_RRF_TOPK}
    """,
    survey_ref="north-star retrieval capstone: hybrid dense + lexical "
               "search fused by reciprocal-rank fusion (RRF, Cormack et "
               "al. 2009) — composes q65's dense top-k with the q63 "
               "shingle inverted index, the production RAG stack shape",
    doc="Hybrid RRF retrieval: per query, a dense embedding top-10 "
        "(exact int64 distances; the q215 IVF probe is the 100 TB drop-"
        "in) and a lexical top-10 (shared word-trigram count via the "
        "shingle inverted index — an equi-join, never all-pairs text "
        "comparison) fuse by reciprocal-rank fusion in exact scaled "
        "integers: floor(1e6/(60+rank)) summed across lists, so no "
        "score calibration between modalities is needed. Query set "
        "broadcasts; the lexical join keys on the shingle; the fused "
        "re-rank touches <= 2k rows per query. Each list's top-k is a "
        "per-query bounded window over its own candidate subset.",
)
def q262_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.queries.text_ops import _shingle_array

    qv = _km_quantize(spark, sf_dir)
    qset = qv.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    wq = W.partitionBy("qid").orderBy("dist", "vec_id")
    dense = (
        qv.crossJoin(F.broadcast(qset))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("dist", _km_sq_dist("q", "qq"))
        .withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= _RRF_LIST_K)
        .select("qid", F.col("vec_id").alias("id"), "rnk")
    )
    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(_shingle_array())).alias("shingle")
    )
    qsh = sh.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("qid"), "shingle"
    )
    ov = (
        qsh.join(sh.withColumnRenamed("doc_id", "id"), "shingle")
        .filter(F.col("id") != F.col("qid"))
        .groupBy("qid", "id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    wl = W.partitionBy("qid").orderBy(F.desc("n_shared"), "id")
    lextop = (
        ov.withColumn("rnk", F.row_number().over(wl))
        .filter(F.col("rnk") <= _RRF_LIST_K)
        .select("qid", "id", "rnk")
    )
    c = F.floor(F.lit(1000000) / (F.lit(_RRF_K) + F.col("rnk"))).cast("long")
    contrib = dense.select(
        "qid", "id", c.alias("c"), F.lit(1).alias("in_d"), F.lit(0).alias("in_l")
    ).unionByName(
        lextop.select(
            "qid", "id", c.alias("c"),
            F.lit(0).alias("in_d"), F.lit(1).alias("in_l"),
        )
    )
    fused = contrib.groupBy("qid", "id").agg(
        F.sum("c").cast("long").alias("rrf_scaled"),
        F.max("in_d").cast("long").alias("in_dense"),
        F.max("in_l").cast("long").alias("in_lexical"),
    )
    wf = W.partitionBy("qid").orderBy(F.desc("rrf_scaled"), "id")
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= _RRF_TOPK)
        .select(
            F.col("qid").alias("query_id"),
            F.col("rn").cast("long").alias("fused_rank"),
            F.col("id").alias("doc_id"),
            "rrf_scaled",
            "in_dense",
            "in_lexical",
        )
    )


# --------------------------------------------------------------------------
# Cluster-balanced sampling (q267)
# --------------------------------------------------------------------------

_CBAL_PER_CLUSTER = 20


@register(
    "q267_cluster_balanced_sample",
    # the DataComp/SemDeDup recipe's final step: sample the corpus
    # BALANCED across learned k-means strata (q144 stratifies on a
    # column; here the strata are trained). Per-cluster selection is
    # deterministic md5 priority — the same hash-sampling contract as
    # q125/q144, independent of partition layout.
    oracle="WITH "
    + _KM_QV_SQL
    + f", c0 AS (SELECT vec_id AS cid, q AS c FROM qv WHERE vec_id < {_IVF_K}),"
    + _km_assign_sql("c0", "a1")
    + ","
    + _km_update_sql("a1", "c1")
    + ","
    + _km_assign_sql("c1", "a2")
    + ","
    + _km_update_sql("a2", "c2")
    + ","
    + _km_assign_sql("c2", "a3")
    + f"""
    SELECT cid AS cluster_id, CAST(rnk AS BIGINT) AS rnk, vec_id
    FROM (
        SELECT cid, vec_id, row_number() OVER (
            PARTITION BY cid
            ORDER BY {_md5_long_sql("CAST(vec_id AS VARCHAR)")}, vec_id
        ) AS rnk
        FROM a3
    )
    WHERE rnk <= {_CBAL_PER_CLUSTER}
    """,
    survey_ref="north-star corpus shaping: cluster-balanced sampling — "
               "stratified selection over LEARNED k-means strata (the "
               "DataComp diversification step; q144 stratifies on a "
               "column, q254 dedups within the same clusters)",
    doc="Cluster-balanced sample: the q212 Lloyd loop assigns every "
        "vector its cluster, then each cluster contributes its top-20 "
        "by deterministic md5 priority — balanced representation "
        "across the learned embedding-space strata regardless of how "
        "skewed the raw cluster sizes are. One broadcast centroid "
        "assignment + one ranked window per cluster key; the md5 "
        "priority makes the sample reproducible under any partition "
        "layout (the q125 hash-sampling contract).",
)
def q267_cluster_balanced_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sciencebeam_parser_spark.queries.text_ops import _md5_long

    qv = _km_quantize(spark, sf_dir)
    _, cent = _km_train(qv, _IVF_K, iters=2)
    # min-struct argmin (see _km_train): same winner, map-side combinable
    a3 = (
        qv.crossJoin(F.broadcast(cent))
        .withColumn("dist", _km_sq_dist())
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).alias("s"))
        .select("vec_id", F.col("s.cid").alias("cid"))
    )
    wr = W.partitionBy("cid").orderBy(
        _md5_long(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        a3.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= _CBAL_PER_CLUSTER)
        .select(F.col("cid").alias("cluster_id"), "rnk", "vec_id")
    )


# --------------------------------------------------------------------------
# Embedding standardization (q268)
# --------------------------------------------------------------------------

# z*1e4 from exact integer moments, shared verbatim by both engines:
# (val*n - s) and (ss*n - s*s) are exact int64; the only float ops are
# one sqrt, one multiply, one divide and one floor — each IEEE-correctly
# rounded, so the doubles agree bit for bit. A constant dimension
# (variance 0) standardizes to 0 instead of dividing by zero.
_ZSTD_SQL = (
    "CASE WHEN ss * n - s * s = 0 THEN 0 "
    "ELSE CAST(floor(10000.0 * (val * n - s) "
    "/ (n * sqrt((ss * n - s * s) * 1.0 / (n * n)))) AS BIGINT) END"
)


@register(
    "q268_embedding_standardize",
    # the normalization pass every indexing/clustering pipeline runs
    # before q212/q215/q226: per-dimension z-scoring of the corpus
    # embeddings, with the statistics derived from EXACT integer sums
    # so both engines standardize identically.
    oracle="WITH "
    + _KM_QV_SQL
    + f""",
    flat AS (
        SELECT vec_id, CAST(i AS INT) AS pos, q[CAST(i AS INT)] AS val
        FROM qv, unnest(range(1, {_KM_DIM + 1})) t(i)
    ),
    stats AS (
        SELECT pos, CAST(sum(val) AS BIGINT) AS s,
               CAST(sum(val * val) AS BIGINT) AS ss,
               CAST(count(*) AS BIGINT) AS n
        FROM flat GROUP BY pos
    )
    SELECT f.vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           CAST(sum({_ZSTD_SQL}) AS BIGINT) AS z_checksum,
           CAST(min({_ZSTD_SQL}) AS BIGINT) AS z_min,
           CAST(max({_ZSTD_SQL}) AS BIGINT) AS z_max
    FROM flat f JOIN stats ON stats.pos = f.pos
    GROUP BY f.vec_id
    """,
    survey_ref="north-star embedding preprocessing: per-dimension "
               "z-score standardization (applies the q219 dim-stats "
               "pass — the whitening step before k-means/IVF/PQ "
               "training)",
    doc="Embedding standardization: per-dimension mean/variance derive "
        "from exact int64 sums (one 64-row aggregate, broadcast back), "
        "and each coordinate standardizes through a shared-text "
        "expression whose only float steps (sqrt, multiply, divide, "
        "floor) are IEEE-correctly rounded — both engines produce the "
        "same scaled-integer z everywhere, verified per-vector by "
        "checksum/min/max. Zero-variance dimensions standardize to 0 "
        "rather than raising under ANSI. One explode + one broadcast "
        "join + one re-aggregate; the stats relation is d rows at any "
        "corpus size.",
)
def q268_embedding_standardize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    qv = _km_quantize(spark, sf_dir)
    flat = qv.select(
        "vec_id", F.posexplode("q").alias("pos0", "val")
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "val")
    stats = flat.groupBy("pos").agg(
        F.sum("val").cast("long").alias("s"),
        F.sum(F.col("val") * F.col("val")).cast("long").alias("ss"),
        F.count("*").cast("long").alias("n"),
    )
    zi = F.expr(_ZSTD_SQL)
    return (
        flat.join(F.broadcast(stats), "pos")
        .groupBy("vec_id")
        .agg(
            F.count("*").cast("long").alias("n_dims"),
            F.sum(zi).cast("long").alias("z_checksum"),
            F.min(zi).cast("long").alias("z_min"),
            F.max(zi).cast("long").alias("z_max"),
        )
    )


# --------------------------------------------------------------------------
# In-context pretraining: similarity-ordered context packing
# --------------------------------------------------------------------------


@register(
    "q289_incontext_packing",
    # The q212 integer Lloyd loop assigns every document's embedding to a
    # cluster; within each cluster docs order by (distance-to-final-
    # centroid, doc_id) and pack into 512-token windows along that order
    # (q126's exclusive running sum, partitioned by cluster instead of
    # source shard). Every quantity is exact int64, so the unrolled
    # k-means + window restatement is bit-identical.
    oracle="WITH "
    + _KM_QV_SQL
    + ", c0 AS (SELECT vec_id AS cid, q AS c FROM qv WHERE vec_id < "
    + str(_KM_K)
    + "),"
    + _km_assign_sql("c0", "a1")
    + ","
    + _km_update_sql("a1", "c1")
    + ","
    + _km_assign_sql("c1", "a2")
    + ","
    + _km_update_sql("a2", "c2")
    + f""",
    scored AS (
        SELECT a.vec_id, a.cid,
               list_sum([(a.q[i] - c.c[i]) * (a.q[i] - c.c[i])
                         FOR i IN range(1, {_KM_DIM + 1})]) AS sq_dist
        FROM a2 a JOIN c2 c ON c.cid = a.cid
    ),
    counts AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    ordered AS (
        SELECT s.vec_id AS doc_id, s.cid AS cluster_id,
               CAST(s.sq_dist AS BIGINT) AS sq_dist, c.n_tokens,
               COALESCE(sum(c.n_tokens) OVER (
                   PARTITION BY s.cid ORDER BY s.sq_dist, s.vec_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS token_start
        FROM scored s JOIN counts c ON c.doc_id = s.vec_id
    )
    SELECT doc_id, cluster_id, sq_dist, n_tokens,
           CAST(token_start AS BIGINT) AS token_start,
           CAST(token_start // 512 AS BIGINT) AS pack_id,
           CAST(token_start % 512 AS BIGINT) AS pack_offset
    FROM ordered
    """,
    survey_ref="north-star training-data pipeline: in-context pretraining "
               "layout (Shi et al. 2023) — related documents packed into "
               "the same context window; composes q212 clustering with "
               "q126 packing",
    doc="Similarity-ordered context packing: the q212 integer k-means "
        "clusters the embedding space; within each cluster documents "
        "order by exact distance-to-centroid (ties by doc_id) and the "
        "q126 exclusive-running-sum packer cuts 512-token windows along "
        "that order, so each pretraining context holds semantically "
        "related documents instead of random ones. At 100 TB: centroids "
        "stay broadcast-sized (assignment is one broadcast join); the "
        "doc-token-count join is corpus-sized on both sides and becomes "
        "a keyed shuffle join beyond the auto-broadcast threshold; "
        "packing is one bounded window per cluster — and the cluster "
        "count is the parallelism lever (scale k ~ corpus/context-"
        "budget, the same sqrt(N)-family guidance as q93/q86).",
)
def q289_incontext_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.queries.corpus_ops import (
        pack_by_window,
        whitespace_token_count,
    )

    qv = _km_quantize(spark, sf_dir)
    assign, cent = _km_train(qv, _KM_K, iters=2)
    docs = table(spark, sf_dir, "documents")
    scored = (
        assign.join(F.broadcast(cent), "cid")
        .withColumn("sq_dist", _km_sq_dist())
        .select("vec_id", "cid", "sq_dist")
    )
    joined = scored.join(
        docs.select("doc_id", whitespace_token_count().alias("n_tokens")),
        scored.vec_id == F.col("doc_id"),
    )
    packed = pack_by_window(joined, "cid", ["sq_dist", "vec_id"])
    return packed.select(
        "doc_id",
        F.col("cid").alias("cluster_id"),
        F.col("sq_dist").cast("long").alias("sq_dist"),
        "n_tokens",
        "token_start",
        "pack_id",
        "pack_offset",
    )
