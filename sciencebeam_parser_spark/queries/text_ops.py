"""LLM-data-pipeline operators over ``documents`` / ``embeddings``
(north-star extensions, SURVEY §7 M9): deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search, and text analysis (language id,
quality scoring, token counting, fingerprinting).

Scale notes (100 TB):
* Exact dedup = hash groupBy on a normalized key — one shuffle, AQE-skew-safe.
* MinHash-LSH is the scale path for near-dup: candidate generation joins on
  (band_id, band_hash) buckets, never all-pairs. The n-gram Jaccard operator
  joins on shared shingles (inverted index), which is the exact-verification
  step one runs *after* LSH bucketing at scale; here it doubles as the oracle
  check for the planted near-duplicate pairs.
* Hash functions are md5-derived (not Spark's xxhash) so a SQL oracle can
  reproduce signatures bit-for-bit in any engine.
"""
from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries.registry import register, table

# Shared tokenization: lowercase, split on non-alphanumeric runs — mirrors
# the reference's get_regex_cleaned_layout_tokens norm + tokenizer
# (sciencebeam_parser/utils/tokenizer.py:10-27, app/parser.py:64-79).
_TOKEN_SPLIT = "[^a-z0-9]+"


def _words(col: str = "text") -> Column:
    arr = F.split(F.lower(F.trim(F.col(col))), _TOKEN_SPLIT)
    return F.filter(arr, lambda x: F.length(x) > 0)


# lambda-free form (single-arrow list_filter lambdas are deprecated in
# newer DuckDB): edge-strip + split, then a comprehension-IF drops empty
# entries. The IF is NOT redundant: for text with no alphanumerics at all
# (empty/whitespace/punctuation-only), split of the stripped empty string
# yields [''] — length 1 — while Spark's _words() yields []; the filter
# restores [] so the engines agree on every input, not just the current
# corpus.
_WORDS_SQL = (
    "[x FOR x IN string_split_regex(regexp_replace(trim(lower(text)),"
    " '(^[^a-z0-9]+)|([^a-z0-9]+$)', '', 'g'), '[^a-z0-9]+')"
    " IF x <> '']"
)


def _md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT — engine-portable hash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _md5_long_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------

@register(
    "q60_dedup_exact",
    oracle=f"""
    WITH normed AS (
        SELECT doc_id,
               md5(array_to_string({_WORDS_SQL}, ' ')) AS content_key
        FROM documents
    )
    SELECT doc_id, content_key,
           CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY content_key)
                THEN TRUE ELSE FALSE END AS is_canonical,
           CAST(count(*) OVER (PARTITION BY content_key) AS BIGINT) AS n_copies
    FROM normed
    """,
    survey_ref="north-star dedup (exact); §2B distinct/dedup",
    doc="Exact dedup by normalized-content hash: one shuffle on the content "
        "key; keeper = min doc_id per group. At 100 TB the md5 key (not the "
        "full text) is what shuffles.",
)
def q60_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    normed = docs.select(
        "doc_id", F.md5(F.array_join(_words(), " ")).alias("content_key")
    )
    w = W.partitionBy("content_key")
    return normed.select(
        "doc_id",
        "content_key",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
        F.count("*").over(w).cast("long").alias("n_copies"),
    )


def _shingle_array(col: str = "text") -> Column:
    """Word-trigram shingles as a pure array projection — no join, no
    shuffle: zip the word array against its two shifted slices and join each
    triple. The zip-of-slices form evaluates the (expensive) split() a
    constant number of times — indexing via get(arr, i) inside a transform
    lambda would re-evaluate it per element, quadratic per document.
    Null (→ explode drops the row) for docs with fewer than 3 words."""
    arr = _words(col)
    n = F.size(arr)
    z = F.arrays_zip(
        F.slice(arr, 1, n - 2).alias("a"),
        F.slice(arr, 2, n - 2).alias("b"),
        F.slice(arr, 3, n - 2).alias("c"),
    )
    return F.when(
        n >= 3,
        F.transform(z, lambda s: F.concat_ws(" ", s["a"], s["b"], s["c"])),
    ).otherwise(F.lit(None).cast("array<string>"))


# fixed 56-bit permutation constants, md5-derived so any engine can restate
# them; embedded as literals in the DuckDB oracle
_MINHASH_XOR_CONSTS = [
    int(hashlib.md5(f"perm:{i}".encode()).hexdigest()[:14], 16)
    for i in range(16)
]


def _minhash_signature(docs: DataFrame, n_hashes: int = 16) -> DataFrame:
    """doc_id → m0..m{n-1} min-hash columns over word 3-gram shingles.

    One shuffle total: shingles are an array projection (see
    _shingle_array), exploded and min-aggregated per doc with map-side
    partial aggregation. Duplicate shingles don't need dedup — min() is
    idempotent over duplicates. The n hash functions are ONE md5 per
    shingle XOR'd with n fixed 56-bit constants (16× less hashing than
    independent keyed md5s): each XOR is a bijection of the hash space, so
    each m_i ranks shingles in an independent-looking order — unlike
    Kirsch-Mitzenmacher h1+i*h2, whose per-i minimizers correlate across
    consecutive i and inflate LSH band collisions (measured 152 vs 28
    candidate pairs at sf0.001).
    """
    sh = docs.select("doc_id", F.explode(_shingle_array()).alias("shingle"))
    h1 = F.conv(F.substring(F.md5("shingle"), 1, 14), 16, 10).cast("long")
    hashed = sh.select("doc_id", h1.alias("h1"))
    aggs = [
        F.min(F.col("h1").bitwiseXOR(F.lit(c))).alias(f"m{i}")
        for i, c in enumerate(_MINHASH_XOR_CONSTS[:n_hashes])
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


_MINHASH_SH_SQL = """
    toks AS (
        SELECT doc_id,
               unnest(ws) AS w,
               unnest(range(1, len(ws)+1)) AS pos
        FROM (SELECT doc_id, {words} AS ws FROM documents)
    ),
    sh AS (
        SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
        FROM toks a
        JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    )
""".format(words=_WORDS_SQL)


# one md5 per shingle XOR'd with the 16 permutation constants (see
# _minhash_signature)
_MINHASH_SIG_SQL = """
    hashed AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS h1
        FROM sh
    ),
    sig AS (
        SELECT doc_id,
            {mins}
        FROM hashed GROUP BY doc_id
    )
""".format(
    mins=", ".join(
        f"CAST(min(xor(h1, {c})) AS BIGINT) AS m{i}"
        for i, c in enumerate(_MINHASH_XOR_CONSTS)
    )
)


@register(
    "q61_dedup_minhash_signature",
    oracle="WITH " + _MINHASH_SH_SQL + ", " + _MINHASH_SIG_SQL + """
    SELECT * FROM sig
    """,
    survey_ref="north-star dedup (MinHash); §2B grouped agg",
    doc="16-permutation MinHash signature over word-trigram shingles, "
        "md5-keyed so any engine reproduces it. Signature computation is a "
        "single groupBy(doc) — embarrassingly parallel.",
)
def q61_dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_signature(table(spark, sf_dir, "documents"))


_LSH_PAIRS_SQL = (
    _MINHASH_SH_SQL
    + ", "
    + _MINHASH_SIG_SQL
    + f""",
    bands AS (
        SELECT doc_id, band_idx,
               CASE band_idx
                   {" ".join(
                       f"WHEN {b} THEN md5(m{4*b} || ':' || m{4*b+1} || ':' "
                       f"|| m{4*b+2} || ':' || m{4*b+3})"
                       for b in range(4)
                   )}
               END AS band_hash
        FROM sig, unnest(range(0, 4)) AS t(band_idx)
    ),
    lsh_pairs AS (
        SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
        FROM bands x
        JOIN bands y ON x.band_idx = y.band_idx
                    AND x.band_hash = y.band_hash
                    AND x.doc_id < y.doc_id
    )
"""
)


@register(
    "q62_dedup_minhash_lsh_pairs",
    oracle="WITH " + _LSH_PAIRS_SQL + """
    SELECT doc1, doc2 FROM lsh_pairs
    """,
    survey_ref="north-star dedup (MinHash+LSH banding); §2B self-join",
    doc="LSH candidate pairs: 16 minhashes → 4 bands of 4; docs sharing any "
        "band bucket are candidates. The join is on (band_idx, band_hash) — "
        "at 100 TB this is the only near-dup join that scales (never "
        "all-pairs).",
)
def q62_dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One row per doc; checkpointed so the shingle-explode + 16-minhash
    # aggregate runs ONCE — as in q100, the (band) self-join broadcasts
    # one side, and ReuseExchange cannot dedup across a BroadcastExchange.
    sig = _minhash_signature(table(spark, sf_dir, "documents")).localCheckpoint(
        eager=False
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(":", f"m{4*b}", f"m{4*b+1}", f"m{4*b+2}", f"m{4*b+3}")
            ).alias("band_hash"),
        )
        for b in range(4)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_hash")
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc1"), F.col("y.doc_id").alias("doc2"))
        .distinct()
    )


@register(
    "q63_dedup_ngram_jaccard",
    oracle="WITH " + _MINHASH_SH_SQL + f""",
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS doc1, y.doc_id AS doc2,
               CAST(count(*) AS BIGINT) AS n_common
        FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT doc1, doc2, n_common,
           round(CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common), 4)
               AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE n_common * 5 >= (s1.n + s2.n - n_common) * 4
    """,
    survey_ref="north-star dedup (n-gram Jaccard verification); §2B self-join + agg",
    doc="Exact Jaccard >= 0.8 over word-trigram shingle sets via a FULL "
        "inverted shingle index (join on shingle) — the exhaustive exact "
        "baseline the approximate families verify against. Measured scale "
        "posture (BASELINE 'scale smoke'): at 10x data with dense clone "
        "families this costs ~|true pairs| x |shared shingles| intermediate "
        "rows regardless of candidate strategy (prefix filtering q211 "
        "cannot prune genuinely-similar pairs), so the 100 TB path is "
        "q62's banded LSH: bucket-bounded candidates verified on "
        "constant-size signatures (~20x cheaper at equal pair yield), with "
        "exact intersection reserved for the surviving candidates only.",
)
def q63_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # per-doc set semantics via array_distinct — a projection, replacing the
    # former global distinct() shuffle; set sizes likewise join-free.
    # Shingles are xxhash64-compressed BEFORE the join: the inverted-index
    # self-join then shuffles 8-byte longs instead of ~25-char strings
    # (3x narrower exchange, long equi-compare) — intersection counts are
    # unchanged (injective up to 2^-64 collisions), and the oracle compares
    # only the emitted doc pairs, never the internal key representation.
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.array_distinct(_shingle_array()), lambda s: F.xxhash64(s)
            )
        ).alias("shingle"),
    )
    sizes = docs.select(
        "doc_id",
        F.size(F.array_distinct(_shingle_array())).cast("long").alias("n"),
    ).filter(F.col("n") > 0)
    x, y = sh.alias("x"), sh.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(F.col("x.doc_id").alias("doc1"), F.col("y.doc_id").alias("doc2"))
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    union_n = F.col("s1.n") + F.col("s2.n") - F.col("n_common")
    jac = F.col("n_common") / union_n
    return (
        inter.join(F.broadcast(s1), F.col("doc1") == F.col("s1.doc_id"))
        .join(F.broadcast(s2), F.col("doc2") == F.col("s2.doc_id"))
        # integer-exact 0.8 threshold (4/5): pairs at exactly 0.8 resolve
        # identically on every engine/version — no float knife-edge
        .filter(F.col("n_common") * 5 >= union_n * 4)
        .select("doc1", "doc2", "n_common", F.round(jac, 4).alias("jaccard"))
    )


@register(
    "q64_dedup_simhash",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents
    ),
    bits AS (
        SELECT doc_id, j,
               sum(CASE WHEN (CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) >> j) % 2 = 1
                        THEN 1 ELSE -1 END) AS weight
        FROM words, unnest(range(0, 32)) AS t(j)
        GROUP BY doc_id, j
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN weight > 0
                         THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS simhash
    FROM bits GROUP BY doc_id
    """,
    survey_ref="north-star dedup (SimHash); §2B grouped agg + bit ops",
    doc="32-bit SimHash from md5 word hashes: bit j of the signature is the "
        "sign of the sum of per-word ±1 votes. Computed as ONE groupBy with "
        "32 sum aggregates (not a 32-way bit explode): partial aggregation "
        "runs map-side, the shuffle carries one 32-int row per (partition, "
        "doc) — at 100 TB the shuffle volume is O(docs), not O(words × 32). "
        "Near-dups then pair by small hamming distance (q100).",
)
def q64_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_words()).alias("w"))
    h32 = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    votes = words.select("doc_id", h32.alias("h")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"w{j}")
            for j in range(32)
        ]
    )
    simhash = None
    for j in range(32):
        term = F.when(F.col(f"w{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return votes.select("doc_id", simhash.cast("long").alias("simhash"))


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

# Brute-force index gate for q65: shared with ivf_topk's auto gate
# (similarity.MAX_BROADCAST_INDEX_CELLS, 64M float64 cells = 512 MB).
# Past this, q65 scores through the distributed self-join.
from sciencebeam_parser_spark.operators.similarity import (  # noqa: E402
    MAX_BROADCAST_INDEX_CELLS as Q65_MAX_INDEX_CELLS,
)


@register(
    "q65_similarity_topk",
    oracle="""
    WITH normed AS (
        SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               list_sum([a.v[i] * b.v[i] FOR i IN range(1, len(a.v)+1)])
               / (sqrt(list_sum([x*x FOR x IN a.v]))
                  * sqrt(list_sum([x*x FOR x IN b.v]))) AS cos
        FROM normed a JOIN normed b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cosine
    FROM (
        SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
               row_number() OVER (
            PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rn
        FROM pairs
    ) WHERE rn <= 5
    """,
    survey_ref="north-star similarity search (brute-force cosine top-k baseline)",
    doc="All-pairs cosine top-5 — the exact baseline. SIZE-GATED: when the "
        "index fits executor memory (n_rows × dim ≤ Q65_MAX_INDEX_CELLS) it "
        "runs as a broadcast index + Arrow-batched numpy matmul (one BLAS "
        "gemm per batch instead of 4M fold expressions); past the gate it "
        "falls back to the distributed all-pairs self-join with codegen'd "
        "unrolled dot products — slower, but no driver collect and no "
        "memory cliff. Ranking uses the 6-dp-rounded cosine so float "
        "summation order can't flip cross-engine ties (neighbor_id breaks "
        "them). The 100 TB path is LSH (q86) / banded candidates, same "
        "scoring.",
)
def q65_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    from sciencebeam_parser_spark.operators.similarity import (
        _dot_n,
        _norm_n,
        _as_double,
        index_probe,
    )

    n_rows, dim = index_probe(emb, "embedding")
    if n_rows * dim > Q65_MAX_INDEX_CELLS:
        # distributed exact fallback: all-pairs self-join, rank on the
        # 6-dp-rounded cosine — the same algebra the oracle states.
        base = emb.select(
            "vec_id", _as_double(F.col("embedding")).alias("v")
        ).withColumn("nrm", _norm_n(F.col("v"), dim))
        a, b = base.alias("a"), base.alias("b")
        pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(
                _dot_n(F.col("a.v"), F.col("b.v"), dim)
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cosine"),
        )
        w = W.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("query_id", "neighbor_id", "cosine")
        )
    # the corpus index is a broadcastable dimension (N×64 float64); queries
    # stream through mapInPandas and each Arrow batch does one gemm.
    # toPandas() here is SIZE-GATED above (plan-pinned in
    # tests/test_plan_quality.py).
    index_pdf = emb.toPandas()
    ids_all = index_pdf["vec_id"].to_numpy(dtype="int64")
    m = np.stack(index_pdf["embedding"].to_numpy()).astype("float64")
    m_normed = m / np.linalg.norm(m, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids_all, m_normed))

    def topk(batches):
        import numpy as np  # noqa: F811 — executor-side import
        import pandas as pd

        corpus_ids, corpus = bc.value
        for pdf in batches:
            q = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = np.round(q @ corpus.T, 6)
            out_q, out_n, out_c = [], [], []
            for i, qid in enumerate(pdf["vec_id"].to_numpy(dtype="int64")):
                mask = corpus_ids != qid
                cand_ids = corpus_ids[mask]
                cand_sims = sims[i][mask]
                order = np.lexsort((cand_ids, -cand_sims))[:5]
                out_q.extend([qid] * len(order))
                out_n.extend(cand_ids[order].tolist())
                out_c.extend(cand_sims[order].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    return emb.mapInPandas(
        topk, "query_id long, neighbor_id long, cosine double"
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "de", "et", "un"),
    "zh": ("de", "le", "shi", "bu", "wo"),
}


@register(
    "q66_language_id",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents
    ),
    sw AS (
        SELECT * FROM (VALUES {", ".join(
            f"('{lang}', '{w}')" for lang, ws in sorted(_STOPWORDS.items()) for w in ws
        )}) AS t(lang, w)
    ),
    hits AS (
        SELECT words.doc_id, sw.lang, CAST(count(*) AS BIGINT) AS n_hits
        FROM words JOIN sw ON words.w = sw.w
        GROUP BY 1, 2
    ),
    best AS (
        SELECT doc_id, lang, n_hits,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY n_hits DESC, lang ASC) AS rn
        FROM hits
    )
    SELECT d.doc_id,
           coalesce(b.lang, 'und') AS guessed_lang,
           CAST(coalesce(b.n_hits, 0) AS BIGINT) AS n_hits
    FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    """,
    survey_ref="north-star text analysis (language id); §2B broadcast join + mode",
    doc="Stopword-vote language id: explode words, broadcast-join the "
        "stopword gazetteer (the reference's TextLookUp pattern, "
        "lookup/__init__.py), plurality vote with deterministic tie-break.",
)
def q66_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_words()).alias("w"))
    sw = docs.sparkSession.createDataFrame(
        [(lang, w) for lang, ws in sorted(_STOPWORDS.items()) for w in ws],
        "lang string, w string",
    )
    hits = (
        words.join(F.broadcast(sw), "w")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n_hits"))
    )
    w_ = W.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("lang"))
    best = hits.withColumn("rn", F.row_number().over(w_)).filter(F.col("rn") == 1)
    return (
        docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lang", F.lit("und")).alias("guessed_lang"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
    )


@register(
    "q67_quality_score",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_actual,
               CAST(len({_WORDS_SQL}) AS BIGINT) AS n_tokens,
               CAST(length(text)
                    - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
                   AS n_digits,
               CAST(length(text)
                    - length(regexp_replace(text, '[^a-z ]', '', 'g')) AS BIGINT)
                   AS n_nonalpha
        FROM documents
    )
    SELECT doc_id, n_chars_actual, n_tokens,
           round(CAST(n_chars_actual AS DOUBLE) / n_tokens, 4) AS avg_token_len,
           round(CAST(n_digits AS DOUBLE) / n_chars_actual, 4) AS digit_ratio,
           round(CAST(n_nonalpha AS DOUBLE) / n_chars_actual, 4) AS nonalpha_ratio,
           CASE WHEN n_tokens >= 30
                 AND CAST(n_digits AS DOUBLE) / n_chars_actual < 0.3
                THEN TRUE ELSE FALSE END AS passes_quality
    FROM feat
    """,
    survey_ref="north-star text analysis (quality scoring); §2B string/math exprs",
    doc="Length / digit-ratio / token-stat quality gates — pure column "
        "expressions, whole-stage-codegen'd (no UDF).",
)
def q67_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("long")
    n_tokens = F.size(_words()).cast("long")
    n_digits = (
        F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    ).cast("long")
    n_nonalpha = (
        F.length("text") - F.length(F.regexp_replace("text", "[^a-z ]", ""))
    ).cast("long")
    feat = docs.select(
        "doc_id",
        n_chars.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        n_digits.alias("n_digits"),
        n_nonalpha.alias("n_nonalpha"),
    )
    return feat.select(
        "doc_id",
        "n_chars_actual",
        "n_tokens",
        F.round(F.col("n_chars_actual").cast("double") / F.col("n_tokens"), 4).alias(
            "avg_token_len"
        ),
        F.round(F.col("n_digits").cast("double") / F.col("n_chars_actual"), 4).alias(
            "digit_ratio"
        ),
        F.round(F.col("n_nonalpha").cast("double") / F.col("n_chars_actual"), 4).alias(
            "nonalpha_ratio"
        ),
        (
            (F.col("n_tokens") >= 30)
            & (F.col("n_digits").cast("double") / F.col("n_chars_actual") < 0.3)
        ).alias("passes_quality"),
    )


@register(
    "q68_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_WORDS_SQL}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({_WORDS_SQL})) AS BIGINT) AS n_unique,
           CAST(len([x FOR x IN {_WORDS_SQL} IF len(x) >= 5]) AS BIGINT)
               AS n_long_tokens,
           round(CAST(len(list_distinct({_WORDS_SQL})) AS DOUBLE)
                 / len({_WORDS_SQL}), 4) AS ttr
    FROM documents
    """,
    survey_ref="north-star text analysis (token counting); §2B array family",
    doc="Whitespace/regex token counts + type-token ratio, all as array "
        "expressions over the split column — the BPE-ish pre-count a "
        "training pipeline runs before tokenizer jobs.",
)
def q68_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    ws = _words()
    return docs.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_unique"),
        F.size(F.filter(ws, lambda x: F.length(x) >= 5)).cast("long").alias(
            "n_long_tokens"
        ),
        F.round(
            F.size(F.array_distinct(ws)).cast("double") / F.size(ws), 4
        ).alias("ttr"),
    )


@register(
    "q69_doc_fingerprint",
    oracle="""
    WITH grams AS (
        SELECT doc_id, substr(text, i, 16) AS gram
        FROM (SELECT doc_id, text, unnest(range(1, length(text) - 14)) AS i
              FROM documents)
    )
    SELECT doc_id,
           min(md5(gram)) AS fingerprint,
           CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct_grams
    FROM grams GROUP BY doc_id
    """,
    survey_ref="north-star text analysis (document fingerprinting / rolling hash)",
    doc="Winnowing-style fingerprint: min md5 over all 16-char substrings "
        "(the rolling-hash window), engine-portable by construction.",
)
def q69_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # docs shorter than the 16-char window emit NO row — the oracle's
    # empty range drops them, and Spark's sequence(1, len-15) would
    # otherwise auto-step DOWNWARD for len < 16 ([1, 0, ...]) and build
    # garbage grams from non-positive substr positions
    docs = table(spark, sf_dir, "documents").filter(F.length("text") >= 16)
    # both aggregates are per-document over the gram array → pure
    # projection (array_min / array_distinct), no explode, NO shuffle:
    # the 100 TB plan is a map-only scan
    grams = F.transform(
        F.sequence(F.lit(1), F.length("text") - 15),
        lambda i: F.col("text").substr(i, F.lit(16)),
    )
    # build the gram array ONCE and dedup BEFORE hashing: min(md5) over
    # duplicates equals min(md5) over the distinct set (md5 is a pure
    # function), so the md5 count drops to the distinct-gram count and
    # the array is constructed once instead of per-aggregate
    return docs.select(
        "doc_id", F.array_distinct(grams).alias("g")
    ).select(
        "doc_id",
        F.array_min(F.transform("g", F.md5)).alias("fingerprint"),
        F.size("g").cast("long").alias("n_distinct_grams"),
    )


# --------------------------------------------------------------------------
# ANN scale path (single-table LSH variant, oracle-checked)
# --------------------------------------------------------------------------

def _ann_oracle_sql(n_planes: int = 8) -> str:
    coeff = (
        "(CAST('0x' || substr(md5(CAST({p} AS VARCHAR) || ':' "
        "|| CAST(i AS VARCHAR)), 1, 15) AS BIGINT) / 1152921504606846976.0 - 0.5)"
    )
    projs = ", ".join(
        "list_sum([v[i] * " + coeff.format(p=p) + " FOR i IN range(1, len(v)+1)])"
        f" AS proj{p}"
        for p in range(n_planes)
    )
    bucket = " + ".join(
        f"(CASE WHEN proj{p} > 0 THEN {2**p} ELSE 0 END)" for p in range(n_planes)
    )
    return f"""
    WITH vecs AS (
        SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
    ),
    projected AS (SELECT vec_id, v, {projs} FROM vecs),
    bucketed AS (
        SELECT vec_id, v,
               sqrt(list_sum([x*x FOR x IN v])) AS nrm,
               CAST({bucket} AS BIGINT) AS bucket
        FROM projected
    ),
    pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
               list_sum([a.v[i] * b.v[i] FOR i IN range(1, len(a.v)+1)])
               / (a.nrm * b.nrm) AS cos
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, bucket, round(cos, 6) AS cosine
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
        FROM pairs
    ) WHERE rn <= 5
    """


@register(
    "q86_similarity_ann_lsh",
    oracle=_ann_oracle_sql(),
    survey_ref="north-star similarity search (LSH-bucketed ANN scale path)",
    doc="Single-table random-hyperplane LSH top-5: bucket = 8 sign bits of "
        "md5-derived hyperplane projections; candidates join on the bucket "
        "(the shuffle key at scale), scored by exact cosine within bucket. "
        "operators/similarity.py adds the multi-table variant for recall. "
        "SCALE LEVER (100x smoke): per-bucket cost is quadratic, so "
        "n_planes must grow ~log2(N / target_bucket_size) — fixed 8-bit "
        "buckets stalled at 200k vectors (>580 s), 14-16 planes finished "
        "in ~160-200 s. The registered query keeps 8 so the sf0.01 "
        "oracle stays meaningful.",
)
def q86_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.similarity import add_lsh_bucket

    emb = table(spark, sf_dir, "embeddings")
    bucketed = add_lsh_bucket(emb, n_planes=8).withColumn(
        "nrm",
        F.sqrt(
            F.aggregate(
                F.transform("v", lambda x: x * x), F.lit(0.0), lambda s, x: s + x
            )
        ),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    dot = F.aggregate(
        F.zip_with("a.v", "b.v", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("query_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.col("a.bucket").alias("bucket"),
        (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "bucket", F.round("cos", 6).alias("cosine"))
    )


def _near_dup_oracle_sql(threshold: float = 0.25, n_planes: int = 8) -> str:
    base = _ann_oracle_sql(n_planes)
    head = base.split("SELECT query_id, neighbor_id, bucket, round")[0]
    return head + f"""
    SELECT query_id AS keep_id, neighbor_id AS dup_id, bucket,
           round(cos, 6) AS cosine
    FROM pairs
    WHERE round(cos, 6) >= {threshold} AND query_id < neighbor_id
    """


@register(
    "q92_dedup_embedding_cosine",
    oracle=_near_dup_oracle_sql(),
    survey_ref="north-star dedup (embedding-cosine near-dup, LSH-bucketed)",
    doc="Embedding near-duplicate pairs: candidates from the same LSH "
        "bucket (the scale shuffle key — never all-pairs), kept when exact "
        "within-bucket cosine ≥ 0.25; query_id < neighbor_id keeps each "
        "undirected pair once (canonical keep/dup orientation for the "
        "dedup decision).",
)
def q92_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.similarity import add_lsh_bucket

    emb = table(spark, sf_dir, "embeddings")
    bucketed = add_lsh_bucket(emb, n_planes=8).withColumn(
        "nrm",
        F.sqrt(
            F.aggregate(
                F.transform("v", lambda x: x * x), F.lit(0.0), lambda s, x: s + x
            )
        ),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    dot = F.aggregate(
        F.zip_with("a.v", "b.v", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("keep_id"),
            F.col("b.vec_id").alias("dup_id"),
            F.col("a.bucket").alias("bucket"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.25)
    )


def _ivf_oracle_sql(k: int = 5, n_centroids: int = 8, n_probe: int = 2) -> str:
    return f"""
    WITH vecs AS (
        SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v,
               sqrt(list_sum([CAST(x AS DOUBLE)*x FOR x IN embedding])) AS nrm
        FROM embeddings
    ),
    cents AS (
        SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
        FROM vecs ORDER BY vec_id LIMIT {n_centroids}
    ),
    assign AS (
        SELECT vec_id, cent_id, ccos,
               row_number() OVER (
                   PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crank
        FROM (
            SELECT a.vec_id, c.cent_id,
                   round(list_sum([a.v[i] * c.cv[i] FOR i IN range(1, len(a.v)+1)])
                         / (a.nrm * c.cnrm), 6) AS ccos
            FROM vecs a CROSS JOIN cents c
        )
    ),
    members AS (
        SELECT vec_id AS member_id, cent_id AS cluster_id
        FROM assign WHERE crank = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, cent_id AS cluster_id
        FROM assign WHERE crank <= {n_probe}
    ),
    scored AS (
        SELECT p.query_id, m.member_id AS neighbor_id,
               round(list_sum([qa.v[i] * qb.v[i] FOR i IN range(1, len(qa.v)+1)])
                     / (qa.nrm * qb.nrm), 6) AS cosine
        FROM probes p
        JOIN members m ON p.cluster_id = m.cluster_id
                      AND m.member_id <> p.query_id
        JOIN vecs qa ON qa.vec_id = p.query_id
        JOIN vecs qb ON qb.vec_id = m.member_id
    )
    SELECT query_id, neighbor_id, cosine
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
        FROM scored
    ) WHERE rn <= {k}
    """


@register(
    "q93_similarity_ivf_topk",
    oracle=_ivf_oracle_sql(),
    survey_ref="north-star similarity search (IVF scale path)",
    doc="Seeded-IVF approximate top-5: vectors assigned to their nearest of "
        "8 centroids (broadcast dim — no fact shuffle for assignment); each "
        "query probes its 2 nearest clusters and scores exact cosine against "
        "members only. cluster_id is the shuffle key at scale; cosines "
        "rounded to 6 dp before ranking for cross-engine determinism.",
)
def q93_similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.similarity import ivf_topk

    return ivf_topk(
        table(spark, sf_dir, "embeddings"), k=5, n_centroids=8, n_probe=2
    )


_SIMHASH_CTE = f"""
    words AS (
        SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents
    ),
    bits AS (
        SELECT doc_id, j,
               sum(CASE WHEN (CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) >> j) % 2 = 1
                        THEN 1 ELSE -1 END) AS weight
        FROM words, unnest(range(0, 32)) AS t(j)
        GROUP BY doc_id, j
    ),
    sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN weight > 0
                             THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS simhash
        FROM bits GROUP BY doc_id
    )
"""


@register(
    "q100_dedup_simhash_pairs",
    oracle="WITH " + _SIMHASH_CTE + """,
    chunks AS (
        SELECT doc_id, simhash, b AS band_idx,
               (simhash >> (8 * b)) & 255 AS chunk
        FROM sig, unnest(range(0, 4)) AS t(b)
    )
    SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2,
           CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
    FROM chunks x
    JOIN chunks y ON x.band_idx = y.band_idx AND x.chunk = y.chunk
                 AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
    """,
    survey_ref="north-star dedup (SimHash near-dup pairs); §2B self-join + bit ops",
    doc="SimHash near-duplicates: 32-bit signatures band into 4 bytes; by "
        "pigeonhole any pair with hamming ≤ 3 shares an identical byte, so "
        "the (band, chunk) equi-join finds all of them without an all-pairs "
        "scan — the banding join IS the 100 TB plan; hamming filter is "
        "bit_count(xor) on the candidates.",
)
def q100_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One row per doc; checkpointed so the words-explode + 32-vote
    # aggregate runs ONCE — the self-join otherwise duplicates the whole
    # subtree (ReuseExchange cannot fire across the BroadcastExchange).
    sig = q64_dedup_simhash(spark, sf_dir).localCheckpoint(eager=False)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_idx"),
    ).withColumn(
        "chunk", F.expr("(simhash >> (8 * band_idx)) & 255")
    )
    x, y = chunks.alias("x"), chunks.alias("y")
    hamming = F.expr("bit_count(x.simhash ^ y.simhash)")
    return (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .filter(hamming <= 3)
        .select(
            F.col("x.doc_id").alias("doc1"),
            F.col("y.doc_id").alias("doc2"),
            hamming.cast("long").alias("hamming"),
        )
        .distinct()
    )


@register(
    "q110_dedup_clusters",
    oracle="WITH RECURSIVE " + _LSH_PAIRS_SQL + """,
    sym AS (
        SELECT doc1 AS a, doc2 AS b FROM lsh_pairs
        UNION
        SELECT doc2 AS a, doc1 AS b FROM lsh_pairs
    ),
    reach(node, lab) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM sym)
        UNION
        SELECT s.a, r.lab FROM sym s JOIN reach r ON s.b = r.node
    )
    SELECT node AS doc_id, CAST(min(lab) AS BIGINT) AS component_id
    FROM reach GROUP BY node
    """,
    survey_ref="north-star dedup (pairs → transitive groups); §2B "
               "iterative algorithm surface (driver-loop DAG, A28 analog)",
    doc="Dedup GROUPS from LSH candidate pairs: connected components by "
        "iterative min-label propagation (join + agg per round, "
        "localCheckpoint cuts lineage; rounds ≈ diameter, O(log n) on "
        "near-dup chains). component_id = smallest doc_id in the group — "
        "the canonical keeper. Oracle: the same fixpoint as a recursive "
        "CTE (min reachable node).",
)
def q110_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.graph import connected_components

    pairs = q62_dedup_minhash_lsh_pairs(spark, sf_dir)
    return connected_components(pairs)


@register(
    "q115_kmv_distinct_sketch",
    oracle=f"""
    WITH words AS (
        SELECT DISTINCT source, unnest({_WORDS_SQL}) AS w FROM documents
    ),
    hashed AS (
        SELECT DISTINCT source,
               CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)
                   / 1152921504606846976.0 AS h
        FROM words
    ),
    ranked AS (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM hashed
    ),
    kth AS (SELECT source, h AS h_k FROM ranked WHERE rn = 16),
    exact AS (
        SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct
        FROM words GROUP BY source
    )
    SELECT exact.source,
           exact.exact_distinct,
           round(15.0 / kth.h_k, 4) AS kmv_estimate
    FROM exact JOIN kth ON exact.source = kth.source
    """,
    survey_ref="§2B count(distinct)/approx_count_distinct; custom sketch "
               "as a composition of existing ops (engine extension)",
    doc="K-minimum-values distinct sketch (k=16): per-source distinct "
        "words hashed to [0,1), the k-th smallest hash h_k gives the "
        "estimator (k-1)/h_k. Unlike HLL (engine-specific registers, not "
        "oracle-portable) KMV is DETERMINISTIC given the hash, so DuckDB "
        "reproduces it exactly — and it merges by unioning min-k sets, "
        "the property that makes it a partial-aggregatable sketch at "
        "100 TB. Exact count(distinct) emitted alongside for calibration.",
)
def q115_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(_words()).alias("w")
    ).distinct()
    hashed = words.select(
        "source", (_md5_long(F.col("w")) / F.lit(float(2**60))).alias("h")
    ).distinct()
    w_ = W.partitionBy("source").orderBy("h")
    kth = (
        hashed.withColumn("rn", F.row_number().over(w_))
        .filter(F.col("rn") == 16)
        .select("source", F.col("h").alias("h_k"))
    )
    exact = words.groupBy("source").agg(
        F.count("*").alias("exact_distinct")
    )
    return exact.join(kth, "source").select(
        "source",
        "exact_distinct",
        F.round(F.lit(15.0) / F.col("h_k"), 4).alias("kmv_estimate"),
    )
