"""Corpus-preparation operators for a training-data pipeline: deterministic
sampling and context-window sequence packing, plus the segmented model
endpoint chain (§3.3).

These extend the north-star LLM-pipeline family (dedup/similarity/text
analysis in text_ops) with the two remaining corpus-shaping steps every
large-scale pretraining ETL needs:

* corpus sampling — hash-bucketed, so it is deterministic, re-runnable, and
  stratifiable by any key (the antithesis of TABLESAMPLE, whose row picks
  are partition-count-dependent); at 100 TB a filter on a hash of the key
  column is embarrassingly parallel, shuffle-free, and composes with
  partition pruning.
* sequence packing — the GPT-style "concatenate the token stream, chunk
  into fixed windows" step, expressed as a running-sum window + integer
  division. Partitioned by `source` (the corpus shard key), so window state
  is bounded per shard and shards pack independently — the same layout a
  1000-executor job would use.

Both carry exact DuckDB oracles (md5-derived hashes, engine-portable; see
text_ops._md5_long).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries.docpipe import _TOKENS_CTE, _tokens
from sciencebeam_parser_spark.queries.registry import register, table


def whitespace_token_count(col: str = "text"):
    """The engine's canonical whitespace token count — q126 packing, q289
    in-context packing, and their oracles all count tokens this way."""
    return F.size(F.split(F.trim(col), r"\s+")).cast("long")


def pack_by_window(counts: DataFrame, partition_col, order_cols,
                   window_tokens: int = 512) -> DataFrame:
    """Concat-and-chunk sequence packing: exclusive running sum of
    ``n_tokens`` along (partition, order) → token_start / pack_id /
    pack_offset. Shared by q126 (per source shard, doc order) and q289
    (per embedding cluster, centroid-distance order) so the packing
    arithmetic cannot drift between them."""
    w = W.partitionBy(partition_col).orderBy(*order_cols)
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    return counts.select(
        "*",
        start.alias("token_start"),
        F.floor(start / F.lit(window_tokens)).cast("long").alias("pack_id"),
        (start % F.lit(window_tokens)).cast("long").alias("pack_offset"),
    )


# Literal-space tokens for the segmented-chain queries (q124/q127): the
# driver hash-compares these two across engine versions it controls, so they
# use ONLY version-proof constructs — a non-regex single-space split (the
# corpus text is single-space joined; verified no other whitespace exists),
# no regex classes, no assembled long-string channel, plain alnum tag
# values, explicit BIGINT casts. The general-purpose regex tokenizer stays
# in docpipe._TOKENS_CTE for everything else.
_LIT_TOKENS_CTE = """
    tokens AS (
        SELECT doc_id,
               CAST(pos AS BIGINT) AS token_seq,
               tok AS token
        FROM (
            SELECT doc_id,
                   unnest(string_split(trim(text), ' ')) AS tok,
                   unnest(range(1, len(string_split(trim(text), ' ')) + 1))
                       AS pos
            FROM documents
        )
    )
"""


def _lit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # F.split's pattern is a Java regex, but a single literal space has no
    # metacharacters — byte-identical to DuckDB's non-regex string_split.
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), " ", -1)).alias("pos", "token"),
    ).select(
        "doc_id", (F.col("pos") + 1).cast("long").alias("token_seq"), "token"
    )


@register(
    "q124_segmented_model_chain",
    # the SegmentedModelRouterFactory flow with mock labels: segmentation
    # assigns regions by document fraction, the chain keeps only header
    # tokens, re-labels them (first 3 → title), and groups BIO runs —
    # filter → semi-join-style region gate → window relabel → islands.
    # Runs are reported by (token_start, token_end) span, not assembled
    # text: the span determines the text exactly, and integer channels
    # cannot hit engine-version string canonicalization drift.
    oracle="WITH " + _LIT_TOKENS_CTE + """,
    seg AS (
        SELECT doc_id, token_seq, token,
               CASE WHEN (token_seq - 1) * 10
                         < count(*) OVER (PARTITION BY doc_id) * 3
                    THEN 'header' ELSE 'other' END AS region
        FROM tokens
    ),
    hdr AS (
        SELECT doc_id, token_seq, token,
               CASE WHEN row_number() OVER (
                        PARTITION BY doc_id ORDER BY token_seq) <= 3
                    THEN 'title' ELSE 'abstract' END AS tag
        FROM seg WHERE region = 'header'
    ),
    flagged AS (
        SELECT *, CASE WHEN lag(tag) OVER w IS NULL
                         OR tag <> lag(tag) OVER w THEN 1 ELSE 0 END AS b
        FROM hdr
        WINDOW w AS (PARTITION BY doc_id ORDER BY token_seq)
    ),
    grouped AS (
        SELECT *, sum(b) OVER (
            PARTITION BY doc_id ORDER BY token_seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS entity_group
        FROM flagged
    )
    SELECT doc_id, CAST(entity_group AS BIGINT) AS entity_group,
           min(tag) AS tag,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(min(token_seq) AS BIGINT) AS token_start,
           CAST(max(token_seq) AS BIGINT) AS token_end
    FROM grouped GROUP BY doc_id, entity_group
    """,
    survey_ref="§3.3 segmented model endpoints (service/api/routers/"
               "models.py SegmentedModelRouterFactory: segmentation → "
               "label filter → downstream model); §2A A14/A15",
    doc="Two-model chain: segmentation regions by document fraction, "
        "header-region filter, header-model relabel, BIO runs — the "
        "segmented endpoint flow as pure window SQL. Entity runs are "
        "reported as (token_start, token_end) spans.",
)
def q124_segmented_model_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.bio import group_bio_entities

    toks = _lit_tokens(spark, sf_dir)
    n = F.count("*").over(W.partitionBy("doc_id"))
    # integer-exact 30% gate: (seq-1)/n < 0.3 restated as (seq-1)*10 < n*3
    # so exact-boundary tokens (ratio == 0.3) resolve identically on every
    # engine/version — no float/decimal division knife-edge.
    region = F.when(
        (F.col("token_seq") - 1) * 10 < n * 3, "header"
    ).otherwise("other")
    header = toks.withColumn("region", region).filter(
        F.col("region") == "header"
    )
    w = W.partitionBy("doc_id").orderBy("token_seq")
    tag = F.when(F.row_number().over(w) <= 3, "title").otherwise("abstract")
    labeled = header.select(
        "doc_id",
        "token_seq",
        F.concat(F.lit("I-"), tag).alias("label"),
    )
    runs = group_bio_entities(labeled)
    return runs.select(
        "doc_id",
        F.col("entity_group").cast("long").alias("entity_group"),
        "tag",
        "n_tokens",
        F.col("token_start").cast("long").alias("token_start"),
        F.col("token_end").cast("long").alias("token_end"),
    )


@register(
    "q125_corpus_sample",
    # 60-bit md5 bucket of the doc key; keep bucket < 20 of 100. Same hash
    # literal on both engines (conv hex→dec vs '0x' cast).
    oracle="""
    SELECT doc_id, source,
           CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                     AS BIGINT) % 100 AS BIGINT) AS sample_bucket
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 100 < 20
    """,
    survey_ref="north-star training-data pipeline: deterministic corpus "
               "subsampling (engine-general; motivated by A30 corpus ETL)",
    doc="Deterministic 20% corpus sample via md5 bucketing on the document "
        "key: re-runnable, partition-layout-independent (unlike "
        "TABLESAMPLE), shuffle-free, and stratifiable by replacing the "
        "hash key.",
)
def q125_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    return (
        docs.withColumn("sample_bucket", bucket)
        .filter(F.col("sample_bucket") < 20)
        .select("doc_id", "source", "sample_bucket")
    )


@register(
    "q126_sequence_packing",
    # pack_id = floor(exclusive-prefix-token-count / window); windows are
    # per source shard, docs ordered by doc_id — the concat-then-chunk
    # token-stream layout used for LLM pretraining batches.
    oracle="""
    WITH counts AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT *,
               COALESCE(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS token_start
        FROM counts
    )
    SELECT doc_id, source, n_tokens,
           CAST(token_start AS BIGINT) AS token_start,
           CAST(token_start // 512 AS BIGINT) AS pack_id,
           CAST(token_start % 512 AS BIGINT) AS pack_offset
    FROM packed
    """,
    survey_ref="north-star training-data pipeline: context-window sequence "
               "packing (concat-and-chunk); §2B running-sum window",
    doc="Pack each source's token stream into 512-token context windows: "
        "exclusive running sum of per-doc token counts → window id and "
        "offset. Per-shard windows keep state bounded; shards pack "
        "independently at any scale.",
)
def q126_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id", "source", whitespace_token_count().alias("n_tokens")
    )
    return pack_by_window(counts, "source", ["doc_id"]).select(
        "doc_id", "source", "n_tokens", "token_start", "pack_id",
        "pack_offset",
    )


@register(
    "q127_name_header_chain",
    # §3.3's deepest endpoint chains THREE models; with deterministic
    # relabeling each stage is a filter + window over the previous one:
    # segmentation (doc-fraction regions) → header (first-8 relabel, keep
    # author) → name (parity relabel, digit tokens → marker) → BIO islands.
    # Version-proof construction like q124: literal-space tokens, the digit
    # test via translate() (no regex class), span channels instead of
    # assembled text, plain alnum tags, BIGINT casts.
    oracle="WITH " + _LIT_TOKENS_CTE + """,
    seg AS (
        SELECT doc_id, token_seq, token,
               CASE WHEN (token_seq - 1) * 10
                         < count(*) OVER (PARTITION BY doc_id) * 3
                    THEN 'header' ELSE 'other' END AS region
        FROM tokens
    ),
    hdr AS (
        SELECT doc_id, token_seq, token,
               CASE WHEN row_number() OVER (
                        PARTITION BY doc_id ORDER BY token_seq) <= 8
                    THEN 'author' ELSE 'abstract' END AS hdr_tag
        FROM seg WHERE region = 'header'
    ),
    name_in AS (
        SELECT doc_id, token_seq, token,
               CASE WHEN token <> ''
                         AND translate(token, '0123456789', '') = ''
                    THEN 'marker'
                    WHEN row_number() OVER (
                        PARTITION BY doc_id ORDER BY token_seq) % 2 = 1
                    THEN 'forename' ELSE 'surname' END AS tag
        FROM hdr WHERE hdr_tag = 'author'
    ),
    flagged AS (
        SELECT *, CASE WHEN lag(tag) OVER w IS NULL
                         OR tag <> lag(tag) OVER w THEN 1 ELSE 0 END AS b
        FROM name_in
        WINDOW w AS (PARTITION BY doc_id ORDER BY token_seq)
    ),
    grouped AS (
        SELECT *, sum(b) OVER (
            PARTITION BY doc_id ORDER BY token_seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS entity_group
        FROM flagged
    )
    SELECT doc_id, CAST(entity_group AS BIGINT) AS entity_group,
           min(tag) AS tag,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(min(token_seq) AS BIGINT) AS token_start,
           CAST(max(token_seq) AS BIGINT) AS token_end
    FROM grouped GROUP BY doc_id, entity_group
    """,
    survey_ref="§3.3 name-header endpoint (service/api/routers/models.py "
               "chains segmentation → header → name); §2A A14/A15/A16",
    doc="Three-model chain with deterministic relabeling at each stage — "
        "every hop is a filter + window over the previous model's "
        "label-gated view, the cascade's region-gating pattern twice "
        "nested. Entity runs reported as (token_start, token_end) spans.",
)
def q127_name_header_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.bio import group_bio_entities

    toks = _lit_tokens(spark, sf_dir)
    n = F.count("*").over(W.partitionBy("doc_id"))
    # integer-exact 30% gate (see q124): no float division at the boundary
    header = toks.withColumn(
        "region",
        F.when((F.col("token_seq") - 1) * 10 < n * 3, "header").otherwise(
            "other"
        ),
    ).filter(F.col("region") == "header")
    w = W.partitionBy("doc_id").orderBy("token_seq")
    authors = header.withColumn(
        "hdr_tag",
        F.when(F.row_number().over(w) <= 8, "author").otherwise("abstract"),
    ).filter(F.col("hdr_tag") == "author")
    is_digits = (F.col("token") != "") & (
        F.translate(F.col("token"), "0123456789", "") == ""
    )
    name_tag = (
        F.when(is_digits, "marker")
        .when(F.row_number().over(w) % 2 == 1, "forename")
        .otherwise("surname")
    )
    labeled = authors.select(
        "doc_id",
        "token_seq",
        F.concat(F.lit("I-"), name_tag).alias("label"),
    )
    runs = group_bio_entities(labeled)
    return runs.select(
        "doc_id",
        F.col("entity_group").cast("long").alias("entity_group"),
        "tag",
        "n_tokens",
        F.col("token_start").cast("long").alias("token_start"),
        F.col("token_end").cast("long").alias("token_end"),
    )


# --- q124 bisection probes -------------------------------------------------
# q124/q127 hash-mismatched under the driver's harness (rounds 1+3) while
# passing the local DuckDB mimic. Root cause analysis points at the
# `(token_seq-1.0)/n < 0.3` float gate: 48 tokens at sf0.01 sit EXACTLY on
# ratio 0.3 (docs of 10/20 tokens put them inside the header window), so an
# engine-version difference in decimal-vs-double division flips them. The
# gate is now integer-exact; these two sliced probes remain so that if the
# driver still disagrees, the next CORRECTNESS file says which column.

_SEG_GATE_CTE = _TOKENS_CTE + """,
    seg AS (
        SELECT doc_id, token_seq, token,
               CASE WHEN (token_seq - 1) * 10
                         < count(*) OVER (PARTITION BY doc_id) * 3
                    THEN '<header>' ELSE '<other>' END AS region
        FROM tokens
    ),
    hdr AS (
        SELECT doc_id, token_seq, token,
               CASE WHEN row_number() OVER (
                        PARTITION BY doc_id ORDER BY token_seq) <= 3
                    THEN '<title>' ELSE '<abstract>' END AS tag
        FROM seg WHERE region = '<header>'
    ),
    flagged AS (
        SELECT *, CASE WHEN lag(tag) OVER w IS NULL
                         OR tag <> lag(tag) OVER w THEN 1 ELSE 0 END AS b
        FROM hdr
        WINDOW w AS (PARTITION BY doc_id ORDER BY token_seq)
    ),
    grouped AS (
        SELECT *, sum(b) OVER (
            PARTITION BY doc_id ORDER BY token_seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS entity_group
        FROM flagged
    )
"""


def _q124_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.bio import group_bio_entities

    toks = _tokens(spark, sf_dir)
    n = F.count("*").over(W.partitionBy("doc_id"))
    header = toks.withColumn(
        "region",
        F.when((F.col("token_seq") - 1) * 10 < n * 3, "<header>").otherwise(
            "<other>"
        ),
    ).filter(F.col("region") == "<header>")
    w = W.partitionBy("doc_id").orderBy("token_seq")
    tag = F.when(F.row_number().over(w) <= 3, "<title>").otherwise(
        "<abstract>"
    )
    labeled = header.select(
        "doc_id",
        "token_seq",
        F.col("token").alias("text"),
        F.concat(F.lit("I-"), tag).alias("label"),
    )
    return group_bio_entities(labeled, text_col="text")


@register(
    "q154_seg_chain_gate_probe",
    # q124 minus the text column: isolates the region-gate/window numbering
    # path from the ordered-string-assembly path.
    oracle="WITH " + _SEG_GATE_CTE + """
    SELECT doc_id, entity_group, min(tag) AS tag,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM grouped GROUP BY doc_id, entity_group
    """,
    survey_ref="§3.3 segmented endpoints — q124 bisection probe (gate + "
               "island numbering, no text assembly)",
    doc="Legacy-construction probe (round 4): q124's ORIGINAL regex-token "
        "+ angle-tag construction minus the text column. q124 itself was "
        "rewritten by construction in round 6 (literal-space tokens, span "
        "channels); this stays registered because it green-pins the "
        "legacy constructs (regex tokens, min(tag) over bracketed "
        "strings) independently.",
)
def q154_seg_chain_gate_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q124_runs(spark, sf_dir).select(
        "doc_id", "entity_group", "tag", "n_tokens"
    )


@register(
    "q155_seg_chain_text_probe",
    # q124 with text replaced by md5(text): same bytes compared, but through
    # a fixed-width hex channel — removes any canonicalization-of-long-string
    # effects in the harness from the equation.
    oracle="WITH " + _SEG_GATE_CTE + """
    SELECT doc_id, entity_group,
           md5(string_agg(token, ' ' ORDER BY token_seq)) AS text_md5
    FROM grouped GROUP BY doc_id, entity_group
    """,
    survey_ref="§3.3 segmented endpoints — q124 bisection probe (md5 of "
               "assembled text)",
    doc="Legacy-construction probe (round 4): q124's ORIGINAL construction "
        "with md5(text) instead of text — green-pins ordered string_agg "
        "assembly through a fixed-width channel. See q154; q124/q127 "
        "themselves were rewritten by construction in round 6.",
)
def q155_seg_chain_text_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q124_runs(spark, sf_dir).select(
        "doc_id", "entity_group", F.md5(F.col("text")).alias("text_md5")
    )


@register(
    "q128_pii_scrub",
    # Synthetic PII is injected deterministically (email + URL built from
    # the doc key) so the redaction path actually fires on every row; the
    # patterns are RE2-safe (no backrefs/lookahead) so both engines agree.
    # Spark regexp_replace is global by default; DuckDB needs the 'g' flag.
    oracle="""
    WITH injected AS (
        SELECT doc_id, source,
               text || ' contact author' || CAST(doc_id AS VARCHAR)
                    || '@example.org or https://example.org/paper/'
                    || CAST(doc_id AS VARCHAR) AS text
        FROM documents
    )
    SELECT doc_id, source,
           regexp_replace(
               regexp_replace(
                   text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+',
                   '[EMAIL]', 'g'),
               'https?://[^ ]+', '[URL]', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(
               text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+'))
               AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, 'https?://[^ ]+'))
               AS BIGINT) AS n_urls
    FROM injected
    """,
    survey_ref="north-star training-data pipeline: PII redaction pass "
               "(engine-general; regexp_replace family per §2B strings)",
    doc="PII scrub over the corpus: email and URL patterns redacted with "
        "global regexp_replace, occurrence counts kept for audit — a "
        "single codegen'd projection, no shuffle, embarrassingly parallel "
        "at any scale.",
)
def q128_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
    url_re = "https?://[^ ]+"
    injected = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact author"),
            F.col("doc_id").cast("string"),
            F.lit("@example.org or https://example.org/paper/"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return injected.select(
        "doc_id",
        "source",
        F.regexp_replace(
            F.regexp_replace("text", email_re, "[EMAIL]"), url_re, "[URL]"
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit(email_re), 0)).cast("long").alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(url_re), 0)).cast("long").alias(
            "n_urls"
        ),
    )


@register(
    "q129_multimodal_resize",
    # fake source dims from the content hash (as q111); the aspect-fit
    # arithmetic (min-ratio scale, floor, 1px clamp) is the real semantics
    # under test and is restated exactly in SQL.
    oracle="""
    WITH media AS (
        SELECT 'm' || doc_id AS media_id, sha256(text) AS h
        FROM documents
    ),
    dims AS (
        SELECT media_id, h,
               64 + CAST('0x' || substr(h, 1, 2) AS INT) AS w,
               64 + CAST('0x' || substr(h, 3, 2) AS INT) AS ht
        FROM media
    )
    SELECT media_id,
           CAST(w AS INT) AS src_width,
           CAST(ht AS INT) AS src_height,
           CAST(greatest(1, floor(w * least(224.0 / w, 224.0 / ht)))
                AS INT) AS out_width,
           CAST(greatest(1, floor(ht * least(224.0 / w, 224.0 / ht)))
                AS INT) AS out_height,
           substr(h, 9, 24) AS resized_hex
    FROM dims
    """,
    survey_ref="north-star multimodal columns — aspect-fit resize kernel "
               "(decode/feature-extract/resize/frame-sample family)",
    doc="The resize mapInPandas stage end-to-end with the deterministic "
        "fake decoder: hash-derived source dims, real aspect-fit math "
        "(min-ratio scale, floor, 1px clamp), sha256-slice payload.",
)
def q129_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.multimodal import resize_images

    docs = table(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    )
    resized = resize_images(media, target=(224, 224), use_fake_decoder=True)
    return resized.select(
        "media_id",
        "src_width",
        "src_height",
        "out_width",
        "out_height",
        F.lower(F.hex("resized")).alias("resized_hex"),
    )


@register(
    "q188_rag_chunking",
    # overlapping RAG chunks: window W=64 tokens, stride S=48 (16-token
    # overlap). Token p (1-based) belongs to chunk k iff k*S < p <= k*S+W;
    # k ranges over [max(0, ceil((p-W)/S)), (p-1)//S]. The ceil is stated
    # as floor-division then clamped, so DuckDB's floor-div and Spark's
    # trunc-div agree (the only sign-sensitive case clamps to 0 on both).
    oracle="WITH " + _TOKENS_CTE + """,
    membership AS (
        SELECT doc_id, token_seq, token,
               unnest(range(
                   greatest(0, (token_seq - 64 + 47) // 48),
                   ((token_seq - 1) // 48) + 1)) AS chunk_id
        FROM tokens
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(min(token_seq) AS BIGINT) AS token_start,
           CAST(max(token_seq) AS BIGINT) AS token_end,
           string_agg(token, ' ' ORDER BY token_seq) AS text
    FROM membership
    GROUP BY doc_id, chunk_id
    """,
    survey_ref="north-star corpus shaping: overlapping context-window "
               "chunking for retrieval (RAG prep) — the overlapped twin "
               "of q126's disjoint packing",
    doc="RAG document chunking: 64-token windows at stride 48 (16-token "
        "overlap, the retrieval-friendly layout). Each token fans out to "
        "the 1-2 chunks containing it (bounded explode, never a "
        "self-join), then one groupBy(doc, chunk) assembles ordered "
        "chunk text with start/end offsets. Map-side explode + single "
        "shuffle on (doc_id, chunk_id); chunks of different docs are "
        "independent at any scale.",
)
def q188_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(spark, sf_dir)
    k_min = F.greatest(
        F.lit(0), F.expr("(token_seq - 64 + 47) div 48")
    )
    k_max = F.expr("(token_seq - 1) div 48")
    member = toks.select(
        "doc_id",
        "token_seq",
        "token",
        F.explode(F.sequence(k_min, k_max)).alias("chunk_id"),
    )
    return member.groupBy(
        "doc_id", F.col("chunk_id").cast("long").alias("chunk_id")
    ).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.min("token_seq").cast("long").alias("token_start"),
        F.max("token_seq").cast("long").alias("token_end"),
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("token_seq", "token"))
            ).token,
            " ",
        ).alias("text"),
    )


@register(
    "q190_audio_features",
    # fake PCM from the content hash (as q111/q129 for image): 32 samples
    # (b-128)/128 — exact powers-of-two arithmetic, so window energies and
    # sign products are bit-identical across engines; the windowed-RMS +
    # zero-crossing math is the real semantics under test.
    oracle="""
    WITH media AS (
        SELECT 'a' || CAST(doc_id AS VARCHAR) AS media_id, sha256(text) AS h
        FROM documents
    ),
    samples AS (
        SELECT media_id, CAST(i AS INT) AS i,
               (CAST('0x' || substr(h, CAST(2 * i + 1 AS INT), 2) AS INT)
                - 128) / 128.0 AS s
        FROM media, unnest(range(0, 32)) AS t(i)
    ),
    winstats AS (
        SELECT media_id, i // 8 AS w, sum(s * s) AS ss
        FROM samples GROUP BY media_id, i // 8
    ),
    rms AS (
        SELECT media_id,
               round(sqrt(max(CASE WHEN w = 0 THEN ss END) / 8), 6) AS rms0,
               round(sqrt(max(CASE WHEN w = 1 THEN ss END) / 8), 6) AS rms1,
               round(sqrt(max(CASE WHEN w = 2 THEN ss END) / 8), 6) AS rms2,
               round(sqrt(max(CASE WHEN w = 3 THEN ss END) / 8), 6) AS rms3
        FROM winstats GROUP BY media_id
    ),
    zc AS (
        SELECT a.media_id, CAST(count(*) AS INT) AS n_zero_crossings
        FROM samples a
        JOIN samples b ON b.media_id = a.media_id AND b.i = a.i + 1
        WHERE a.s * b.s < 0
        GROUP BY a.media_id
    )
    SELECT r.media_id, CAST(32 AS INT) AS n_samples,
           r.rms0, r.rms1, r.rms2, r.rms3,
           CAST(COALESCE(z.n_zero_crossings, 0) AS INT) AS n_zero_crossings
    FROM rms r LEFT JOIN zc z ON z.media_id = r.media_id
    """,
    survey_ref="north-star multimodal columns — audio branch: opaque "
               "binary -> decode -> windowed energy features (completes "
               "the image q111/q129 and video q112 family)",
    doc="Audio feature extraction end-to-end with the deterministic fake "
        "PCM decoder: 4x8-sample windowed RMS energy + zero-crossing "
        "count (the classic cheap VAD features), computed in the real "
        "mapInPandas kernel (operators/multimodal.py "
        "extract_audio_features; the codec call is the injectable stub, "
        "the feature math is production). All sample arithmetic is exact "
        "in binary floating point, so the oracle reproduces it "
        "bit-for-bit.",
)
def q190_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = table(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("a"), F.col("doc_id").cast("string")).alias(
            "media_id"
        ),
        F.encode("text", "utf-8").alias("content"),
    )
    return extract_audio_features(media, use_fake_decoder=True)


@register(
    "q192_vocab_growth",
    # Heaps-law curve: per document (in corpus order), how many tokens
    # were seen and how many word TYPES were new — first occurrence via
    # a per-word row_number over global (doc_id, token_seq) order, then
    # running sums over the per-doc aggregates.
    oracle="WITH " + _TOKENS_CTE + """,
    first_occ AS (
        SELECT doc_id, token_seq, token,
               CASE WHEN row_number() OVER (
                   PARTITION BY token ORDER BY doc_id, token_seq) = 1
                   THEN 1 ELSE 0 END AS is_new
        FROM tokens
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(is_new) AS BIGINT) AS n_new_types
        FROM first_occ GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_new_types,
           CAST(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tokens,
           CAST(sum(n_new_types) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_vocab
    FROM per_doc
    """,
    survey_ref="north-star text analysis: corpus vocabulary-growth curve "
               "(Heaps' law observable) — the statistic that sizes the "
               "q168 LM table and tokenizer vocab budgets",
    doc="Vocabulary growth in corpus order: each word type's first "
        "occurrence found with one per-word window (shuffle on the word "
        "key — the only big shuffle), aggregated per doc, then two "
        "running sums over the tiny per-doc relation. The cumulative "
        "curve is the Heaps-law measurement used to budget tokenizer "
        "vocab and LM table sizes before a full 100 TB pass.",
)
def q192_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(spark, sf_dir)
    w_first = W.partitionBy("token").orderBy("doc_id", "token_seq")
    first_occ = toks.withColumn(
        "is_new",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    per_doc = first_occ.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("is_new").cast("long").alias("n_new_types"),
    )
    from sciencebeam_parser_spark.operators.global_rank import (
        with_global_cumsum,
    )

    # mode-gated exact running sums (see global_rank.py): single-window
    # locally, two-phase partial-sum offsets in production
    cum = with_global_cumsum(
        per_doc,
        ["doc_id"],
        {"_ct": "n_tokens", "_cv": "n_new_types"},
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        "n_new_types",
        F.col("_ct").cast("long").alias("cum_tokens"),
        F.col("_cv").cast("long").alias("cum_vocab"),
    )


# --------------------------------------------------------------------------
# T5 span corruption (q286) and FIM transformation (q287)
# --------------------------------------------------------------------------

_SPAN_LEN = 3          # fixed span length (T5 uses mean-3 random spans)
_CORRUPT_PCT = 15      # T5's 15% corruption rate


@register(
    "q286_span_corruption",
    # deterministic T5 denoising objective: 3-token spans, each masked
    # iff its md5 bucket < 15 of 100; masked spans are replaced by
    # dense per-doc sentinels in the input and emitted after their
    # sentinel in the target — the (input, target) pretraining pair.
    oracle="WITH " + _TOKENS_CTE + f""",
    sp AS (
        SELECT doc_id, token_seq, token,
               (token_seq - 1) // {_SPAN_LEN} AS span_id
        FROM tokens
    ),
    mk AS (
        SELECT *,
               (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                          || CAST(span_id AS VARCHAR)), 1, 15) AS BIGINT)
                % 100 < {_CORRUPT_PCT}) AS masked
        FROM sp
    ),
    ks AS (
        SELECT doc_id, span_id,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY span_id) AS k
        FROM (SELECT DISTINCT doc_id, span_id FROM mk WHERE masked)
    ),
    j AS (
        SELECT m.doc_id, m.token_seq, m.token, m.span_id, ks.k
        FROM mk m LEFT JOIN ks
          ON ks.doc_id = m.doc_id AND ks.span_id = m.span_id
    )
    SELECT doc_id,
           CAST(count(DISTINCT k) AS BIGINT) AS n_masked_spans,
           COALESCE(string_agg(
               CASE WHEN k IS NULL THEN token
                    WHEN token_seq % {_SPAN_LEN} = 1
                        THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
                    ELSE NULL END, ' ' ORDER BY token_seq), '')
               AS input_text,
           COALESCE(string_agg(
               CASE WHEN k IS NULL THEN NULL
                    WHEN token_seq % {_SPAN_LEN} = 1
                        THEN '<extra_id_' || CAST(k AS VARCHAR) || '> '
                             || token
                    ELSE token END, ' ' ORDER BY token_seq), '')
               AS target_text
    FROM j GROUP BY doc_id
    """,
    survey_ref="north-star pretraining-data shaping: T5/UL2 span "
               "corruption (Raffel et al. 2020 §3.1.4) — the denoising "
               "(input, target) pair generator beside q126 packing and "
               "q181 negative sampling",
    doc="Span corruption: fixed 3-token spans are masked at a "
        "deterministic 15% (md5 bucket of (doc_id, span_id) — "
        "re-runnable, layout-independent, the q125 idiom); masked "
        "spans collapse to dense per-doc sentinels <extra_id_k> in the "
        "input, and the target emits each sentinel followed by its "
        "original tokens — byte-identical T5 semantics restated "
        "relationally. One shuffle keys the sentinel window and the "
        "final per-doc assembly; ordered sorted-struct aggregation "
        "mirrors string_agg ORDER BY on both engines (the q124 "
        "discipline). At 100 TB everything partitions by doc_id.",
)
def q286_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(spark, sf_dir)
    t = toks.withColumn(
        "span_id", F.expr(f"(token_seq - 1) div {_SPAN_LEN}")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("span_id").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    t = t.withColumn("masked", bucket < _CORRUPT_PCT)
    spans = (
        t.filter("masked").select("doc_id", "span_id").distinct()
        .withColumn(
            "k",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy("span_id")
            ),
        )
    )
    j = t.join(spans, ["doc_id", "span_id"], "left")
    first_of_span = F.col("token_seq") % _SPAN_LEN == 1
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("k").cast("string"), F.lit(">")
    )
    input_piece = (
        F.when(F.col("k").isNull(), F.col("token"))
        .when(first_of_span, sentinel)
        .otherwise(F.lit(None).cast("string"))
    )
    target_piece = (
        F.when(F.col("k").isNull(), F.lit(None).cast("string"))
        .when(
            first_of_span,
            F.concat(sentinel, F.lit(" "), F.col("token")),
        )
        .otherwise(F.col("token"))
    )

    def _ordered_join(piece):
        # sorted-struct assembly: array_join skips the NULL pieces the
        # CASE dropped, matching string_agg's NULL-skipping
        return F.array_join(
            F.array_sort(
                F.collect_list(F.struct("token_seq", piece.alias("p")))
            ).p,
            " ",
        )

    return j.groupBy("doc_id").agg(
        F.countDistinct("k").cast("long").alias("n_masked_spans"),
        _ordered_join(input_piece).alias("input_text"),
        _ordered_join(target_piece).alias("target_text"),
    )


@register(
    "q287_fim_transform",
    # fill-in-middle (PSM order): the middle fifth [2n/5, 3n/5) moves to
    # the end behind markers — the code-LLM data transformation.
    oracle="WITH " + _TOKENS_CTE + """,
    sized AS (
        SELECT doc_id, token_seq, token,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM tokens
    ),
    sect AS (
        SELECT doc_id, token_seq, token,
               CAST(n AS BIGINT) AS n,
               CASE WHEN token_seq - 1 < (n * 2) // 5 THEN 'p'
                    WHEN token_seq - 1 < (n * 3) // 5 THEN 'm'
                    ELSE 's' END AS part
        FROM sized
    )
    SELECT doc_id, CAST(min(n) AS BIGINT) AS n_tokens,
           '<PRE> ' || COALESCE(string_agg(
               CASE WHEN part = 'p' THEN token END, ' '
               ORDER BY token_seq), '')
           || ' <SUF> ' || COALESCE(string_agg(
               CASE WHEN part = 's' THEN token END, ' '
               ORDER BY token_seq), '')
           || ' <MID> ' || COALESCE(string_agg(
               CASE WHEN part = 'm' THEN token END, ' '
               ORDER BY token_seq), '') AS fim_text
    FROM sect GROUP BY doc_id
    """,
    survey_ref="north-star pretraining-data shaping: fill-in-middle "
               "(Bavarian et al. 2022) PSM reordering — the code-LLM "
               "infilling transformation beside q286 span corruption",
    doc="FIM: each document's middle fifth (token positions "
        "[2n/5, 3n/5), integer arithmetic so both engines cut "
        "identically) moves behind the suffix in "
        "<PRE> p <SUF> s <MID> m order — training the model to infill. "
        "Deterministic by construction (no RNG: the boundaries are "
        "functions of n alone; a production variant would hash-pick "
        "the split like q286 picks spans). Single shuffle on doc_id; "
        "the three sections assemble from one sorted-struct pass.",
)
def q287_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(spark, sf_dir)
    sized = toks.withColumn(
        "n", F.count("*").over(W.partitionBy("doc_id"))
    )
    part = (
        F.when(
            F.col("token_seq") - 1 < F.expr("(n * 2) div 5"), "p"
        )
        .when(F.col("token_seq") - 1 < F.expr("(n * 3) div 5"), "m")
        .otherwise("s")
    )
    sect = sized.withColumn("part", part)

    def _section(tag):
        piece = F.when(F.col("part") == tag, F.col("token")).otherwise(
            F.lit(None).cast("string")
        )
        return F.array_join(
            F.array_sort(
                F.collect_list(F.struct("token_seq", piece.alias("p")))
            ).p,
            " ",
        )

    return sect.groupBy("doc_id").agg(
        F.min("n").cast("long").alias("n_tokens"),
        F.concat(
            F.lit("<PRE> "),
            _section("p"),
            F.lit(" <SUF> "),
            _section("s"),
            F.lit(" <MID> "),
            _section("m"),
        ).alias("fim_text"),
    )


_BATCH_SIZE = 32


@register(
    "q288_length_bucketed_batches",
    # dynamic batching: docs sorted by token length, fixed-size batches
    # cut along the sorted order — per-batch padding waste is the
    # quantity the layout minimizes (vs random batching, where max-len
    # outliers pad every batch).
    oracle=f"""
    WITH counts AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (
                   ORDER BY n_tokens DESC, doc_id) AS rnk
        FROM counts
    )
    SELECT CAST((rnk - 1) // {_BATCH_SIZE} AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
               AS padding_waste
    FROM ranked
    GROUP BY 1
    """,
    survey_ref="north-star training-data shaping: length-bucketed "
               "dynamic batching (padding-waste minimization) — the "
               "batch-layout twin of q126's sequence packing (packing "
               "concatenates to a fixed window; bucketing groups "
               "similar lengths so per-batch padding to the batch max "
               "is minimal)",
    doc="Length-bucketed batching: documents rank by token length "
        "(descending, doc_id tiebreak) and fixed-size-32 batches cut "
        "along the sorted order; each batch reports its padding waste "
        "(n_docs x max - sum), the cost function this layout "
        "minimizes. The rank is a global window over ONE ROW PER "
        "DOCUMENT (the aggregated length relation — the q233/q280 "
        "posture: sortable at 10^9 rows, with the q213 histogram "
        "sketch as the approximate substitute if not).",
)
def q288_length_bucketed_batches(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    from sciencebeam_parser_spark.operators.global_rank import (
        with_global_rank,
    )

    # mode-gated exact global rank (see global_rank.py): single-window
    # locally, two-phase range-partitioned in production
    ranked = with_global_rank(
        counts, [F.desc("n_tokens"), F.asc("doc_id")], out="rnk"
    )
    return (
        ranked.withColumn(
            "batch_id", F.expr(f"(rnk - 1) div {_BATCH_SIZE}")
        )
        .groupBy(F.col("batch_id").cast("long").alias("batch_id"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
            (F.count("*") * F.max("n_tokens") - F.sum("n_tokens"))
            .cast("long")
            .alias("padding_waste"),
        )
    )
