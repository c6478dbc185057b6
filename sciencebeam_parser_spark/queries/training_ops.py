"""Training-data pipeline operators, round 3 (north-star extensions):
document quality filtering, corpus n-gram statistics, TF-IDF term scoring,
stratified sampling, end-to-end fuzzy-dedup corpus output, and embedding
normalization/quantization.

These extend the q60-q69/q125-q128 family: everything a large-scale LLM
pretraining-data pipeline runs between raw documents and training shards,
expressed as declarative DataFrame plans so each stays one-or-two shuffles
at 100 TB (per-doc metrics are pure projections; the only wide operations
are the corpus-level groupBys, which get map-side partial aggregation).

Reference anchor: the corpus ETL surface of
training/cli/generate_data.py (A30) — the reference generates training
data per-document; these operators are the corpus-level shaping steps the
north star adds on top.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries.registry import register, table
from sciencebeam_parser_spark.queries.text_ops import (
    _LSH_PAIRS_SQL,
    _WORDS_SQL,
    _words,
    q62_dedup_minhash_lsh_pairs,
)

# Tiny fixed stopword set — enough for a Gopher-style "contains common
# English function words" signal while staying engine-portable.
_STOPWORDS = ("the", "and", "of", "to", "in", "is", "that", "for")
_STOPWORDS_SQL = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"


@register(
    "q139_quality_filter",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, lang,
               CAST(len({_WORDS_SQL}) AS BIGINT) AS n_words,
               round(list_sum([len(x) FOR x IN {_WORDS_SQL}]) * 1.0
                     / greatest(len({_WORDS_SQL}), 1), 4) AS mean_word_len,
               round(len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                     * 1.0 / greatest(len(text), 1), 4) AS symbol_ratio,
               CAST(len([x FOR x IN {_WORDS_SQL}
                         IF x IN {_STOPWORDS_SQL}]) AS BIGINT)
                   AS stop_hits
        FROM documents
    )
    SELECT doc_id, lang, n_words, mean_word_len, symbol_ratio, stop_hits,
           CASE WHEN n_words < 50 THEN 'too_few_words'
                WHEN n_words > 100000 THEN 'too_many_words'
                WHEN mean_word_len < 3 OR mean_word_len > 10
                    THEN 'word_length'
                WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
                WHEN stop_hits < 2 THEN 'no_stopwords'
           END AS drop_reason,
           CASE WHEN n_words >= 50 AND n_words <= 100000
                     AND mean_word_len >= 3 AND mean_word_len <= 10
                     AND symbol_ratio <= 0.1 AND stop_hits >= 2
                THEN TRUE ELSE FALSE END AS keep
    FROM m
    """,
    survey_ref="north-star text analysis: Gopher/C4-style document quality "
               "filter (extends q67 quality score into a keep/drop gate)",
    doc="Rule-based pretraining quality gate: word-count bounds, mean word "
        "length band, symbol ratio cap, stopword-presence floor; emits the "
        "first failing rule as drop_reason. Pure per-document projection — "
        "no shuffle at any scale; the regex/array kernels run in "
        "whole-stage codegen. Rules are compared on ROUNDED metrics so the "
        "oracle decides boundaries identically.",
)
def q139_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = _words()
    n_words = F.size(words).cast("long")
    word_chars = F.aggregate(
        words, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    mean_word_len = F.round(
        word_chars / F.greatest(F.size(words), F.lit(1)), 4
    )
    n_chars = F.length("text")
    # stripping the alnum/whitespace chars leaves exactly the symbols
    symbols = F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", ""))
    symbol_ratio = F.round(symbols / F.greatest(n_chars, F.lit(1)), 4)
    stop_hits = F.size(
        F.filter(words, lambda x: x.isin(*_STOPWORDS))
    ).cast("long")
    m = docs.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
    )
    drop_reason = (
        F.when(F.col("n_words") < 50, "too_few_words")
        .when(F.col("n_words") > 100000, "too_many_words")
        .when(
            (F.col("mean_word_len") < 3) | (F.col("mean_word_len") > 10),
            "word_length",
        )
        .when(F.col("symbol_ratio") > 0.1, "symbol_ratio")
        .when(F.col("stop_hits") < 2, "no_stopwords")
    )
    return m.select(
        "*",
        drop_reason.alias("drop_reason"),
        drop_reason.isNull().alias("keep"),
    )


@register(
    "q142_ngram_topk",
    oracle=f"""
    WITH w AS (SELECT {_WORDS_SQL} AS ws FROM documents),
    bg AS (
        SELECT unnest([ws[i] || ' ' || ws[i + 1]
                       FOR i IN range(1, len(ws))]) AS bigram
        FROM w WHERE len(ws) >= 2
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 50
    """,
    survey_ref="north-star text analysis: corpus n-gram statistics "
               "(token-frequency tables for tokenizer training / contamination "
               "checks); §2B top-k",
    doc="Corpus-wide top-50 word bigrams: shuffle-free bigram projection "
        "(zip of shifted array slices, same kernel as the shingle builder), "
        "one count groupBy with map-side combine, and a global top-k that "
        "compiles to TakeOrderedAndProject — no full sort of the vocabulary "
        "at any scale. Full tiebreak (n DESC, bigram) keeps it deterministic.",
)
def q142_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    arr = _words()
    n = F.size(arr)
    z = F.arrays_zip(
        F.slice(arr, 1, n - 1).alias("a"), F.slice(arr, 2, n - 1).alias("b")
    )
    bigrams = F.when(
        n >= 2, F.transform(z, lambda s: F.concat_ws(" ", s["a"], s["b"]))
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


@register(
    "q143_tfidf_topterms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents
    ),
    tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, w
    ),
    dfreq AS (
        SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.w AS term, tf.tf, dfreq.df,
               round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 4)
                   AS tfidf
        FROM tf JOIN dfreq ON tf.w = dfreq.w CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
    survey_ref="north-star text analysis: TF-IDF keyterm scoring (corpus "
               "statistics join per-doc stats); §2B window top-k per group",
    doc="Top-3 TF-IDF terms per document with smoothed idf "
        "ln((N+1)/(df+1)). Two aggregations (term frequency per doc, "
        "document frequency per term) plus an equi-join on the term and a "
        "per-doc top-k window — each map-side-combinable; the df table is "
        "vocabulary-sized, so at 100 TB the join shuffles O(vocab + "
        "doc-term pairs), never the raw text. Ranked on the ROUNDED score "
        "(+term tiebreak) so both engines' libm ulp differences cannot "
        "reorder the window.",
)
def q143_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # metadata-only count: parquet row-group stats, no data scan
    n_docs = docs.count()
    tok = docs.select("doc_id", F.explode(_words()).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "w").select(
        "doc_id",
        F.col("w").alias("term"),
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 4
        ).alias("tfidf"),
    )
    w_ = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w_))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "q144_stratified_sample",
    oracle="""
    WITH rated AS (
        SELECT doc_id, lang, source,
               CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                         ELSE 0.1 END AS rate,
               (CAST('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)),
                                    1, 15) AS BIGINT) % 1000000) / 1000000.0
                   AS u
        FROM documents
    )
    SELECT doc_id, lang, source, rate FROM rated WHERE u < rate
    """,
    survey_ref="north-star training-data pipeline: per-language stratified "
               "sampling for corpus mixture weighting (extends q125's "
               "uniform hash sample)",
    doc="Deterministic stratified sampling: per-stratum keep rates "
        "(en 50%, de 25%, rest 10%) decided by an md5 hash of the doc key "
        "mapped to [0,1) — re-runnable, partition-independent, shuffle-free "
        "(a pure filter; Catalyst pushes the md5-filter to the scan). The "
        "rate CASE is the corpus mixture table; swap in a broadcast dim "
        "join for per-(lang, source) mixtures at scale.",
)
def q144_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 0.5)
        .when(F.col("lang") == "de", 0.25)
        .otherwise(0.1)
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    ) / 1000000.0
    return (
        docs.select("doc_id", "lang", "source", rate.alias("rate"), u.alias("u"))
        .filter(F.col("u") < F.col("rate"))
        .drop("u")
    )


@register(
    "q145_dedup_canonical_corpus",
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
    ),
    comp AS (
        SELECT node AS doc_id, min(lab) AS component_id
        FROM reach GROUP BY node
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    LEFT JOIN comp ON d.doc_id = comp.doc_id
    WHERE comp.doc_id IS NULL OR comp.component_id = d.doc_id
    """,
    survey_ref="north-star dedup end-to-end: LSH pairs → connected "
               "components → canonical keep-set (the deduplicated corpus a "
               "training run actually reads); composes q62 + q110",
    doc="The full fuzzy-dedup OUTPUT: documents minus non-canonical "
        "near-duplicate cluster members (keeper = min doc_id per "
        "component). The losers table is tiny (only docs in some cluster), "
        "so the final step is a broadcast LEFT ANTI join against the "
        "corpus — the 100 TB-shaped plan: full-corpus scan happens exactly "
        "once, everything cluster-sized stays small.",
)
def q145_dedup_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = q62_dedup_minhash_lsh_pairs(spark, sf_dir)
    comp = connected_components(pairs)
    losers = comp.filter(F.col("doc_id") != F.col("component_id")).select(
        "doc_id"
    )
    # no forced broadcast: losers is data-dependent (all non-canonical
    # near-dups) and unbounded at scale — let AQE/autoBroadcastJoinThreshold
    # pick the strategy (it broadcasts the tiny side at bench scale anyway)
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )


@register(
    "q146_embedding_quantize",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS dv
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, label, dv,
               sqrt(list_sum([x * x FOR x IN dv])) AS nrm
        FROM v
    )
    SELECT vec_id, label, round(nrm, 4) AS l2_norm,
           CASE WHEN nrm > 0 THEN array_to_string(
               [CAST(round(x / nrm * 127) AS INTEGER) FOR x IN dv], ',')
           ELSE array_to_string([CAST(0 AS INTEGER) FOR x IN dv], ',')
           END AS qvec
    FROM n
    """,
    survey_ref="north-star similarity search: embedding L2-normalize + int8 "
               "quantize (the storage/ANN prep step before IVF/LSH indexing, "
               "q86/q93); §2B array functions",
    doc="Unit-normalize each embedding and quantize to int8 (x/||x||*127 "
        "rounded) — the standard pre-index compression for ANN at scale "
        "(4x smaller vectors => 4x more index per executor). Pure array "
        "projection, no shuffle; the sequential F.aggregate sum matches "
        "DuckDB's list_sum fold order so the norms agree bit-for-bit.",
)
def q146_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    dv = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(dv, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    n = emb.select("vec_id", "label", dv.alias("dv"), nrm.alias("nrm"))
    qvec = F.when(
        F.col("nrm") > 0,
        F.array_join(
            F.transform(
                "dv",
                lambda x: F.round(x / F.col("nrm") * 127).cast("int"),
            ),
            ",",
        ),
    ).otherwise(
        F.array_join(F.transform("dv", lambda x: F.lit(0)), ",")
    )
    return n.select(
        "vec_id",
        "label",
        F.round("nrm", 4).alias("l2_norm"),
        qvec.alias("qvec"),
    )


@register(
    "q152_training_corpus_pipeline",
    # the full corpus-build DAG as ONE oracle: canonical fuzzy dedup
    # (recursive CTE) ∩ quality gate ∩ stratified hash sample, then
    # per-source sequence packing over the survivors.
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
        SELECT node AS doc_id, min(lab) AS component_id
        FROM reach GROUP BY node
    ),
    m AS (
        SELECT doc_id, lang, source, text,
               CAST(len({_WORDS_SQL}) AS BIGINT) AS n_words,
               round(list_sum([len(x) FOR x IN {_WORDS_SQL}]) * 1.0
                     / greatest(len({_WORDS_SQL}), 1), 4) AS mean_word_len,
               round(len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                     * 1.0 / greatest(len(text), 1), 4) AS symbol_ratio,
               CAST(len([x FOR x IN {_WORDS_SQL}
                         IF x IN {_STOPWORDS_SQL}]) AS BIGINT)
                   AS stop_hits
        FROM documents
    ),
    kept AS (
        SELECT m.doc_id, m.lang, m.source,
               CAST(len(string_split_regex(trim(m.text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM m
        LEFT JOIN comp ON m.doc_id = comp.doc_id
        WHERE (comp.doc_id IS NULL OR comp.component_id = m.doc_id)
          AND m.n_words >= 50 AND m.n_words <= 100000
          AND m.mean_word_len >= 3 AND m.mean_word_len <= 10
          AND m.symbol_ratio <= 0.1 AND m.stop_hits >= 2
          AND (CAST('0x' || substr(md5('strat:' || CAST(m.doc_id AS VARCHAR)),
                                   1, 15) AS BIGINT) % 1000000) / 1000000.0
              < CASE m.lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                            ELSE 0.1 END
    ),
    packed AS (
        SELECT *,
               COALESCE(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS token_start
        FROM kept
    )
    SELECT doc_id, lang, source, n_tokens,
           CAST(token_start AS BIGINT) AS token_start,
           CAST(token_start // 512 AS BIGINT) AS pack_id,
           CAST(token_start % 512 AS BIGINT) AS pack_offset
    FROM packed
    """,
    survey_ref="north-star training-data pipeline END-TO-END: fuzzy dedup "
               "(q62/q110/q145) → quality gate (q139) → stratified sample "
               "(q144) → sequence packing (q126) composed as one DAG — "
               "the A28-style cascade orchestration applied to corpus ETL "
               "(A30)",
    doc="The whole corpus build as one DataFrame DAG: LSH canonical dedup "
        "anti-join, quality keep-rules, per-language hash sampling, then "
        "per-source context-window packing of the survivors. Each stage "
        "is the already-verified operator; composition adds ONE broadcast "
        "anti-join and reuses one corpus scan — the shape a 100 TB "
        "pretraining ETL actually runs nightly. One oracle checks the "
        "fused result end-to-end.",
)
def q152_training_corpus_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sciencebeam_parser_spark.operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")

    # stage 1: canonical fuzzy dedup (losers are cluster-members != keeper)
    comp = connected_components(q62_dedup_minhash_lsh_pairs(spark, sf_dir))
    losers = comp.filter(F.col("doc_id") != F.col("component_id")).select(
        "doc_id"
    )

    # stage 2: quality rules on ROUNDED metrics (same exprs as q139)
    words = _words()
    n_words = F.size(words).cast("long")
    mean_word_len = F.round(
        F.aggregate(words, F.lit(0), lambda acc, x: acc + F.length(x))
        / F.greatest(F.size(words), F.lit(1)),
        4,
    )
    symbol_ratio = F.round(
        F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", ""))
        / F.greatest(F.length("text"), F.lit(1)),
        4,
    )
    stop_hits = F.size(
        F.filter(words, lambda x: x.isin(*_STOPWORDS))
    ).cast("long")

    # stage 3: stratified hash sample (same hash/rates as q144)
    rate = (
        F.when(F.col("lang") == "en", 0.5)
        .when(F.col("lang") == "de", 0.25)
        .otherwise(0.1)
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    ) / 1000000.0

    kept = (
        # unbounded relation — strategy left to AQE (see q145)
        docs.join(losers, "doc_id", "left_anti")
        .filter(
            (n_words >= 50)
            & (n_words <= 100000)
            & (mean_word_len >= 3)
            & (mean_word_len <= 10)
            & (symbol_ratio <= 0.1)
            & (stop_hits >= 2)
            & (u < rate)
        )
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias(
                "n_tokens"
            ),
        )
    )

    # stage 4: per-source sequence packing (same window as q126)
    w = W.partitionBy("source").orderBy("doc_id")
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    return kept.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        start.alias("token_start"),
        F.floor(start / F.lit(512)).cast("long").alias("pack_id"),
        (start % F.lit(512)).cast("long").alias("pack_offset"),
    )


@register(
    "q153_decontaminate",
    # eval set = every 50th doc (deterministic holdout); a corpus doc is
    # contaminated if it shares >= 1 word-trigram shingle with ANY eval
    # doc. Shingle sets reuse the dedup kernel's zip-of-slices projection.
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                        FOR i IN range(1, len(ws) - 1)]) AS shingles
        FROM (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents
              WHERE doc_id % 50 <> 0)
        WHERE len(ws) >= 3
    ),
    eval_set AS (
        SELECT DISTINCT unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                        FOR i IN range(1, len(ws) - 1)]) AS shingle
        FROM (SELECT {_WORDS_SQL} AS ws FROM documents
              WHERE doc_id % 50 = 0)
        WHERE len(ws) >= 3
    )
    SELECT c.doc_id,
           CAST(count(DISTINCT s.shingle) AS BIGINT) AS n_shared_grams
    FROM corpus c, unnest(c.shingles) AS t(shingle)
    JOIN eval_set s ON t.shingle = s.shingle
    GROUP BY c.doc_id
    """,
    survey_ref="north-star training-data pipeline: benchmark "
               "DECONTAMINATION (eval-overlap removal by shared n-grams) — "
               "the same inverted-index join shape as q63's Jaccard "
               "verification",
    doc="Flag corpus documents sharing any word-trigram with the held-out "
        "eval slice (doc_id % 50 == 0). The eval shingle set is tiny "
        "relative to the corpus, so it BROADCASTS and the corpus side "
        "never shuffles — at 100 TB decontamination is a map-side "
        "broadcast semi-join per shingle, not a corpus shuffle. Emits "
        "(doc_id, n_shared_grams) for the contaminated docs; the drop is "
        "an anti-join on this relation.",
)
def q153_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    from sciencebeam_parser_spark.queries.text_ops import _shingle_array

    corpus = docs.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id",
        F.explode(F.array_distinct(_shingle_array())).alias("shingle"),
    )
    eval_set = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(F.array_distinct(_shingle_array())).alias("shingle"))
        .distinct()
    )
    return (
        # eval shingle set is data-dependent (2% of corpus exploded to
        # trigrams) — unbounded at 100 TB, so no forced broadcast; AQE
        # still broadcasts it while it fits autoBroadcastJoinThreshold
        corpus.join(eval_set, "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared_grams"))
    )


@register(
    "q163_paragraph_dedup",
    # sentences (period-split segments) stand in for paragraphs on the
    # single-paragraph synthetic docs; dedup keeps the globally-first
    # occurrence (min doc_id, then min position) of each normalized
    # segment — the C4 three-sentence-span dedup shape.
    oracle="""
    WITH segs AS (
        SELECT doc_id,
               CAST(pos AS BIGINT) AS seg_index,
               trim(seg) AS seg_text
        FROM (
            SELECT doc_id,
                   unnest(string_split(text, '.')) AS seg,
                   unnest(range(1, len(string_split(text, '.')) + 1)) AS pos
            FROM documents
        )
        WHERE trim(seg) <> ''
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY lower(seg_text)
                   ORDER BY doc_id, seg_index) AS rn,
               CAST(count(*) OVER (PARTITION BY lower(seg_text)) AS BIGINT)
                   AS n_copies
        FROM segs
    )
    SELECT doc_id, seg_index, md5(seg_text) AS seg_md5, n_copies
    FROM ranked WHERE rn = 1
    """,
    survey_ref="north-star dedup family: cross-document exact segment "
               "dedup (the C4 repeated-span removal step) — hash-groupBy "
               "+ first-occurrence window; §2B windows",
    doc="Corpus-level exact paragraph/segment dedup: explode documents "
        "into period-split segments, keep the globally first occurrence "
        "of each normalized segment, report the copy count. One shuffle "
        "on the segment key; at 100 TB the key is a hash, the window "
        "state per key is the duplicate count — the standard C4 "
        "repeated-span removal expressed relationally.",
)
def q163_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    segs = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", r"\.")).alias("pos", "seg"),
        )
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("long").alias("seg_index"),
            F.trim("seg").alias("seg_text"),
        )
        .filter(F.col("seg_text") != "")
    )
    # materialize the partition key once: inlining lower(seg_text) in both
    # window specs makes Catalyst mint two distinct attrs and plan TWO
    # exchanges; one named column → both windows share one shuffle
    segs = segs.withColumn("seg_key", F.lower("seg_text"))
    w = W.partitionBy("seg_key").orderBy("doc_id", "seg_index")
    wc = W.partitionBy("seg_key")
    return (
        segs.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(wc).cast("long"))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "seg_index",
            F.md5("seg_text").alias("seg_md5"),
            "n_copies",
        )
    )
