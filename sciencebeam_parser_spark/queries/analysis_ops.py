"""Corpus- and signal-analysis operators, round 5: Gopher-style repetition
signals, PMI collocation mining, time-series gap-fill/resample, and
embedding dimension statistics.

These extend the north-star LLM-pipeline family with the remaining
*measurement* steps a curation pipeline runs before and after filtering:

* **repetition signals** (q216) — the Gopher/MassiveText duplicate-n-gram
  heuristics (Rae et al. 2021 §A1.1): fraction of repeated word bigrams/
  trigrams and the most-frequent-word mass per document. The n-gram
  distinct/total ratios are PURE ARRAY PROJECTIONS (zip-of-slices n-grams
  + array_distinct) — no explode, no shuffle; only the top-word mass needs
  a (doc, word) hash aggregate, and that is map-side combinable.
* **PMI collocations** (q217) — corpus-level pointwise mutual information
  over adjacent word pairs: three hash aggregates over one exploded bigram
  relation, a broadcast-sized join back, and a top-k that compiles to
  TakeOrderedAndProject (no global sort materializes at any scale).
* **gap-fill resample** (q218) — the time-series regularization step:
  per-user hourly grid (sequence + explode), observations averaged into
  their hour, then forward-fill expressed as the two-window "group of the
  last non-null" trick — count(obs) running window assigns a group id,
  max() per (user, group) broadcasts the group's single observation to
  the gap rows. Both windows share one (user) shuffle; state per key is
  bounded by the grid length, never the corpus.
* **embedding dimension stats** (q219) — per-label per-dimension moment
  profile (n / mean / population variance) of the embedding table: one
  posexplode to (label, dim, value) and one map-side-combinable aggregate;
  the fan-out is exactly d=|embedding| per row, so at 100 TB this stays a
  single shuffle whose key space is |labels| × d.

Engine anchor: the reference has no corpus-analysis layer (its unit is one
document, app/parser.py:516-527); these are north-star additions the task
brief lists as first-class.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries.registry import register, table
from sciencebeam_parser_spark.queries.curation_ops import _WORDPOS_CTE, _bigrams
from sciencebeam_parser_spark.queries.text_ops import _words
from sciencebeam_parser_spark.utils import checkpoint_big


def _ngram_array(arr, n: int):
    """Word n-grams as a pure array projection (generalizes
    text_ops._shingle_array to any n): zip the word array against its
    n-1 shifted slices. Null for documents with fewer than n words."""
    size = F.size(arr)
    width = size - (n - 1)
    z = F.arrays_zip(
        *[F.slice(arr, i + 1, width).alias(f"g{i}") for i in range(n)]
    )
    return F.when(
        size >= n,
        F.transform(z, lambda s: F.concat_ws(" ", *[s[f"g{i}"] for i in range(n)])),
    ).otherwise(F.lit(None).cast("array<string>"))


@register(
    "q216_gopher_repetition",
    oracle="WITH " + _WORDPOS_CTE + """,
    trigrams AS (
        SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
        FROM wordpos a
        JOIN wordpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN wordpos c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    wordstats AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_words,
               CAST(max(c) AS BIGINT) AS top_word_count
        FROM (
            SELECT doc_id, w, count(*) AS c FROM wordpos GROUP BY doc_id, w
        ) GROUP BY doc_id
    ),
    bistats AS (
        SELECT doc_id,
               count(*) AS n_bi,
               count(DISTINCT w1 || ' ' || w2) AS d_bi
        FROM bigrams GROUP BY doc_id
    ),
    tristats AS (
        SELECT doc_id, count(*) AS n_tri, count(DISTINCT g) AS d_tri
        FROM trigrams GROUP BY doc_id
    )
    SELECT w.doc_id,
           w.n_words,
           round(1.0 * w.top_word_count / w.n_words, 4) AS top_word_frac,
           round(1.0 - 1.0 * b.d_bi / b.n_bi, 4) AS dup_bigram_frac,
           round(1.0 - 1.0 * t.d_tri / t.n_tri, 4) AS dup_trigram_frac
    FROM wordstats w
    JOIN bistats b ON w.doc_id = b.doc_id
    JOIN tristats t ON w.doc_id = t.doc_id
    WHERE w.n_words >= 3
    """,
    survey_ref="north-star quality family: Gopher/MassiveText repetition "
               "signals (duplicate n-gram fractions, top-word mass) — "
               "array projections + one hash aggregate",
    doc="Per-document repetition heuristics from the Gopher data pipeline: "
        "fraction of repeated word bigrams/trigrams and the share of the "
        "most frequent word. The n-gram ratios never leave the row "
        "(zip-of-slices n-gram arrays + array_distinct), so at 100 TB the "
        "only shuffle is the (doc_id, word) count for the top-word mass — "
        "map-side combinable with bounded key width.",
)
def q216_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # stage the arrays ONCE (the former shape re-derived the word split
    # per consuming expression), and compute the top-word count in
    # array-land too: the max count of any word equals the longest
    # equal-run in the SORTED word array — a linear fold, which turns
    # the former explode + two shuffled aggregates + join into a pure
    # projection. The whole query is now map-only: zero exchanges.
    staged = docs.select(
        "doc_id",
        _words().alias("ws"),
        _ngram_array(_words(), 2).alias("bi"),
        _ngram_array(_words(), 3).alias("tri"),
    ).select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        F.size("bi").alias("n_bi"),
        F.size(F.array_distinct("bi")).alias("d_bi"),
        F.size("tri").alias("n_tri"),
        F.size(F.array_distinct("tri")).alias("d_tri"),
        F.array_sort("ws").alias("sw"),
    ).filter(F.col("n_words") >= 3)

    run = F.aggregate(
        F.sequence(F.lit(1), F.size("sw") - 1),
        F.struct(
            F.lit(1).cast("long").alias("cur"),
            F.lit(1).cast("long").alias("best"),
        ),
        lambda acc, i: F.struct(
            F.when(F.col("sw")[i] == F.col("sw")[i - 1], acc["cur"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("cur"),
            F.greatest(
                acc["best"],
                F.when(
                    F.col("sw")[i] == F.col("sw")[i - 1], acc["cur"] + 1
                ).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return staged.select(
        "doc_id",
        "n_words",
        F.round(run / F.col("n_words"), 4).alias("top_word_frac"),
        F.round(1.0 - F.col("d_bi") / F.col("n_bi"), 4).alias(
            "dup_bigram_frac"
        ),
        F.round(1.0 - F.col("d_tri") / F.col("n_tri"), 4).alias(
            "dup_trigram_frac"
        ),
    )


@register(
    "q217_pmi_collocations",
    oracle="WITH " + _WORDPOS_CTE + """,
    lm AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bigrams GROUP BY w1, w2
    ),
    leftc AS (SELECT w1, sum(c12) AS c1 FROM lm GROUP BY w1),
    rightc AS (SELECT w2, sum(c12) AS c2 FROM lm GROUP BY w2),
    total AS (SELECT sum(c12) AS n FROM lm),
    scored AS (
        SELECT lm.w1, lm.w2, lm.c12,
               round(log2(1.0 * lm.c12 * total.n / (leftc.c1 * rightc.c2)), 4)
                   AS pmi
        FROM lm
        JOIN leftc ON lm.w1 = leftc.w1
        JOIN rightc ON lm.w2 = rightc.w2
        CROSS JOIN total
        WHERE lm.c12 >= 5
    )
    SELECT w1, w2, c12, pmi
    FROM scored
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
    survey_ref="north-star corpus-analysis family: PMI collocation mining "
               "(adjacent-pair pointwise mutual information) — hash "
               "aggregates + top-k (TakeOrderedAndProject)",
    doc="Corpus-level collocations: PMI of adjacent word pairs with a "
        "min-support gate (c12 >= 5), top-50 by rounded PMI with a full "
        "lexicographic tiebreak. Three aggregates over one exploded "
        "bigram relation; the unigram marginals are derived FROM the "
        "bigram counts (no second corpus pass) and join back hash-keyed. "
        "Ordering uses the ROUNDED score so the k-boundary is identical "
        "on every engine.",
)
def q217_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    bg = _bigrams(spark, sf_dir)
    # the vocabulary-bounded count table feeds FOUR branches (left/right
    # marginals, the 1-row total broadcast, and the scored join) — each
    # embedded the whole corpus bigram-explode+count subtree (broadcast
    # build sides defeat exchange reuse). One lazy checkpoint counts the
    # corpus once (guide §1.2/§5).
    lm = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
        .localCheckpoint(eager=False)
    )
    leftc = lm.groupBy("w1").agg(F.sum("c12").alias("c1"))
    rightc = lm.groupBy("w2").agg(F.sum("c12").alias("c2"))
    total = lm.agg(F.sum("c12").alias("n"))
    scored = (
        lm.filter(F.col("c12") >= 5)
        .join(leftc, "w1")
        .join(rightc, "w2")
        .crossJoin(F.broadcast(total))  # 1-row relation: safe forced broadcast
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log2(F.col("c12") * F.col("n") / (F.col("c1") * F.col("c2"))),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(50)


@register(
    "q218_gap_fill_resample",
    oracle="""
    WITH obs AS (
        SELECT user_id,
               date_trunc('hour', ts) AS h,
               round(avg(value), 4) AS v
        FROM events
        WHERE user_id % 10 = 0
        GROUP BY user_id, date_trunc('hour', ts)
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(min_h, max_h,
                                               INTERVAL 1 HOUR)) AS h
        FROM (
            SELECT user_id, min(h) AS min_h, max(h) AS max_h
            FROM obs GROUP BY user_id
        )
    ),
    joined AS (
        SELECT g.user_id, g.h, o.v,
               CAST(o.v IS NOT NULL AS BIGINT) AS is_observed,
               count(o.v) OVER (PARTITION BY g.user_id ORDER BY g.h
                                ROWS UNBOUNDED PRECEDING) AS grp
        FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h
    )
    SELECT user_id, h,
           max(v) OVER (PARTITION BY user_id, grp) AS v_filled,
           is_observed
    FROM joined
    """,
    survey_ref="north-star time-series family: resample to a regular grid "
               "+ forward fill (the two-window last-non-null trick); §2B "
               "windows, generator functions",
    doc="Regularize a sparse per-user value series onto an hourly grid "
        "with last-observation-carried-forward: sequence() generates the "
        "grid rows, a left join attaches observations, and the fill is "
        "count(obs)-running-window group ids + a per-group max — no "
        "ignore-nulls window (portable) and both windows plus the join "
        "share ONE hash shuffle on user_id. State per key is the grid "
        "length; keys partition freely at 100 TB.",
)
def q218_gap_fill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.avg("value"), 4).alias("v"))
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("h").alias("min_h"), F.max("h").alias("max_h"))
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(min_h, max_h, interval 1 hour)")
            ).alias("h"),
        )
    )
    joined = grid.join(obs, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        "v",
        F.col("v").isNotNull().cast("long").alias("is_observed"),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    joined = joined.withColumn("grp", F.count("v").over(w_run))
    return joined.select(
        "user_id",
        "h",
        F.max("v").over(W.partitionBy("user_id", "grp")).alias("v_filled"),
        "is_observed",
    )


@register(
    "q219_embedding_dim_stats",
    oracle="""
    WITH flat AS (
        SELECT label,
               CAST(dim AS BIGINT) AS dim,
               CAST(v AS DOUBLE) AS v
        FROM (
            SELECT label,
                   unnest(embedding) AS v,
                   unnest(range(0, len(embedding))) AS dim
            FROM embeddings
        )
    )
    SELECT label, dim,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(v) / count(*), 4) AS mean,
           round(sum(v * v) / count(*)
                 - (sum(v) / count(*)) * (sum(v) / count(*)), 4) AS var_pop
    FROM flat
    GROUP BY label, dim
    """,
    survey_ref="north-star embedding family: per-label per-dimension "
               "moment profile (n/mean/population variance) — posexplode "
               "+ one map-side-combinable aggregate",
    doc="Moment profile of the embedding space per class label: each "
        "vector fans out to exactly d=(dim count) rows, then ONE hash "
        "aggregate on (label, dim) computes count/mean/variance from raw "
        "sums (explicit sum/sum-of-squares so both engines run the "
        "identical formula). Key space is |labels| x d — fixed, so the "
        "shuffle never grows with the corpus; partial aggregation does "
        "the heavy lifting map-side at 100 TB.",
)
def q219_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label", F.col("dim").cast("long").alias("dim"),
        F.col("v").cast("double").alias("v"),
    )
    return flat.groupBy("label", "dim").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("v") / F.count("*"), 4).alias("mean"),
        F.round(
            F.sum(F.col("v") * F.col("v")) / F.count("*")
            - (F.sum("v") / F.count("*")) * (F.sum("v") / F.count("*")),
            4,
        ).alias("var_pop"),
    )


@register(
    "q220_duplicate_span_removal",
    oracle="WITH " + _WORDPOS_CTE + """,
    grams AS (
        SELECT a.doc_id, a.pos,
               a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS g
        FROM wordpos a
        JOIN wordpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN wordpos c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        JOIN wordpos d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
        JOIN wordpos e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
    cov AS (
        SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p
        FROM (
            SELECT gr.doc_id, unnest(range(gr.pos, gr.pos + 5)) AS p
            FROM grams gr JOIN dup ON gr.g = dup.g
        )
    ),
    kept AS (
        SELECT w.doc_id, w.pos, w.w
        FROM wordpos w
        LEFT JOIN cov ON w.doc_id = cov.doc_id AND w.pos = cov.p
        WHERE cov.p IS NULL
    ),
    stats AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words
        FROM wordpos GROUP BY doc_id
    ),
    covn AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        FROM cov GROUP BY doc_id
    ),
    keptagg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_kept,
               md5(string_agg(w, ' ' ORDER BY pos)) AS clean_md5
        FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_words,
           COALESCE(c.n_removed, 0) AS n_removed,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.clean_md5, md5('')) AS clean_md5
    FROM stats s
    LEFT JOIN covn c ON s.doc_id = c.doc_id
    LEFT JOIN keptagg k ON s.doc_id = k.doc_id
    """,
    survey_ref="north-star dedup family: exact duplicated-span removal "
               "(the suffix-array substring dedup of Lee et al. 2022, "
               "'Deduplicating Training Data Makes Language Models "
               "Better', re-expressed as an inverted word-5-gram index) — "
               "finer-grained than the q163 segment dedup",
    doc="Remove every word position covered by a 5-gram that occurs more "
        "than once in the corpus (cross- OR in-document — the Lee et al. "
        "criterion), then rebuild the cleaned text per document. The "
        "suffix array becomes an inverted index: one hash aggregate finds "
        "duplicated grams, a semi-join marks their occurrences, a bounded "
        "x5 explode marks covered positions, and an anti-join keeps the "
        "rest. Every join is equi-keyed on (gram) or (doc_id, pos); "
        "reconstruction is a per-document sorted collect bounded by "
        "document length — at 100 TB nothing here is quadratic and no "
        "relation is forced to broadcast.",
)
def q220_duplicate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    ws = _words()
    wordpos = docs.select(
        "doc_id", F.posexplode(ws).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "w")
    grams = docs.select(
        "doc_id", F.posexplode(_ngram_array(ws, 5)).alias("pos0", "g")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "g")
    dup = (
        grams.groupBy("g")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select("g")
    )
    cov = (
        grams.join(dup, "g", "left_semi")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + 4)).alias("p"),
        )
        .distinct()
    )
    kept = wordpos.join(
        cov,
        (wordpos.doc_id == cov.doc_id) & (wordpos.pos == cov.p),
        "left_anti",
    )
    stats = wordpos.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words")
    )
    # n_removed is DERIVED (n_words - n_kept): every covered position is a
    # valid word position (a gram at pos p needs words p..p+4), so counting
    # cov separately would recompute the whole gram subtree a second time
    # for a number the kept aggregate already determines (r8 guide §1.2;
    # plan: 6 scans -> 4, the duplicated explode+distinct branch is gone).
    keptagg = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            )
        ).alias("clean_md5"),
    )
    n_kept = F.coalesce("n_kept", F.lit(0)).cast("long")
    return (
        stats.join(keptagg, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            (F.col("n_words") - n_kept).cast("long").alias("n_removed"),
            n_kept.alias("n_kept"),
            F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
        )
    )


# --------------------------------------------------------------------------
# BPE merge training (q223)
# --------------------------------------------------------------------------

_BPE_ROUNDS = 3
_BPE_VOCAB = 100

# the triple space-delimited replace used by train (q223) and encode (q224):
# both engines apply EXACTLY three passes, so they agree even on words where
# alternating overlaps would need more passes to reach the true fixpoint.
# The merge pair arrives via LEFT JOIN ON TRUE (not CROSS JOIN): a round
# with NO eligible pair (fully merged / all-single-char vocab) must pass
# sequences through unmerged, not wipe the relation to zero rows.
_BPE_REP_SQL = (
    "CASE WHEN a IS NULL THEN seq ELSE "
    "trim(replace(replace(replace(' ' || seq || ' ',"
    " ' '||a||' '||b||' ', ' '||a||b||' '),"
    " ' '||a||' '||b||' ', ' '||a||b||' '),"
    " ' '||a||' '||b||' ', ' '||a||b||' ')) END"
)


def _bpe_round_sql(prev: str, r: int) -> str:
    """One unrolled BPE merge round: adjacent-pair counts weighted by word
    frequency, best (non-self) pair by (weight desc, a, b), then a
    triple substring replace (space-delimited tokens, so plain replace()
    is exact; three passes reach the fixpoint for distinct-symbol pairs —
    see the q223 doc)."""
    rep = _BPE_REP_SQL
    return f"""
    sy{r} AS (
        SELECT word, cnt,
               unnest(string_split(seq, ' ')) AS sym,
               unnest(range(1, len(string_split(seq, ' ')) + 1)) AS pos
        FROM {prev}
    ),
    p{r} AS (
        SELECT x.sym AS a, y.sym AS b, sum(x.cnt) AS wsum
        FROM sy{r} x JOIN sy{r} y ON x.word = y.word AND y.pos = x.pos + 1
        WHERE x.sym <> y.sym
        GROUP BY x.sym, y.sym
    ),
    b{r} AS (SELECT a, b FROM p{r} ORDER BY wsum DESC, a, b LIMIT 1),
    v{r} AS (
        SELECT word, cnt, {rep} AS seq
        FROM {prev} LEFT JOIN b{r} ON TRUE
    )"""


@register(
    "q223_bpe_merge_train",
    oracle="WITH " + _WORDPOS_CTE + f""",
    wc AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM wordpos GROUP BY w
    ),
    v0 AS (
        SELECT word, cnt,
               trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
        FROM wc ORDER BY cnt DESC, word LIMIT {_BPE_VOCAB}
    ),
    {",".join(_bpe_round_sql(f'v{r - 1}', r) for r in range(1, _BPE_ROUNDS + 1))}
    SELECT v.word, v.cnt, v.seq AS tokens,
           CAST(len(string_split(v.seq, ' ')) AS BIGINT) AS n_tokens,
           b1.a || '+' || b1.b AS merge1,
           b2.a || '+' || b2.b AS merge2,
           b3.a || '+' || b3.b AS merge3
    FROM v{_BPE_ROUNDS} v
    LEFT JOIN b1 ON TRUE LEFT JOIN b2 ON TRUE LEFT JOIN b3 ON TRUE
    """,
    survey_ref="north-star tokenizer family: iterative BPE merge TRAINING "
               "(3 unrolled rounds over the word-frequency table) — "
               "completes q180's single-round pair counting",
    doc="Byte-pair-encoding training as dataflow: ONE corpus pass builds "
        "the (word, count) table — the map-side-combinable heavy step at "
        "100 TB — then 3 merge rounds run on the top-100 vocabulary "
        "(tiny, like every real BPE trainer: Sennrich et al. 2016 train "
        "on the word histogram, not the corpus). Each round: adjacent "
        "symbol pairs weighted by word count, best non-self pair by "
        "(weight, then lexicographic), merge applied as a space-"
        "delimited substring replace. Self-pairs (a,a) are excluded so "
        "occurrences are token-disjoint, which makes replace-to-fixpoint "
        "equal the greedy left-to-right BPE merge; three replace passes "
        "reach the fixpoint (a pass only misses an occurrence whose "
        "leading space was consumed by the previous match, and merging "
        "that neighbor isolates it for the next pass). The 1-row best-"
        "pair relation broadcasts; nothing in the loop ever reshuffles "
        "the corpus.",
)
def q223_bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    wc = _word_counts(spark, sf_dir)
    vocab, bests = _bpe_train(wc)
    out = vocab.select(
        "word",
        "cnt",
        F.col("seq").alias("tokens"),
        F.size(F.split("seq", " ")).cast("long").alias("n_tokens"),
    )
    for r, best in enumerate(bests, start=1):
        # LEFT join on TRUE: an empty best-pair round contributes a NULL
        # merge column instead of wiping the output to zero rows
        out = out.join(
            F.broadcast(
                best.select(F.concat_ws("+", "a", "b").alias(f"merge{r}"))
            ),
            F.lit(True),
            "left",
        )
    return out


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (word, count) histogram — the single corpus-wide pass shared by
    BPE train and encode; map-side combinable at any scale."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_words()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _char_seq(col):
    """Word → space-delimited character sequence (the BPE start state)."""
    return F.btrim(F.regexp_replace(col, "(.)", "$1 "))


def _apply_merge(seq_col):
    """Triple space-delimited replace of the (a, b) pair in scope — the
    Spark twin of _BPE_REP_SQL; a NULL pair (empty merge round arriving
    via left join) passes the sequence through unmerged."""
    pat = F.concat(F.lit(" "), "a", F.lit(" "), "b", F.lit(" "))
    rep = F.concat(F.lit(" "), "a", F.col("b"), F.lit(" "))
    padded = F.concat(F.lit(" "), seq_col, F.lit(" "))
    merged = F.btrim(
        F.replace(F.replace(F.replace(padded, pat, rep), pat, rep), pat, rep)
    )
    return F.when(F.col("a").isNull(), seq_col).otherwise(merged)


def _bpe_train(wc: DataFrame):
    """Run _BPE_ROUNDS merge rounds on the top-_BPE_VOCAB word histogram.
    Returns (merged vocab with `seq`, [1-row (a, b) DataFrames in merge
    order]). Every relation in the loop is vocabulary-sized."""
    spark = wc.sparkSession
    vocab = (
        wc.orderBy(F.desc("cnt"), "word")
        .limit(_BPE_VOCAB)
        .select("word", "cnt", _char_seq(F.col("word")).alias("seq"))
        # the vocab is <= _BPE_VOCAB rows; checkpointing it ONCE keeps
        # every round's pair scan reading ~100 rows instead of
        # re-deriving the corpus-wide histogram per branch
        .localCheckpoint()
    )
    bests = []
    for _ in range(_BPE_ROUNDS):
        syms = F.split(F.col("seq"), " ")
        pair = F.zip_with(
            syms,
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(1))),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        pairs = (
            vocab.select("cnt", F.explode(pair).alias("p"))
            .filter(
                F.col("p.b").isNotNull() & (F.col("p.a") != F.col("p.b"))
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("wsum"))
        )
        # The best pair is ONE row of control-plane state (the same O(1)
        # driver fingerprint pattern as the graph convergence probe):
        # collecting it here costs one job over the <=100-row vocab chain
        # and turns every downstream use into a LocalTableScan, where the
        # former lazy 1-row DataFrame re-executed its agg+limit subquery
        # per consuming broadcast AND forced a localCheckpoint per round
        # (2-3 jobs/round -> 1). An empty round stays an empty relation,
        # so the NULL-pass-through left-join semantics are unchanged.
        row = pairs.orderBy(F.desc("wsum"), "a", "b").limit(1).collect()
        best = spark.createDataFrame(
            [(row[0]["a"], row[0]["b"])] if row else [],
            "a string, b string",
        )
        bests.append(best)
        vocab = vocab.join(F.broadcast(best), F.lit(True), "left").select(
            "word", "cnt", _apply_merge(F.col("seq")).alias("seq")
        )
    return vocab, bests


def _bpe_encode_sql(prev: str, r: int) -> str:
    """One encode pass: apply the already-trained b{r} merge to every word."""
    return f"""
    e{r} AS (
        SELECT word, cnt, {_BPE_REP_SQL} AS seq
        FROM {prev} LEFT JOIN b{r} ON TRUE
    )"""


@register(
    "q224_bpe_encode",
    oracle="WITH " + _WORDPOS_CTE + f""",
    wc AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM wordpos GROUP BY w
    ),
    v0 AS (
        SELECT word, cnt,
               trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
        FROM wc ORDER BY cnt DESC, word LIMIT {_BPE_VOCAB}
    ),
    {",".join(_bpe_round_sql(f'v{r - 1}', r) for r in range(1, _BPE_ROUNDS + 1))},
    e0 AS (
        SELECT word, cnt,
               trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
        FROM wc
    ),
    {",".join(_bpe_encode_sql(f'e{r - 1}', r) for r in range(1, _BPE_ROUNDS + 1))}
    SELECT word, cnt, seq AS tokens,
           CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(replace(word, ' ', '')) AS BIGINT) AS n_chars
    FROM e{_BPE_ROUNDS}
    """,
    survey_ref="north-star tokenizer family: BPE ENCODE — apply the q223-"
               "trained merge list to the full word-type table (the "
               "tokenize-the-corpus step)",
    doc="BPE encoding as dataflow, closing the train→encode loop with "
        "q223: the trained merge list (each merge a 1-row broadcast "
        "relation) is applied IN TRAINING ORDER to every distinct word "
        "in the corpus — the word-TYPE table, which is what production "
        "tokenizers cache (encode once per type, then join tokens back "
        "to occurrences); at 100 TB the type table is millions of rows "
        "while the corpus is trillions, so encoding never touches the "
        "token stream. Each merge application is a codegen'd string "
        "replace — a map over the type table with zero shuffles after "
        "the one histogram aggregate.",
)
def q224_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the word-TYPE table is reused by training (via the vocab) and by the
    # encode chain: checkpoint it so the corpus explode+aggregate runs once
    wc = _word_counts(spark, sf_dir).localCheckpoint()
    _, bests = _bpe_train(wc)
    enc = wc.select("word", "cnt", _char_seq(F.col("word")).alias("seq"))
    for best in bests:
        enc = enc.join(F.broadcast(best), F.lit(True), "left").select(
            "word", "cnt", _apply_merge(F.col("seq")).alias("seq")
        )
    return enc.select(
        "word",
        "cnt",
        F.col("seq").alias("tokens"),
        F.size(F.split("seq", " ")).cast("long").alias("n_tokens"),
        F.length(F.replace(F.col("word"), F.lit(" "), F.lit(""))).cast("long").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# Cross-source contamination matrix (q249)
# --------------------------------------------------------------------------

from sciencebeam_parser_spark.queries.text_ops import (  # noqa: E402
    _MINHASH_SH_SQL,
    _shingle_array,
)


@register(
    "q249_source_overlap_matrix",
    # corpus diagnostics: pairwise shingle Jaccard between source shards.
    # The candidate join is an inverted index on the shingle key, and the
    # per-shingle fan-out is bounded by the (distinct source, shingle)
    # dedup at <= |sources| rows per shingle — never all-pairs over docs.
    oracle="WITH "
    + _MINHASH_SH_SQL
    + """,
    src_sh AS (
        SELECT DISTINCT d.source, s.shingle
        FROM sh s JOIN documents d ON d.doc_id = s.doc_id
    ),
    sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM src_sh GROUP BY source
    ),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM src_sh a
        JOIN src_sh b ON b.shingle = a.shingle AND b.source > a.source
        GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, i.n_shared,
           x.n AS n_a, y.n AS n_b,
           round(CAST(i.n_shared AS DOUBLE)
                 / (x.n + y.n - i.n_shared), 4) AS jaccard
    FROM inter i
    JOIN sizes x ON x.source = i.source_a
    JOIN sizes y ON y.source = i.source_b
    """,
    survey_ref="north-star corpus diagnostics (beside q153 decontaminate, "
               "q193 minhash accuracy): cross-source shingle-overlap "
               "matrix — which shards duplicate each other, the dataset-"
               "composition audit every corpus release runs",
    doc="Source-pair contamination matrix: distinct (source, shingle) "
        "pairs form an inverted index; the self-join on the shingle key "
        "counts shared shingles per source pair (fan-out bounded at "
        "|sources| rows per shingle, so never quadratic in documents), "
        "and Jaccard = shared / (a + b - shared) scores each of the "
        "<= |sources|^2/2 pairs. At 100 TB this is two hash aggregates "
        "and one bounded inverted-index join — the shape q153 uses for "
        "eval decontamination, turned source-pairwise.",
)
def q249_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    src_sh = checkpoint_big(
        # read by the sizes aggregate AND both sides of the pair join;
        # O(corpus shingles) rows, so DISK_ONLY + shingle partitioning
        # (pre-aligns both sides of the self-join below)
        docs.select("source", F.explode(_shingle_array()).alias("shingle"))
        .distinct(),
        "shingle",
    )
    sizes = src_sh.groupBy("source").agg(
        F.count("*").cast("long").alias("n")
    )
    a = src_sh.alias("a")
    b = src_sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("b.shingle") == F.col("a.shingle"))
            & (F.col("b.source") > F.col("a.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    sx = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sy = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sx), "source_a")
        .join(F.broadcast(sy), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                4,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Tokenizer fertility by language (q256)
# --------------------------------------------------------------------------


@register(
    "q256_tokenizer_fertility",
    # the tokenizer-evaluation table every multilingual pipeline builds:
    # per-language fertility (BPE tokens per word) and compression
    # (chars per token) of the q223/q224 trained tokenizer. Exercises
    # the encode-once-per-TYPE-then-join-back-to-occurrences step that
    # q224's doc describes: the corpus token stream is never re-derived,
    # occurrences just equi-join their word type.
    oracle="WITH " + _WORDPOS_CTE + f""",
    wc AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM wordpos GROUP BY w
    ),
    v0 AS (
        SELECT word, cnt,
               trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
        FROM wc ORDER BY cnt DESC, word LIMIT {_BPE_VOCAB}
    ),
    {",".join(_bpe_round_sql(f'v{r - 1}', r) for r in range(1, _BPE_ROUNDS + 1))},
    e0 AS (
        SELECT word, cnt,
               trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
        FROM wc
    ),
    {",".join(_bpe_encode_sql(f'e{r - 1}', r) for r in range(1, _BPE_ROUNDS + 1))},
    enc AS (
        SELECT word,
               CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(word) AS BIGINT) AS n_chars
        FROM e{_BPE_ROUNDS}
    )
    SELECT d.lang,
           CAST(count(DISTINCT p.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(e.n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(e.n_chars) AS BIGINT) AS n_chars,
           round(sum(e.n_tokens) * 1.0 / count(*), 4) AS fertility,
           round(sum(e.n_chars) * 1.0 / sum(e.n_tokens), 4)
               AS chars_per_token
    FROM wordpos p
    JOIN documents d ON d.doc_id = p.doc_id
    JOIN enc e ON e.word = p.w
    GROUP BY d.lang
    """,
    survey_ref="north-star tokenizer family capstone: per-language "
               "fertility / compression evaluation of the q223-trained "
               "BPE tokenizer — the tokenizer-quality table (beside "
               "q68 token counts, q192 vocab growth)",
    doc="Tokenizer fertility: the q224 encode runs once per word TYPE "
        "(vocabulary-bounded), then the occurrence stream recovers its "
        "token counts by an equi-join on the word key and aggregates "
        "per language — tokens/word (fertility) and chars/token "
        "(compression), the metrics that decide whether a tokenizer "
        "under-serves a language. At 100 TB the type table is millions "
        "of rows vs trillions of occurrences, so the only corpus-scale "
        "operations are one explode and one join on the word key; "
        "head-word skew on that join is broadcast territory since the "
        "encoded type table is itself broadcastable after a frequency "
        "cut.",
)
def q256_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    wc = _word_counts(spark, sf_dir).localCheckpoint()
    _, bests = _bpe_train(wc)
    enc = wc.select("word", _char_seq(F.col("word")).alias("seq"))
    for best in bests:
        enc = enc.join(F.broadcast(best), F.lit(True), "left").select(
            "word", _apply_merge(F.col("seq")).alias("seq")
        )
    enc = enc.select(
        "word",
        F.size(F.split("seq", " ")).cast("long").alias("n_tokens"),
        F.length("word").cast("long").alias("n_chars"),
    )
    occ = docs.select(
        "doc_id", "lang", F.explode(_words()).alias("word")
    )
    joined = occ.join(enc, "word")
    return joined.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.round(F.sum("n_tokens") * 1.0 / F.count("*"), 4).alias("fertility"),
        F.round(F.sum("n_chars") * 1.0 / F.sum("n_tokens"), 4).alias(
            "chars_per_token"
        ),
    )
