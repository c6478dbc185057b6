"""UDF-surface queries (SURVEY §2B "UDF / UDAF / UDTF surface"): the two
protocol rows not exercised elsewhere — the grouped-agg pandas UDF (UDAF)
and the Python UDTF (table function).

The production engine prefers built-in expressions for both shapes (the
merged-bbox IS min/max algebra, SURVEY §1.2; tokenization IS
posexplode(split(...))), and the sibling queries implement them that way
(q94-q96 spatial, q80 tokenize). These two queries exercise the *protocol*
with the same semantics so that a custom aggregate or table function the
built-ins genuinely cannot express (a learned merge, a model-backed
generator) has a tested, benchmarked template — and the oracle proves the
UDF path agrees with the relational algebra bit-for-bit.
"""
from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries.registry import register, table

# deterministic synthetic boxes: one per token-ish unit, laid out on pages
# (reference analog: per-token LayoutPageCoordinates, layout_document.py:29-77)
_BOXES_SQL = """
    boxes AS (
        SELECT doc_id,
               CAST(i % 5 AS BIGINT) AS page,
               CAST(10 + (i * 7) % 300 AS DOUBLE) AS x,
               CAST(20 + (i * 13) % 500 AS DOUBLE) AS y,
               CAST(30 + (i % 11) AS DOUBLE) AS width,
               CAST(10 + (i % 5) AS DOUBLE) AS height
        FROM (SELECT doc_id, unnest(range(0, 1 + n_chars % 37)) AS i
              FROM documents WHERE doc_id % 10 = 0)
    )
"""


def _boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic 10% doc slice (same pattern as q148): a grouped-agg
    # pandas UDF pays one Python call per (group, UDF) — the protocol
    # proof doesn't need 25k groups x 5 UDFs of it
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    i = F.explode(F.sequence(F.lit(0), F.col("n_chars") % 37)).alias("i")
    return docs.select("doc_id", i).select(
        "doc_id",
        (F.col("i") % 5).cast("long").alias("page"),
        (10 + (F.col("i") * 7) % 300).cast("double").alias("x"),
        (20 + (F.col("i") * 13) % 500).cast("double").alias("y"),
        (30 + F.col("i") % 11).cast("double").alias("width"),
        (10 + F.col("i") % 5).cast("double").alias("height"),
    )


@register(
    "q147_merged_bbox_udaf",
    oracle="WITH " + _BOXES_SQL + """
    SELECT doc_id, page,
           min(x) AS x, min(y) AS y,
           round(max(x + width) - min(x), 2) AS width,
           round(max(y + height) - min(y), 2) AS height,
           CAST(count(*) AS BIGINT) AS n_boxes
    FROM boxes GROUP BY doc_id, page
    """,
    survey_ref="§2B grouped-agg UDF (pandas_udf GROUPED_AGG) — the "
               "merged-bbox aggregate (LayoutPageCoordinates."
               "get_merged_with, layout_document.py:65-77, 80-98)",
    doc="Per-(doc, page) merged bounding box computed by grouped-agg "
        "pandas UDFs (Arrow-batched per group, partial-agg-free — grouped "
        "aggregation UDFs shuffle raw rows, which is WHY production code "
        "prefers min/max expressions with map-side combine; the oracle's "
        "relational algebra confirms identical results). Template for "
        "custom aggregates the built-ins cannot express.",
)
def q147_merged_bbox_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def min_agg(s: pd.Series) -> float:
        return float(s.min())

    @F.pandas_udf("double")
    def max_agg(s: pd.Series) -> float:
        return float(s.max())

    # grouped-agg pandas UDFs cannot mix with built-in aggregates in one
    # agg() (INVALID_PANDAS_UDF_PLACEMENT) — the count rides the UDF path
    @F.pandas_udf("long")
    def count_agg(s: pd.Series) -> int:
        # s.count() skips nulls — matching SQL count(col) semantics (len(s)
        # would count nulls; this query's boxes are non-null, but the UDAF
        # is documented as the custom-aggregate template, so it must match)
        return int(s.count())

    boxes = _boxes(spark, sf_dir).select(
        "doc_id", "page", "x", "y",
        (F.col("x") + F.col("width")).alias("x2"),
        (F.col("y") + F.col("height")).alias("y2"),
    )
    return (
        boxes.groupBy("doc_id", "page")
        .agg(
            min_agg("x").alias("_x"),
            min_agg("y").alias("_y"),
            max_agg("x2").alias("_x2"),
            max_agg("y2").alias("_y2"),
            count_agg("x").alias("n_boxes"),
        )
        .select(
            "doc_id",
            "page",
            F.col("_x").alias("x"),
            F.col("_y").alias("y"),
            F.round(F.col("_x2") - F.col("_x"), 2).alias("width"),
            F.round(F.col("_y2") - F.col("_y"), 2).alias("height"),
            "n_boxes",
        )
    )


@register(
    "q148_python_udtf_tokenize",
    oracle="""
    SELECT doc_id,
           CAST(pos AS BIGINT) AS token_seq,
           tok AS token,
           CAST(len(tok) AS BIGINT) AS token_len
    FROM (
        -- comprehension (not list_filter + the deprecated arrow lambda)
        -- so a driver-side DuckDB upgrade can't break the oracle
        SELECT doc_id,
               unnest([x FOR x IN string_split_regex(trim(text), '\\s+')
                       IF len(x) > 0]) AS tok,
               unnest(range(1, len([x FOR x IN
                   string_split_regex(trim(text), '\\s+')
                   IF len(x) > 0]) + 1)) AS pos
        FROM documents WHERE doc_id % 20 = 0
    )
    """,
    survey_ref="§2B table function (Python UDTF) — ALTO parse (A2) / CV "
               "box detection (A24) generator shape",
    doc="A REAL Python UDTF (Spark 4 'udtf' protocol: eval yields rows) "
        "expanding each document into token rows via LATERAL join — the "
        "generator template for sources whose per-row output is computed "
        "imperatively (XML parse, model detections). Restricted to a "
        "deterministic 5% doc slice: row-at-a-time Python eval is the "
        "SLOW path, which is exactly the point — the relational twin "
        "(q80, posexplode(split())) is the production plan; this proves "
        "the protocol and the parity.",
)
def q148_python_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token_seq: long, token: string, token_len: long")
    class SplitTokens:
        def eval(self, text: str):  # noqa: D401
            if not text:
                return
            seq = 0
            for tok in text.strip().split():
                if tok:
                    seq += 1
                    yield seq, tok, len(tok)

    spark.udtf.register("split_tokens", SplitTokens)
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    docs.createOrReplaceTempView("q148_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.token_seq, t.token, t.token_len
        FROM q148_docs d, LATERAL split_tokens(d.text) t
        """
    )


@register(
    "q298_wapiti_sidecar_labels",
    # the A11 sidecar-inference path, end-to-end under oracle: each
    # document's first 30 space-split tokens go through the PERSISTENT
    # wapiti-protocol subprocess (stdin/stdout stream, watchdog timeout,
    # retry-with-restart — reference models/wapiti_model_impl.py:25-164)
    # and come back labeled. In-sandbox the sidecar is the deterministic
    # fake LABELER PROCESS (same protocol, SQL-restatable rule); where a
    # real `wapiti` binary is on PATH the same code drives
    # `wapiti label --stream`.
    oracle="""
    WITH words AS (
        SELECT doc_id,
               list_slice(
                   [x FOR x IN string_split(text, ' ') IF x <> ''],
                   1, 30
               ) AS toks
        FROM documents
    ),
    toks AS (
        SELECT doc_id,
               unnest(toks) AS token,
               unnest(range(1, len(toks) + 1)) AS pos
        FROM words
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos, token,
           CASE WHEN translate(token, '0123456789', '') = '' THEN 'B-num'
                WHEN length(token) >= 6 THEN 'B-long'
                WHEN substr(token, 1, 1) IN ('a','e','i','o','u')
                     THEN 'B-vowel'
                ELSE 'I-other' END AS label
    FROM toks
    """,
    survey_ref="§2A A11 sequence labeling — the reference-shaped SIDECAR "
               "inference path (persistent wapiti stream process per "
               "worker, models/wapiti_model_impl.py:25-164), beside "
               "q116's in-process weight-table model and q156's Viterbi "
               "decode",
    doc="Sequence labeling through the wapiti-protocol sidecar: token "
        "sequences (one per document, first 30 literal-space tokens) "
        "stream through mapInPandas; each executor worker holds ONE "
        "persistent labeling subprocess (executor_singleton) speaking "
        "the wapiti stream protocol — token lines + blank-line sequence "
        "terminators in, token<TAB>label lines out — under the "
        "reference's 20 s watchdog-kill + 10-attempt retry-with-restart "
        "contract. Only token/label columns cross the Python boundary, "
        "partition-parallel via repartition_for_python; process startup "
        "amortizes across every task on the worker. The in-sandbox "
        "labeler is a real subprocess with a deterministic rule the "
        "oracle restates (digit/length/vowel classes), so the hash "
        "proves the whole spawn→stream→decode chain.",
)
def q298_wapiti_sidecar_labels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sciencebeam_parser_spark.plans.wapiti_sidecar import WapitiSidecar
    from sciencebeam_parser_spark.utils import (
        executor_singleton,
        repartition_for_python,
    )

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.slice(
            F.filter(F.split("text", " "), lambda x: x != F.lit("")),
            1,
            30,
        ).alias("toks"),
    ).filter(F.size("toks") > 0)

    def run(batches):
        sidecar = executor_singleton("wapiti_sidecar", WapitiSidecar)
        for pdf in batches:
            seqs = [list(t) for t in pdf["toks"]]
            labels = sidecar.label_sequences(seqs)
            out = {"doc_id": [], "pos": [], "token": [], "label": []}
            for doc_id, seq, labs in zip(pdf["doc_id"], seqs, labels):
                for i, (tok, lab) in enumerate(zip(seq, labs), start=1):
                    out["doc_id"].append(doc_id)
                    out["pos"].append(i)
                    out["token"].append(tok)
                    out["label"].append(lab)
            yield pd.DataFrame(out)

    return repartition_for_python(toks, "doc_id").mapInPandas(
        run, "doc_id long, pos long, token string, label string"
    )
