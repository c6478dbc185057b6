"""Training-data generation ETL (SURVEY §2A A30).

Reference: training/cli/generate_data.py — runs the model cascade over a PDF
corpus and, per model, emits (a) the CRF "data" file: one line per token
(or per line for segmentation) holding the token text followed by its
feature values space-joined (models/data.py:46-55 ``LayoutModelData.
data_line``), optionally suffixed with the label when ``--use-model`` is
set (generate_data.py:433+); and (b) a per-document training TEI file.
The ``ModelResultCache`` (generate_data.py:51-56) memoizes model output
across the per-model generators.

Spark mapping: a second driver program over the same operator DAG —
feature generation (A7) is reused as column expressions, the data-line is a
single ``concat_ws`` projection, labels arrive via the model protocol
(plans/models.py), and the TEI sink is reused per model. The cache is
``.cache()`` on the shared labeled-token relation (SURVEY §4 "Result cache
in training pipeline → df.cache() / DAG reuse").
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.features import add_token_features

# the data-line feature order mirrors the generic feature set the engine
# computes (the reference's per-model sets are fixed-order subsets of the
# generic generator, models/data.py:389-697)
DEFAULT_FEATURE_COLUMNS: tuple = (
    "prefix_1", "prefix_2", "prefix_3", "prefix_4",
    "suffix_1", "suffix_2", "suffix_3", "suffix_4",
    "digit_class", "cap_class", "punct_type",
    "line_status", "block_status",
    "font_status", "font_size_status",
    "is_largest_font", "is_smallest_font", "is_larger_than_avg_font",
    "doc_position_bin",
)


def generate_model_data_lines(
    tokens: DataFrame,
    *,
    labels: Optional[DataFrame] = None,
    model_name: Optional[str] = None,
    feature_columns: Sequence[str] = DEFAULT_FEATURE_COLUMNS,
    precomputed_features: bool = False,
) -> DataFrame:
    """Produce the per-token data-line relation for one model:
    (doc_id, token_seq, data_line) where data_line = "<text> <feat1> …
    [<label>]". With `labels`+`model_name` the label column is appended
    (the --use-model path); without, the unlabeled raw_data format."""
    feats = tokens if precomputed_features else add_token_features(tokens)
    cols = [F.col("text")] + [
        F.col(c).cast("string") for c in feature_columns
    ]
    if labels is not None and model_name is not None:
        feats = feats.join(
            labels.filter(F.col("model_name") == model_name).select(
                "doc_id", "token_seq", "label"
            ),
            ["doc_id", "token_seq"],
            "left",
        )
        cols = cols + [F.coalesce("label", F.lit("O"))]
    return feats.select(
        "doc_id",
        "token_seq",
        F.concat_ws(" ", *cols).alias("data_line"),
    )


def generate_training_documents(
    tokens: DataFrame,
    labels: DataFrame,
    model_names: Sequence[str],
) -> dict:
    """The full A30 job: for every requested model emit its data-line
    relation plus the per-doc assembled training text (one string per doc,
    lines in token order — the data-file body). Returns
    {model_name: (data_lines_df, per_doc_df)}. The labeled feature relation
    is cached once and shared across models (ModelResultCache analog)."""
    feats = add_token_features(tokens).cache()
    out = {}
    for name in model_names:
        lines = generate_model_data_lines(
            feats, labels=labels, model_name=name, precomputed_features=True
        )
        # order inside the agg, not before it: collect_list does not
        # preserve pre-groupBy order through the shuffle
        per_doc = lines.groupBy("doc_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("token_seq", "data_line"))
                    ),
                    lambda s: s["data_line"],
                ),
                "\n",
            ).alias("data_file_text"),
            F.count("*").cast("long").alias("n_lines"),
        )
        out[name] = (lines, per_doc)
    return out


def translate_iob_to_grobid(label):
    """IOB2 → GROBID/wapiti tag scheme (training/cli/
    generate_delft_data.py:77-90 ``translate_tags_IOB_to_grobid``):
    ``O`` → ``<other>``, ``B-x`` → ``I-x``, ``I-x`` → ``x``; anything else
    passes through unchanged."""
    tail = F.substring(label, 3, 1_000_000)
    return (
        F.when(label == "O", F.lit("<other>"))
        .when(label.startswith("B-"), F.concat(F.lit("I-"), tail))
        .when(label.startswith("I-"), tail)
        .otherwise(label)
    )


def generate_delft_data_lines(
    labeled_tokens: DataFrame,
    feature_columns: Sequence[str],
    *,
    text_col: str = "text",
    label_col: str = "label",
) -> DataFrame:
    """DELFT training-data conversion (A30, training/cli/
    generate_delft_data.py:172-227): one line per token in the delft DATA
    format — token text, space-joined feature values, then the
    IOB→GROBID-translated tag (``iter_format_tag_result(TagOutputFormats.
    DATA)``). Token/tag alignment, asserted manually in the reference
    (:203-206), holds by construction here (single relation). The blank-line
    document separator (:268-270) is a sink concern, not a row."""
    line = F.concat_ws(
        " ",
        F.col(text_col),
        *[F.col(c).cast("string") for c in feature_columns],
        translate_iob_to_grobid(F.col(label_col)),
    )
    return labeled_tokens.select(
        "doc_id", "token_seq", line.alias("delft_line")
    )


__all__ = [
    "generate_model_data_lines",
    "generate_training_documents",
    "generate_delft_data_lines",
    "translate_iob_to_grobid",
    "DEFAULT_FEATURE_COLUMNS",
]


def generate_exact_model_data_lines(
    tokens: DataFrame,
    model_name: str,
    *,
    labels: Optional[DataFrame] = None,
    first_name_terms: Optional[DataFrame] = None,
    last_name_terms: Optional[DataFrame] = None,
    country_terms: Optional[DataFrame] = None,
) -> DataFrame:
    """A30 with the EXACT per-model CRF vectors (the reference's per-model
    data generators, reproduced field-for-field by the operators in
    operators/features.py) instead of the generic feature set:
    (doc_id, token_seq, data_line) with the label appended when ``labels``
    is given (the --use-model path of generate_data.py:433+).

    Token-level models only — segmentation emits per-LINE rows (use
    segmentation_line_features directly). Lookup-using models require
    their gazetteer term DataFrames.
    """
    from sciencebeam_parser_spark.operators.features import (
        affiliation_token_features,
        citation_token_features,
        fulltext_token_features,
        header_token_features,
        name_token_features,
        ref_segmenter_token_features,
    )

    if model_name == "header":
        df = header_token_features(tokens)
    elif model_name == "fulltext":
        df = fulltext_token_features(tokens)
    elif model_name == "citation":
        df = citation_token_features(
            tokens, first_name_terms, last_name_terms
        )
    elif model_name == "name":
        df = name_token_features(tokens, first_name_terms, last_name_terms)
    elif model_name == "affiliation_address":
        df = affiliation_token_features(
            tokens, first_name_terms, country_terms
        )
    elif model_name == "reference_segmenter":
        df = ref_segmenter_token_features(tokens, first_name_terms)
    else:
        raise ValueError(
            f"no exact token-level data generator for {model_name!r}"
        )
    out = df.select("doc_id", "token_seq", "data_line")
    if labels is not None:
        out = out.join(
            labels.filter(F.col("model_name") == model_name).select(
                "doc_id", "token_seq", "label"
            ),
            ["doc_id", "token_seq"],
            "left",
        ).select(
            "doc_id",
            "token_seq",
            F.concat_ws(
                " ", "data_line", F.coalesce("label", F.lit("O"))
            ).alias("data_line"),
        )
    return out
