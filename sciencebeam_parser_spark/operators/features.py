"""Token feature generation (SURVEY §2A A7-A10) as pure column expressions.

The reference computes ~34 categorical features per token (or per line for
segmentation) in Python loops (models/data.py:389-773 and per-model data
generators). Here each feature is a Catalyst expression over the F1 tokens
table — whole-stage codegen'd, shuffling only for the window features
(one shuffle per distinct partitioning: doc, (doc,line), (doc,block)).

Unicode note: the reference uses Python ``str.isdigit``/``islower`` (unicode
classes); we use ASCII classes ``[0-9]``/``[a-z]`` which agree on the ALTO
output the reference sees in practice.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Scalar features
# ---------------------------------------------------------------------------


def prefix_feature(text: Column, n: int) -> Column:
    """models/data.py (ContextAwareLayoutTokenFeatures.get_prefix) — text[:n]."""
    return F.substring(text, 1, n)


def suffix_feature(text: Column, n: int) -> Column:
    """text[-n:] — python slice semantics (whole string when shorter)."""
    return F.when(F.length(text) <= n, text).otherwise(
        F.substring(text, -n, n)
    )


def digit_feature(text: Column) -> Column:
    """get_digit_feature (models/data.py:155-161)."""
    return (
        F.when(text.rlike("^[0-9]+$"), "ALLDIGIT")
        .when(text.rlike("[0-9]"), "CONTAINSDIGITS")
        .otherwise("NODIGIT")
    )


def capitalisation_feature(text: Column) -> Column:
    """get_capitalisation_feature (models/data.py:164-169): ALLCAP when no
    lowercase char, INITCAP when first char uppercase, else NOCAPS."""
    return (
        F.when((F.length(text) > 0) & ~text.rlike("[a-z]"), "ALLCAP")
        .when(text.rlike("^[A-Z]"), "INITCAP")
        .otherwise("NOCAPS")
    )


_PUNCT_MAP = {
    "(": "OPENBRACKET",
    "[": "OPENBRACKET",
    ")": "ENDBRACKET",
    "]": "ENDBRACKET",
    ".": "DOT",
    ",": "COMMA",
    "-": "HYPHEN",
    "–": "HYPHEN",
    '"': "QUOTE",
    "'": "QUOTE",
    "`": "QUOTE",
    "’": "QUOTE",
}
IS_PUNCT_PATTERN = r"^[\,\:;\?\.]+$"


def punctuation_type_feature(text: Column) -> Column:
    """get_punctuation_type_feature (models/data.py:316-322) +
    PUNCTUATION_PROFILE_MAP (:185-198)."""
    expr = None
    for ch, val in _PUNCT_MAP.items():
        cond = text == ch
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.when(text.rlike(IS_PUNCT_PATTERN), "PUNCT").otherwise("NOPUNCT")


def linear_scaling_bin(pos: Column, total: Column, bin_count: int) -> Column:
    """feature_linear_scaling_int (models/data.py:117-128): floor(pos/total*n),
    clamped to [0, n]."""
    return (
        F.when(pos >= total, F.lit(bin_count))
        .when(pos <= 0, F.lit(0))
        .otherwise(F.floor(pos / total * bin_count).cast("int"))
    )


# ---------------------------------------------------------------------------
# Window features over the tokens table
# ---------------------------------------------------------------------------


def add_token_features(tokens: DataFrame, *, position_bins: int = 10) -> DataFrame:
    """Add the A7/A8/A10 feature columns to an F1 tokens DataFrame.

    Window partitionings used (each = one shuffle, reused across features):
      * (doc_id) ordered by token_seq — previous-token font deltas, doc aggs
      * (doc_id, line_id) / (doc_id, block_id) — line/block status
    """
    t = F.col("text")
    w_doc = W.partitionBy("doc_id").orderBy("token_seq")
    w_doc_all = W.partitionBy("doc_id")
    w_line = W.partitionBy("doc_id", "line_id").orderBy("token_seq")
    w_line_desc = W.partitionBy("doc_id", "line_id").orderBy(F.desc("token_seq"))
    w_block_lines = W.partitionBy("doc_id", "block_id").orderBy("line_id")

    prev_family = F.lag("font_family").over(w_doc)
    prev_size = F.lag("font_size").over(w_doc)
    # lag of a non-null column: null ⇔ first token of the doc
    has_prev = F.lag("token_seq").over(w_doc).isNotNull()

    df = tokens.select(
        "*",
        # prefixes / suffixes 1-4
        *[prefix_feature(t, n).alias(f"prefix_{n}") for n in (1, 2, 3, 4)],
        *[suffix_feature(t, n).alias(f"suffix_{n}") for n in (1, 2, 3, 4)],
        digit_feature(t).alias("digit_class"),
        capitalisation_feature(t).alias("cap_class"),
        punctuation_type_feature(t).alias("punct_type"),
        F.length(t).alias("token_length"),
        # font vs previous token — get_token_font_status /
        # get_token_font_size_feature (models/data.py:131-154). Note the
        # reference compares families with Python == (None == None is SAME);
        # only a missing previous *token* forces NEWFONT.
        F.when(~has_prev, "NEWFONT")
        .when(F.col("font_family").eqNullSafe(prev_family), "SAMEFONT")
        .otherwise("NEWFONT")
        .alias("font_status"),
        F.when(
            ~has_prev
            | prev_size.isNull()
            | (prev_size == 0.0)
            | F.col("font_size").isNull()
            | (F.col("font_size") == 0.0)
            | (prev_size < F.col("font_size")),
            "HIGHERFONT",
        )
        .when(prev_size > F.col("font_size"), "LOWERFONT")
        .otherwise("SAMEFONTSIZE")
        .alias("font_size_status"),
        # doc-level font aggregates — RelativeFontSizeFeature
        # (models/data.py:263-295); nulls excluded by Spark aggs natively
        (F.col("font_size") == F.max("font_size").over(w_doc_all)).alias(
            "is_largest_font"
        ),
        (F.col("font_size") == F.min("font_size").over(w_doc_all)).alias(
            "is_smallest_font"
        ),
        F.coalesce(
            F.col("font_size") > F.avg("font_size").over(w_doc_all), F.lit(False)
        ).alias("is_larger_than_avg_font"),
        # line/block status — models/data.py:221-260
        F.when(F.row_number().over(w_line) == 1, "LINESTART")
        .when(F.row_number().over(w_line_desc) == 1, "LINEEND")
        .otherwise("LINEIN")
        .alias("line_status"),
        F.dense_rank().over(w_block_lines).alias("_line_in_block"),
        # relative document position bin — used via
        # get_str_number_relative_document_token_position
        # (models/data.py:636-656)
        linear_scaling_bin(
            F.row_number().over(w_doc) - 1,
            F.count("*").over(w_doc_all),
            position_bins,
        ).alias("doc_position_bin"),
    )
    n_lines_in_block = F.max("_line_in_block").over(
        W.partitionBy("doc_id", "block_id")
    )
    df = df.withColumn(
        "block_status",
        # get_block_status_with_blockstart_for_single_token (models/data.py:244-259)
        F.when(
            (F.col("_line_in_block") == 1) & (F.col("line_status") == "LINESTART"),
            "BLOCKSTART",
        )
        .when(
            (F.col("_line_in_block") == n_lines_in_block)
            & (F.col("line_status") == "LINEEND"),
            "BLOCKEND",
        )
        .otherwise("BLOCKIN"),
    ).drop("_line_in_block")
    return df


def add_line_indentation(tokens: DataFrame) -> DataFrame:
    """A10 — LineIndentationStatusFeature (models/data.py:298-321).

    Stateful scan over line starts: indentation flips on when a line starts
    more than one character-width right of the previous line, off when more
    than one character-width left; otherwise carries. The carry is expressed
    as last(non-null flip) over preceding lines — no per-row Python.
    """
    w_line = W.partitionBy("doc_id", "line_id").orderBy("token_seq")
    line_starts = (
        tokens.withColumn("_rn", F.row_number().over(w_line))
        .filter((F.col("_rn") == 1) & F.col("x").isNotNull() & (F.length("text") > 0))
        .select(
            "doc_id",
            "line_id",
            F.col("x").alias("_line_x"),
            (F.col("width") / F.length("text")).alias("_char_w"),
        )
    )
    w_lines = W.partitionBy("doc_id").orderBy("line_id")
    prev_x = F.lag("_line_x").over(w_lines)
    flip = (
        F.when(F.col("_line_x") - prev_x > F.col("_char_w"), F.lit(True))
        .when(prev_x - F.col("_line_x") > F.col("_char_w"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
    flags = line_starts.withColumn(
        "is_indented",
        F.coalesce(
            F.last(flip, ignorenulls=True).over(
                w_lines.rowsBetween(W.unboundedPreceding, 0)
            ),
            F.lit(False),
        ),
    ).select("doc_id", "line_id", "is_indented")
    return tokens.join(flags, ["doc_id", "line_id"], "left").withColumn(
        "is_indented", F.coalesce("is_indented", F.lit(False))
    )


def add_repetitive_patterns(tokens: DataFrame) -> DataFrame:
    """A9 — repetitive pattern detection (models/segmentation/data.py:161-232).

    Candidate lines: first line of blocks with index < 2 or == last on each
    page; pattern = lowercased text stripped of non-letters
    (get_text_pattern, :66-68), kept when len >= 8; repetitive when the
    pattern occurs more than once in the document; ``is_first_repetitive``
    marks the first candidate line (document order) carrying that pattern.

    Returns one row per candidate line: (doc_id, line_id, pattern,
    is_repetitive_pattern, is_first_repetitive_pattern).
    """
    # line text in order — join_layout_tokens (layout_document.py:500-509)
    lines = (
        tokens.groupBy("doc_id", "page_number", "block_id", "line_id")
        .agg(
            F.min("token_seq").alias("line_seq"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("token_seq", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("line_text"),
        )
    )
    w_block_in_page = W.partitionBy("doc_id", "page_number").orderBy("block_id")
    w_line_in_block = W.partitionBy("doc_id", "block_id").orderBy("line_id")
    blocks_per_page = F.count("*").over(
        W.partitionBy("doc_id", "page_number")
    )
    first_lines = (
        lines.withColumn("_line_idx", F.row_number().over(w_line_in_block))
        .filter(F.col("_line_idx") == 1)
        .withColumn("_block_idx", F.row_number().over(w_block_in_page) - 1)
        .withColumn("_n_blocks", blocks_per_page)
        .filter(
            (F.col("_block_idx") < 2) | (F.col("_block_idx") == F.col("_n_blocks") - 1)
        )
    )
    candidates = first_lines.withColumn(
        "pattern",
        F.lower(F.regexp_replace("line_text", "[^a-zA-Z ]", "")),
    ).filter(F.length("pattern") >= 8)
    w_pattern = W.partitionBy("doc_id", "pattern")
    w_pattern_seq = w_pattern.orderBy("line_seq")
    return candidates.select(
        "doc_id",
        "page_number",
        "block_id",
        "line_id",
        "pattern",
        (F.count("*").over(w_pattern) > 1).alias("is_repetitive_pattern"),
        (
            (F.count("*").over(w_pattern) > 1)
            & (F.row_number().over(w_pattern_seq) == 1)
        ).alias("is_first_repetitive_pattern"),
    )
