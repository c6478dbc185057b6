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


def bool_str_feature(c: Column) -> Column:
    """'1'/'0' string boolean (null → '0') — the data_line bool encoding
    shared by every per-model feature generator."""
    return F.when(F.coalesce(c, F.lit(False)), "1").otherwise("0")


def cap_with_digit_override(text: Column) -> Column:
    """Capitalisation class with the ALLDIGIT→NOCAPS override
    (models/data.py: all-digit tokens report NOCAPS, not their case)."""
    return F.when(digit_feature(text) == "ALLDIGIT", "NOCAPS").otherwise(
        capitalisation_feature(text)
    )


def font_statuses(prev_missing: Column, prev_family: Column,
                  cur_family: Column, prev_size: Column,
                  cur_size: Column) -> tuple:
    """(font_status, font_size_status) vs the previous unit —
    get_token_font_status / get_token_font_size_feature
    (models/data.py:131-154). One definition for all generators: the
    reference compares families with Python == (None == None is SAME),
    hence eqNullSafe; only a missing previous unit forces NEWFONT, and
    missing/zero sizes on either side report HIGHERFONT."""
    font_status = (
        F.when(prev_missing, "NEWFONT")
        .when(cur_family.eqNullSafe(prev_family), "SAMEFONT")
        .otherwise("NEWFONT")
    )
    font_size_status = (
        F.when(
            prev_missing
            | prev_size.isNull()
            | (prev_size == 0.0)
            | cur_size.isNull()
            | (cur_size == 0.0)
            | (prev_size < cur_size),
            "HIGHERFONT",
        )
        .when(prev_size > cur_size, "LOWERFONT")
        .otherwise("SAMEFONTSIZE")
    )
    return font_status, font_size_status


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
    _fs = font_statuses(
        ~has_prev, prev_family, F.col("font_family"), prev_size,
        F.col("font_size"),
    )

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
        _fs[0].alias("font_status"),
        _fs[1].alias("font_size_status"),
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


# Characters kept by the line punctuation profile —
# PUNCTUATION_PROFILE_CHARACTERS (models/data.py:204-207) minus whitespace
# (space / NBSP are excluded by the reference's `not c.isspace()` guard).
# Escaped for use inside a regex character class (Java regex and RE2 agree
# on these literal escapes; no \uXXXX escapes — RE2 drops them silently).
_PUNCT_PROFILE_CLASS = "(（\\[•*,:;?.!/)）\\-−–‐«»„\"“”‘’'`$#@\\]♦♥♣♠"
PUNCT_PROFILE_STRIP_RE = "[^" + _PUNCT_PROFILE_CLASS + "]"

_NBSP = " "


def segmentation_line_features(
    tokens: DataFrame,
    *,
    use_first_token_of_block: bool = True,
    position_bins: int = 12,
    line_scale: int = 10,
) -> DataFrame:
    """A7 segmentation data generator — the 34-feature line vector
    (models/segmentation/data.py:237-303) as pure Catalyst expressions.

    One output row per layout line; ``data_line`` is the space-joined
    34-feature string the reference feeds to the CRF (order asserted at
    segmentation/data.py:293-298). The reference walks the document in a
    Python loop carrying mutable state (previous token, pattern counter,
    running token index); here each piece of state is a window:

    * previous selected token        → ``lag()`` over (doc) by line_seq
    * running document token index   → running ``sum()`` (exclusive frame)
    * block line index/count/max-len → windows over (doc, block)
    * page block index/count         → dense_rank + max over (doc, page)
    * repetitive pattern counter     → count/row_number over (doc, pattern)

    All partitions key on doc_id prefixes, so per-partition state is bounded
    by document size regardless of corpus scale.

    Input: F1 tokens with doc_id, page_number, block_id, line_id, token_seq,
    text, font_family, font_size, is_bold, is_italics.
    """
    # -- per-line aggregation (one shuffle) --------------------------------
    texts_sorted = F.transform(
        F.array_sort(F.collect_list(F.struct("token_seq", "text"))),
        lambda s: s["text"],
    )
    lines = tokens.groupBy("doc_id", "page_number", "block_id", "line_id").agg(
        F.min("token_seq").alias("line_seq"),
        F.count("*").alias("n_line_tokens"),
        F.array_join(texts_sorted, " ").alias("line_text"),
        F.get(texts_sorted, 0).alias("_tok1"),
        F.get(texts_sorted, 1).alias("_tok2"),
        F.min_by(
            F.struct("font_family", "font_size", "is_bold", "is_italics"),
            F.col("token_seq"),
        ).alias("_ftok"),
    )

    # -- block windows ------------------------------------------------------
    w_block = W.partitionBy("doc_id", "block_id").orderBy("line_seq")
    w_block_all = W.partitionBy("doc_id", "block_id")
    w_block_frame = w_block.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    lines = lines.select(
        "*",
        (F.row_number().over(w_block) - 1).alias("line_index"),
        F.count("*").over(w_block_all).alias("line_count"),
        F.max(F.length("line_text")).over(w_block_all).alias("_max_line_len"),
        F.first("_ftok").over(w_block_frame).alias("_block_ftok"),
    )

    # -- page windows -------------------------------------------------------
    w_page = W.partitionBy("doc_id", "page_number")
    lines = lines.withColumn(
        "block_index", F.dense_rank().over(w_page.orderBy("block_id")) - 1
    )
    lines = lines.withColumn(
        "block_count", F.max(F.col("block_index") + 1).over(w_page)
    )

    # -- document windows ---------------------------------------------------
    w_doc = W.partitionBy("doc_id").orderBy("line_seq")
    w_doc_all = W.partitionBy("doc_id")
    sel = F.col("_block_ftok") if use_first_token_of_block else F.col("_ftok")
    lines = lines.select(
        "*",
        sel.alias("_sel"),
        F.lag(sel).over(w_doc).alias("_prev"),
        F.coalesce(
            F.sum("n_line_tokens").over(w_doc.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("doc_token_index"),
        F.sum("n_line_tokens").over(w_doc_all).alias("doc_token_count"),
    )

    # -- repetitive patterns (models/segmentation/data.py:161-232) ----------
    is_candidate = (F.col("line_index") == 0) & (
        (F.col("block_index") < 2)
        | (F.col("block_index") == F.col("block_count") - 1)
    )
    pattern = F.lower(F.regexp_replace("line_text", "[^a-zA-Z ]", ""))
    lines = lines.withColumn(
        "_pattern",
        F.when(is_candidate & (F.length(pattern) >= 8), pattern),
    )
    w_pat = W.partitionBy("doc_id", "_pattern")
    repetitive = F.col("_pattern").isNotNull() & (
        F.count("*").over(w_pat) > 1
    )
    first_repetitive = repetitive & (
        F.row_number().over(w_pat.orderBy("line_seq")) == 1
    )

    # -- the 34 features ----------------------------------------------------
    tok1 = F.coalesce(F.col("_tok1"), F.lit(""))
    f_token = tok1
    f_second = F.when(
        F.coalesce(F.col("_tok2"), F.lit("")) != "", F.col("_tok2")
    ).otherwise(tok1)
    digit = digit_feature(tok1)
    cap = cap_with_digit_override(tok1)
    block_status = (
        F.when(F.col("line_index") == 0, "BLOCKSTART")
        .when(F.col("line_index") == F.col("line_count") - 1, "BLOCKEND")
        .otherwise("BLOCKIN")
    )
    page_status = (
        F.when(
            (F.col("block_index") == 0) & (F.col("line_index") == 0), "PAGESTART"
        )
        .when(
            (F.col("block_index") == F.col("block_count") - 1)
            & (F.col("line_index") == F.col("line_count") - 1),
            "PAGEEND",
        )
        .otherwise("PAGEIN")
    )
    # _sel is a min_by struct over a non-empty group, hence never null —
    # a null lagged struct therefore means "first line of the document"
    prev_missing = F.col("_prev").isNull()
    font_status, font_size_status = font_statuses(
        prev_missing,
        F.col("_prev.font_family"),
        F.col("_sel.font_family"),
        F.col("_prev.font_size"),
        F.col("_sel.font_size"),
    )
    bool_str = bool_str_feature
    raw_profile = F.regexp_replace("line_text", PUNCT_PROFILE_STRIP_RE, "")
    profile = F.when(raw_profile == "", "no").otherwise(raw_profile)
    whole_line = F.translate(F.trim("line_text"), " \t", _NBSP + _NBSP)
    feats = {
        "token_text": f_token,
        "second_token_text": f_second,
        "lower_token_text": F.lower(tok1),
        "prefix_1": prefix_feature(tok1, 1),
        "prefix_2": prefix_feature(tok1, 2),
        "prefix_3": prefix_feature(tok1, 3),
        "prefix_4": prefix_feature(tok1, 4),
        "block_status": block_status,
        "page_status": page_status,
        "font_status": font_status,
        "font_size_status": font_size_status,
        "is_bold": bool_str(F.col("_sel.is_bold")),
        "is_italic": bool_str(F.col("_sel.is_italics")),
        "cap_status": cap,
        "digit_status": digit,
        "is_single_char": bool_str(F.length(tok1) == 1),
        "rel_doc_position": linear_scaling_bin(
            F.col("doc_token_index"), F.col("doc_token_count"), position_bins
        ).cast("string"),
        "line_punct_profile": profile,
        "punct_profile_len": F.length(raw_profile).cast("string"),
        "block_rel_line_len": linear_scaling_bin(
            F.length("line_text"), F.col("_max_line_len"), line_scale
        ).cast("string"),
        "is_repetitive": bool_str(repetitive),
        "is_first_repetitive": bool_str(first_repetitive),
        "whole_line": whole_line,
    }
    zero = F.lit("0")
    # exact reference order, segmentation/data.py:257-291
    data_line_cols = [
        feats["token_text"], feats["second_token_text"],
        feats["lower_token_text"],
        feats["prefix_1"], feats["prefix_2"], feats["prefix_3"],
        feats["prefix_4"],
        feats["block_status"], feats["page_status"],
        feats["font_status"], feats["font_size_status"],
        feats["is_bold"], feats["is_italic"],
        feats["cap_status"], feats["digit_status"], feats["is_single_char"],
        zero, zero, zero, zero, zero, zero, zero,  # dummy name/date/email/http
        feats["rel_doc_position"], zero,
        feats["line_punct_profile"], feats["punct_profile_len"],
        feats["block_rel_line_len"],
        zero, zero,  # dummy bitmap/vector around
        feats["is_repetitive"], feats["is_first_repetitive"],
        F.lit("1"),  # dummy is_main_area
        feats["whole_line"],
    ]
    return lines.select(
        "doc_id",
        "page_number",
        "block_id",
        "line_id",
        "line_seq",
        *[expr.alias(name) for name, expr in feats.items()],
        F.concat_ws(" ", *data_line_cols).alias("data_line"),
    )


def add_word_shape(
    df: DataFrame, text_col: str = "text", out_col: str = "word_shape"
) -> DataFrame:
    """get_word_shape_feature (models/data.py:360-383), used by the
    citation/name data generators: char classes digit→d, upper→X, lower→x,
    punctuation kept; shape = first char + middle (consecutive duplicates
    collapsed) + last two of shape[1:].

    The collapse uses an index-lambda array filter (keep c[i] when i==0 or
    c[i-1]≠c[i]) — RE2 has no backreferences, so the regex '(.)\\1+' form
    would not be oracle-portable. ASCII char classes as elsewhere (A7)."""
    shape = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), "[a-z]", "x"), "[A-Z]", "X"
        ),
        "[0-9]",
        "d",
    )
    df = df.withColumn("_shape", shape)
    n = F.length("_shape")
    df = df.withColumn(
        "_mid",
        F.when(
            n >= 4, F.expr("substring(_shape, 2, length(_shape) - 3)")
        ).otherwise(F.lit("")),
    )
    chars = F.split(F.col("_mid"), "")
    collapsed = F.array_join(
        F.filter(
            chars, lambda c, i: (i == F.lit(0)) | (F.get(chars, i - 1) != c)
        ),
        "",
    )
    suffix = (
        F.when(n >= 3, F.expr("substring(_shape, length(_shape) - 1, 2)"))
        .when(n == 2, F.expr("substring(_shape, 2, 1)"))
        .otherwise(F.lit(""))
    )
    return df.withColumn(
        out_col,
        F.concat(F.substring(F.col("_shape"), 1, 1), collapsed, suffix),
    ).drop("_shape", "_mid")


def header_token_features(tokens: DataFrame) -> DataFrame:
    """A7 header data generator — the 32-feature token vector
    (models/header/data.py:10-52) as pure column expressions.

    One output row per token; ``data_line`` joins the 32 features in the
    reference's exact order (incl. the GROBID-bug dummies: smallest-font
    '0', larger-than-avg '1' — header/data.py:46-50). Same window-per-state
    design as segmentation_line_features, but token-level:

    * line token index/count   → row_number/count over (doc, line)
    * block line index/count   → dense_rank + max over (doc, block)
    * previous token font      → lag over (doc) by token_seq
    * largest font in doc      → max over (doc)
    * alignment (indentation)  → add_line_indentation's line flags

    Input: F1 tokens with doc_id, block_id, line_id, token_seq, text,
    font_family, font_size, is_bold, is_italics, x, width.
    """
    t = F.col("text")
    w_line = W.partitionBy("doc_id", "line_id").orderBy("token_seq")
    w_line_all = W.partitionBy("doc_id", "line_id")
    w_doc = W.partitionBy("doc_id").orderBy("token_seq")
    w_doc_all = W.partitionBy("doc_id")
    w_block = W.partitionBy("doc_id", "block_id")

    base = add_line_indentation(tokens).select(
        "*",
        (F.row_number().over(w_line) - 1).alias("_tok_idx"),
        F.count("*").over(w_line_all).alias("_tok_cnt"),
        (F.dense_rank().over(w_block.orderBy("line_id")) - 1).alias("_line_idx"),
        F.lag("token_seq").over(w_doc).alias("_prev_seq"),
        F.lag("font_family").over(w_doc).alias("_prev_family"),
        F.lag("font_size").over(w_doc).alias("_prev_size"),
        F.max("font_size").over(w_doc_all).alias("_max_size"),
    )
    base = base.withColumn(
        "_line_cnt", F.max(F.col("_line_idx") + 1).over(w_block)
    )

    line_status = (
        F.when(F.col("_tok_idx") == F.col("_tok_cnt") - 1, "LINEEND")
        .when(F.col("_tok_idx") == 0, "LINESTART")
        .otherwise("LINEIN")
    )
    block_status = (
        F.when(
            (F.col("_line_idx") == F.col("_line_cnt") - 1)
            & (line_status == "LINEEND"),
            "BLOCKEND",
        )
        .when(
            (F.col("_line_idx") == 0) & (line_status == "LINESTART"),
            "BLOCKSTART",
        )
        .otherwise("BLOCKIN")
    )
    prev_missing = F.col("_prev_seq").isNull()
    font_status, font_size_status = font_statuses(
        prev_missing,
        F.col("_prev_family"),
        F.col("font_family"),
        F.col("_prev_size"),
        F.col("font_size"),
    )
    bool_str = bool_str_feature
    digit = digit_feature(t)
    cap = cap_with_digit_override(t)
    feats = {
        "token_text": t,
        "lower_token_text": F.lower(t),
        "prefix_1": prefix_feature(t, 1),
        "prefix_2": prefix_feature(t, 2),
        "prefix_3": prefix_feature(t, 3),
        "prefix_4": prefix_feature(t, 4),
        "suffix_1": suffix_feature(t, 1),
        "suffix_2": suffix_feature(t, 2),
        "suffix_3": suffix_feature(t, 3),
        "suffix_4": suffix_feature(t, 4),
        "block_status": block_status,
        "line_status": line_status,
        "alignment_status": F.when(
            F.col("is_indented"), "LINEINDENT"
        ).otherwise("ALIGNEDLEFT"),
        "font_status": font_status,
        "font_size_status": font_size_status,
        "is_bold": bool_str(F.col("is_bold")),
        "is_italic": bool_str(F.col("is_italics")),
        "cap_status": cap,
        "digit_status": digit,
        "is_single_char": bool_str(F.length(t) == 1),
        "punct_type": punctuation_type_feature(t),
        "is_largest_font": bool_str(F.col("font_size") == F.col("_max_size")),
    }
    zero = F.lit("0")
    # exact reference order, header/data.py:15-51
    data_line_cols = [
        feats["token_text"], feats["lower_token_text"],
        feats["prefix_1"], feats["prefix_2"], feats["prefix_3"],
        feats["prefix_4"],
        feats["suffix_1"], feats["suffix_2"], feats["suffix_3"],
        feats["suffix_4"],
        feats["block_status"], feats["line_status"],
        feats["alignment_status"],
        feats["font_status"], feats["font_size_status"],
        feats["is_bold"], feats["is_italic"],
        feats["cap_status"], feats["digit_status"], feats["is_single_char"],
        zero, zero, zero, zero, zero, zero, zero,  # dummy name/date/loc/web
        feats["punct_type"],
        feats["is_largest_font"],
        zero,  # dummy smallest font (GROBID #795)
        F.lit("1"),  # dummy larger-than-average (GROBID #795)
        zero,  # dummy label
    ]
    return base.select(
        "doc_id",
        "block_id",
        "line_id",
        "token_seq",
        *[expr.alias(name) for name, expr in feats.items()],
        F.concat_ws(" ", *data_line_cols).alias("data_line"),
    )


def citation_token_features(
    tokens: DataFrame,
    first_name_terms: DataFrame,
    last_name_terms: DataFrame,
    *,
    position_bins: int = 12,
) -> DataFrame:
    """A7 citation data generator — the 30-feature token vector
    (models/citation/data.py:10-48) as column expressions + two broadcast
    gazetteer joins.

    Unlike header/segmentation, citation features include LIVE lookups:
    is_first_name / is_last_name are TextLookUp membership
    (models/data.py:663-678 _get_str_lookup; lookup/__init__.py
    SimpleTextLookUp = lowercase set) — here broadcast left joins on
    lower(text), so the token fact table never shuffles for them.
    ``*_name_terms``: one lowercase ``term`` column each.

    Input: F1 tokens with doc_id, line_id, token_seq, text.
    """
    t = F.col("text")
    w_line = W.partitionBy("doc_id", "line_id").orderBy("token_seq")
    w_line_all = W.partitionBy("doc_id", "line_id")
    w_doc = W.partitionBy("doc_id").orderBy("token_seq")
    w_doc_all = W.partitionBy("doc_id")

    fn = F.broadcast(
        first_name_terms.select(F.col("term").alias("_fn_term")).distinct()
    )
    ln = F.broadcast(
        last_name_terms.select(F.col("term").alias("_ln_term")).distinct()
    )
    base = (
        tokens.withColumn("_lower", F.lower(t))
        .join(fn, F.col("_lower") == F.col("_fn_term"), "left")
        .join(ln, F.col("_lower") == F.col("_ln_term"), "left")
        .select(
            "*",
            (F.row_number().over(w_line) - 1).alias("_tok_idx"),
            F.count("*").over(w_line_all).alias("_tok_cnt"),
            (F.row_number().over(w_doc) - 1).alias("_doc_idx"),
            F.count("*").over(w_doc_all).alias("_doc_cnt"),
        )
    )
    line_status = (
        F.when(F.col("_tok_idx") == F.col("_tok_cnt") - 1, "LINEEND")
        .when(F.col("_tok_idx") == 0, "LINESTART")
        .otherwise("LINEIN")
    )
    bool_str = bool_str_feature
    digit = digit_feature(t)
    cap = cap_with_digit_override(t)
    feats = {
        "token_text": t,
        "lower_token_text": F.col("_lower"),
        "prefix_1": prefix_feature(t, 1),
        "prefix_2": prefix_feature(t, 2),
        "prefix_3": prefix_feature(t, 3),
        "prefix_4": prefix_feature(t, 4),
        "suffix_1": suffix_feature(t, 1),
        "suffix_2": suffix_feature(t, 2),
        "suffix_3": suffix_feature(t, 3),
        "suffix_4": suffix_feature(t, 4),
        "line_status": line_status,
        "cap_status": cap,
        "digit_status": digit,
        "is_single_char": bool_str(F.length(t) == 1),
        "is_first_name": bool_str(F.col("_fn_term").isNotNull()),
        "is_last_name": bool_str(F.col("_ln_term").isNotNull()),
        "punct_type": punctuation_type_feature(t),
        "rel_position": linear_scaling_bin(
            F.col("_doc_idx"), F.col("_doc_cnt"), position_bins
        ).cast("string"),
    }
    zero = F.lit("0")
    # exact reference order, citation/data.py:15-47
    data_line_cols = [
        feats["token_text"], feats["lower_token_text"],
        feats["prefix_1"], feats["prefix_2"], feats["prefix_3"],
        feats["prefix_4"],
        feats["suffix_1"], feats["suffix_2"], feats["suffix_3"],
        feats["suffix_4"],
        feats["line_status"],
        feats["cap_status"], feats["digit_status"], feats["is_single_char"],
        zero, zero,  # dummy proper/common name
        feats["is_first_name"], feats["is_last_name"],
        zero, zero, zero, zero,  # dummy location/year/month/http
        zero, zero, zero, zero, zero,  # dummy known collab…identifier
        feats["punct_type"],
        feats["rel_position"],
        zero,  # dummy label
    ]
    return base.select(
        "doc_id",
        "line_id",
        "token_seq",
        *[expr.alias(name) for name, expr in feats.items()],
        F.concat_ws(" ", *data_line_cols).alias("data_line"),
    )


def ref_segmenter_token_features(
    tokens: DataFrame,
    first_name_terms: DataFrame,
    *,
    line_scale: int = 10,
) -> DataFrame:
    """A7 reference-segmenter data generator — the 28-feature token vector
    (models/reference_segmenter/data.py:10-47).

    Novel pieces vs the header/citation vectors (models/data.py:700-775):
    the line-scoped features use the NO-SPACE concatenation of the line's
    token texts (''.join); ``line_token_relative_position`` bins the
    token's running char offset within that string; ``line_relative_length``
    bins the line length against the document-wide max; the punctuation
    profile length is truncated at 10. Line-level strings are aggregated
    once per line and joined back (co-partitioned on (doc, line)); running
    char offsets are an exclusive-frame window sum.

    Input: F1 tokens with doc_id, block_id, line_id, token_seq, text, x,
    width (for indentation). ``first_name_terms``: lowercase ``term`` col.
    """
    t = F.col("text")
    w_line = W.partitionBy("doc_id", "line_id").orderBy("token_seq")
    w_line_all = W.partitionBy("doc_id", "line_id")
    w_block = W.partitionBy("doc_id", "block_id")
    w_doc_all = W.partitionBy("doc_id")

    # per-line no-space concatenation + profile features, joined back
    texts_sorted = F.transform(
        F.array_sort(F.collect_list(F.struct("token_seq", "text"))),
        lambda s: s["text"],
    )
    lines = tokens.groupBy("doc_id", "line_id").agg(
        F.array_join(texts_sorted, "").alias("_line_text")
    )
    raw_profile = F.regexp_replace("_line_text", PUNCT_PROFILE_STRIP_RE, "")
    lines = lines.select(
        "doc_id",
        "line_id",
        F.length("_line_text").alias("_line_len"),
        F.when(raw_profile == "", "no").otherwise(raw_profile).alias(
            "_profile"
        ),
        F.least(F.length(raw_profile), F.lit(10)).alias("_profile_trunc_len"),
    ).withColumn("_max_line_len", F.max("_line_len").over(w_doc_all))

    fn = F.broadcast(
        first_name_terms.select(F.col("term").alias("_fn_term")).distinct()
    )
    base = (
        add_line_indentation(tokens)
        .join(lines, ["doc_id", "line_id"])
        .join(fn, F.lower(t) == F.col("_fn_term"), "left")
        .select(
            "*",
            (F.row_number().over(w_line) - 1).alias("_tok_idx"),
            F.count("*").over(w_line_all).alias("_tok_cnt"),
            F.coalesce(
                F.sum(F.length("text")).over(
                    w_line.rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("_line_pos"),
            (F.dense_rank().over(w_block.orderBy("line_id")) - 1).alias(
                "_line_idx"
            ),
        )
    )
    base = base.withColumn(
        "_line_cnt", F.max(F.col("_line_idx") + 1).over(w_block)
    )

    line_status = (
        F.when(F.col("_tok_idx") == F.col("_tok_cnt") - 1, "LINEEND")
        .when(F.col("_tok_idx") == 0, "LINESTART")
        .otherwise("LINEIN")
    )
    block_status = (
        F.when(
            (F.col("_line_idx") == F.col("_line_cnt") - 1)
            & (line_status == "LINEEND"),
            "BLOCKEND",
        )
        .when(
            (F.col("_line_idx") == 0) & (line_status == "LINESTART"),
            "BLOCKSTART",
        )
        .otherwise("BLOCKIN")
    )
    bool_str = bool_str_feature
    digit = digit_feature(t)
    cap = cap_with_digit_override(t)
    feats = {
        "token_text": t,
        "lower_token_text": F.lower(t),
        "prefix_1": prefix_feature(t, 1),
        "prefix_2": prefix_feature(t, 2),
        "prefix_3": prefix_feature(t, 3),
        "prefix_4": prefix_feature(t, 4),
        "suffix_1": suffix_feature(t, 1),
        "suffix_2": suffix_feature(t, 2),
        "suffix_3": suffix_feature(t, 3),
        "suffix_4": suffix_feature(t, 4),
        "line_status": line_status,
        "alignment_status": F.when(
            F.col("is_indented"), "LINEINDENT"
        ).otherwise("ALIGNEDLEFT"),
        "cap_status": cap,
        "digit_status": digit,
        "is_single_char": bool_str(F.length(t) == 1),
        "is_first_name": bool_str(F.col("_fn_term").isNotNull()),
        "line_punct_profile": F.col("_profile"),
        "line_rel_position": linear_scaling_bin(
            F.col("_line_pos"), F.col("_line_len"), line_scale
        ).cast("string"),
        "line_rel_length": linear_scaling_bin(
            F.col("_line_len"), F.col("_max_line_len"), line_scale
        ).cast("string"),
        "block_status": block_status,
        "punct_profile_trunc_len": F.col("_profile_trunc_len").cast("string"),
    }
    zero = F.lit("0")
    # exact reference order, reference_segmenter/data.py:15-46
    data_line_cols = [
        feats["token_text"], feats["lower_token_text"],
        feats["prefix_1"], feats["prefix_2"], feats["prefix_3"],
        feats["prefix_4"],
        feats["suffix_1"], feats["suffix_2"], feats["suffix_3"],
        feats["suffix_4"],
        feats["line_status"], feats["alignment_status"],
        feats["cap_status"], feats["digit_status"], feats["is_single_char"],
        zero, zero,  # dummy proper/common name
        feats["is_first_name"],
        zero, zero, zero, zero,  # dummy location/year/month/http
        feats["line_punct_profile"],
        feats["line_rel_position"], feats["line_rel_length"],
        feats["block_status"],
        feats["punct_profile_trunc_len"],
        zero,  # dummy label
    ]
    return base.select(
        "doc_id",
        "line_id",
        "token_seq",
        *[expr.alias(name) for name, expr in feats.items()],
        F.concat_ws(" ", *data_line_cols).alias("data_line"),
    )


def _line_status_lineend(w_line, w_line_all) -> Column:
    return (
        F.when(
            F.row_number().over(w_line) - 1 == F.count("*").over(w_line_all) - 1,
            "LINEEND",
        )
        .when(F.row_number().over(w_line) - 1 == 0, "LINESTART")
        .otherwise("LINEIN")
    )


def name_token_features(
    tokens: DataFrame,
    first_name_terms: DataFrame,
    last_name_terms: DataFrame,
) -> DataFrame:
    """A7 name data generator — the 21-feature token vector
    (models/name/data.py:10-37): a subset of the citation vector (same
    lookups, line status, scalar classes) without the document-position
    bin. Input as citation_token_features."""
    t = F.col("text")
    w_line = W.partitionBy("doc_id", "line_id").orderBy("token_seq")
    w_line_all = W.partitionBy("doc_id", "line_id")
    fn = F.broadcast(
        first_name_terms.select(F.col("term").alias("_fn_term")).distinct()
    )
    ln = F.broadcast(
        last_name_terms.select(F.col("term").alias("_ln_term")).distinct()
    )
    base = (
        tokens.withColumn("_lower", F.lower(t))
        .join(fn, F.col("_lower") == F.col("_fn_term"), "left")
        .join(ln, F.col("_lower") == F.col("_ln_term"), "left")
    )
    bool_str = bool_str_feature
    digit = digit_feature(t)
    cap = cap_with_digit_override(t)
    feats = {
        "token_text": t,
        "lower_token_text": F.col("_lower"),
        "prefix_1": prefix_feature(t, 1),
        "prefix_2": prefix_feature(t, 2),
        "prefix_3": prefix_feature(t, 3),
        "prefix_4": prefix_feature(t, 4),
        "suffix_1": suffix_feature(t, 1),
        "suffix_2": suffix_feature(t, 2),
        "suffix_3": suffix_feature(t, 3),
        "suffix_4": suffix_feature(t, 4),
        "line_status": _line_status_lineend(w_line, w_line_all),
        "cap_status": cap,
        "digit_status": digit,
        "is_single_char": bool_str(F.length(t) == 1),
        "is_first_name": bool_str(F.col("_fn_term").isNotNull()),
        "is_last_name": bool_str(F.col("_ln_term").isNotNull()),
        "punct_type": punctuation_type_feature(t),
    }
    zero = F.lit("0")
    # exact reference order, name/data.py:15-36
    data_line_cols = [
        feats["token_text"], feats["lower_token_text"],
        feats["prefix_1"], feats["prefix_2"], feats["prefix_3"],
        feats["prefix_4"],
        feats["suffix_1"], feats["suffix_2"], feats["suffix_3"],
        feats["suffix_4"],
        feats["line_status"], feats["cap_status"], feats["digit_status"],
        feats["is_single_char"],
        zero,  # dummy common name
        feats["is_first_name"], feats["is_last_name"],
        zero, zero,  # dummy known title/suffix
        feats["punct_type"],
        zero,  # dummy label
    ]
    return base.select(
        "doc_id",
        "line_id",
        "token_seq",
        *[expr.alias(name) for name, expr in feats.items()],
        F.concat_ws(" ", *data_line_cols).alias("data_line"),
    )


def affiliation_token_features(
    tokens: DataFrame,
    first_name_terms: DataFrame,
    country_terms: DataFrame,
) -> DataFrame:
    """A7 affiliation-address data generator — the 22-feature token vector
    (models/affiliation_address/data.py:10-41). Distinctives: a DUMMY
    'LINEEND' line status (GROBID #796, preserved), the ALLCAPS
    capitalisation variant and CONTAINDIGIT digit variant
    (models/data.py:421-437), the country gazetteer lookup, and the word
    shape embedded in the vector."""
    t = F.col("text")
    fn = F.broadcast(
        first_name_terms.select(F.col("term").alias("_fn_term")).distinct()
    )
    co = F.broadcast(
        country_terms.select(F.col("term").alias("_co_term")).distinct()
    )
    base = add_word_shape(
        tokens.withColumn("_lower", F.lower(t))
        .join(fn, F.col("_lower") == F.col("_fn_term"), "left")
        .join(co, F.col("_lower") == F.col("_co_term"), "left")
    )
    bool_str = bool_str_feature
    digit = digit_feature(t)
    digit_v = F.when(digit == "CONTAINSDIGITS", "CONTAINDIGIT").otherwise(digit)
    cap = F.when(digit == "ALLDIGIT", "NOCAPS").otherwise(
        capitalisation_feature(t)
    )
    cap_v = F.when(cap == "ALLCAP", "ALLCAPS").otherwise(cap)
    feats = {
        "token_text": t,
        "lower_token_text": F.col("_lower"),
        "prefix_1": prefix_feature(t, 1),
        "prefix_2": prefix_feature(t, 2),
        "prefix_3": prefix_feature(t, 3),
        "prefix_4": prefix_feature(t, 4),
        "suffix_1": suffix_feature(t, 1),
        "suffix_2": suffix_feature(t, 2),
        "suffix_3": suffix_feature(t, 3),
        "suffix_4": suffix_feature(t, 4),
        "cap_status": cap_v,
        "digit_status": digit_v,
        "is_single_char": bool_str(F.length(t) == 1),
        "is_first_name": bool_str(F.col("_fn_term").isNotNull()),
        "is_country": bool_str(F.col("_co_term").isNotNull()),
        "punct_type": punctuation_type_feature(t),
        "word_shape": F.col("word_shape"),
    }
    zero = F.lit("0")
    # exact reference order, affiliation_address/data.py:17-40
    data_line_cols = [
        feats["token_text"], feats["lower_token_text"],
        feats["prefix_1"], feats["prefix_2"], feats["prefix_3"],
        feats["prefix_4"],
        feats["suffix_1"], feats["suffix_2"], feats["suffix_3"],
        feats["suffix_4"],
        F.lit("LINEEND"),  # dummy line status (GROBID #796)
        feats["cap_status"], feats["digit_status"], feats["is_single_char"],
        zero, zero,  # dummy proper/common name
        feats["is_first_name"],
        zero,  # dummy location
        feats["is_country"],
        feats["punct_type"], feats["word_shape"],
        zero,  # dummy label
    ]
    return base.select(
        "doc_id",
        "line_id",
        "token_seq",
        *[expr.alias(name) for name, expr in feats.items()],
        F.concat_ws(" ", *data_line_cols).alias("data_line"),
    )


def fulltext_token_features(tokens: DataFrame) -> DataFrame:
    """A7 fulltext data generator — the 27-feature token vector
    (models/fulltext/data.py:10-43, shared by the figure/table models via
    their ``get_data_generator``). Distinctives: the LINESTART-priority
    line/block status variants (models/data.py:218-241), the dummy callout
    type 'UNKNOWN', and the superscript flag.

    Input: F1 tokens with doc_id, block_id, line_id, token_seq, text,
    font_family, font_size, is_bold, is_italics, is_superscript, x, width.
    """
    t = F.col("text")
    w_line = W.partitionBy("doc_id", "line_id").orderBy("token_seq")
    w_line_all = W.partitionBy("doc_id", "line_id")
    w_doc = W.partitionBy("doc_id").orderBy("token_seq")
    w_block = W.partitionBy("doc_id", "block_id")

    base = add_line_indentation(tokens).select(
        "*",
        (F.row_number().over(w_line) - 1).alias("_tok_idx"),
        F.count("*").over(w_line_all).alias("_tok_cnt"),
        (F.dense_rank().over(w_block.orderBy("line_id")) - 1).alias("_line_idx"),
        F.lag("token_seq").over(w_doc).alias("_prev_seq"),
        F.lag("font_family").over(w_doc).alias("_prev_family"),
        F.lag("font_size").over(w_doc).alias("_prev_size"),
    )
    base = base.withColumn(
        "_line_cnt", F.max(F.col("_line_idx") + 1).over(w_block)
    )
    # LINESTART-priority variant (get_line_status_with_linestart_…)
    line_status = (
        F.when(F.col("_tok_idx") == 0, "LINESTART")
        .when(F.col("_tok_idx") == F.col("_tok_cnt") - 1, "LINEEND")
        .otherwise("LINEIN")
    )
    block_status = (
        F.when(
            (F.col("_line_idx") == 0) & (line_status == "LINESTART"),
            "BLOCKSTART",
        )
        .when(
            (F.col("_line_idx") == F.col("_line_cnt") - 1)
            & (line_status == "LINEEND"),
            "BLOCKEND",
        )
        .otherwise("BLOCKIN")
    )
    prev_missing = F.col("_prev_seq").isNull()
    font_status, font_size_status = font_statuses(
        prev_missing,
        F.col("_prev_family"),
        F.col("font_family"),
        F.col("_prev_size"),
        F.col("font_size"),
    )
    bool_str = bool_str_feature
    digit = digit_feature(t)
    cap = cap_with_digit_override(t)
    feats = {
        "token_text": t,
        "lower_token_text": F.lower(t),
        "prefix_1": prefix_feature(t, 1),
        "prefix_2": prefix_feature(t, 2),
        "prefix_3": prefix_feature(t, 3),
        "prefix_4": prefix_feature(t, 4),
        "suffix_1": suffix_feature(t, 1),
        "suffix_2": suffix_feature(t, 2),
        "suffix_3": suffix_feature(t, 3),
        "suffix_4": suffix_feature(t, 4),
        "block_status": block_status,
        "line_status": line_status,
        "alignment_status": F.when(
            F.col("is_indented"), "LINEINDENT"
        ).otherwise("ALIGNEDLEFT"),
        "font_status": font_status,
        "font_size_status": font_size_status,
        "is_bold": bool_str(F.col("is_bold")),
        "is_italic": bool_str(F.col("is_italics")),
        "cap_status": cap,
        "digit_status": digit,
        "is_single_char": bool_str(F.length(t) == 1),
        "punct_type": punctuation_type_feature(t),
        "is_superscript": bool_str(F.col("is_superscript")),
    }
    zero = F.lit("0")
    # exact reference order, fulltext/data.py:15-42
    data_line_cols = [
        feats["token_text"], feats["lower_token_text"],
        feats["prefix_1"], feats["prefix_2"], feats["prefix_3"],
        feats["prefix_4"],
        feats["suffix_1"], feats["suffix_2"], feats["suffix_3"],
        feats["suffix_4"],
        feats["block_status"], feats["line_status"],
        feats["alignment_status"],
        feats["font_status"], feats["font_size_status"],
        feats["is_bold"], feats["is_italic"],
        feats["cap_status"], feats["digit_status"], feats["is_single_char"],
        feats["punct_type"],
        zero, zero, zero,  # dummy rel doc/page position, bitmap around
        F.lit("UNKNOWN"),  # dummy callout type
        zero,  # dummy is_callout_known
        feats["is_superscript"],
    ]
    return base.select(
        "doc_id",
        "block_id",
        "line_id",
        "token_seq",
        *[expr.alias(name) for name, expr in feats.items()],
        F.concat_ws(" ", *data_line_cols).alias("data_line"),
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
