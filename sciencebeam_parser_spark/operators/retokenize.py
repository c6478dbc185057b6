"""Text normalization + retokenization (SURVEY §2A A4/A6).

Reference:
* normalize_text (utils/text.py:55-66): ligature/dash/quote/bullet char
  replacements (GROBID's map) + whitespace collapsing.
* retokenize_layout_token (document/layout_document.py:159-212): split each
  token's text on the delimiter tokenizer; non-whitespace pieces become
  tokens (whitespace pieces attach to the PREVIOUS piece's trailing
  whitespace); coordinates are interpolated proportionally to character
  offsets (get_relative_coordinates, :136-156); whitespace-only tokens drop.
* normalize_layout_document (app/parser.py:64-79) = normalize + retokenize +
  remove empty blocks (A5).

Spark mapping: normalization is translate/regexp_replace expressions;
retokenization is an explode over a piece array built with the fence-split
trick (same tokenizer as ref_matching), with offsets/widths as arithmetic
column expressions — no Python in the hot path. Re-sequencing after the
explode mints new token_seq by row_number (surrogate keys, SURVEY §1.4).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.ref_matching import _DELIM_ALTERNATION

# utils/text.py:7-47 — single-char → replacement (multi-char targets need
# per-pair regexp_replace; single-char pairs use one translate()).
_MULTI_CHAR_REPLACEMENTS = {
    "ﬀ": "ff", "ﬁ": "fi", "ﬂ": "fl", "ﬃ": "ffi",
    "ﬄ": "ffl", "ﬅ": "ft", "ﬆ": "st",
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
}
_SINGLE_CHAR_FROM = (
    "`‐‑‒–—―"
    "“”„‟’‘"
    "‣⁃⁌⁍∙◉◘◦☙❥❧⦾⦿"
    "∗"
)
_SINGLE_CHAR_TO = "'------\"\"\"\"''" + "•" * 13 + "*"


def normalize_text(col: Column) -> Column:
    """normalize_text (utils/text.py:55-66) as column expressions."""
    out = F.translate(col, _SINGLE_CHAR_FROM, _SINGLE_CHAR_TO)
    for src, dst in _MULTI_CHAR_REPLACEMENTS.items():
        out = F.regexp_replace(out, src, dst)
    out = F.regexp_replace(out, r"\s*\n\s*", "\n")
    out = F.regexp_replace(out, r"\s{2,}", " ")
    return out


def retokenize_tokens(tokens: DataFrame, *, normalize: bool = True) -> DataFrame:
    """Explode multi-piece tokens into one row per piece with interpolated
    coordinates; re-mint token_seq in document order.

    Expects the F1 columns; preserves all of them.
    """
    text = normalize_text(F.col("text")) if normalize else F.col("text")
    # fence-split keeps delimiter pieces (keep_whitespace=True tokenizer)
    pieces_all = F.filter(
        F.split(F.regexp_replace(text, _DELIM_ALTERNATION, "\x00$1\x00"), "\x00"),
        lambda p: F.length(p) > 0,
    )
    df = tokens.withColumn("_pieces", pieces_all)
    # total length over all pieces (== normalized text length)
    df = df.withColumn(
        "_total_len",
        F.aggregate("_pieces", F.lit(0), lambda acc, p: acc + F.length(p)),
    )
    # piece start offsets: running sum of prior piece lengths
    df = df.withColumn(
        "_offsets",
        F.expr(
            "transform(_pieces, (p, i) -> "
            "aggregate(slice(_pieces, 1, i), 0, (a, q) -> a + length(q)))"
        ),
    )
    exploded = df.select(
        "*", F.posexplode("_pieces").alias("_pos", "_piece"),
    ).withColumn("_offset", F.col("_offsets")[F.col("_pos")])
    # keep non-whitespace pieces; drop whitespace-only source tokens
    kept = exploded.filter(
        (F.trim("_piece") != "") & (F.trim(text) != "")
    )
    w = W.partitionBy("doc_id").orderBy("token_seq", "_pos")
    out = kept.select(
        "doc_id",
        "page_number",
        "block_id",
        "line_id",
        (F.row_number().over(w) - 1).cast("long").alias("token_seq"),
        F.col("_piece").alias("text"),
        # retokenize_layout_token semantics: pieces split from one token
        # are directly adjacent, so only the LAST kept piece inherits the
        # source token's trailing whitespace — intermediate pieces get ''
        # (a text+whitespace reconstruction must yield the original line,
        # not inject a space after every piece)
        F.when(
            F.col("_pos")
            == F.max("_pos").over(W.partitionBy("doc_id", "token_seq")),
            F.col("whitespace"),
        ).otherwise(F.lit("")).alias("whitespace"),
        "font_id",
        "font_family",
        "font_size",
        "is_bold",
        "is_italics",
        "is_subscript",
        "is_superscript",
        # get_relative_coordinates (layout_document.py:136-156)
        F.when(
            F.col("x").isNotNull() & (F.col("_total_len") > 0),
            F.col("x") + F.col("width") * F.col("_offset") / F.col("_total_len"),
        ).otherwise(F.col("x")).alias("x"),
        F.col("y"),
        F.when(
            F.col("width").isNotNull() & (F.col("_total_len") > 0),
            F.col("width") * F.length("_piece") / F.col("_total_len"),
        ).otherwise(F.col("width")).alias("width"),
        F.col("height"),
        F.col("page_width"),
        F.col("page_height"),
    )
    return out


def remove_empty_lines_and_blocks(tokens: DataFrame) -> DataFrame:
    """A5 — prune whitespace-only tokens; line/block emptiness then falls out
    of the token table (groups with no rows just don't exist).
    """
    return tokens.filter(F.trim("text") != "")
