"""Explicit StructType schemas for the core relations.

Mirrors the reference's code-defined data model (SURVEY §1.2/§1.3): the
reference declares NamedTuples/dataclasses (LayoutToken at
sciencebeam_parser/document/layout_document.py:121-126, LayoutFont :16-26,
LayoutPageCoordinates :29-77, LayoutGraphic :331-336, the
SemanticContentWrapper hierarchy in document/semantic_document.py); we declare
StructTypes — schema is never inferred.

Identity is surrogate-key based (SURVEY §1.4): the reference joins on Python
``id(...)`` which does not survive serialization, so every row carries
(doc_id, page_number, block_id, line_id, token_seq / entity_id) minted at
ingest with row_number windows.
"""
from __future__ import annotations

from pyspark.sql import types as T

# Sentinel font id, mirroring the reference EMPTY_FONT
# (layout_document.py:26) — tri-state booleans stay nullable.
EMPTY_FONT_ID = "_EMPTY"

FONT_STRUCT = T.StructType(
    [
        T.StructField("font_id", T.StringType(), False),
        T.StructField("font_family", T.StringType(), True),
        T.StructField("font_size", T.DoubleType(), True),
        T.StructField("is_bold", T.BooleanType(), True),
        T.StructField("is_italics", T.BooleanType(), True),
        T.StructField("is_subscript", T.BooleanType(), True),
        T.StructField("is_superscript", T.BooleanType(), True),
    ]
)

# LayoutPageCoordinates (layout_document.py:29-77)
COORDS_STRUCT = T.StructType(
    [
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
        T.StructField("width", T.DoubleType(), True),
        T.StructField("height", T.DoubleType(), True),
    ]
)

# F1 tokens — the central fact table (one row per token, document order).
# Flat columns (not nested structs) so parquet column pruning and codegen
# stay trivially effective for the ~34-feature projections (SURVEY A7).
TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("page_number", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("line_id", T.IntegerType(), False),
        T.StructField("token_seq", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("whitespace", T.StringType(), False),
        T.StructField("font_id", T.StringType(), False),
        T.StructField("font_family", T.StringType(), True),
        T.StructField("font_size", T.DoubleType(), True),
        T.StructField("is_bold", T.BooleanType(), True),
        T.StructField("is_italics", T.BooleanType(), True),
        T.StructField("is_subscript", T.BooleanType(), True),
        T.StructField("is_superscript", T.BooleanType(), True),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
        T.StructField("width", T.DoubleType(), True),
        T.StructField("height", T.DoubleType(), True),
        T.StructField("page_width", T.DoubleType(), True),
        T.StructField("page_height", T.DoubleType(), True),
    ]
)

# F2 token_labels — deterministic mock-model output (reference
# tests/processors/fulltext/model_mocks.py:46-135) or real model output.
TOKEN_LABELS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("token_seq", T.LongType(), False),
        T.StructField("model_name", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
    ]
)

# F3 graphics (LayoutGraphic, layout_document.py:331-336); binary content
# is the multimodal column (opaque bytes + typed metadata).
GRAPHICS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("graphic_id", T.IntegerType(), False),
        T.StructField("page_number", T.IntegerType(), False),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
        T.StructField("width", T.DoubleType(), True),
        T.StructField("height", T.DoubleType(), True),
        T.StructField("graphic_type", T.StringType(), True),
        T.StructField("local_file_path", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

# F4 entities — the semantic tree as an adjacency list (SemanticDocument,
# semantic_document.py:621-626; ~70 node types :248-539 → entity_type values).
ENTITIES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("parent_entity_id", T.LongType(), True),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("content_id", T.StringType(), True),
        T.StructField("target_content_id", T.StringType(), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("token_start", T.LongType(), True),
        T.StructField("token_end", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

# Per-model label vocabularies (reference models/*/training_data.py label
# maps; FIXTURES.md F2) — used by the cascade and by mock label generation.
MODEL_LABELS: dict[str, tuple[str, ...]] = {
    "segmentation": (
        "<header>", "<body>", "<references>", "<acknowledgement>", "<annex>",
        "<headnote>", "<footnote>", "<marginnote>", "<page>", "<cover>",
        "<toc>", "<other>",
    ),
    "header": (
        "<title>", "<author>", "<affiliation>", "<address>", "<abstract>",
        "<date>", "<journal>", "<publisher>", "<pubnum>", "<keyword>",
        "<email>", "<web>", "<page>", "<note>",
    ),
    "fulltext": (
        "<section>", "<paragraph>", "<citation_marker>", "<figure_marker>",
        "<table_marker>", "<equation>", "<equation_label>", "<figure>",
        "<table>", "<item>", "<other>",
    ),
    "name": (
        "<marker>", "<title>", "<forename>", "<middlename>", "<surname>",
        "<suffix>",
    ),
    "affiliation_address": (
        "<marker>", "<institution>", "<department>", "<laboratory>",
        "<addrLine>", "<postCode>", "<postBox>", "<region>", "<settlement>",
        "<country>",
    ),
    "reference_segmenter": ("<label>", "<reference>"),
    "citation": (
        "<author>", "<editor>", "<title>", "<journal>", "<booktitle>",
        "<series>", "<date>", "<volume>", "<issue>", "<pages>", "<publisher>",
        "<location>", "<institution>", "<collaboration>", "<tech>", "<web>",
        "<pubnum>", "<note>",
    ),
}
