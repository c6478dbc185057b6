"""Scalar column functions (SURVEY §2A A17): the reference's string parsers
re-expressed as built-in Spark SQL expressions — no UDFs, whole-stage
codegen'd.
"""
from sciencebeam_parser_spark.functions.parsers import (  # noqa: F401
    clean_abstract_text,
    detect_external_identifier,
    extract_year,
    normalize_name_part,
    parse_page_range,
    split_section_label,
)
