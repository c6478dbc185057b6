"""Ingest sources (SURVEY §2B scans): ALTO XML → token/graphics tables,
binary file scans, gazetteer text scans.
"""
from sciencebeam_parser_spark.sources.alto import (  # noqa: F401
    read_alto_graphics,
    read_alto_tokens,
)
