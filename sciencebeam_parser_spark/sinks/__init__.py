"""Sinks (SURVEY §2A A29): TEI XML generation + text/partitioned writes."""
from sciencebeam_parser_spark.sinks.tei import entities_to_tei  # noqa: F401
