"""The registered query surface: every SURVEY §2 operator gets at least one
named query with a Spark builder and (where SQL-expressible) a DuckDB oracle.

Importing this package populates the registry.
"""
from sciencebeam_parser_spark.queries.registry import REGISTRY, Query, register  # noqa: F401
from sciencebeam_parser_spark.queries import (  # noqa: F401
    relational,
    text_ops,
    events_ops,
    docpipe,
    pipeline_ops,
    spatial_ops,
    matching_ops,
    corpus_ops,
    training_ops,
    udf_ops,
    layout_ops,
    curation_ops,
    graph_ops,
    eval_ops,
    warehouse_ops,
    retrieval_ops,
    analysis_ops,
    governance_ops,
    spark4_ops,
)
