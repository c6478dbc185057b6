"""Structured Streaming operators (SURVEY §2B streaming).

The reference is batch-only (request-scoped pipeline, app/parser.py:212-252);
these operators expose the engine-general streaming surface over event
streams. The windowed-aggregation expressions are shared with the batch
queries in ``queries/events_ops.py`` — the same plan runs under
``readStream`` with a watermark.
"""
from sciencebeam_parser_spark.streaming.windows import (  # noqa: F401
    sessionized_counts,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)
