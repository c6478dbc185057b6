"""Office-document → PDF conversion gate (SURVEY §2A A3).

Reference: app/parser.py:460-483 — sources whose media type is in
``DOC_TO_PDF_SUPPORTED_MEDIA_TYPES`` (DOC/DOCX/DOTX/RTF, :53-56) are
converted to PDF through a LibreOffice listener child process
(transformers/doc_converter_wrapper.py:98-287) before PDF→ALTO; PDFs pass
through; anything else raises "unsupported media type" (:479-483).

Spark mapping: the media-type gate is a `when` column expression; the
conversion itself is a mapInPandas stage whose worker holds ONE LibreOffice
sidecar per executor (the reference's listener pattern — restart on
max_uptime — becomes a process-global lazy singleton). The kernel resolves at executor init in priority order: injected
``converter_fn`` (tests use deterministic fakes) -> PATH-probed
``soffice``/``libreoffice`` one-shot conversion (sources/binprobe.py -
production-real wherever LibreOffice exists on PATH) -> clearly-marked
NotImplementedError stub (this sandbox's default), while the
gating/partitioning/schema plumbing is always real and tested.
"""
from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sciencebeam_parser_spark.sources.binprobe import resolve_kernel
from sciencebeam_parser_spark.utils import executor_singleton

# utils/media_types.py MediaTypes values (public constants)
MEDIA_TYPE_PDF = "application/pdf"
DOC_TO_PDF_SUPPORTED_MEDIA_TYPES = frozenset(
    {
        "application/msword",
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        "application/vnd.openxmlformats-officedocument.wordprocessingml.template",
        "application/rtf",
    }
)

CONVERTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("conversion", T.StringType()),
    ]
)


def classify_sources(df: DataFrame, *, media_type_col: str = "media_type") -> DataFrame:
    """Add the A3 routing column: 'passthrough' (already PDF), 'convert'
    (office formats), or 'unsupported' (app/parser.py:468-483)."""
    mt = F.col(media_type_col)
    return df.withColumn(
        "conversion",
        F.when(mt == MEDIA_TYPE_PDF, "passthrough")
        .when(mt.isin(*DOC_TO_PDF_SUPPORTED_MEDIA_TYPES), "convert")
        .otherwise("unsupported"),
    )


def _default_converter(content: bytes) -> bytes:
    raise NotImplementedError(
        "LibreOffice sidecar not available in this environment (STUB); "
        "inject converter_fn to supply a real doc→pdf conversion"
    )


def convert_to_pdf(
    df: DataFrame,
    *,
    converter_fn: Optional[Callable[[bytes], bytes]] = None,
    fail_on_unsupported: bool = True,
) -> DataFrame:
    """Route sources through the conversion gate. PDFs pass through
    unchanged; office docs run `converter_fn` inside mapInPandas (one
    executor-local sidecar in the real deployment); unsupported types raise
    (or are dropped when fail_on_unsupported=False).

    Input: (doc_id, media_type, content: binary). Output: same plus
    `conversion` tag; `content` holds PDF bytes for converted rows.
    """
    _key = "soffice:{}".format(
        getattr(converter_fn, "__qualname__", None)
        or getattr(converter_fn, "__name__", None)
        or "default"
    )

    def _fn():
        # executor-side resolution: injected fake -> PATH-probed soffice ->
        # stub; one probe per (kernel identity, worker)
        return executor_singleton(
            _key,
            lambda: resolve_kernel(
                "soffice", converter_fn, lambda: _default_converter
            ),
        )

    routed = classify_sources(df)
    if fail_on_unsupported:
        # fail fast at plan time semantics: surface bad rows in the stage
        def check_and_convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                bad = pdf[pdf["conversion"] == "unsupported"]
                if len(bad):
                    raise ValueError(
                        "unsupported media type: %r" % bad["media_type"].iloc[0]
                    )
                out = pdf.copy()
                mask = out["conversion"] == "convert"
                if mask.any():
                    out.loc[mask, "content"] = out.loc[mask, "content"].map(_fn())
                    out.loc[mask, "media_type"] = MEDIA_TYPE_PDF
                yield out[["doc_id", "media_type", "content", "conversion"]]

        body = check_and_convert
    else:
        def convert_only(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = pdf[pdf["conversion"] != "unsupported"].copy()
                mask = out["conversion"] == "convert"
                if mask.any():
                    out.loc[mask, "content"] = out.loc[mask, "content"].map(_fn())
                    out.loc[mask, "media_type"] = MEDIA_TYPE_PDF
                yield out[["doc_id", "media_type", "content", "conversion"]]

        body = convert_only
    return routed.select("doc_id", "media_type", "content", "conversion").mapInPandas(
        body, schema=CONVERTED_SCHEMA
    )


__all__ = [
    "classify_sources",
    "convert_to_pdf",
    "DOC_TO_PDF_SUPPORTED_MEDIA_TYPES",
    "MEDIA_TYPE_PDF",
]
