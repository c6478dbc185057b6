"""PDF ingest source (SURVEY §2A A1) and page rendering (A23) / OCR (A25)
stage stubs.

Reference: external/pdfalto/wrapper.py shells the ``pdfalto`` binary per
document producing ALTO XML (invoked app/parser.py:485-493); page images
come from pdf2image with a thread pool (processors/document_page_image.py:
19-58); OCR from tesserocr, lock-serialized (ocr_models/
tesserocr_ocr_model.py:32-71).

Spark mapping: ``spark.read.format("binaryFile")`` scans the corpus (one
row per PDF, content as binary); the pdfalto/pdf2image/tesseract calls run
inside mapInPandas with an executor-local lazy singleton per binary (A32 —
the reference's process-reuse). None of those binaries exist in this
container, so each kernel resolves at executor init in priority order:
injected fn (tests use deterministic fakes) -> PATH-probed real binary
(sources/binprobe.py - production-real wherever pdfalto/pdftoppm/tesseract
exist on PATH) -> clearly-marked NotImplementedError stub. Task parallelism over (doc, page) rows
replaces the reference's thread pool; page pruning (A22) filters the (doc,
page) relation BEFORE rendering.
"""
from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


from sciencebeam_parser_spark.sources.binprobe import resolve_kernel
from sciencebeam_parser_spark.utils import executor_singleton


def read_pdf_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Binary-file scan over a PDF corpus: (doc_id, path, length, content).
    doc_id = file stem (surrogate key minted at ingest, SURVEY §1.4)."""
    files = spark.read.format("binaryFile").load(path)
    return files.select(
        F.regexp_extract(
            F.element_at(F.split("path", "/"), -1), r"^(.*?)(\.pdf)?$", 1
        ).alias("doc_id"),
        "path",
        F.col("length").cast("long").alias("n_bytes"),
        "content",
    )


ALTO_XML_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("alto_xml", T.BinaryType()),
    ]
)


def _kernel_key(stage: str, fn) -> str:
    """Stable executor-singleton key: one cached handle per (stage,
    kernel identity) per worker. A per-call uuid key would mint — and
    retain — a fresh sidecar handle on every invocation per worker,
    defeating the process-reuse contract (A32) and leaking handles in
    long-lived sessions."""
    return "{}:{}".format(
        stage,
        getattr(fn, "__qualname__", None)
        or getattr(fn, "__name__", None)
        or "default",
    )


def pdf_to_alto(
    pdfs: DataFrame,
    *,
    pdfalto_fn: Optional[Callable[[bytes], bytes]] = None,
) -> DataFrame:
    """A1: PDF binary → ALTO XML via the pdfalto sidecar. The sidecar handle
    is an executor singleton (one persistent process per worker, the
    reference's process-reuse at wapiti_model_impl.py:111-121). STUB: inject
    ``pdfalto_fn``; the default raises at execution time."""
    _key = _kernel_key("pdfalto", pdfalto_fn)

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = executor_singleton(
            _key,
            lambda: resolve_kernel(
                "pdfalto", pdfalto_fn, lambda: _missing_binary("pdfalto")
            ),
        )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "alto_xml": pdf["content"].map(fn),
                }
            )

    return pdfs.select("doc_id", "content").mapInPandas(
        convert, schema=ALTO_XML_SCHEMA
    )


PAGE_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("page_number", T.IntegerType()),
        T.StructField("dpi", T.IntegerType()),
        T.StructField("image", T.BinaryType()),
    ]
)


def render_pages(
    doc_pages: DataFrame,
    *,
    dpi: int = 200,
    render_fn: Optional[Callable[[bytes, int, int], bytes]] = None,
) -> DataFrame:
    """A23: render selected (doc, page) rows to images. Input must already
    be page-pruned (A22) — the filter happens BEFORE this expensive stage.
    render_fn(content, page_number, dpi) -> png bytes. STUB by default."""
    _key = _kernel_key("pdf2image", render_fn)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = executor_singleton(
            _key,
            lambda: resolve_kernel(
                "pdf2image", render_fn, lambda: _missing_binary("pdf2image")
            ),
        )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "page_number": pdf["page_number"],
                    "dpi": dpi,
                    "image": [
                        fn(c, int(p), dpi)
                        for c, p in zip(pdf["content"], pdf["page_number"])
                    ],
                }
            )

    return doc_pages.select("doc_id", "page_number", "content").mapInPandas(
        render, schema=PAGE_IMAGE_SCHEMA
    )


OCR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("page_number", T.IntegerType()),
        T.StructField("ocr_text", T.StringType()),
    ]
)


def ocr_images(
    images: DataFrame,
    *,
    ocr_fn: Optional[Callable[[bytes], str]] = None,
) -> DataFrame:
    """A25: OCR over an image column. The tesseract handle is an executor
    singleton (the reference lock-serializes ONE handle per process —
    tesserocr_ocr_model.py:32-71; here each Python worker owns one). STUB
    by default."""
    _key = _kernel_key("tesseract", ocr_fn)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = executor_singleton(
            _key,
            lambda: resolve_kernel(
                "tesseract", ocr_fn, lambda: _missing_binary("tesseract")
            ),
        )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "page_number": pdf["page_number"],
                    "ocr_text": pdf["image"].map(fn),
                }
            )

    return images.select("doc_id", "page_number", "image").mapInPandas(
        run, schema=OCR_SCHEMA
    )


def _missing_binary(name: str) -> Callable:
    def raiser(*_a, **_k):
        raise NotImplementedError(
            f"{name} binary not available in this environment (STUB); "
            f"inject the kernel fn to run for real"
        )

    return raiser


__all__ = ["read_pdf_corpus", "pdf_to_alto", "render_pages", "ocr_images"]
