"""Gated REAL-binary end-to-end tests (VERDICT r6 #2).

Each test drives the actual PATH-probe resolution chain (injected fn
absent → ``binprobe`` probes the real binary) through the same Spark
plumbing the q159/q160/q290 queries compose — and is SKIPPED, not
faked, where the binary is missing (this sandbox). Where the binaries
exist, these are the first executions of the real kernels end-to-end;
fixtures are hand-built minimal-but-valid PDF/DOCX payloads, no
external libs required.
"""
from __future__ import annotations

import os
import zipfile

import pytest

from sciencebeam_parser_spark.sources import binprobe

HAS_PDFALTO = binprobe.which("pdfalto") is not None
HAS_PDFTOPPM = binprobe.which("pdftoppm") is not None
HAS_TESSERACT = binprobe.which("tesseract") is not None
HAS_SOFFICE = (
    binprobe.which("soffice") is not None
    or binprobe.which("libreoffice") is not None
)


def minimal_pdf(text: str = "Hello World") -> bytes:
    """A hand-assembled single-page PDF with one Helvetica text run —
    valid xref offsets, no libraries."""
    content = f"BT /F1 24 Tf 72 700 Td ({text}) Tj ET".encode()
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def minimal_docx(text: str = "Hello Office") -> bytes:
    """A hand-assembled minimal OOXML document (three required parts)."""
    import io

    w = (
        "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
            "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
            'Target="word/document.xml"/>'
            "</Relationships>",
        )
        z.writestr(
            "word/document.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<w:document xmlns:w="{w}"><w:body><w:p><w:r>'
            f"<w:t>{text}</w:t>"
            "</w:r></w:p></w:body></w:document>",
        )
    return buf.getvalue()


@pytest.mark.skipif(not HAS_PDFALTO, reason="pdfalto not on PATH")
class TestRealPdfalto:
    def test_q159_ingest_chain_with_real_binary(self, spark, tmp_path):
        """read_pdf_corpus → pdf_to_alto (NO injected fn: PATH-probe
        resolves the real pdfalto) → ALTO parse — the q159/q290 ingest
        slice on a genuine PDF."""
        from sciencebeam_parser_spark.sources.alto import (
            parse_alto_tokens_df,
        )
        from sciencebeam_parser_spark.sources.pdf import (
            pdf_to_alto,
            read_pdf_corpus,
        )

        corpus = tmp_path / "corpus"
        corpus.mkdir()
        (corpus / "d1.pdf").write_bytes(minimal_pdf("Hello World"))
        pdfs = read_pdf_corpus(spark, str(corpus))
        alto = pdf_to_alto(pdfs)  # resolution: PATH probe → REAL kernel
        parsed = parse_alto_tokens_df(alto, xml_col="alto_xml")
        rows = parsed.collect()
        assert rows, "real pdfalto produced no tokens"
        texts = {r["text"] for r in rows}
        assert "Hello" in texts and "World" in texts

    def test_q290_one_doc_cascade_slice(self, spark, tmp_path):
        """The q290 chain on one real-binary-ingested doc: tokens →
        mock labels → full cascade, entity rows come out."""
        from pyspark.sql import functions as F

        from sciencebeam_parser_spark.plans.cascade import (
            run_fulltext_cascade,
        )
        from sciencebeam_parser_spark.queries.pipeline_ops import (
            _mock_labels_for,
        )
        from sciencebeam_parser_spark.sources.alto import (
            parse_alto_tokens_df,
        )
        from sciencebeam_parser_spark.sources.pdf import (
            pdf_to_alto,
            read_pdf_corpus,
        )
        from sciencebeam_parser_spark.utils import checkpoint_big

        corpus = tmp_path / "one"
        corpus.mkdir()
        (corpus / "d7.pdf").write_bytes(
            minimal_pdf("Title words then some body text here")
        )
        parsed = parse_alto_tokens_df(
            pdf_to_alto(read_pdf_corpus(spark, str(corpus))),
            xml_col="alto_xml",
        )
        toks = checkpoint_big(
            parsed.select(
                "doc_id",
                (F.col("token_seq") + 1).cast("long").alias("token_seq"),
                "text",
            ),
            "doc_id",
        )
        toks, labels = _mock_labels_for(toks)
        out = run_fulltext_cascade(toks, checkpoint_big(labels, "doc_id"))
        assert out.count() > 0


@pytest.mark.skipif(not HAS_SOFFICE, reason="soffice not on PATH")
class TestRealSoffice:
    def test_q160_convert_kernel_with_real_binary(self):
        kernel = binprobe.probe_soffice()
        assert kernel is not None
        pdf = kernel(minimal_docx("Hello Office"))
        assert pdf.startswith(b"%PDF"), "soffice did not emit a PDF"


@pytest.mark.skipif(not HAS_PDFTOPPM, reason="pdftoppm not on PATH")
class TestRealPdftoppm:
    def test_render_kernel_emits_png(self):
        kernel = binprobe.probe_pdftoppm()
        png = kernel(minimal_pdf("Render me"), 1, 100)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"


@pytest.mark.skipif(
    not (HAS_PDFTOPPM and HAS_TESSERACT),
    reason="pdftoppm+tesseract not both on PATH",
)
class TestRealOcrChain:
    def test_q132_stage3_ocr_on_rendered_page(self):
        """Two real binaries chained: poppler renders the page,
        tesseract reads the text back — q132's stage-3 shape."""
        render = binprobe.probe_pdftoppm()
        ocr = binprobe.probe_tesseract()
        png = render(minimal_pdf("HELLO OCR"), 1, 200)
        text = ocr(png)
        assert "HELLO" in text.upper()
