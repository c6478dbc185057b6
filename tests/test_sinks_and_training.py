"""Tests for the JATS sink (A29), asset-ZIP sink, doc-converter gate (A3),
and training-data generation plan (A30)."""
from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from sciencebeam_parser_spark.plans.training_data import (
    generate_model_data_lines,
    generate_training_documents,
)
from sciencebeam_parser_spark.sinks.jats import (
    tei_to_jats,
    tei_to_jats_xml,
    write_xml_zip,
)
from sciencebeam_parser_spark.sources.doc_converter import (
    classify_sources,
    convert_to_pdf,
)

TEI_SAMPLE = (
    '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><fileDesc>'
    "<titleStmt><title>My Title</title></titleStmt></fileDesc>"
    "<profileDesc><abstract><p>Abstract text.</p></abstract></profileDesc>"
    "</teiHeader><text><body><div><head>Intro</head><p>Body para.</p>"
    '<ref type="bibr" target="#b0">[1]</ref></div>'
    '<figure type="table" xml:id="tab_0"><figDesc>A table</figDesc></figure>'
    '</body><back><div type="references"><listBibl>'
    '<biblStruct xml:id="b0"><note>Smith 2020</note></biblStruct>'
    "</listBibl></div></back></text></TEI>"
)


class TestJats:
    def test_structural_mapping(self):
        jats = tei_to_jats_xml(TEI_SAMPLE)
        root = ET.fromstring(jats)
        assert root.tag == "article"
        assert root.findtext("front/article-meta/title-group/article-title") == "My Title"
        assert root.findtext("front/article-meta/abstract/p") == "Abstract text."
        sec = root.find("body/sec")
        assert sec.findtext("title") == "Intro"
        xref = sec.find("xref")
        assert (xref.get("ref-type"), xref.get("rid")) == ("bibr", "b0")
        tw = root.find("body/table-wrap")
        assert tw.get("id") == "tab_0"
        ref = root.find("back/ref-list/ref")
        assert ref.get("id") == "b0"
        # tei-to-jats.xsl:250-335: biblStruct always becomes an
        # element-citation; a raw note-only reference maps to an empty one
        cit = ref.find("element-citation")
        assert cit is not None
        assert cit.get("publication-type") == "journal"
        assert cit.find("article-title") is None

    def test_dataframe_conversion(self, spark):
        df = spark.createDataFrame(
            [("d1", TEI_SAMPLE)], "doc_id string, tei_xml string"
        )
        out = tei_to_jats(df).collect()
        assert len(out) == 1
        assert "<article-title>My Title</article-title>" in out[0].jats_xml

    def test_zip_sink(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("d1", TEI_SAMPLE), ("d2", TEI_SAMPLE)],
            "doc_id string, tei_xml string",
        ).repartition(2)
        out_dir = str(tmp_path / "zips")
        write_xml_zip(df, out_dir)
        members = []
        for p in sorted(Path(out_dir).glob("*.zip")):
            with zipfile.ZipFile(p) as zf:
                members.extend(zf.namelist())
                for name in zf.namelist():
                    assert b"<TEI" in zf.read(name) or b"TEI " in zf.read(name)
        assert sorted(members) == ["d1.tei.xml", "d2.tei.xml"]


class TestDocConverter:
    def _sources(self, spark):
        return spark.createDataFrame(
            [
                ("d1", "application/pdf", bytearray(b"%PDF-fake")),
                ("d2", "application/msword", bytearray(b"DOCBYTES")),
                ("d3", "text/plain", bytearray(b"nope")),
            ],
            "doc_id string, media_type string, content binary",
        )

    def test_gate_classification(self, spark):
        out = {
            r.doc_id: r.conversion
            for r in classify_sources(self._sources(spark)).collect()
        }
        assert out == {"d1": "passthrough", "d2": "convert", "d3": "unsupported"}

    def test_unsupported_raises(self, spark):
        with pytest.raises(Exception, match="unsupported media type"):
            convert_to_pdf(
                self._sources(spark), converter_fn=lambda b: b"%PDF-conv"
            ).collect()

    def test_convert_with_injected_sidecar(self, spark):
        out = {
            r.doc_id: (r.media_type, bytes(r.content))
            for r in convert_to_pdf(
                self._sources(spark),
                converter_fn=lambda b: b"%PDF-conv:" + b,
                fail_on_unsupported=False,
            ).collect()
        }
        assert out["d1"] == ("application/pdf", b"%PDF-fake")
        assert out["d2"] == ("application/pdf", b"%PDF-conv:DOCBYTES")
        assert "d3" not in out

    def test_default_converter_is_stub(self, spark):
        with pytest.raises(Exception, match="STUB|NotImplemented"):
            convert_to_pdf(
                self._sources(spark).filter(F.col("doc_id") == "d2")
            ).collect()


@pytest.fixture()
def mini_tokens(spark):
    rows = []
    for d in ("d1", "d2"):
        for i, text in enumerate(["The", "Title", "body", "text"]):
            rows.append(
                {
                    "doc_id": d, "token_seq": i, "text": text,
                    "line_id": i // 2, "block_id": 0,
                    "font_family": "serif", "font_size": 10.0,
                }
            )
    return spark.createDataFrame(rows)


class TestTrainingData:
    def test_data_lines_unlabeled(self, spark, mini_tokens):
        lines = generate_model_data_lines(mini_tokens).collect()
        assert len(lines) == 8
        first = next(
            r for r in lines if r.doc_id == "d1" and r.token_seq == 0
        )
        parts = first.data_line.split(" ")
        assert parts[0] == "The"
        assert len(parts) == 1 + 19  # text + DEFAULT_FEATURE_COLUMNS

    def test_data_lines_labeled_and_per_doc_order(self, spark, mini_tokens):
        labels = spark.createDataFrame(
            [
                ("d1", 0, "header", "B-<title>"),
                ("d1", 1, "header", "I-<title>"),
            ],
            "doc_id string, token_seq long, model_name string, label string",
        )
        out = generate_training_documents(mini_tokens, labels, ["header"])
        lines, per_doc = out["header"]
        d1 = {r.token_seq: r.data_line for r in lines.filter("doc_id='d1'").collect()}
        assert d1[0].endswith("B-<title>")
        assert d1[2].endswith(" O")  # unlabeled token → O fallback
        doc_row = per_doc.filter("doc_id='d1'").collect()[0]
        body = doc_row.data_file_text.split("\n")
        assert doc_row.n_lines == 4
        assert [ln.split(" ")[0] for ln in body] == ["The", "Title", "body", "text"]


class TestDelftConversion:
    def test_iob_translation_branches(self, spark):
        from sciencebeam_parser_spark.plans.training_data import (
            translate_iob_to_grobid,
        )

        df = spark.createDataFrame(
            [("O",), ("B-<title>",), ("I-<title>",), ("<other>",)],
            "label string",
        ).select(translate_iob_to_grobid(F.col("label")).alias("t"))
        # translate_tags_IOB_to_grobid (generate_delft_data.py:77-90)
        assert [r.t for r in df.collect()] == [
            "<other>", "I-<title>", "<title>", "<other>"
        ]

    def test_delft_data_lines(self, spark, mini_tokens):
        from sciencebeam_parser_spark.plans.training_data import (
            generate_delft_data_lines,
        )

        labeled = mini_tokens.withColumn(
            "label",
            F.when(F.col("token_seq") == 0, "B-<title>")
            .when(F.col("token_seq") == 1, "I-<title>")
            .otherwise("O"),
        ).withColumn("f1", F.length("text"))
        lines = {
            (r.doc_id, r.token_seq): r.delft_line
            for r in generate_delft_data_lines(labeled, ["f1"]).collect()
        }
        assert lines[("d1", 0)] == "The 3 I-<title>"
        assert lines[("d1", 1)] == "Title 5 <title>"
        assert lines[("d1", 2)] == "body 4 <other>"


TEI_STRUCTURED_REF = (
    '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><back>'
    '<div type="references"><listBibl>'
    '<biblStruct xml:id="b0">'
    "<analytic>"
    '<title level="a" type="main">Deep Parsing</title>'
    "<idno>doi123</idno>"
    "<author><persName>"
    '<forename type="first">maria</forename><surname>lopez</surname>'
    "</persName></author>"
    "</analytic>"
    '<monogr><title level="j">J. Spark</title>'
    "<imprint><publisher>Pub House</publisher></imprint></monogr>"
    '<note type="raw_reference">raw text</note>'
    "</biblStruct>"
    "</listBibl></div></back></text></TEI>"
)


class TestJatsStructuredReference:
    def test_element_citation_structured_fields(self):
        root = ET.fromstring(tei_to_jats_xml(TEI_STRUCTURED_REF))
        cit = root.find("back/ref-list/ref/element-citation")
        assert cit.findtext("article-title") == "Deep Parsing"
        assert cit.findtext("source") == "J. Spark"
        name = cit.find("person-group/name")
        assert cit.find("person-group").get("person-group-type") == "author"
        assert name.findtext("surname") == "lopez"
        assert name.findtext("given-names") == "maria"


class TestJatsFigureTemplate:
    """tei-to-jats.xsl:160-200 figure/table templates (label, object-id,
    caption, graphic xlink, empty-graphic default, table body)."""

    TEI_NS = "http://www.tei-c.org/ns/1.0"

    def _convert(self, body_inner: str) -> str:
        from sciencebeam_parser_spark.sinks.jats import tei_to_jats_xml

        tei = (
            f'<TEI xmlns="{self.TEI_NS}"><teiHeader/>'
            f"<text><body>{body_inner}</body></text></TEI>"
        )
        return tei_to_jats_xml(tei)

    def test_fig_full(self):
        jats = self._convert(
            '<figure xml:id="fig_0"><head>Figure 1</head>'
            "<figDesc>A caption</figDesc>"
            '<graphic url="image1.png"/></figure>'
        )
        assert '<fig id="fig_0">' in jats
        assert "<object-id>fig_0</object-id>" in jats
        assert "<label>Figure 1</label>" in jats
        assert "<title>Figure 1</title>" in jats
        assert "<p>A caption</p>" in jats
        assert 'href="image1.png"' in jats

    def test_fig_empty_graphic_default(self):
        # output_empty_figure_graphic defaults 'true': no tei:graphic →
        # an EMPTY <graphic/> still appears (xsl:172-176)
        jats = self._convert(
            '<figure xml:id="fig_1"><figDesc>d</figDesc></figure>'
        )
        assert "<graphic />" in jats or "<graphic/>" in jats

    def test_table_wrap(self):
        jats = self._convert(
            '<figure type="table" xml:id="tab_0"><head>Table 1</head>'
            "<figDesc>desc</figDesc><table>1 2 3</table></figure>"
        )
        assert '<table-wrap id="tab_0">' in jats
        assert "<label>Table 1</label>" in jats
        assert "<td>1 2 3</td>" in jats
        # table-wrap has no object-id in the stylesheet
        assert "object-id" not in jats


class TestJatsImprintMappings:
    TEI_NS = "http://www.tei-c.org/ns/1.0"

    def _convert_ref(self, bibl_inner: str) -> str:
        from sciencebeam_parser_spark.sinks.jats import tei_to_jats_xml

        tei = (
            f'<TEI xmlns="{self.TEI_NS}"><teiHeader/>'
            "<text><body/><back><div><listBibl>"
            f'<biblStruct xml:id="b0">{bibl_inner}</biblStruct>'
            "</listBibl></div></back></text></TEI>"
        )
        return tei_to_jats_xml(tei)

    def test_date_year_month_day(self):
        jats = self._convert_ref(
            "<monogr><imprint>"
            '<date type="published" when="2001-02-03"/>'
            "</imprint></monogr>"
        )
        assert "<year>2001</year>" in jats
        assert "<month>02</month>" in jats
        assert "<day>03</day>" in jats

    def test_date_year_only_and_year_month(self):
        assert "<year>2001</year>" in self._convert_ref(
            '<monogr><imprint><date type="published" when="2001"/>'
            "</imprint></monogr>"
        )
        jats = self._convert_ref(
            '<monogr><imprint><date type="published" when="2001-02"/>'
            "</imprint></monogr>"
        )
        assert "<month>02</month>" in jats and "<day>" not in jats

    def test_non_published_date_skipped(self):
        jats = self._convert_ref(
            '<monogr><imprint><date when="1999"/></imprint></monogr>'
        )
        assert "<year>" not in jats

    def test_volume_pages_from_to_and_fallback(self):
        jats = self._convert_ref(
            "<monogr><imprint>"
            '<biblScope unit="volume">7</biblScope>'
            '<biblScope unit="page" from="321" to="324"/>'
            "</imprint></monogr>"
        )
        assert "<volume>7</volume>" in jats
        assert "<fpage>321</fpage>" in jats and "<lpage>324</lpage>" in jats
        fallback = self._convert_ref(
            "<monogr><imprint>"
            '<biblScope unit="page">55</biblScope>'
            "</imprint></monogr>"
        )
        assert "<fpage>55</fpage>" in fallback
        assert "<lpage>55</lpage>" in fallback

    def test_monogr_doi_pub_id(self):
        jats = self._convert_ref(
            '<monogr><idno type="doi">10.1/x</idno></monogr>'
        )
        assert '<pub-id pub-id-type="doi">10.1/x</pub-id>' in jats
