"""TEI sink tests — XPath assertions like the reference's
tests/document/tei_document_test.py:63-258.
"""
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from sciencebeam_parser_spark.plans.cascade import run_fulltext_cascade
from sciencebeam_parser_spark.sinks.tei import entities_to_tei

NS = {"tei": "http://www.tei-c.org/ns/1.0"}


@pytest.fixture(scope="module")
def tei_root(spark):
    entities = spark.createDataFrame(
        [
            ("d1", 1, "title", "front", 0, 1, "Deep Spark", None, None, None),
            ("d1", 2, "abstract", "front", 2, 4, "Abstract: We study", "We study", None, None),
            ("d1", 3, "heading", "body", 5, 6, "1. Intro", None, "1.", None),
            ("d1", 4, "paragraph", "body", 7, 9, "Some text", None, None, None),
            ("d1", 5, "figure_citation", "body", 10, 11, "Figure 1", None, None, "fig_0"),
            ("d1", 6, "raw_figure", "body", 12, 14, "Figure 1 caption", None, None, None),
            ("d1", 7, "raw_reference_text", "back", 15, 16, "Smith 2020", None, None, None),
        ],
        "doc_id string, entity_group long, entity_type string, region string, "
        "token_start long, token_end long, text string, clean_abstract string, "
        "section_label string, target_content_id string",
    ).withColumn(
        "content_id",
        F.when(F.col("entity_type") == "raw_figure", "fig_0").when(
            F.col("entity_type") == "raw_reference_text", "b0"
        ),
    )
    out = entities_to_tei(entities).collect()
    assert len(out) == 1
    return ET.fromstring(out[0]["tei_xml"])


class TestTeiSink:
    def test_title(self, tei_root):
        title = tei_root.find(
            ".//tei:teiHeader/tei:fileDesc/tei:titleStmt/tei:title", NS
        )
        assert title is not None and title.text == "Deep Spark"
        assert title.get("level") == "a"

    def test_abstract_uses_cleaned_text(self, tei_root):
        p = tei_root.find(".//tei:profileDesc/tei:abstract/tei:p", NS)
        assert p is not None and p.text == "We study"

    def test_body_div_head_and_paragraph(self, tei_root):
        div = tei_root.find(".//tei:body/tei:div", NS)
        assert div is not None
        head = div.find("tei:head", NS)
        assert head.text == "1. Intro" and head.get("n") == "1."
        assert div.find("tei:p", NS).text == "Some text"

    def test_figure_with_id_and_citation_target(self, tei_root):
        fig = tei_root.find(".//tei:body/tei:figure", NS)
        assert fig is not None
        assert fig.get("{http://www.w3.org/XML/1998/namespace}id") == "fig_0"
        ref = tei_root.find(".//tei:div/tei:ref", NS)
        assert ref.get("type") == "figure"
        assert ref.get("target") == "#fig_0"

    def test_references_listbibl(self, tei_root):
        bibl = tei_root.find(
            ".//tei:back/tei:div[@type='references']/tei:listBibl/tei:biblStruct", NS
        )
        assert bibl is not None
        assert bibl.get("{http://www.w3.org/XML/1998/namespace}id") == "b0"


class TestCascadeToTei:
    def test_end_to_end_cascade_then_tei(self, spark):
        tokens = spark.createDataFrame(
            [("d1", 1, 1, 1, 0, "Title"), ("d1", 1, 1, 1, 1, "Here")],
            "doc_id string, page_number int, block_id int, line_id int, "
            "token_seq long, text string",
        )
        labels = spark.createDataFrame(
            [
                ("d1", 0, "segmentation", "B-<header>"),
                ("d1", 1, "segmentation", "I-<header>"),
                ("d1", 0, "header", "B-<title>"),
                ("d1", 1, "header", "I-<title>"),
            ],
            "doc_id string, token_seq long, model_name string, label string",
        )
        ents = run_fulltext_cascade(tokens, labels)
        tei = entities_to_tei(ents).collect()[0]["tei_xml"]
        root = ET.fromstring(tei)
        assert root.find(".//tei:titleStmt/tei:title", NS).text == "Title Here"


@pytest.fixture(scope="module")
def tei_authors_root(spark):
    """Front matter with two authors and two orphan affiliations —
    reference behaviors from tests/document/tei_document_test.py:63-258
    (persName parts, affiliation key, dummy author for orphans)."""
    entities = spark.createDataFrame(
        [
            ("d2", 1, "title", "front", 0, 1, "A Title", None),
            ("d2", 2, "raw_authors", "front", 2, 4, "maria garcia lopez", None),
            ("d2", 3, "raw_authors", "front", 5, 5, "prince", None),
            ("d2", 4, "raw_affiliation", "front", 6, 7, "univ one", "aff0"),
            ("d2", 5, "raw_affiliation", "front", 8, 9, "univ two", "aff1"),
            ("d2", 6, "raw_authors", "back", 10, 11, "smith j", None),
        ],
        "doc_id string, entity_group long, entity_type string, region string, "
        "token_start long, token_end long, text string, content_id string",
    )
    out = entities_to_tei(entities).collect()
    assert len(out) == 1
    return ET.fromstring(out[0]["tei_xml"])


class TestTeiAuthors:
    def test_authors_under_analytic(self, tei_authors_root):
        authors = tei_authors_root.findall(
            ".//tei:fileDesc/tei:sourceDesc/tei:biblStruct/tei:analytic"
            "/tei:author",
            NS,
        )
        # 2 real + 1 dummy (orphan affiliations)
        assert len(authors) == 3

    def test_persname_forename_surname_split(self, tei_authors_root):
        pers = tei_authors_root.findall(".//tei:author/tei:persName", NS)
        assert len(pers) == 2
        fn = pers[0].find("tei:forename", NS)
        assert fn.text == "maria" and fn.get("type") == "first"
        assert pers[0].find("tei:surname", NS).text == "garcia lopez"
        # single-token author: forename only, no surname element
        assert pers[1].find("tei:forename", NS).text == "prince"
        assert pers[1].find("tei:surname", NS) is None

    def test_orphan_affiliations_under_dummy_author(self, tei_authors_root):
        dummy_notes = tei_authors_root.findall(
            ".//tei:author/tei:note[@type='dummy_author']", NS
        )
        assert len(dummy_notes) == 1
        affs = tei_authors_root.findall(".//tei:author/tei:affiliation", NS)
        assert [a.get("key") for a in affs] == ["aff0", "aff1"]
        raw = affs[0].find("tei:note", NS)
        assert raw.get("type") == "raw_affiliation"
        assert raw.text == "univ one"

    def test_back_region_authors_stay_notes(self, tei_authors_root):
        # citation-model raw_authors (back region) are NOT front authors
        notes = tei_authors_root.findall(
            ".//tei:body/tei:note[@type='raw_authors']", NS
        )
        assert len(notes) == 1 and notes[0].text == "smith j"

    def test_jats_contrib_group(self, tei_authors_root):
        from sciencebeam_parser_spark.sinks.jats import tei_to_jats_xml

        jats = ET.fromstring(
            tei_to_jats_xml(ET.tostring(tei_authors_root, encoding="unicode"))
        )
        contribs = jats.findall(".//contrib-group/contrib")
        assert len(contribs) == 3
        name = contribs[0].find("name")
        assert name.find("surname").text == "garcia lopez"
        assert name.find("given-names").text == "maria"
        # dummy author contributes the aff xref, not a name
        assert contribs[2].find("name") is None
        xref = contribs[2].find("xref")
        assert xref.get("ref-type") == "aff" and xref.get("rid") == "aff0"
        affs = jats.findall(".//article-meta/aff")
        assert [a.get("id") for a in affs] == ["aff0", "aff1"]


class TestTeiStyles:
    """<hi rend> style runs, ported from tests/document/tei/common_test.py
    (bold / italic / nested bold+italic / merged consecutive runs; plain
    text preserved around them)."""

    def _title_el(self, spark, runs):
        entities = spark.createDataFrame(
            [("d1", 1, "title", "front", 0, 2, "t1 t2 t3", runs)],
            "doc_id string, entity_group long, entity_type string, "
            "region string, token_start long, token_end long, text string, "
            "style_runs array<struct<styles:array<string>,text:string>>",
        )
        out = entities_to_tei(entities).collect()[0]["tei_xml"]
        return ET.fromstring(out).find(".//tei:titleStmt/tei:title", NS)

    def test_bold_run(self, spark):
        el = self._title_el(
            spark,
            [([], "t1"), (["bold"], "t2"), ([], "t3")],
        )
        his = el.findall("tei:hi", NS)
        assert [h.get("rend") for h in his] == ["bold"]
        assert his[0].text == "t2"
        assert "".join(el.itertext()) == "t1 t2 t3"

    def test_nested_bold_italic(self, spark):
        el = self._title_el(
            spark,
            [([], "t1"), (["bold", "italic"], "t2"), ([], "t3")],
        )
        outer = el.find("tei:hi", NS)
        assert outer.get("rend") == "bold"
        inner = outer.find("tei:hi", NS)
        assert inner.get("rend") == "italic" and inner.text == "t2"
        assert "".join(el.itertext()) == "t1 t2 t3"

    def test_merged_consecutive_styled_tokens(self, spark):
        # consecutive same-style tokens arrive pre-merged into one run
        el = self._title_el(
            spark,
            [([], "t1"), (["bold"], "t2 t3"), ([], "t4")],
        )
        his = el.findall("tei:hi", NS)
        assert len(his) == 1 and his[0].text == "t2 t3"
        assert "".join(el.itertext()) == "t1 t2 t3 t4"

    def test_no_styles_plain_text(self, spark):
        el = self._title_el(spark, [])
        assert el.text == "t1 t2 t3"
        assert el.findall("tei:hi", NS) == []


class TestTeiParsedFigure:
    def test_parsed_label_and_caption(self, spark):
        """tei/figure_table.py:24-60 — a parsed label emits BOTH head and
        label; the caption becomes figDesc."""
        entities = spark.createDataFrame(
            [
                ("d1", 1, "raw_figure", "body", 0, 3, "Figure 1 A caption",
                 "fig_0", "Figure 1", "A caption"),
                ("d1", 2, "raw_table", "body", 4, 5, "tab text",
                 "tab_0", None, None),
            ],
            "doc_id string, entity_group long, entity_type string, "
            "region string, token_start long, token_end long, text string, "
            "content_id string, fig_label string, fig_caption string",
        )
        root = ET.fromstring(
            entities_to_tei(entities).collect()[0]["tei_xml"]
        )
        figs = root.findall(".//tei:body/tei:figure", NS)
        assert len(figs) == 2
        parsed = figs[0]
        assert parsed.find("tei:head", NS).text == "Figure 1"
        assert parsed.find("tei:label", NS).text == "Figure 1"
        assert parsed.find("tei:figDesc", NS).text == "A caption"
        raw = figs[1]
        assert raw.find("tei:head", NS) is None
        assert raw.find("tei:figDesc", NS).text == "tab text"


class TestTeiEquation:
    def test_formula_with_nested_label(self, spark):
        """tei/equation.py:26-52 — raw equation → formula; a following
        equation_label nests inside it as label."""
        entities = spark.createDataFrame(
            [
                ("d1", 1, "equation", "body", 0, 2, "E = mc2"),
                ("d1", 2, "equation_label", "body", 3, 3, "(1)"),
            ],
            "doc_id string, entity_group long, entity_type string, "
            "region string, token_start long, token_end long, text string",
        ).withColumn("content_id", F.lit(None).cast("string"))
        root = ET.fromstring(
            entities_to_tei(entities).collect()[0]["tei_xml"]
        )
        formula = root.find(".//tei:body/tei:formula", NS)
        assert formula is not None and formula.text == "E = mc2"
        assert formula.find("tei:label", NS).text == "(1)"
        # no stray notes
        assert root.findall(".//tei:note", NS) == []


class TestTeiPageRangeAndGraphic:
    def test_structured_ref_page_range(self, spark):
        """tei/page_range.py — parsed ranges become biblScope[@unit=page]
        with from/to; unparseable ranges keep the text."""
        entities = spark.createDataFrame(
            [
                ("d1", 1, "raw_reference_text", "back", 0, 5, "ref one",
                 "b0",
                 [{"field_type": "page_range", "text": "12-34"}]),
                ("d1", 2, "raw_reference_text", "back", 6, 9, "ref two",
                 "b1",
                 [{"field_type": "page_range", "text": "e1234"}]),
            ],
            "doc_id string, entity_group long, entity_type string, "
            "region string, token_start long, token_end long, text string, "
            "content_id string, "
            "ref_fields array<struct<field_type:string,text:string>>",
        )
        root = ET.fromstring(
            entities_to_tei(entities).collect()[0]["tei_xml"]
        )
        scopes = root.findall(".//tei:imprint/tei:biblScope", NS)
        assert len(scopes) == 2
        assert (scopes[0].get("from"), scopes[0].get("to")) == ("12", "34")
        assert scopes[0].text is None
        assert scopes[1].get("from") is None and scopes[1].text == "e1234"

    def test_figure_graphic_children(self, spark):
        """tei/graphic.py — matched layout graphics become graphic
        children with url/coords/type attributes."""
        entities = spark.createDataFrame(
            [
                ("d1", 1, "raw_figure", "body", 0, 3, "Figure 1", "fig_0",
                 [{"url": "image1.png", "coords": "1,10.00,20.00,30.00,40.00",
                   "graphic_type": "bitmap"}]),
            ],
            "doc_id string, entity_group long, entity_type string, "
            "region string, token_start long, token_end long, text string, "
            "content_id string, "
            "graphics array<map<string,string>>",
        )
        root = ET.fromstring(
            entities_to_tei(entities).collect()[0]["tei_xml"]
        )
        g = root.find(".//tei:figure/tei:graphic", NS)
        assert g.get("url") == "image1.png"
        assert g.get("coords") == "1,10.00,20.00,30.00,40.00"
        assert g.get("type") == "bitmap"


class TestFusedHistogram:
    def test_fused_equals_unfused_chain(self, spark):
        # the fused build+count crossing must produce exactly the
        # histogram of the 2/3-stage chain it replaced, for both the
        # plain-TEI and the TEI->JATS forms
        from collections import Counter
        from xml.parsers import expat

        from sciencebeam_parser_spark.queries.pipeline_ops import (
            _xml_histogram_fused,
        )
        from sciencebeam_parser_spark.sinks.jats import tei_to_jats_xml

        entities = spark.createDataFrame(
            [
                ("d1", 1, "title", "front", 0, 1, "Deep Spark"),
                ("d1", 2, "heading", "body", 2, 3, "1. Intro"),
                ("d1", 3, "paragraph", "body", 4, 6, "Some text"),
                ("d1", 4, "raw_reference_text", "back", 7, 8, "Smith 2020"),
                ("d2", 1, "title", "front", 0, 1, "Other Doc"),
                ("d2", 2, "paragraph", "body", 2, 3, "Body text"),
            ],
            "doc_id string, entity_group long, entity_type string, "
            "region string, token_start long, token_end long, text string",
        ).withColumn(
            "content_id",
            F.when(F.col("entity_type") == "raw_reference_text", "b0"),
        )

        def manual_counts(xml):
            counts = Counter()
            p = expat.ParserCreate(namespace_separator="}")
            p.StartElementHandler = (
                lambda tag, attrs: counts.update([tag.rsplit("}", 1)[-1]])
            )
            p.Parse(xml, True)
            return counts

        for to_jats in (False, True):
            got = {
                (r["doc_id"], r["element"]): r["n_elements"]
                for r in _xml_histogram_fused(
                    entities, to_jats=to_jats
                ).collect()
            }
            want = {}
            for row in entities_to_tei(entities).collect():
                xml = row["tei_xml"]
                if to_jats:
                    xml = tei_to_jats_xml(xml)
                for tag, n in manual_counts(xml).items():
                    want[(row["doc_id"], tag)] = n
            assert got == want and got
