"""ALTO XML ingest tests (FIXTURES.md F7; reference
tests/external/pdfalto/parser_test.py behaviors).
"""
import pytest
from pyspark.sql import functions as F

from sciencebeam_parser_spark.sources.alto import (
    read_alto_graphics,
    read_alto_tokens,
)

ALTO_XML = """<?xml version="1.0" encoding="UTF-8"?>
<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">
  <Styles>
    <TextStyle ID="font1" FONTFAMILY="Times" FONTSIZE="9.9" FONTSTYLE="bold italics"/>
    <TextStyle ID="font2" FONTFAMILY="Arial" FONTSIZE="11.0"/>
  </Styles>
  <Layout>
    <Page PHYSICAL_IMG_NR="1" WIDTH="600" HEIGHT="800">
      <PrintSpace>
        <TextBlock>
          <TextLine>
            <String CONTENT="Hello" STYLEREFS="font1" HPOS="10" VPOS="20" WIDTH="50" HEIGHT="12"/>
            <String CONTENT="World" STYLEREFS="font2" HPOS="70" VPOS="20" WIDTH="55" HEIGHT="12"/>
          </TextLine>
          <TextLine/>
          <TextLine>
            <String CONTENT="Second" HPOS="10" VPOS="40" WIDTH="60" HEIGHT="12"/>
          </TextLine>
        </TextBlock>
        <Illustration FILEID="image1.png" TYPE="image" HPOS="100" VPOS="200" WIDTH="300" HEIGHT="150"/>
      </PrintSpace>
    </Page>
    <Page WIDTH="600" HEIGHT="800">
      <PrintSpace>
        <TextBlock>
          <TextLine>
            <String CONTENT="Page2" HPOS="10" VPOS="20" WIDTH="40" HEIGHT="12"/>
          </TextLine>
        </TextBlock>
      </PrintSpace>
    </Page>
  </Layout>
</alto>
"""


@pytest.fixture(scope="module")
def alto_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("alto")
    (d / "doc1.alto.xml").write_text(ALTO_XML)
    return str(d)


class TestReadAltoTokens:
    def test_token_rows_with_fonts_and_coords(self, spark, alto_dir):
        df = read_alto_tokens(spark, alto_dir + "/*.xml")
        rows = {r["text"]: r for r in df.collect()}
        assert set(rows) == {"Hello", "World", "Second", "Page2"}
        hello = rows["Hello"]
        # font map join (parser.py:154-162)
        assert hello["font_family"] == "Times"
        assert hello["font_size"] == 9.9
        assert hello["is_bold"] is True and hello["is_italics"] is True
        assert hello["is_subscript"] is False
        # EMPTY font sentinel for missing STYLEREFS (layout_document.py:26)
        assert rows["Second"]["font_id"] == "_EMPTY"
        assert rows["Second"]["font_family"] is None
        assert hello["x"] == 10.0 and hello["width"] == 50.0
        assert hello["page_width"] == 600.0

    def test_surrogate_keys_in_document_order(self, spark, alto_dir):
        df = read_alto_tokens(spark, alto_dir + "/*.xml")
        rows = sorted(df.collect(), key=lambda r: r["token_seq"])
        assert [r["text"] for r in rows] == ["Hello", "World", "Second", "Page2"]
        assert [r["token_seq"] for r in rows] == [0, 1, 2, 3]
        # empty TextLine skipped; line ids advance only on non-empty lines
        assert rows[0]["line_id"] == rows[1]["line_id"]
        assert rows[2]["line_id"] == rows[0]["line_id"] + 1
        # missing PHYSICAL_IMG_NR → 1 + page_index (parser.py:110-112)
        assert rows[3]["page_number"] == 2
        assert rows[3]["doc_id"] == "doc1.alto"

    def test_graphics(self, spark, alto_dir):
        df = read_alto_graphics(spark, alto_dir + "/*.xml")
        rows = df.collect()
        assert len(rows) == 1
        g = rows[0]
        assert g["graphic_type"] == "image"
        assert g["local_file_path"] == "image1.png"
        assert (g["x"], g["y"], g["width"], g["height"]) == (100.0, 200.0, 300.0, 150.0)
