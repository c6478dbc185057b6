"""TEI → JATS conversion + asset-ZIP sink (SURVEY §2A A29, second half).

Reference: transformers/xslt.py applies resources/xslt/tei-to-jats.xsl
(app/parser.py:284-292); asset ZIP bundling is app/parser.py:102-127
(``create_asset_zip_for_semantic_document``). lxml/libxslt is not available
in this environment, so the JATS transform re-implements the stylesheet's
structural mappings with stdlib ElementTree:

  TEI element                                   → JATS element
  teiHeader/fileDesc/titleStmt/title            → front/article-meta/title-group/article-title
  profileDesc/abstract                          → front/article-meta/abstract
  text/body/div                                 → body/sec (head → title, p → p)
  figure[@type!=table] / figure[@type=table]    → fig / table-wrap
  back//listBibl                                → back/ref-list (biblStruct → ref)
  ref[@type=bibr|figure|table]                  → xref[@ref-type=bibr|fig|table]

(mappings at tei-to-jats.xsl:18-35, :57-123, :140-206, :242-266, :355+).

NOTE — behavioral port, not the stylesheet: this module is a structural
re-implementation of resources/xslt/tei-to-jats.xsl, not an execution of
it. All 17 of the stylesheet's templates are covered semantically —
root/article scaffold, front matter (title-group, contrib-group/contrib/
name with surname/given-names, aff + xref-by-marker and the orphan-aff
path, abstract), body sec/title/p recursion, fig and table-wrap (label,
caption, graphic @xlink:href, table body), back ack/app/sec defaults,
ref-list with biblStruct → element-citation (person-group, article-title,
source, volume, fpage/lpage from the '-'-split page range, year/month/day
from the date parser), and the three xref @ref-type rewrites — verified by
q131/q167/q195/q196 oracles plus test_tei_sink.py/test_sinks_and_training
unit cases. A real libxslt run is impossible here (lxml is absent); a
deployment that requires the literal stylesheet can apply it with lxml in
this same mapInPandas shape — the Spark plumbing is transform-agnostic.

Spark mapping: per-row transformation of the (doc_id, tei_xml) relation — a
scalar pandas-style UDF territory, implemented with mapInPandas to stream
Arrow batches; the ZIP sink is a ``foreachPartition`` writer producing one
zip per partition (the reference zips one doc per request; a corpus run
wants one archive per task, not per row).
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET
import zipfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

TEI_NS = "http://www.tei-c.org/ns/1.0"


def _t(tag: str) -> str:
    return f"{{{TEI_NS}}}{tag}"


def _local(el: ET.Element) -> str:
    return el.tag.rsplit("}", 1)[-1]


def _all_text(el: ET.Element) -> str:
    return "".join(el.itertext())


def tei_to_jats_xml(tei_xml: str) -> str:
    """Convert one TEI document string to a JATS article string."""
    tei = ET.fromstring(tei_xml)
    article = ET.Element("article")
    article.set("article-type", "research-article")

    front = ET.SubElement(article, "front")
    meta = ET.SubElement(front, "article-meta")
    title_group = ET.SubElement(meta, "title-group")
    for title in tei.findall(f"{_t('teiHeader')}/{_t('fileDesc')}/{_t('titleStmt')}/{_t('title')}"):
        ET.SubElement(title_group, "article-title").text = _all_text(title)

    # analytic/author → contrib-group/contrib (tei-to-jats.xsl:64-86):
    # persName → name{surname, given-names} (:339-353); author/affiliation
    # → xref[@ref-type=aff][@rid=key] on the contrib and a top-level
    # aff[@id=key] per affiliation (:88-121)
    authors = tei.findall(
        f"{_t('teiHeader')}/{_t('fileDesc')}/{_t('sourceDesc')}"
        f"/{_t('biblStruct')}/{_t('analytic')}/{_t('author')}"
    )
    if authors:
        group = ET.SubElement(meta, "contrib-group")
        group.set("content-type", "author")
        for author in authors:
            contrib = ET.SubElement(group, "contrib")
            contrib.set("contrib-type", "person")
            pers = author.find(_t("persName"))
            if pers is not None:
                name = ET.SubElement(contrib, "name")
                surname = pers.find(_t("surname"))
                ET.SubElement(name, "surname").text = (
                    _all_text(surname) if surname is not None else ""
                )
                ET.SubElement(name, "given-names").text = " ".join(
                    _all_text(f) for f in pers.findall(_t("forename"))
                )
            affs = author.findall(_t("affiliation"))
            if affs:
                # xsl:value-of over a node-set takes the first node's @key
                xref = ET.SubElement(contrib, "xref")
                xref.set("ref-type", "aff")
                xref.set("rid", affs[0].get("key", ""))
        for aff in tei.findall(
            f"{_t('teiHeader')}/{_t('fileDesc')}/{_t('sourceDesc')}"
            f"/{_t('biblStruct')}/{_t('analytic')}/{_t('author')}"
            f"/{_t('affiliation')}"
        ):
            aff_out = ET.SubElement(meta, "aff")
            aff_out.set("id", aff.get("key", ""))

    for abstract in tei.findall(f"{_t('teiHeader')}/{_t('profileDesc')}/{_t('abstract')}"):
        ab = ET.SubElement(meta, "abstract")
        for p in abstract.findall(_t("p")):
            ET.SubElement(ab, "p").text = _all_text(p)

    body_out = ET.SubElement(article, "body")
    tei_body = tei.find(f"{_t('text')}/{_t('body')}")
    if tei_body is not None:
        for child in tei_body:
            tag = _local(child)
            if tag == "div":
                sec = ET.SubElement(body_out, "sec")
                for sub in child:
                    sub_tag = _local(sub)
                    if sub_tag == "head":
                        ET.SubElement(sec, "title").text = _all_text(sub)
                    elif sub_tag == "p":
                        ET.SubElement(sec, "p").text = _all_text(sub)
                    elif sub_tag == "ref":
                        xref = ET.SubElement(sec, "xref")
                        rt = sub.get("type", "")
                        xref.set(
                            "ref-type",
                            {"bibr": "bibr", "figure": "fig", "table": "table"}.get(rt, rt),
                        )
                        tgt = sub.get("target", "")
                        if tgt.startswith("#"):
                            xref.set("rid", tgt[1:])
                        xref.text = _all_text(sub)
            elif tag == "p":
                ET.SubElement(body_out, "p").text = _all_text(child)
            elif tag == "figure":
                # tei-to-jats.xsl:160-200: fig gets object-id + label
                # (head text) + caption{title(head), p(figDesc)} +
                # graphic[@xlink:href] per tei:graphic (or an empty
                # <graphic/> — output_empty_figure_graphic defaults
                # true); table-wrap gets label + caption +
                # table/tbody/tr/td with the tei:table text
                is_table = child.get("type") == "table"
                fig = ET.SubElement(body_out, "table-wrap" if is_table else "fig")
                xml_id = child.get("{http://www.w3.org/XML/1998/namespace}id")
                fig.set("id", xml_id or "")
                head = child.find(_t("head"))
                head_text = _all_text(head) if head is not None else ""
                if not is_table:
                    ET.SubElement(fig, "object-id").text = xml_id or ""
                ET.SubElement(fig, "label").text = head_text
                cap = ET.SubElement(fig, "caption")
                if head is not None:
                    ET.SubElement(cap, "title").text = head_text
                desc = child.find(_t("figDesc"))
                ET.SubElement(cap, "p").text = (
                    _all_text(desc) if desc is not None else ""
                )
                if is_table:
                    tbl = child.find(_t("table"))
                    table_out = ET.SubElement(fig, "table")
                    tbody = ET.SubElement(table_out, "tbody")
                    tr = ET.SubElement(tbody, "tr")
                    ET.SubElement(tr, "td").text = (
                        _all_text(tbl) if tbl is not None else ""
                    )
                else:
                    graphics = child.findall(_t("graphic"))
                    for g in graphics:
                        g_out = ET.SubElement(fig, "graphic")
                        if g.get("url"):
                            g_out.set(
                                "{http://www.w3.org/1999/xlink}href",
                                g.get("url"),
                            )
                    if not graphics:
                        ET.SubElement(fig, "graphic")
            elif tag == "note":
                p = ET.SubElement(body_out, "p")
                p.set("content-type", child.get("type", "note"))
                p.text = _all_text(child)

    back_out = ET.SubElement(article, "back")
    # back template (tei-to-jats.xsl:209-240, default params
    # acknowledgement_target='ack', annex_target='back'):
    # div[@type=acknowledgement]'s child divs → ack/sec{title,p};
    # div[@type=annex]'s child divs → sec directly in back
    tei_back = tei.find(f"{_t('text')}/{_t('back')}")

    def _sec_from_div(parent: ET.Element, div: ET.Element) -> None:
        sec = ET.SubElement(parent, "sec")
        head = div.find(_t("head"))
        if head is not None:
            ET.SubElement(sec, "title").text = _all_text(head)
        for p in div.findall(_t("p")):
            ET.SubElement(sec, "p").text = _all_text(p)

    if tei_back is not None:
        ack_divs = [
            d for d in tei_back.findall(_t("div"))
            if d.get("type") == "acknowledgement"
        ]
        if any(d.findall(_t("div")) for d in ack_divs):
            ack = ET.SubElement(back_out, "ack")
            for outer in ack_divs:
                for div in outer.findall(_t("div")):
                    _sec_from_div(ack, div)
        for outer in tei_back.findall(_t("div")):
            if outer.get("type") != "annex":
                continue
            for div in outer.findall(_t("div")):
                _sec_from_div(back_out, div)
    for list_bibl in tei.iter(_t("listBibl")):
        ref_list = ET.SubElement(back_out, "ref-list")
        ref_list.set("id", "ref-list-1")
        for bibl in list_bibl.findall(_t("biblStruct")):
            ref = ET.SubElement(ref_list, "ref")
            xml_id = bibl.get("{http://www.w3.org/XML/1998/namespace}id")
            if xml_id:
                ref.set("id", xml_id)
            # biblStruct → element-citation (tei-to-jats.xsl:250-335):
            # article-title from analytic (or monogr) title[@type=main],
            # source from monogr title[@level=j], person-group from
            # analytic/author/persName; unmapped raw notes do NOT surface
            # (the stylesheet has no mixed-citation fallback)
            cit = ET.SubElement(ref, "element-citation")
            cit.set("publication-type", "journal")
            a_title = bibl.find(
                f"{_t('analytic')}/{_t('title')}[@type='main']"
            )
            if a_title is None:
                a_title = bibl.find(
                    f"{_t('monogr')}/{_t('title')}[@type='main']"
                )
            if a_title is not None:
                ET.SubElement(cit, "article-title").text = _all_text(a_title)
            j_title = bibl.find(f"{_t('monogr')}/{_t('title')}[@level='j']")
            if j_title is not None:
                ET.SubElement(cit, "source").text = _all_text(j_title)
            # imprint mappings (tei-to-jats.xsl:276-335): published date
            # @when → year/month/day (parseDateComponents, :434-490 —
            # split on '-': first part year, second month, remainder
            # day); biblScope volume/issue → volume/issue; biblScope
            # page @from/@to → fpage/lpage, text fallback → both
            imprint = f"{_t('monogr')}/{_t('imprint')}"
            for d in bibl.findall(f"{imprint}/{_t('date')}"):
                if d.get("type") != "published":
                    continue
                when = d.get("when", "")
                if "-" in when:
                    year, rest = when.split("-", 1)
                    ET.SubElement(cit, "year").text = year
                    if "-" in rest:
                        month, day = rest.split("-", 1)
                        ET.SubElement(cit, "month").text = month
                        ET.SubElement(cit, "day").text = day
                    else:
                        ET.SubElement(cit, "month").text = rest
                else:
                    ET.SubElement(cit, "year").text = when
                break  # the stylesheet reads the (first) published date
            for unit in ("volume", "issue"):
                scope = bibl.find(
                    f"{imprint}/{_t('biblScope')}[@unit='{unit}']"
                )
                if scope is not None:
                    ET.SubElement(cit, unit).text = _all_text(scope)
            page = bibl.find(f"{imprint}/{_t('biblScope')}[@unit='page']")
            if page is not None:
                if page.get("from") or page.get("to"):
                    if page.get("from"):
                        ET.SubElement(cit, "fpage").text = page.get("from")
                    if page.get("to"):
                        ET.SubElement(cit, "lpage").text = page.get("to")
                elif page.text:
                    ET.SubElement(cit, "fpage").text = page.text
                    ET.SubElement(cit, "lpage").text = page.text
            doi = bibl.find(f"{_t('monogr')}/{_t('idno')}[@type='doi']")
            if doi is not None:
                pub_id = ET.SubElement(cit, "pub-id")
                pub_id.set("pub-id-type", "doi")
                pub_id.text = _all_text(doi)
            # person-group per author container (xsl:305-317: analytic
            # authors, then monogr authors, each their own group)
            for container in ("analytic", "monogr"):
                pers = bibl.findall(
                    f"{_t(container)}/{_t('author')}/{_t('persName')}"
                )
                if pers:
                    group = ET.SubElement(cit, "person-group")
                    group.set("person-group-type", "author")
                    for p in pers:
                        name = ET.SubElement(group, "name")
                        surname = p.find(_t("surname"))
                        ET.SubElement(name, "surname").text = (
                            _all_text(surname) if surname is not None else ""
                        )
                        ET.SubElement(name, "given-names").text = " ".join(
                            _all_text(f) for f in p.findall(_t("forename"))
                        )
    return ET.tostring(article, encoding="unicode")


JATS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("jats_xml", T.StringType()),
    ]
)


def tei_to_jats(tei_df: DataFrame) -> DataFrame:
    """(doc_id, tei_xml) → (doc_id, jats_xml), streamed per Arrow batch."""

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "jats_xml": pdf["tei_xml"].map(tei_to_jats_xml),
                }
            )

    return tei_df.select("doc_id", "tei_xml").mapInPandas(
        convert, schema=JATS_OUT_SCHEMA
    )


def tei_with_jats(tei_df: DataFrame) -> DataFrame:
    """(doc_id, tei_xml) → (doc_id, tei_xml, jats_xml) in ONE pass —
    avoids the tei ⋈ jats self-join (and the cache it forces) when a sink
    needs both serializations."""

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tei_xml": pdf["tei_xml"],
                    "jats_xml": pdf["tei_xml"].map(tei_to_jats_xml),
                }
            )

    return tei_df.select("doc_id", "tei_xml").mapInPandas(
        convert,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("tei_xml", T.StringType()),
                T.StructField("jats_xml", T.StringType()),
            ]
        ),
    )


def write_xml_zip(
    df: DataFrame,
    output_dir: str,
    *,
    id_col: str = "doc_id",
    xml_col: str = "tei_xml",
    suffix: str = ".tei.xml",
) -> None:
    """Asset-ZIP sink: one zip archive per partition, one XML member per
    document (app/parser.py:102-127 writes one zip per doc; a corpus job
    amortizes to per-task archives — executor-side I/O, nothing through the
    driver)."""
    os.makedirs(output_dir, exist_ok=True)

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(output_dir, f"part-{pid:05d}.zip")
        written = False
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            for row in rows:
                zf.writestr(f"{row[id_col]}{suffix}", row[xml_col] or "")
                written = True
        if not written:
            os.remove(path)

    df.select(id_col, xml_col).foreachPartition(write_partition)


__all__ = ["tei_to_jats", "tei_to_jats_xml", "write_xml_zip"]
