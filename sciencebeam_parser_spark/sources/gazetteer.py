"""Gazetteer (text lookup) source + membership feature (SURVEY §1.2
`TextLookUp`, §2B "Text/CSV scan").

Reference: lookup/loader.py `load_lookup_from_text_file` (one term per line,
blank lines dropped), lookup/__init__.py `SimpleTextLookUp` (case-insensitive
membership via lowering both sides) and `MergedTextLookUp` (OR over several
lookups → here a plain union of term tables). The consuming feature is
models/data.py:658-678 (`_get_str_lookup` → is_country/is_first_name/
is_last_name).

Scale: a gazetteer is a small dimension (10^4-10^6 terms); membership is a
broadcast join against the distinct lowered term set, so the token fact table
never shuffles. At 100 TB of tokens this stays a map-side hash probe.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_gazetteer(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Load one or more term-per-line text files into a (term) DataFrame.
    Terms are lowercased and deduplicated; blank lines dropped — matching
    `load_lookup_from_text_file` + `SimpleTextLookUp.__init__`. Passing
    several paths is the `MergedTextLookUp` union."""
    df = spark.read.text(paths if isinstance(paths, list) else [paths])
    return (
        df.select(F.lower(F.trim("value")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )


def add_gazetteer_flag(
    df: DataFrame,
    gazetteer: DataFrame,
    *,
    text_col: str = "text",
    flag_col: str = "is_in_gazetteer",
) -> DataFrame:
    """Add boolean `flag_col`: lower(text) ∈ gazetteer. Broadcast left join
    (`SimpleTextLookUp.contains` lowers the probe side too)."""
    terms = F.broadcast(
        gazetteer.select(F.col("term").alias("_gz_term")).withColumn(
            "_gz_hit", F.lit(True)
        )
    )
    return (
        df.join(terms, F.lower(F.col(text_col)) == F.col("_gz_term"), "left")
        .withColumn(flag_col, F.coalesce("_gz_hit", F.lit(False)))
        .drop("_gz_term", "_gz_hit")
    )


_TEI_NS = "http://www.tei-c.org/ns/1.0"


def read_xml_gazetteer(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Load a TEI-XML gazetteer: every ``//tei:cell``'s text content is one
    term (reference: lookup/xml_lookup.py `load_xml_lookup_from_file`,
    `get_text_content` = all descendant text joined). The XML parses on
    EXECUTORS via mapInPandas over a binaryFile scan — a directory of
    gazetteer files parses in parallel; terms lower + distinct like the
    text loader."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    raw = spark.read.format("binaryFile").load(
        paths if isinstance(paths, list) else [paths]
    ).select("content")

    def parse(batches):
        import xml.etree.ElementTree as ET

        import pandas as pd

        for pdf in batches:
            terms: list[str] = []
            for blob in pdf["content"]:
                root = ET.fromstring(bytes(blob))
                for cell in root.iter(f"{{{_TEI_NS}}}cell"):
                    terms.append("".join(cell.itertext()))
            yield pd.DataFrame({"term": terms})

    df = raw.mapInPandas(parse, "term string")
    return (
        df.select(F.lower(F.trim("term")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )


__all__ = ["read_gazetteer", "read_xml_gazetteer", "add_gazetteer_flag"]
