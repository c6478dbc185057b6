"""Scalar parsers as column expressions.

Each function mirrors a reference parser exactly (file:line cited per
function, all under /root/reference/sciencebeam_parser/). Implemented with
built-in pyspark.sql.functions only — they compile to JVM codegen, which is
the main throughput win over the reference's per-string Python (SURVEY §4).
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Page ranges — models/citation/extract.py:77-90 (parse_page_range)
# ---------------------------------------------------------------------------


def parse_page_range(text: Column | str) -> Column:
    """'321-330' → (321, 330); '321-4' → (321, 324) via end-page completion
    (to_page shorter than from_page borrows its leading digits); no '-' or
    >2 parts → (null, null). Returns struct(from_page, to_page) as strings,
    matching the reference which keeps them as text.
    """
    col = F.col(text) if isinstance(text, str) else text
    parts = F.split(col, "-")
    from_raw = F.trim(parts.getItem(0))
    to_raw = F.trim(parts.getItem(1))
    completed_to = F.when(
        (F.length(to_raw) > 0) & (F.length(to_raw) < F.length(from_raw)),
        F.concat(
            from_raw.substr(F.lit(1), F.length(from_raw) - F.length(to_raw)),
            to_raw,
        ),
    ).otherwise(to_raw)
    two_parts = F.size(parts) == 2
    return F.struct(
        F.when(two_parts, from_raw).alias("from_page"),
        F.when(two_parts, completed_to).alias("to_page"),
    )


# ---------------------------------------------------------------------------
# External identifiers — models/citation/extract.py:34-52, 108-132
# (get_detected_external_identifier_type_and_value_for_text)
# ---------------------------------------------------------------------------

DOI_PATTERN = r"\b(10\.\d{4,}(?:\.\d{1,})*/.+)"
PMID_PATTERN = r"(?:(?:PMID)|(?:Pub(?:\s)?Med(?:\s)?(?:ID)?))(?:\s)?(?:\:)?(?:\s)*(\d{1,8})"
PMCID_PATTERN = r"(?:PMC)(\d{1,})"
ARXIV_PATTERN_1 = r"(?:arXiv\s?(?:\.org)?\s?\:\s?(\d{4}\s?\.\s?\d{4,5}(?:v\d+)?))"
ARXIV_PATTERN_2 = r"(?:arXiv\s?(?:\.org)?\s?\:\s?([ a-zA-Z\-\.]*\s?/\s?\d{7}(?:v\d+)?))"
PII_PATTERN = r"\b([S,B]\W*(?:[0-9xX]\W*){15,}[0-9xX])"


def detect_external_identifier(text: Column | str) -> Column:
    """struct(id_type, value): first match wins in reference order
    DOI → PMCID → arXiv → PMID (anchored) → PII; whitespace stripped first;
    no match → (null, stripped_text). PMCID values get the 'PMC' prefix
    re-attached (extract.py:117-120).
    """
    col = F.col(text) if isinstance(text, str) else text
    v = F.regexp_replace(col, r"\s", "")
    doi = F.regexp_extract(v, DOI_PATTERN, 1)
    pmcid = F.regexp_extract(v, PMCID_PATTERN, 1)
    arxiv1 = F.regexp_extract(v, ARXIV_PATTERN_1, 1)
    arxiv2 = F.regexp_extract(v, ARXIV_PATTERN_2, 1)
    # re.match == anchored search
    pmid = F.regexp_extract(v, "^" + PMID_PATTERN, 1)
    pii = F.regexp_extract(v, PII_PATTERN, 1)
    id_type = (
        F.when(doi != "", "doi")
        .when(pmcid != "", "pmcid")
        .when((arxiv1 != "") | (arxiv2 != ""), "arxiv")
        .when(pmid != "", "pmid")
        .when(pii != "", "pii")
        .otherwise(F.lit(None).cast("string"))
    )
    value = (
        F.when(doi != "", doi)
        .when(pmcid != "", F.concat(F.lit("PMC"), pmcid))
        .when(arxiv1 != "", arxiv1)
        .when(arxiv2 != "", arxiv2)
        .when(pmid != "", pmid)
        .when(pii != "", pii)
        .otherwise(v)
    )
    return F.struct(id_type.alias("id_type"), value.alias("value"))


# ---------------------------------------------------------------------------
# Dates — models/citation/extract.py:153-162 (parse_date)
# ---------------------------------------------------------------------------


def extract_year(text: Column | str) -> Column:
    """First 4-digit run in the whitespace-stripped text → int year, else null."""
    col = F.col(text) if isinstance(text, str) else text
    y = F.regexp_extract(F.regexp_replace(col, r"\s", ""), r"(\d{4})", 1)
    return F.when(y != "", y.cast("int")).otherwise(F.lit(None).cast("int"))


# ---------------------------------------------------------------------------
# Abstract prefix strip — models/header/extract.py:24, 34-57
# ---------------------------------------------------------------------------

ABSTRACT_REGEX = (
    r"^(?:(?:abstract|summary|résumé|abrégé|a b s t r a c t)(?:[.:])?)?\s*(.*)"
)


def clean_abstract_text(text: Column | str) -> Column:
    """Strip a leading 'Abstract:'/'Summary.'-style prefix, case-insensitive."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract(col, "(?i)" + ABSTRACT_REGEX, 1)


# ---------------------------------------------------------------------------
# Section label split — models/fulltext/extract.py:43-65
# ---------------------------------------------------------------------------

HEADER_LABEL_REGEX = r"^(\d+\.?(?:\d+\.?)*)\s*(\D.*)"


def split_section_label(text: Column | str) -> Column:
    """'1.2 Methods' → struct(section_label='1.2', section_title='Methods');
    no leading number → (null, text).
    """
    col = F.col(text) if isinstance(text, str) else text
    label = F.regexp_extract(col, HEADER_LABEL_REGEX, 1)
    title = F.regexp_extract(col, HEADER_LABEL_REGEX, 2)
    has = label != ""
    return F.struct(
        F.when(has, label).alias("section_label"),
        F.when(has, title).otherwise(col).alias("section_title"),
    )


# ---------------------------------------------------------------------------
# Name normalization — models/name/extract.py:43-96
# ---------------------------------------------------------------------------


def normalize_name_part(text: Column | str) -> Column:
    """Title-case a name part (convert_name_parts_to_title_case,
    name/extract.py:77-82 — Python str.title() ≈ initcap per word).
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.initcap(col)


def is_two_letter_uppercase_given_name(text: Column | str) -> Column:
    """The 'JA' → given 'J' + middle 'A' split precondition
    (name/extract.py:43-74).
    """
    col = F.col(text) if isinstance(text, str) else text
    return (F.length(col) == 2) & (col == F.upper(col)) & col.rlike("^[A-Z]{2}$")
