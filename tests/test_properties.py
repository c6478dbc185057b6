"""Property-based tests (hypothesis): the Spark window/agg implementations
must agree with direct pure-Python models of the REFERENCE algorithms on
arbitrary inputs — a stronger net than example tests or the DuckDB oracle
(which only proves SQL-to-SQL equivalence).

The reference test suite has no property tests (SURVEY §5); these extend
its strategy. One Spark job per hypothesis example is expensive, so each
example packs many generated sequences into a single multi-doc DataFrame
and examples are capped small.
"""
from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sciencebeam_parser_spark.operators.bio import group_bio_entities

# ---------------------------------------------------------------------------
# Pure-Python model of iter_entities_including_other (models/model.py:61-79):
# new entity on B- prefix or stripped-tag change; O runs kept.
# ---------------------------------------------------------------------------


def _strip(label: str) -> str:
    return label[2:] if label.startswith(("B-", "I-")) else label


def reference_bio_groups(labels: list[str]) -> list[tuple[str, int, int]]:
    """[(tag, start_seq, end_seq)] with token_seq starting at 0."""
    out: list[tuple[str, int, int]] = []
    prev_tag = None
    for i, label in enumerate(labels):
        tag = _strip(label)
        if label.startswith("B-") or prev_tag is None or tag != prev_tag:
            out.append((tag, i, i))
        else:
            out[-1] = (out[-1][0], out[-1][1], i)
        prev_tag = tag
    return out


_LABELS = st.lists(
    st.sampled_from(
        ["B-<title>", "I-<title>", "B-<author>", "I-<author>", "O", "I-<ref>"]
    ),
    min_size=1,
    max_size=12,
)


class TestBioGroupingProperty:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(_LABELS, min_size=1, max_size=6))
    def test_matches_reference_algorithm(self, spark, docs):
        rows = [
            (f"d{di}", i, label, f"t{i}")
            for di, labels in enumerate(docs)
            for i, label in enumerate(labels)
        ]
        df = spark.createDataFrame(
            rows, "doc_id string, token_seq long, label string, text string"
        )
        got = {
            (r["doc_id"], r["token_start"]): (
                r["tag"],
                r["token_start"],
                r["token_end"],
                r["n_tokens"],
            )
            for r in group_bio_entities(df, text_col="text").collect()
        }
        expected = {}
        for di, labels in enumerate(docs):
            for tag, start, end in reference_bio_groups(labels):
                expected[(f"d{di}", start)] = (tag, start, end, end - start + 1)
        assert got == expected

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_LABELS)
    def test_islands_partition_the_sequence(self, spark, labels):
        """Entity runs must tile the token sequence exactly: disjoint,
        contiguous, covering — regardless of label pattern."""
        df = spark.createDataFrame(
            [("d", i, label) for i, label in enumerate(labels)],
            "doc_id string, token_seq long, label string",
        )
        runs = sorted(
            (r["token_start"], r["token_end"])
            for r in group_bio_entities(df).collect()
        )
        assert runs[0][0] == 0
        assert runs[-1][1] == len(labels) - 1
        for (s1, e1), (s2, e2) in zip(runs, runs[1:]):
            assert s2 == e1 + 1, f"gap or overlap between runs at {e1}->{s2}"
