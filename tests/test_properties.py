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


# ---------------------------------------------------------------------------
# Pure-Python model of the chained citation matcher (processors/
# ref_matching.py:44-105): exact-key dict, prefix-key dict, plurality vote
# (with the documented evident-intent tie rule: tie at the top -> None).
# ---------------------------------------------------------------------------

import re
from collections import Counter

from sciencebeam_parser_spark.operators.ref_matching import (
    _DELIMITERS,
    match_content_ids,
)

_DELIM_RE = re.compile("(" + "|".join(re.escape(c) for c in _DELIMITERS) + r"|\s)")


def _norm(s: str) -> str:
    return re.sub("[^a-z0-9]", "", s.lower())


def _tok(s: str) -> list[str]:
    fenced = _DELIM_RE.sub("\x00\\1\x00", s)
    return [t for t in fenced.split("\x00") if t.strip() != ""]


def _prefix_key(s: str, n: int = 1) -> str:
    parts = re.split(r"\s", s)
    return "".join(
        _norm(t if re.search(r"\d", t) else t[:n]) for t in parts
    )


def reference_match(citations, targets):
    """citations: [(cid, text)]; targets: [(content_id, text, seq)] →
    {cid: content_id | None} per the chained matcher model."""
    d1, d2 = {}, {}
    for content_id, text, _seq in sorted(targets, key=lambda t: t[2]):
        k1, k2 = _norm(text), _prefix_key(text)
        if k1:
            d1[k1] = content_id  # last target wins
        if k2:
            d2[k2] = content_id
    index: dict[str, list[str]] = {}
    for content_id, text, _seq in targets:
        for t in _tok(text):
            index.setdefault(_norm(t), []).append(content_id)
    out = {}
    for cid, text in citations:
        k1, k2 = _norm(text), _prefix_key(text)
        if k1 and k1 in d1:
            out[cid] = d1[k1]
            continue
        if k2 and k2 in d2:
            out[cid] = d2[k2]
            continue
        votes = Counter()
        for t in _tok(text):
            for content_id in index.get(_norm(t), []):
                votes[content_id] += 1
        if not votes:
            out[cid] = None
            continue
        top = votes.most_common()
        if len(top) > 1 and top[0][1] == top[1][1]:
            out[cid] = None  # ambiguous -> no match (documented intent)
        else:
            out[cid] = top[0][0]
    return out


_WORDS = ["Smith", "smith", "2020", "Fig", "7b", "a", "B", "et", "al"]
_PUNCT = [".", ",", ""]
_TEXT = st.lists(
    st.tuples(st.sampled_from(_WORDS), st.sampled_from(_PUNCT)),
    min_size=1,
    max_size=4,
).map(lambda ps: " ".join(w + p for w, p in ps))


class TestCitationMatcherProperty:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(_TEXT, min_size=1, max_size=3),
        st.lists(_TEXT, min_size=1, max_size=3),
    )
    def test_matches_chained_matcher_model(self, spark, cit_texts, tgt_texts):
        citations = [(f"c{i}", t) for i, t in enumerate(cit_texts)]
        targets = [(f"b{i}", t, i) for i, t in enumerate(tgt_texts)]
        cdf = spark.createDataFrame(
            [("d", cid, t) for cid, t in citations],
            "doc_id string, citation_id string, text string",
        )
        tdf = spark.createDataFrame(
            [("d", cid, t, s) for cid, t, s in targets],
            "doc_id string, content_id string, text string, target_seq long",
        )
        got = {
            r["citation_id"]: r["target_content_id"]
            for r in match_content_ids(cdf, tdf).collect()
        }
        assert got == reference_match(citations, targets)


# ---------------------------------------------------------------------------
# Sequence packing invariants (q126/q152 packing stage): offsets tile the
# per-source token stream exactly, regardless of document sizes.
# ---------------------------------------------------------------------------


class TestSequencePackingProperty:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["s1", "s2"]),
                st.integers(min_value=1, max_value=40),
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_packing_tiles_the_stream(self, spark, docs):
        from sciencebeam_parser_spark.queries.corpus_ops import (
            q126_sequence_packing,
        )
        import sciencebeam_parser_spark.queries.corpus_ops as mod

        rows = [
            (i, " ".join(["w"] * n), "en", src, n)
            for i, (src, n) in enumerate(docs)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: df  # noqa: ARG005
            out = sorted(
                q126_sequence_packing(spark, "u").collect(),
                key=lambda r: (r.source, r.doc_id),
            )
        finally:
            mod.table = orig
        by_source: dict = {}
        for r in out:
            assert 0 <= r.pack_offset < 512
            assert r.token_start == r.pack_id * 512 + r.pack_offset
            by_source.setdefault(r.source, []).append(r)
        for src, rs in by_source.items():
            # exclusive running sum: each doc starts where the previous ended
            expected_start = 0
            for r in rs:  # already ordered by doc_id within source
                assert r.token_start == expected_start
                expected_start += r.n_tokens


class TestRagChunkingProperty:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.integers(min_value=1, max_value=150), min_size=1, max_size=6
        )
    )
    def test_chunks_match_reference_model(self, spark, doc_sizes):
        """q188's relational chunking must equal the direct sliding-window
        model: chunk k covers tokens (k*48, k*48+64], chunks exist while
        k*48 < n."""
        import sciencebeam_parser_spark.queries.docpipe as docpipe_mod
        from sciencebeam_parser_spark.queries.corpus_ops import (
            q188_rag_chunking,
        )

        rows = [
            (i, " ".join(f"t{p}" for p in range(1, n + 1)), "en", "s", n)
            for i, n in enumerate(doc_sizes)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        orig = docpipe_mod.table
        try:
            docpipe_mod.table = lambda s, d, n: df  # noqa: ARG005
            got = {
                (r.doc_id, r.chunk_id): (
                    r.n_tokens, r.token_start, r.token_end, r.text
                )
                for r in q188_rag_chunking(spark, "u").collect()
            }
        finally:
            docpipe_mod.table = orig

        want = {}
        for i, n in enumerate(doc_sizes):
            k = 0
            while k * 48 < n:
                lo, hi = k * 48 + 1, min(k * 48 + 64, n)
                want[(i, k)] = (
                    hi - lo + 1, lo, hi,
                    " ".join(f"t{p}" for p in range(lo, hi + 1)),
                )
                k += 1
        assert got == want


class TestSnapshotUpsertProperty:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=60),
                st.floats(
                    min_value=0, max_value=1000,
                    allow_nan=False, allow_infinity=False,
                ),
            ),
            min_size=1,
            max_size=15,
            unique_by=lambda t: t[0],
        )
    )
    def test_merge_matches_reference_model(self, spark, custs):
        import sciencebeam_parser_spark.queries.graph_ops as graph_mod
        from sciencebeam_parser_spark.queries.graph_ops import (
            q178_snapshot_upsert,
        )

        rows = [
            (k, f"c{k}", 0, round(bal, 2), "SEG") for k, bal in custs
        ]
        df = spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        )
        orig = graph_mod.table
        try:
            graph_mod.table = lambda s, d, n: df  # noqa: ARG005
            got = {
                r.c_custkey: (r.c_acctbal, r.c_mktsegment, r.row_source)
                for r in q178_snapshot_upsert(spark, "u").collect()
            }
        finally:
            graph_mod.table = orig

        want = {}
        for k, bal in custs:
            bal = round(bal, 2)
            if k % 10 != 7:
                want[k] = (round(bal, 2), "SEG", "base")
            if k % 5 == 0:  # update wins, inserts missing keys
                want[k] = (round(bal + 100, 2), "UPDATED", "update")
        assert got == want


class TestPrefixFilterCompleteness:
    """q211's prefix filter must be LOSSLESS: every pair at the Jaccard
    threshold appears, for arbitrary corpora — the property that
    distinguishes it from LSH candidates."""

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.lists(
                st.sampled_from("abcdefgh"), min_size=3, max_size=8
            ),
            min_size=2,
            max_size=6,
        )
    )
    def test_matches_bruteforce(self, spark, word_lists):
        import itertools

        from sciencebeam_parser_spark.queries.retrieval_ops import (
            q211_setsim_prefix_join,
        )
        import sciencebeam_parser_spark.queries.retrieval_ops as mod

        texts = {i: " ".join(ws) for i, ws in enumerate(word_lists)}
        docs = spark.createDataFrame(
            [(k, v, "en", "s", len(v)) for k, v in texts.items()],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: docs  # noqa: ARG005
            got = {
                (r.id_a, r.id_b)
                for r in q211_setsim_prefix_join(spark, "unused").collect()
            }
        finally:
            mod.table = orig

        def shingles(t):
            ws = t.split()
            return {
                " ".join(ws[i:i + 3]) for i in range(len(ws) - 2)
            }

        want = set()
        for a, b in itertools.combinations(sorted(texts), 2):
            sa, sb = shingles(texts[a]), shingles(texts[b])
            if not sa or not sb:
                continue
            inter, union = len(sa & sb), len(sa | sb)
            if inter * 5 >= 3 * union:
                want.add((a, b))
        assert got == want


class TestCountMinProperty:
    """CMS estimates can only overestimate, and are exact when no bucket
    collides — both hold for arbitrary word multisets."""

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=1,
            max_size=30,
        )
    )
    def test_overestimate_only(self, spark, words):
        from sciencebeam_parser_spark.queries.retrieval_ops import (
            q209_count_min_heavy_hitters,
        )
        import sciencebeam_parser_spark.queries.retrieval_ops as mod
        from collections import Counter

        docs = spark.createDataFrame(
            [(0, " ".join(words), "en", "s", 1)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: docs  # noqa: ARG005
            rows = q209_count_min_heavy_hitters(spark, "unused").collect()
        finally:
            mod.table = orig
        exact = Counter(words)
        for r in rows:
            assert r.exact == exact[r.word]
            assert r.estimate >= r.exact
            assert r.overestimate == r.estimate - r.exact


class TestScd2Property:
    """SCD2 intervals tile each customer's timeline: version numbers are
    dense from 1, intervals chain exactly, one current row per key."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
            min_size=1,
            max_size=8,
        )
    )
    def test_intervals_tile(self, spark, priorities):
        from sciencebeam_parser_spark.queries.warehouse_ops import (
            q200_scd2_history,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod
        from datetime import datetime, timedelta

        base = datetime(2024, 1, 1)
        orders = spark.createDataFrame(
            [
                (i, 1, "O", 1.0, base + timedelta(days=i), p)
                for i, p in enumerate(priorities)
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: orders  # noqa: ARG005
            rows = sorted(
                q200_scd2_history(spark, "unused").collect(),
                key=lambda r: r.version,
            )
        finally:
            mod.table = orig
        # change count: first + each adjacent differing pair
        n_changes = 1 + sum(
            1 for a, b in zip(priorities, priorities[1:]) if a != b
        )
        assert [r.version for r in rows] == list(range(1, n_changes + 1))
        for a, b in zip(rows, rows[1:]):
            assert a.effective_to == b.effective_from
            assert not a.is_current
        assert rows[-1].is_current and rows[-1].effective_to is None


# ---------------------------------------------------------------------------
# Round-5c properties: CUSUM window identity, compaction conservation,
# CDC-apply fold equivalence
# ---------------------------------------------------------------------------


class TestCusumProperty:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.integers(min_value=0, max_value=50),
            min_size=8,
            max_size=20,
        )
    )
    def test_window_identity_matches_recursion(self, spark, daily_counts):
        """S_t - min(0, running min S) == the max(0, C + dev) recursion
        for ANY daily series (q263's zero-floored window identity)."""
        from datetime import datetime, timedelta

        from sciencebeam_parser_spark.queries.events_ops import (
            q263_cusum_drift,
        )
        import sciencebeam_parser_spark.queries.events_ops as mod

        base = datetime(2024, 1, 1)
        rows = []
        eid = 0
        for day, n in enumerate(daily_counts):
            for _ in range(max(n, 1)):  # >=1 event so the day exists
                rows.append(
                    (eid, base + timedelta(days=day), 1, "click", 1.0, "{}")
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: df  # noqa: ARG005
            out = sorted(
                q263_cusum_drift(spark, "u").collect(),
                key=lambda r: r["day"],
            )
        finally:
            mod.table = orig
        ns = [max(n, 1) for n in daily_counts]
        b7 = sum(ns[:7])
        c = 0
        expected = []
        for n in ns[7:]:
            c = max(0, c + (n * 7 - b7))
            expected.append(c)
        assert [r["cusum_scaled"] for r in out] == expected


class TestCompactionProperty:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", "d"]),
                st.sampled_from(["en", "de"]),
                st.integers(min_value=1, max_value=20000),
            ),
            min_size=1,
            max_size=10,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    def test_next_fit_packing_conserves_and_orders(self, spark, shards):
        from sciencebeam_parser_spark.queries.warehouse_ops import (
            _COMPACT_TARGET,
            q257_compaction_plan,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod

        rows = [
            (i, "x", lang, src, size)
            for i, (src, lang, size) in enumerate(shards)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: df  # noqa: ARG005
            out = q257_compaction_plan(spark, "u").collect()
        finally:
            mod.table = orig
        # python model: next-fit by key order
        inv = sorted(shards)
        cum = 0
        bins: dict = {}
        for src, lang, size in inv:
            b = cum // _COMPACT_TARGET
            bins.setdefault(b, []).append((f"{src}/{lang}", size))
            cum += size
        assert {r["bin_id"] for r in out} == set(bins)
        for r in out:
            members = bins[r["bin_id"]]
            assert r["n_shards"] == len(members)
            assert r["total_bytes"] == sum(s for _, s in members)
            keys = sorted(k for k, _ in members)
            assert r["first_shard"] == keys[0]
            assert r["last_shard"] == keys[-1]


class TestCdcApplyProperty:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=5),   # key
                st.integers(min_value=1, max_value=99),  # seq (orderkey)
            ),
            min_size=1,
            max_size=14,
            unique_by=lambda t: t[1],
        )
    )
    def test_final_state_is_python_fold(self, spark, feed):
        from datetime import datetime, timedelta

        from sciencebeam_parser_spark.queries.warehouse_ops import (
            q261_cdc_apply,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod

        base = datetime(2024, 1, 1)
        rows = [
            (
                seq,
                k,
                "F",
                100.0,
                base + timedelta(days=seq),
                f"P{seq % 3}",
            )
            for k, seq in feed
        ]
        df = spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: df  # noqa: ARG005
            out = q261_cdc_apply(spark, "u").collect()
        finally:
            mod.table = orig
        # python fold: last op per key by (date, seq); date == seq here
        last: dict = {}
        for k, seq in feed:
            if k not in last or seq > last[k]:
                last[k] = seq
        live: dict = {}
        deleted = []
        for k, seq in last.items():
            if seq % 7 == 0:
                deleted.append(k)
            else:
                live.setdefault(f"P{seq % 3}", []).append(k)
        got_live = {
            r["priority"]: (r["n_keys"], r["key_checksum"])
            for r in out
            if r["state"] == "live"
        }
        assert got_live == {
            p: (len(ks), sum(ks)) for p, ks in live.items()
        }
        got_del = [r for r in out if r["state"] == "deleted"]
        assert len(got_del) == 1
        assert got_del[0]["n_keys"] == len(deleted)
        assert got_del[0]["key_checksum"] == (
            sum(deleted) if deleted else None
        )
