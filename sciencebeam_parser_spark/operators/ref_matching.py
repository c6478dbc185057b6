"""Citation → target content-id matching (SURVEY §2A A20).

Reference: sciencebeam_parser/processors/ref_matching.py —
``ChainedContentIdMatcher([SimpleContentIdMatcher, PartialContentIdMatcher])``
applied per document (processors/fulltext/processor.py:242-267).

Stages (first hit wins):
  1. exact normalized-key equi-join (get_normalized_key_text, :19-24)
  2. token-prefix key equi-join (get_token_prefix_normalized_key_text,
     :27-33 — tokens containing digits are kept whole, others truncated to
     prefix_length BEFORE normalization)
  3. bag-of-tokens plurality vote (PartialContentIdMatcher, :66-95) with
     tie → no match.

Stages 1-2 are FUSED into one prioritized (priority, key) join with a
min-priority pick — semantically identical to the reference's
run-then-anti-join chaining (both keys are cheap expressions), at one
join + one window instead of two joins + an anti-join. Stage 3 runs only
on the fused remainder.

Key-collision semantics: the reference builds ``{key: content_id}`` dicts, so
when two targets normalize to the same key the LAST one (target order) wins —
reproduced with a row_number pick.

Deliberate deviation (documented): for stage 3 the reference returns the
*first-encountered* content id unless its count ties the second-encountered
(a Counter-insertion-order artifact). We implement the evident intent —
plurality winner, null when the top two counts tie — which matches every
reference test (tests/processors/ref_matching_test.py).

Scale: all three stages are equi-joins on normalized keys (shuffle by key);
stage 3 explodes citation tokens against an inverted token index — the same
inverted-index pattern as the n-gram dedup join. No cross joins.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# utils/tokenizer.py:10-16 — every delimiter is a single char; each becomes
# its own token (split keeps delimiters). \s covers \n\r\t\f.
# Built as an escaped alternation (like the reference DELIMITERS_REGEX) -
# a char class is too easy to get wrong with '-' and backslash in the set.
# \s is appended for ASCII whitespace; NBSP is listed explicitly (Java \s
# does not match it).
_DELIMITERS = "\u00a0 ([ \u2022*,:;?.!/#)-\u2212\u2013\u2010\"\u201c\u201d\u2018\u2019'`$]*\u2666\u2665\u2663\u2660@\u2020\u2021\u00a7\u00b6\u204b\u01c2"
_DELIM_ALTERNATION = "(" + "|".join("\\" + c for c in _DELIMITERS) + "|\\s)"


def normalized_key(col: Column) -> Column:
    """get_normalized_key_text: lowercase, strip [^a-z0-9]."""
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def tokenized_tokens(col: Column) -> Column:
    """iter_tokenized_tokens: split on delimiters (kept as tokens), drop
    whitespace-only tokens. Implemented by fencing every delimiter with \\x00
    and splitting — preserves punctuation tokens like the reference."""
    fenced = F.regexp_replace(col, _DELIM_ALTERNATION, "\x00$1\x00")
    return F.filter(
        F.split(fenced, "\x00"), lambda t: F.trim(t) != ""
    )


def normalized_key_tokens(col: Column) -> Column:
    """get_normalized_key_tokens: normalize each kept token (punctuation
    tokens normalize to '' and ARE kept — they carry votes in stage 3)."""
    return F.transform(tokenized_tokens(col), normalized_key)


def token_prefix_key(col: Column, prefix_length: int = 1) -> Column:
    """get_token_prefix_normalized_key_text: whitespace-split; tokens with a
    digit kept whole, others truncated to prefix_length; then normalized and
    concatenated."""
    return F.array_join(
        F.transform(
            F.split(col, r"\s"),
            lambda t: normalized_key(
                F.when(t.rlike(r"\d"), t).otherwise(F.substring(t, 1, prefix_length))
            ),
        ),
        "",
    )


def match_content_ids(
    citations: DataFrame,
    targets: DataFrame,
    *,
    prefix_length: int = 1,
) -> DataFrame:
    """Resolve each citation to a target content id (or null).

    citations: (doc_id, citation_id, text); targets: (doc_id, content_id,
    text, target_seq). Returns (doc_id, citation_id, target_content_id).
    """
    # Both inputs fan out to every chain stage (key builds, anti-join
    # remainders, the inverted token index, the final left join). The
    # repeated subtrees in the logical plan are deduplicated at runtime by
    # Spark's ReuseExchange/ReuseSubquery — measured FASTER than forcing a
    # .cache() here (an InMemoryRelation is a barrier AQE can't optimize
    # through), so the inputs are deliberately left uncached.
    cit = citations.select("doc_id", "citation_id", "text")
    tgt = targets.select("doc_id", "content_id", "text", "target_seq")

    # ---- stages 1+2 fused: prioritized key join ----
    # The reference runs exact-key then prefix-key sequentially over the
    # remainder; "first chain stage with a hit wins" is equivalently ONE
    # join on a stacked (priority, key) relation with a min-priority pick —
    # both key builds are cheap expressions, and the fusion replaces two
    # equi-joins plus an anti-join (three shuffles of the citation set)
    # with one join plus one window. Within a stage, {key: id} dict
    # semantics still apply (last target wins per key, per priority).
    def stacked_keys(df: DataFrame) -> DataFrame:
        keys = F.array(
            F.struct(
                F.lit(1).alias("_prio"),
                normalized_key(F.col("text")).alias("_key"),
            ),
            F.struct(
                F.lit(2).alias("_prio"),
                token_prefix_key(F.col("text"), prefix_length).alias("_key"),
            ),
        )
        return (
            df.select("*", F.explode(keys).alias("_pk"))
            .select("*", "_pk._prio", "_pk._key")
            .drop("_pk")
            .filter(F.length("_key") > 0)
        )

    w_last = W.partitionBy("doc_id", "_prio", "_key").orderBy(
        F.desc("target_seq")
    )
    t12 = (
        stacked_keys(tgt)
        .withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "_prio", "_key", "content_id")
    )
    w_best = W.partitionBy("doc_id", "citation_id").orderBy("_prio")
    m12 = (
        stacked_keys(cit)
        .join(t12, ["doc_id", "_prio", "_key"], "inner")
        .withColumn("_best", F.row_number().over(w_best))
        .filter(F.col("_best") == 1)
        .select(
            "doc_id",
            "citation_id",
            F.col("content_id").alias("target_content_id"),
        )
        # m12 is consumed twice (the stage-3 anti-join remainder AND the
        # final matched union); without a checkpoint each consumer embeds
        # the whole stacked-key join + window subtree — and the remainder
        # side additionally replays it under stage 3's joins, where a
        # BroadcastExchange build side leaves no exchange node for
        # ReuseExchange to dedup (the q62/q100/q132 pathology). One row
        # per matched citation: checkpoint is control-plane sized.
        .localCheckpoint(eager=False)
    )

    # ---- stage 3: plurality vote over the unmatched remainder ----
    rem2 = cit.join(m12, ["doc_id", "citation_id"], "left_anti")
    # inverted token index over targets: one row per (doc, token, content_id)
    # occurrence — multiplicity matters (defaultdict(list) appends)
    tgt_tokens = tgt.select(
        "doc_id", "content_id", F.explode(normalized_key_tokens(F.col("text"))).alias("tok")
    )
    cit_tokens = rem2.select(
        "doc_id", "citation_id", F.explode(normalized_key_tokens(F.col("text"))).alias("tok")
    )
    votes = (
        cit_tokens.join(tgt_tokens, ["doc_id", "tok"])
        .groupBy("doc_id", "citation_id", "content_id")
        .agg(F.count("*").alias("n_votes"))
    )
    w = W.partitionBy("doc_id", "citation_id").orderBy(
        F.desc("n_votes"), F.asc("content_id")
    )
    # plurality-with-tie→null in ONE window pass: the top-ranked candidate
    # wins iff the runner-up (lead over the same desc-votes order) has
    # strictly fewer votes. Equivalent to "count of candidates at max_v is
    # 1": the rank-1 row holds the max, so a second max-holder is exactly
    # a rank-2 row with equal n_votes. Replaces two derivations of the
    # ranked relation self-joined through a tie-count aggregate (three
    # window functions + a groupBy + a join, with the votes subtree
    # embedded on both join sides).
    m3 = (
        votes.select(
            "*",
            F.row_number().over(w).alias("_rn"),
            F.lead("n_votes").over(w).alias("_next_v"),
        )
        .filter(
            (F.col("_rn") == 1)
            & (F.col("_next_v").isNull() | (F.col("_next_v") < F.col("n_votes")))
        )
        .select("doc_id", "citation_id", F.col("content_id").alias("target_content_id"))
    )

    matched = m12.unionByName(m3)
    return (
        cit.select("doc_id", "citation_id")
        .join(matched, ["doc_id", "citation_id"], "left")
        .select("doc_id", "citation_id", "target_content_id")
    )
