"""Entity-tree rewrite: replace raw entities with parsed results (SURVEY §2A
A27).

Reference: `flat_map_inplace_by_type` (document/semantic_document.py:167-187)
as used by the fulltext processor to swap `SemanticRawReference` children for
parsed `SemanticReference`s keyed by content id
(processors/fulltext/processor.py:586-622), raw authors/editors for parsed
name lists (:653-717, :747-787) and raw affiliations for parsed affiliation
structures (:452-527). Raw entities with no parsed counterpart are kept
as-is (the `fn(content) if … else [content]` identity branch).

Spark mapping: the semantic tree is an adjacency-list relation, so the
rewrite is pure relational algebra — an anti-join to drop the replaced rows,
a union to splice in the replacements at the anchor position, and one window
to re-number the document order. No UDF, no driver loop; the only shuffle is
the window partitioned by doc_id (bounded per document).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def replace_entities(
    entities: DataFrame,
    parsed: DataFrame,
    *,
    target_types: Sequence[str],
    type_col: str = "entity_type",
    anchor_col: str = "entity_group",
    sub_order_col: str = "part_seq",
    out_seq_col: str = "entity_seq",
) -> DataFrame:
    """Replace entities of `target_types` that have parsed rows.

    entities: one row per entity, ordered within doc by `anchor_col`.
    parsed:   replacement rows carrying (doc_id, `anchor_col`) of the entity
              they replace plus `sub_order_col` for their internal order;
              all other columns must be union-compatible with `entities`
              (missing columns are allowed on either side — filled with null
              via allowMissingColumns).

    Returns entities ∖ replaced ∪ parsed, re-sequenced in document order as
    `out_seq_col` (replacements occupy their anchor's position). Entities of
    a target type with no parsed rows are kept (reference identity branch).
    """
    anchors = parsed.select("doc_id", anchor_col).distinct()
    replaced = (
        entities.filter(F.col(type_col).isin(*target_types))
        .join(anchors, ["doc_id", anchor_col], "left_semi")
    )
    kept = entities.join(
        replaced.select("doc_id", anchor_col), ["doc_id", anchor_col], "left_anti"
    ).withColumn(sub_order_col, F.lit(0))
    spliced = kept.unionByName(parsed, allowMissingColumns=True)
    w = W.partitionBy("doc_id").orderBy(anchor_col, sub_order_col)
    return spliced.withColumn(out_seq_col, F.row_number().over(w))


__all__ = ["replace_entities"]
