"""Spatial matching (A21), page pruning (A22), and token masking (A26) as
oracle-checked queries.

Box fixtures are synthesized deterministically from the `part` / `orders`
tables (modular arithmetic on keys → exact 2-dp rationals), so both engines
compute identical doubles; distances are a single sqrt over identically-
ordered arithmetic, bit-equal across engines, with id tie-breaks on every
ranking.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.graphic_matching import (
    cv_candidate_pages,
    mask_tokens_by_boxes,
    nearest_candidate_match,
    with_successor_pages,
)
from sciencebeam_parser_spark.queries.registry import register, table


def _graphics(spark, sf_dir):
    """graphics fixture: one box per part with p_partkey % 3 == 0."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") % 3 == 0).select(
        (F.col("p_partkey") % 40).cast("long").alias("doc_id"),
        F.col("p_partkey").cast("int").alias("graphic_id"),
        F.when(F.col("p_partkey") % 10 == 0, "svg").otherwise("bitmap").alias(
            "graphic_type"
        ),
        ((F.col("p_partkey") % 97) / F.lit(100.0)).alias("nx"),
        ((F.col("p_partkey") % 89) / F.lit(100.0)).alias("ny"),
        F.lit(0.10).alias("nw"),
        F.lit(0.10).alias("nh"),
    )


def _candidates(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") % 3 == 1).select(
        (F.col("p_partkey") % 40).cast("long").alias("doc_id"),
        F.concat(F.lit("fig_"), F.col("p_partkey")).alias("content_id"),
        ((F.col("p_partkey") % 83) / F.lit(100.0)).alias("nx"),
        ((F.col("p_partkey") % 79) / F.lit(100.0)).alias("ny"),
        F.lit(0.15).alias("nw"),
        F.lit(0.12).alias("nh"),
    )


_BOX_FIXTURE_SQL = """
    graphics AS (
        SELECT CAST(p_partkey % 40 AS BIGINT) AS doc_id,
               CAST(p_partkey AS INT) AS graphic_id,
               CASE WHEN p_partkey % 10 = 0 THEN 'svg' ELSE 'bitmap' END AS graphic_type,
               (p_partkey % 97) / 100.0 AS nx,
               (p_partkey % 89) / 100.0 AS ny,
               0.10 AS nw, 0.10 AS nh
        FROM part WHERE p_partkey % 3 = 0
    ),
    candidates AS (
        SELECT CAST(p_partkey % 40 AS BIGINT) AS doc_id,
               'fig_' || p_partkey AS content_id,
               (p_partkey % 83) / 100.0 AS nx,
               (p_partkey % 79) / 100.0 AS ny,
               0.15 AS nw, 0.12 AS nh
        FROM part WHERE p_partkey % 3 = 1
    )
"""


@register(
    "q94_spatial_nearest_match",
    oracle="WITH " + _BOX_FIXTURE_SQL + """,
    pairs AS (
        SELECT g.doc_id, g.graphic_id, c.content_id,
               sqrt(
                   pow(greatest(0.0, c.nx - (g.nx + g.nw), g.nx - (c.nx + c.nw)), 2)
                 + pow(greatest(0.0, c.ny - (g.ny + g.nh), g.ny - (c.ny + c.nh)), 2)
               ) AS distance
        FROM graphics g JOIN candidates c ON g.doc_id = c.doc_id
        WHERE g.graphic_type <> 'svg'
    ),
    best_g AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id, graphic_id
            ORDER BY distance ASC, content_id ASC) AS rn
        FROM pairs WHERE distance < 0.3
    ),
    best_c AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id, content_id
            ORDER BY distance ASC, graphic_id ASC) AS rc
        FROM best_g WHERE rn = 1
    )
    SELECT doc_id, graphic_id, content_id, round(distance, 6) AS distance
    FROM best_c WHERE rc = 1
    """,
    survey_ref="§2A A21 graphic↔figure nearest-neighbor join; §2B theta/nearest join",
    doc="Single-round nearest-box assignment: per-doc gap distance "
        "(graphic_matching.py:112-136 semantics), graphic proposes nearest "
        "candidate under 0.3, closest proposer wins per candidate, svg "
        "excluded. The join keys on doc_id — bounded per-partition cross, "
        "never a global cross join.",
)
def q94_spatial_nearest_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nearest_candidate_match(
        _graphics(spark, sf_dir), _candidates(spark, sf_dir)
    )


_PAGE_FIXTURE_SQL = """
    pages AS (
        SELECT CAST(o_orderkey % 20 AS BIGINT) AS doc_id,
               CAST(o_orderkey % 37 AS INT) AS page_number,
               CASE WHEN o_orderkey % 37 IN (0, 5) THEN 500.0 ELSE 612.0 END AS page_width,
               792.0 AS page_height
        FROM orders WHERE o_orderkey % 11 = 0
        GROUP BY 1, 2, 3, 4
    ),
    page_graphics AS (
        SELECT CAST(o_orderkey % 20 AS BIGINT) AS doc_id,
               CAST(o_orderkey % 37 AS INT) AS page_number,
               CASE WHEN o_orderkey % 5 = 0 THEN 'svg' ELSE 'bitmap' END AS graphic_type,
               0.0 AS x, 0.0 AS y,
               CASE WHEN o_orderkey % 7 = 0 THEN 600.0 ELSE 50.0 END AS width,
               CASE WHEN o_orderkey % 7 = 0 THEN 700.0 ELSE 50.0 END AS height
        FROM orders WHERE o_orderkey % 13 = 0
    )
"""


@register(
    "q95_page_pruning",
    oracle="WITH " + _PAGE_FIXTURE_SQL + """,
    dims AS (
        SELECT doc_id, page_width, page_height, count(*) AS n
        FROM pages GROUP BY 1, 2, 3
    ),
    mode AS (
        SELECT doc_id, page_width AS mw, page_height AS mh
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY n DESC, page_width ASC, page_height ASC) AS rn,
                   count(*) OVER (PARTITION BY doc_id) AS n_dims
            FROM dims
        ) WHERE rn = 1 AND n_dims >= 2
    ),
    uncommon AS (
        SELECT p.doc_id, p.page_number
        FROM pages p JOIN mode m ON p.doc_id = m.doc_id
        WHERE p.page_width <> m.mw OR p.page_height <> m.mh
    ),
    bitmap_pages AS (
        SELECT DISTINCT g.doc_id, g.page_number
        FROM page_graphics g
        JOIN pages p ON g.doc_id = p.doc_id AND g.page_number = p.page_number
        WHERE g.graphic_type <> 'svg'
          AND (g.width * g.height) / (p.page_width * p.page_height) > 0.5
    ),
    cands AS (
        SELECT u.doc_id, u.page_number FROM uncommon u
        LEFT JOIN bitmap_pages b
          ON u.doc_id = b.doc_id AND u.page_number = b.page_number
        WHERE b.doc_id IS NULL
    )
    SELECT DISTINCT doc_id, page_number FROM (
        SELECT doc_id, page_number FROM cands
        UNION ALL
        SELECT c.doc_id, c.page_number + 1 AS page_number
        FROM cands c
        WHERE EXISTS (
            SELECT 1 FROM pages p
            WHERE p.doc_id = c.doc_id AND p.page_number = c.page_number + 1
        )
    )
    """,
    survey_ref="§2A A22 page pruning; §2B except/anti-join + union + mode",
    doc="CV candidate pages: uncommon-dimension pages (mode via top-1 count) "
        "minus mostly-bitmap pages (set difference as anti-join), plus "
        "existing successor pages (union + semi-join). Only these partitions "
        "would reach the expensive render/CV stage.",
)
def q95_page_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    pages = (
        o.filter(F.col("o_orderkey") % 11 == 0)
        .select(
            (F.col("o_orderkey") % 20).cast("long").alias("doc_id"),
            (F.col("o_orderkey") % 37).cast("int").alias("page_number"),
            F.when((F.col("o_orderkey") % 37).isin(0, 5), 500.0)
            .otherwise(612.0)
            .alias("page_width"),
            F.lit(792.0).alias("page_height"),
        )
        .distinct()
    )
    graphics = o.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") % 20).cast("long").alias("doc_id"),
        (F.col("o_orderkey") % 37).cast("int").alias("page_number"),
        F.when(F.col("o_orderkey") % 5 == 0, "svg").otherwise("bitmap").alias(
            "graphic_type"
        ),
        F.lit(0.0).alias("x"),
        F.lit(0.0).alias("y"),
        F.when(F.col("o_orderkey") % 7 == 0, 600.0).otherwise(50.0).alias("width"),
        F.when(F.col("o_orderkey") % 7 == 0, 700.0).otherwise(50.0).alias("height"),
    )
    # the derived pages relation (scan + distinct) is consumed four times
    # downstream (mode dims, the mode join, the bitmap-area join, the
    # successor semi-join) — mostly as BroadcastExchange build sides,
    # where exchange reuse cannot fire, so the plan embedded the whole
    # scan+distinct subtree once per branch (9 parquet scans / 16
    # Exchange textual). One lazy localCheckpoint computes it once; the
    # candidate set is likewise consumed twice by the union+successor
    # probe (guide §1.2/§5 — the q132/q97 pattern).
    pages = pages.localCheckpoint(eager=False)
    cands = cv_candidate_pages(pages, graphics).localCheckpoint(eager=False)
    return with_successor_pages(cands, pages)


@register(
    "q96_token_masking",
    oracle="""
    WITH tokens AS (
        SELECT CAST(p_partkey % 40 AS BIGINT) AS doc_id,
               CAST(p_partkey % 7 AS INT) AS page_number,
               CAST(p_partkey AS BIGINT) AS token_seq,
               (p_partkey % 61) / 100.0 AS x,
               (p_partkey % 53) / 100.0 AS y,
               0.02 AS width, 0.01 AS height
        FROM part WHERE p_partkey % 3 = 2
    ),
    boxes AS (
        SELECT CAST(p_partkey % 40 AS BIGINT) AS doc_id,
               CAST(p_partkey % 7 AS INT) AS page_number,
               (p_partkey % 31) / 100.0 AS x,
               (p_partkey % 29) / 100.0 AS y,
               0.30 AS width, 0.30 AS height
        FROM part WHERE p_partkey % 9 = 0
    )
    SELECT t.doc_id, t.page_number, t.token_seq
    FROM tokens t
    WHERE NOT EXISTS (
        SELECT 1 FROM boxes b
        WHERE b.doc_id = t.doc_id AND b.page_number = t.page_number
          AND t.x >= b.x AND t.x + t.width <= b.x + b.width
          AND t.y >= b.y AND t.y + t.height <= b.y + b.height
    )
    """,
    survey_ref="§2A A26 token masking by region; §2B anti-join + range predicates",
    doc="Remove tokens fully inside graphic boxes: containment-predicate "
        "anti-join keyed on (doc, page) — the partition key bounds the "
        "range-predicate fan-out at scale.",
)
def q96_token_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    tokens = p.filter(F.col("p_partkey") % 3 == 2).select(
        (F.col("p_partkey") % 40).cast("long").alias("doc_id"),
        (F.col("p_partkey") % 7).cast("int").alias("page_number"),
        F.col("p_partkey").cast("long").alias("token_seq"),
        ((F.col("p_partkey") % 61) / F.lit(100.0)).alias("x"),
        ((F.col("p_partkey") % 53) / F.lit(100.0)).alias("y"),
        F.lit(0.02).alias("width"),
        F.lit(0.01).alias("height"),
    )
    boxes = p.filter(F.col("p_partkey") % 9 == 0).select(
        (F.col("p_partkey") % 40).cast("long").alias("doc_id"),
        (F.col("p_partkey") % 7).cast("int").alias("page_number"),
        ((F.col("p_partkey") % 31) / F.lit(100.0)).alias("x"),
        ((F.col("p_partkey") % 29) / F.lit(100.0)).alias("y"),
        F.lit(0.30).alias("width"),
        F.lit(0.30).alias("height"),
    )
    return mask_tokens_by_boxes(tokens, boxes).select(
        "doc_id", "page_number", "token_seq"
    )


@register(
    "q132_graphic_match_chain",
    # stage 1 = q94's spatial nearest assignment; stage 2 runs ONLY on the
    # anti-join remainder (svg graphics and out-of-threshold boxes) and
    # matches on the figure-label number extracted by regex from the
    # synthesized block text, first candidate (min content_id) winning.
    oracle="WITH " + _BOX_FIXTURE_SQL + """,
    pairs AS (
        SELECT g.doc_id, g.graphic_id, c.content_id,
               sqrt(
                   pow(greatest(0.0, c.nx - (g.nx + g.nw), g.nx - (c.nx + c.nw)), 2)
                 + pow(greatest(0.0, c.ny - (g.ny + g.nh), g.ny - (c.ny + c.nh)), 2)
               ) AS distance
        FROM graphics g JOIN candidates c ON g.doc_id = c.doc_id
        WHERE g.graphic_type <> 'svg'
    ),
    best_g AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id, graphic_id
            ORDER BY distance ASC, content_id ASC) AS rn
        FROM pairs WHERE distance < 0.3
    ),
    best_c AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id, content_id
            ORDER BY distance ASC, graphic_id ASC) AS rc
        FROM best_g WHERE rn = 1
    ),
    spatial AS (
        SELECT doc_id, graphic_id, content_id FROM best_c WHERE rc = 1
    ),
    unmatched1 AS (
        SELECT g.doc_id, g.graphic_id
        FROM graphics g LEFT JOIN spatial s
          ON g.doc_id = s.doc_id AND g.graphic_id = s.graphic_id
        WHERE s.content_id IS NULL
    ),
    rem AS (
        SELECT doc_id, graphic_id,
               'Figure ' || CAST(graphic_id % 50 AS VARCHAR) AS block_text
        FROM unmatched1
        WHERE graphic_id % 4 = 0
    ),
    label_pairs AS (
        SELECT r.doc_id, r.graphic_id, c.content_id,
               row_number() OVER (
                   PARTITION BY r.doc_id, r.graphic_id
                   ORDER BY c.content_id) AS rn
        FROM rem r JOIN (
            SELECT doc_id, content_id,
                   'Figure ' || CAST(CAST(substr(content_id, 5) AS INT) % 50
                                     AS VARCHAR) AS fig_label
            FROM candidates
        ) c ON r.doc_id = c.doc_id
           AND CAST(regexp_extract(r.block_text, 'Figure ([0-9]+)', 1)
                    AS INT)
             = CAST(regexp_extract(c.fig_label, 'Figure ([0-9]+)', 1)
                    AS INT)
    ),
    label_matched AS (
        SELECT doc_id, graphic_id, content_id
        FROM label_pairs WHERE rn = 1
    ),
    rem3 AS (
        -- svg graphics yield no OCR text (the reference returns '' for
        -- svg, graphic_matching.py:578-581) and stay unmatched
        SELECT u.doc_id, u.graphic_id,
               'FIG ' || CAST(u.graphic_id + 40 AS VARCHAR) AS ocr_text
        FROM unmatched1 u LEFT JOIN label_matched lm
          ON u.doc_id = lm.doc_id AND u.graphic_id = lm.graphic_id
        WHERE lm.content_id IS NULL AND u.graphic_id % 10 <> 0
    ),
    ocr_pairs AS (
        SELECT r.doc_id, r.graphic_id, c.content_id,
               row_number() OVER (
                   PARTITION BY r.doc_id, r.graphic_id
                   ORDER BY c.content_id) AS rn
        FROM rem3 r JOIN candidates c
          ON r.doc_id = c.doc_id
         AND regexp_replace(lower(c.content_id), '[^a-z0-9]', '', 'g')
           = regexp_replace(lower(r.ocr_text), '[^a-z0-9]', '', 'g')
    )
    SELECT doc_id, graphic_id, content_id, 'spatial' AS match_stage
    FROM spatial
    UNION ALL
    SELECT doc_id, graphic_id, content_id, 'label' FROM label_matched
    UNION ALL
    SELECT doc_id, graphic_id, content_id, 'ocr'
    FROM ocr_pairs WHERE rn = 1
    """,
    survey_ref="§2A A21 matcher chain (graphic_matching.py:54-94 chained "
               "over unmatched remainder; label regex matcher ~:250-400); "
               "§2B left-anti join",
    doc="Two-stage matcher chain: spatial nearest assignment, then a "
        "figure-label regex match over the anti-join remainder — each "
        "round one equi-anti-join on (doc_id, graphic_id).",
)
def q132_graphic_match_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.graphic_matching import (
        chain_graphic_matchers,
    )

    graphics = _graphics(spark, sf_dir)
    candidates = _candidates(spark, sf_dir)

    def spatial(remaining):
        return nearest_candidate_match(remaining, candidates).select(
            "doc_id", "graphic_id", "content_id"
        )

    labeled_cands = candidates.select(
        "doc_id",
        "content_id",
        F.concat(
            F.lit("Figure "),
            (F.substring("content_id", 5, 1000).cast("int") % 50).cast(
                "string"
            ),
        ).alias("fig_label"),
    ).withColumn(
        "fig_num",
        F.regexp_extract("fig_label", r"Figure ([0-9]+)", 1).cast("int"),
    )

    def label_match(remaining):
        # related_block is Optional in the reference (graphic_matching.py:
        # 556-563 returns '' without one): the fixture gives every 4th
        # graphic a related text block; the rest fall through to OCR
        rem = remaining.filter(F.col("graphic_id") % 4 == 0).select(
            "doc_id",
            "graphic_id",
            F.concat(
                F.lit("Figure "), (F.col("graphic_id") % 50).cast("string")
            ).alias("block_text"),
        ).withColumn(
            "blk_num",
            F.regexp_extract("block_text", r"Figure ([0-9]+)", 1).cast("int"),
        )
        pairs = rem.join(
            labeled_cands,
            (rem["doc_id"] == labeled_cands["doc_id"])
            & (rem["blk_num"] == labeled_cands["fig_num"]),
        ).select(
            rem["doc_id"], "graphic_id", "content_id"
        )
        w = W.partitionBy("doc_id", "graphic_id").orderBy("content_id")
        return (
            pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def ocr_match(remaining):
        # A25 completes the A21 chain (graphic_matching.py:568-593
        # OpticalCharacterRecognitionGraphicMatcher): OCR the remaining
        # NON-SVG graphics' images through the REAL ocr_images plumbing
        # (executor-singleton handle, mapInPandas) with a deterministic
        # fake kernel (bytes→text; tesseract absent in this sandbox),
        # then match per OCR LINE with exact-then-prefix normalized keys
        # (AbstractGraphicTextGraphicMatcher + SimpleContentIdMatcher,
        # prefix_length=3 — match_graphics_by_text).
        from sciencebeam_parser_spark.operators.graphic_matching import (
            match_graphics_by_text,
        )
        from sciencebeam_parser_spark.sources.pdf import ocr_images

        # synthesized graphic "image": bytes embedding the label text the
        # fake OCR reads back (doc-consistent: candidate partkeys are
        # graphic_id + 40 — same doc mod 40, candidate residue mod 3);
        # svg graphics are skipped (the reference OCRs only bitmaps)
        imgs = remaining.filter(F.col("graphic_type") != "svg").select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("graphic_id").cast("int").alias("page_number"),
            F.encode(
                F.concat(
                    F.lit("FIG "), (F.col("graphic_id") + 40).cast("string")
                ),
                "utf-8",
            ).alias("image"),
        )
        texts = ocr_images(
            imgs, ocr_fn=lambda b: bytes(b).decode("utf-8")
        ).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("page_number").cast("int").alias("graphic_id"),
            "ocr_text",
        )
        labels = candidates.select(
            "doc_id", "content_id", F.col("content_id").alias("label_text")
        )
        return match_graphics_by_text(texts, labels)

    return chain_graphic_matchers(
        graphics,
        [("spatial", spatial), ("label", label_match), ("ocr", ocr_match)],
    )


@register(
    "q133_cv_box_dedup",
    # CV boxes and existing graphics synthesized from part keys on a
    # 4-page grid; a CV box is dropped iff some existing graphic on the
    # same (doc, page) overlaps with intersection/larger-area >= 0.80 —
    # exact rational arithmetic (2-dp grid) so both engines agree.
    oracle="""
    WITH cv AS (
        SELECT CAST(p_partkey % 25 AS BIGINT) AS doc_id,
               CAST(p_partkey % 4 AS INT) AS page_number,
               (p_partkey % 50) / 100.0 AS x,
               (p_partkey % 40) / 100.0 AS y,
               0.20 AS width, 0.20 AS height
        FROM part WHERE p_partkey % 2 = 0
    ),
    ex AS (
        SELECT CAST(p_partkey % 25 AS BIGINT) AS doc_id,
               CAST(p_partkey % 4 AS INT) AS page_number,
               (p_partkey % 48) / 100.0 AS x,
               (p_partkey % 44) / 100.0 AS y,
               0.20 AS width, 0.20 AS height
        FROM part WHERE p_partkey % 2 = 1
    ),
    dup_keys AS (
        SELECT DISTINCT c.doc_id, c.page_number, c.x, c.y, c.width, c.height
        FROM cv c JOIN ex e
          ON c.doc_id = e.doc_id AND c.page_number = e.page_number
        WHERE CASE WHEN greatest(c.width * c.height, e.width * e.height) = 0.0
                   THEN 0.0
                   ELSE greatest(0.0, least(c.x + c.width, e.x + e.width)
                                      - greatest(c.x, e.x))
                      * greatest(0.0, least(c.y + c.height, e.y + e.height)
                                      - greatest(c.y, e.y))
                      / greatest(c.width * c.height, e.width * e.height)
              END >= 0.80
    )
    SELECT c.doc_id, c.page_number, c.x, c.y
    FROM cv c LEFT JOIN dup_keys d
      ON c.doc_id = d.doc_id AND c.page_number = d.page_number
         AND c.x = d.x AND c.y = d.y AND c.width = d.width
         AND c.height = d.height
    WHERE d.doc_id IS NULL
    """,
    survey_ref="§2A A24 CV box IoU dedup (processors/cv_graphic_provider"
               ".py:38-66, threshold 0.80); §2B theta + left-anti join",
    doc="CV-box dedup against existing graphics: per-(doc,page) overlap "
        "join with intersection/larger-area ratio, anti-join survivors — "
        "the page key bounds the join, per-page box counts stay tiny at "
        "any corpus size.",
)
def q133_cv_box_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.graphic_matching import (
        dedup_cv_boxes,
    )

    p = table(spark, sf_dir, "part")
    cv = p.filter(F.col("p_partkey") % 2 == 0).select(
        (F.col("p_partkey") % 25).cast("long").alias("doc_id"),
        (F.col("p_partkey") % 4).cast("int").alias("page_number"),
        ((F.col("p_partkey") % 50) / F.lit(100.0)).alias("x"),
        ((F.col("p_partkey") % 40) / F.lit(100.0)).alias("y"),
        F.lit(0.20).alias("width"),
        F.lit(0.20).alias("height"),
    )
    ex = p.filter(F.col("p_partkey") % 2 == 1).select(
        (F.col("p_partkey") % 25).cast("long").alias("doc_id"),
        (F.col("p_partkey") % 4).cast("int").alias("page_number"),
        ((F.col("p_partkey") % 48) / F.lit(100.0)).alias("x"),
        ((F.col("p_partkey") % 44) / F.lit(100.0)).alias("y"),
        F.lit(0.20).alias("width"),
        F.lit(0.20).alias("height"),
    )
    return dedup_cv_boxes(cv, ex, threshold=0.80).select(
        "doc_id", "page_number", "x", "y"
    )


@register(
    "q161_cv_provider_chain",
    # image bytes = 'img:<doc>:<page>'; the fake detector derives one
    # figure + one table box per page from the image md5 (k/512 fractions
    # are exact binary, so cross-engine equality is safe); existing
    # graphics duplicate the figure box on even pages, so dedup drops
    # exactly those (ratio 1.0; the only other same-page pair peaks at
    # ratio 0.75 by construction - no 0.80 knife-edge).
    oracle="""
    WITH pages AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, p.page_number,
               md5('img:' || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(p.page_number AS VARCHAR)) AS h
        FROM documents, (SELECT unnest([1, 2]) AS page_number) p
    ),
    boxes AS (
        SELECT doc_id, page_number, 0 AS box_index, 'figure' AS box_type,
               CAST('0x' || substr(h, 1, 2) AS INT) / 512 AS x,
               CAST('0x' || substr(h, 3, 2) AS INT) / 512 AS y,
               0.25 AS width, 0.20 AS height,
               round(0.5 + CAST('0x' || substr(h, 5, 1) AS INT) / 32, 6)
                   AS score
        FROM pages
        UNION ALL
        SELECT doc_id, page_number, 1, 'table',
               CAST('0x' || substr(h, 7, 2) AS INT) / 512,
               CAST('0x' || substr(h, 9, 2) AS INT) / 512,
               0.30, 0.15,
               round(0.5 + CAST('0x' || substr(h, 11, 1) AS INT) / 32, 6)
        FROM pages
    )
    SELECT doc_id, CAST(page_number AS INT) AS page_number,
           box_index, box_type,
           round(x, 6) AS x, round(y, 6) AS y, score
    FROM boxes
    WHERE NOT (box_type = 'figure' AND page_number % 2 = 0)
    """,
    survey_ref="§2A A24 CV layout detection end-to-end (cv_models/"
               "layout_parser_cv_model.py predictor singleton; provider "
               "chain processors/cv_graphic_provider.py:~70-200) + A23 "
               "render + IoU dedup",
    doc="The CV graphic-provider chain: page rendering through the real "
        "render_pages sidecar plumbing (fake kernel), layout detection "
        "through the executor-singleton detect_layout_boxes model stage "
        "(deterministic md5-derived fake detector), and IoU dedup against "
        "existing graphics - detection plumbing, batch shape, and dedup "
        "all under one oracle.",
)
def q161_cv_provider_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sciencebeam_parser_spark.operators.graphic_matching import (
        dedup_cv_boxes,
    )
    from sciencebeam_parser_spark.operators.multimodal import (
        detect_layout_boxes,
    )
    from sciencebeam_parser_spark.sources.pdf import render_pages

    docs = table(spark, sf_dir, "documents")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.array(F.lit(1), F.lit(2))).alias("page_number"),
        F.encode(F.concat(F.lit("pdf:"), F.col("doc_id").cast("string")),
                 "utf-8").alias("content"),
    )

    def fake_render(content: bytes, page_number: int, dpi: int) -> bytes:
        doc = bytes(content).decode("utf-8")[4:]
        return f"img:{doc}:{page_number}".encode("utf-8")

    images = render_pages(pages, render_fn=fake_render)
    cv = detect_layout_boxes(images, use_fake_detector=True)

    # existing graphics: the figure box duplicated on even pages (same
    # md5 derivation, JVM-side)
    h = F.md5(
        F.concat(
            F.lit("img:"), F.col("doc_id").cast("string"), F.lit(":"),
            F.col("page_number").cast("string"),
        )
    )
    ex = pages.select("doc_id", "page_number").filter(
        F.col("page_number") % 2 == 0
    ).select(
        "doc_id",
        "page_number",
        (F.conv(F.substring(h, 1, 2), 16, 10).cast("long") / 512).alias("x"),
        (F.conv(F.substring(h, 3, 2), 16, 10).cast("long") / 512).alias("y"),
        F.lit(0.25).alias("width"),
        F.lit(0.20).alias("height"),
    )
    kept = dedup_cv_boxes(cv, ex, threshold=0.80)
    return kept.select(
        "doc_id",
        "page_number",
        "box_index",
        "box_type",
        F.round("x", 6).alias("x"),
        F.round("y", 6).alias("y"),
        "score",
    )
