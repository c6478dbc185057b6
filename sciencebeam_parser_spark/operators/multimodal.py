"""Multimodal columns (north-star): image/audio/video as opaque ``binary``
columns with typed metadata, plus decode / feature-extract / resize /
frame-sample stages as Arrow-batched ``mapInPandas`` stages.

Reference analogs: LayoutGraphic binary content + page images
(processors/document_page_image.py renders PDF pages; cv_models /
ocr_models consume them). The image/audio codec libraries are NOT in this
container, so the decode kernels are stubbed (deterministic fake or
NotImplementedError) — the Spark-side plumbing (schemas, batch iteration,
partitioning, column pruning through the UDF) is real and tested; swapping
in PIL/ffmpeg later only changes the kernel body.

Scale: media bytes stay in one ``binary`` column; metadata predicates
(media_type/size filters) prune BEFORE the expensive decode stage, the A22
partition-pruning pattern. Arrow moves the bytes executor-side in batches;
nothing ever collects to the driver.
"""
from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

# magic-byte prefixes → media type (hex)
_MAGIC_PREFIXES = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "25504446": "application/pdf",
    "494433": "audio/mpeg",
    "52494646": "audio/wav",  # RIFF container
}


def sniff_media_type(content: Column) -> Column:
    """Magic-byte media-type detection as column expressions (media-type
    gate, app/parser.py:460-483 analog)."""
    head = F.lower(F.hex(F.substring(content, 1, 4)))
    expr = None
    for prefix, mtype in _MAGIC_PREFIXES.items():
        cond = head.startswith(prefix)
        expr = F.when(cond, mtype) if expr is None else expr.when(cond, mtype)
    return expr.otherwise(F.lit("application/octet-stream"))


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata columns over an opaque binary column — all JVM-side
    (length/sha2/hex), no UDF."""
    c = F.col(content_col)
    return df.select(
        "*",
        F.length(c).cast("long").alias("n_bytes"),
        F.sha2(c, 256).alias("sha256"),
        sniff_media_type(c).alias("sniffed_type"),
    )


IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(media_id: str, content: bytes) -> tuple[int, int, str, list[float]]:
    """Deterministic fake decode: dimensions/feature derived from the content
    hash — stable across runs and engines, exercising the full batch path."""
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feature = [round(b / 255.0, 6) for b in h[:8]]
    return width, height, "RGB", feature


def decode_images(
    media: DataFrame,
    *,
    use_fake_decoder: bool = False,
    batch_note: str = "PIL not available in this environment",
) -> DataFrame:
    """Decode stage: binary → (width, height, mode, feature vector).

    The kernel is a STUB: with ``use_fake_decoder=True`` it produces a
    deterministic hash-derived fake (for tests / plumbing validation);
    otherwise it raises NotImplementedError at execution time. The
    mapInPandas batch shape, output schema, and column pruning are the real
    production plumbing.
    """

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake_decoder:
                raise NotImplementedError(
                    f"real image decode not implemented: {batch_note}"
                )
            out = [
                (row["media_id"], *_fake_decode(row["media_id"], row["content"]))
                for _, row in pdf.iterrows()
            ]
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mode", "feature"]
            )

    return media.select("media_id", "content").mapInPandas(
        decode, schema=IMAGE_DECODE_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    *,
    every_ms: int = 1000,
    n_frames: int = 4,
    use_fake_decoder: bool = False,
) -> DataFrame:
    """Video frame sampling stub: one output row per sampled frame (a
    table-function stage — mapInPandas emitting multiple rows per input).
    Fake path derives frames by slicing the content hash."""

    def sample(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake_decoder:
                raise NotImplementedError("ffmpeg not available in this environment")
            rows = []
            for _, row in pdf.iterrows():
                h = hashlib.sha256(row["content"] or b"").digest()
                for i in range(n_frames):
                    rows.append(
                        (
                            row["media_id"],
                            i,
                            i * every_ms,
                            bytes(h[i : i + 8]),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_ts_ms", "frame"]
            )

    return media.select("media_id", "content").mapInPandas(
        sample, schema=FRAME_SAMPLE_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(
    media: DataFrame,
    *,
    target: tuple = (224, 224),
    use_fake_decoder: bool = False,
) -> DataFrame:
    """Aspect-fit resize stage: binary → resized binary + dimensions.

    The aspect-fit arithmetic (scale = min(tw/w, th/h), floor, min 1px) is
    real and cross-engine-checkable; the pixel work is the stubbed kernel
    (PIL is not in this container). Fake path derives source dimensions and
    the resized payload from the content hash, exactly like decode_images.
    """
    import math

    tw, th = target

    def resize(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake_decoder:
                raise NotImplementedError("PIL not available in this environment")
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                h = hashlib.sha256(content or b"").digest()
                w, ht = 64 + h[0], 64 + h[1]
                scale = min(tw / w, th / ht)
                ow = max(1, math.floor(w * scale))
                oh = max(1, math.floor(ht * scale))
                rows.append((media_id, w, ht, ow, oh, h[4:16]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_width", "src_height",
                    "out_width", "out_height", "resized",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        resize, schema=RESIZE_SCHEMA
    )


CV_BOXES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("page_number", T.IntegerType()),
        T.StructField("box_index", T.IntegerType()),
        T.StructField("box_type", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("width", T.DoubleType()),
        T.StructField("height", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _fake_detect(content: bytes):
    """Deterministic fake layout detector: two typed boxes per page derived
    from the image-content md5 (stable across runs/engines) on the
    normalized [0,1] page grid — one 'figure', one 'table'."""
    h = hashlib.md5(content or b"").hexdigest()

    def frac(i: int) -> float:
        return int(h[i: i + 2], 16) / 512.0  # [0, 0.498]

    return [
        (0, "figure", frac(0), frac(2), 0.25, 0.20,
         round(0.5 + int(h[4], 16) / 32.0, 6)),
        (1, "table", frac(6), frac(8), 0.30, 0.15,
         round(0.5 + int(h[10], 16) / 32.0, 6)),
    ]


def detect_layout_boxes(
    images: DataFrame,
    *,
    detector_fn=None,
    use_fake_detector: bool = False,
) -> DataFrame:
    """A24 CV layout detection: page images → typed bounding boxes.

    The real deployment loads the detection model once per Python worker
    (executor singleton — cv_models/layout_parser_cv_model.py holds one
    detectron2-style predictor per process) and runs batched inference.
    Here the model kernel is injectable (`detector_fn(content) ->
    [(box_index, type, x, y, w, h, score)]`); `use_fake_detector` selects
    the deterministic md5-derived fake. Input: (doc_id, page_number,
    image).
    """
    from sciencebeam_parser_spark.utils import executor_singleton

    # stable singleton key derived from the kernel's identity — a per-call
    # uuid key would mint a fresh cache entry (and, with a real model,
    # a fresh model load retained forever) on EVERY invocation per worker,
    # the opposite of the once-per-worker contract
    kernel = detector_fn or (_fake_detect if use_fake_detector else None)
    _key = "cv_model:{}".format(
        getattr(kernel, "__qualname__", None)
        or getattr(kernel, "__name__", None)
        or "none"
    )

    def detect(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = executor_singleton(_key, lambda: kernel)
        if fn is None:
            raise NotImplementedError(
                "CV layout model not available in this environment (STUB); "
                "inject detector_fn or use_fake_detector=True"
            )
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                for box in fn(row["image"]):
                    rows.append((row["doc_id"], row["page_number"], *box))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "page_number", "box_index", "box_type",
                        "x", "y", "width", "height", "score",
                    ],
                )

    return images.select("doc_id", "page_number", "image").mapInPandas(
        detect, schema=CV_BOXES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms0", T.DoubleType()),
        T.StructField("rms1", T.DoubleType()),
        T.StructField("rms2", T.DoubleType()),
        T.StructField("rms3", T.DoubleType()),
        T.StructField("n_zero_crossings", T.IntegerType()),
    ]
)


def _fake_pcm(content: bytes) -> list:
    """32 deterministic PCM samples in [-1, 1): sha256 bytes recentred and
    divided by 128 (a power of two — every sample is EXACT in binary
    floating point, so downstream sums/products are engine-portable)."""
    h = hashlib.sha256(content or b"").digest()
    return [(b - 128) / 128.0 for b in h[:32]]


def extract_audio_features(
    media: DataFrame,
    *,
    use_fake_decoder: bool = False,
    batch_note: str = "audio codecs not available in this environment",
) -> DataFrame:
    """Audio feature stage: binary → windowed RMS energy + zero-crossing
    count (the classic cheap VAD/energy features).

    Kernel contract mirrors decode_images: the REAL decode (PCM via an
    audio codec) is a stub that raises at execution time; with
    ``use_fake_decoder=True`` the PCM comes from the content hash
    (deterministic, engine-portable). Feature math is the production code
    either way: 4 windows x 8 samples, rms = sqrt(mean(s^2)) rounded 6dp,
    zero crossings counted on strict sign changes. mapInPandas batch
    shape, schema, and column pruning are the real plumbing.
    """
    import math

    def features(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake_decoder:
                raise NotImplementedError(
                    f"real audio decode not implemented: {batch_note}"
                )
            rows = []
            for _, row in pdf.iterrows():
                s = _fake_pcm(row["content"])
                rms = [
                    round(
                        math.sqrt(sum(x * x for x in s[w * 8:w * 8 + 8]) / 8),
                        6,
                    )
                    for w in range(4)
                ]
                zc = sum(
                    1 for i in range(len(s) - 1) if s[i] * s[i + 1] < 0
                )
                rows.append((row["media_id"], len(s), *rms, zc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples",
                    "rms0", "rms1", "rms2", "rms3",
                    "n_zero_crossings",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        features, schema=AUDIO_FEATURES_SCHEMA
    )


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("bands", T.ArrayType(T.LongType())),
    ]
)


def ahash_images(media: DataFrame) -> DataFrame:
    """Perceptual average-hash stage: binary → 64-bit signature as four
    16-bit band values (LSH-ready for hamming-bucketed dedup).

    Production kernel would decode pixels and hash the 8x8 downsample
    (classic aHash); this kernel signs the byte-BIGRAM histogram instead —
    a decoder-free signature with the same contract (near-identical
    payloads → near-identical bits) that runs on any binary column. Bit i
    is the PARITY of histogram bucket i: a k-byte edit flips O(k) bucket
    parities, while unrelated payloads land ~32 bits apart — mean-
    thresholded bits degenerate when payloads share a global distribution
    (every bucket sits on the same side of the mean), parity does not.
    Buckets key on bigrams, not single byte values: text payloads use
    only ~30 distinct byte values, so half the single-byte buckets were
    STRUCTURALLY empty — two whole bands constant 0 across the corpus,
    i.e. two corpus-sized LSH buckets (measured at the 100x smoke: the
    band self-join tried ~2.5e11 candidate pairs and never finished).
    Bigram support is dense (~900 pairs over 64 buckets), so every band
    discriminates. Integer-exact, so a SQL oracle replays it
    byte-for-byte. Returned as 4x16-bit bands rather than one 64-bit
    word so band-bucket joins and XOR popcounts never overflow signed
    arithmetic in any engine.
    """
    import numpy as np

    def ahash(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                buf = np.frombuffer(content or b"", dtype=np.uint8)
                grams = (buf[:-1].astype(np.int64) * 31 + buf[1:]) % 64
                hist = np.bincount(grams, minlength=64).astype(np.int64)
                total = int(buf.size)
                bits = (hist & 1) == 1
                bands = []
                for j in range(4):
                    val = 0
                    for i in range(16):
                        if bits[16 * j + i]:
                            val |= 1 << i
                    bands.append(val)
                rows.append((media_id, total, bands))
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "bands"])

    return media.select("media_id", "content").mapInPandas(
        ahash, schema=AHASH_SCHEMA
    )
