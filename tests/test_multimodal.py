"""Multimodal column tests: metadata expressions are real; decode kernels
are stubs whose plumbing (schemas, batch shapes, multi-row emission) is
exercised via the deterministic fake path.
"""
import pytest
from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.multimodal import (
    attach_media_metadata,
    decode_images,
    sample_frames,
    sniff_media_type,
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n" + b"fakepngdata"
JPEG_MAGIC = b"\xff\xd8\xff\xe0" + b"fakejpegdata"
PDF_MAGIC = b"%PDF-1.4 fake"


def media_df(spark):
    return spark.createDataFrame(
        [
            ("m1", PNG_MAGIC),
            ("m2", JPEG_MAGIC),
            ("m3", PDF_MAGIC),
            ("m4", b"unknownbytes"),
        ],
        "media_id string, content binary",
    )


class TestMediaMetadata:
    def test_magic_byte_sniffing(self, spark):
        out = {
            r["media_id"]: r["sniffed_type"]
            for r in attach_media_metadata(media_df(spark)).collect()
        }
        assert out == {
            "m1": "image/png",
            "m2": "image/jpeg",
            "m3": "application/pdf",
            "m4": "application/octet-stream",
        }

    def test_size_and_hash_columns(self, spark):
        rows = {r["media_id"]: r for r in attach_media_metadata(media_df(spark)).collect()}
        assert rows["m1"]["n_bytes"] == len(PNG_MAGIC)
        assert len(rows["m1"]["sha256"]) == 64

    def test_metadata_predicate_prunes_before_decode(self, spark):
        # the A22 pattern: filter on cheap metadata, decode only survivors
        media = attach_media_metadata(media_df(spark))
        images = media.filter(F.col("sniffed_type").startswith("image/"))
        out = decode_images(images, use_fake_decoder=True).collect()
        assert sorted(r["media_id"] for r in out) == ["m1", "m2"]


class TestDecodeStub:
    def test_fake_decode_is_deterministic(self, spark):
        out1 = {r["media_id"]: r for r in decode_images(media_df(spark), use_fake_decoder=True).collect()}
        out2 = {r["media_id"]: r for r in decode_images(media_df(spark), use_fake_decoder=True).collect()}
        assert out1["m1"]["width"] == out2["m1"]["width"]
        assert out1["m1"]["feature"] == out2["m1"]["feature"]
        assert len(out1["m1"]["feature"]) == 8

    def test_real_decode_raises_not_implemented(self, spark):
        with pytest.raises(Exception, match="NotImplementedError|not implemented"):
            decode_images(media_df(spark)).collect()


class TestFrameSampling:
    def test_emits_multiple_rows_per_video(self, spark):
        out = sample_frames(
            media_df(spark).limit(1), n_frames=3, use_fake_decoder=True
        ).collect()
        assert len(out) == 3
        assert [r["frame_index"] for r in sorted(out, key=lambda r: r["frame_index"])] == [0, 1, 2]
        assert out[0]["frame_ts_ms"] == 0 and len(out[0]["frame"]) == 8


class TestResize:
    def test_aspect_fit_and_clamp(self, spark):
        from sciencebeam_parser_spark.operators.multimodal import resize_images

        media = spark.createDataFrame(
            [("m1", b"payload")], "media_id string, content binary"
        )
        row = resize_images(media, target=(100, 100), use_fake_decoder=True).collect()[0]
        import hashlib, math
        h = hashlib.sha256(b"payload").digest()
        w, ht = 64 + h[0], 64 + h[1]
        scale = min(100 / w, 100 / ht)
        assert (row.src_width, row.src_height) == (w, ht)
        assert row.out_width == max(1, math.floor(w * scale))
        assert row.out_height == max(1, math.floor(ht * scale))
        assert max(row.out_width, row.out_height) == 100
        assert bytes(row.resized) == h[4:16]

    def test_real_path_is_stubbed(self, spark):
        from sciencebeam_parser_spark.operators.multimodal import resize_images

        media = spark.createDataFrame(
            [("m1", b"x")], "media_id string, content binary"
        )
        import pytest as _pytest
        from py4j.protocol import Py4JJavaError
        with _pytest.raises(Exception):
            resize_images(media).collect()


class TestAudioFeatures:
    def test_fake_decoder_deterministic_and_bounded(self, spark):
        from pyspark.sql import functions as F

        from sciencebeam_parser_spark.operators.multimodal import (
            extract_audio_features,
        )

        media = spark.createDataFrame(
            [("a1", b"hello"), ("a2", b"world"), ("a3", None)],
            "media_id string, content binary",
        )
        rows = {r["media_id"]: r for r in extract_audio_features(
            media, use_fake_decoder=True
        ).collect()}
        assert set(rows) == {"a1", "a2", "a3"}
        for r in rows.values():
            assert r["n_samples"] == 32
            for w in range(4):
                assert 0.0 <= r[f"rms{w}"] <= 1.0
            assert 0 <= r["n_zero_crossings"] <= 31
        again = {r["media_id"]: r for r in extract_audio_features(
            media, use_fake_decoder=True
        ).collect()}
        assert rows == again

    def test_real_path_raises(self, spark):
        import pytest

        from sciencebeam_parser_spark.operators.multimodal import (
            extract_audio_features,
        )

        media = spark.createDataFrame(
            [("a1", b"x")], "media_id string, content binary"
        )
        with pytest.raises(Exception, match="not implemented"):
            extract_audio_features(media).collect()
