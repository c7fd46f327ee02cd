"""Multimodal plumbing: binary columns through Arrow batches, decode
metadata, feature extraction, frame sampling — deterministic stub
kernels, real Spark plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webfilter import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synth_media(spark, 200).cache()


def test_media_schema_roundtrip(media):
    row = media.first()
    assert isinstance(bytes(row["bytes"]), bytes) and len(row["bytes"]) > 0
    assert row["meta"]["codec"] in ("bmp", "png")
    assert media.count() == 200


def test_decode_image_meta_is_real(media):
    """Decode parses the ACTUAL format headers: recovered dims must
    equal the generator contract for every row, no decode errors."""
    rows = multimodal.decode_image_meta(media).collect()
    assert len(rows) == 200
    for r in rows:
        w, h = multimodal.synth_dims(r["media_id"])
        assert (r["width"], r["height"]) == (w, h), r
        assert r["decode_err"] is None
        assert r["format"] in ("bmp", "png")
        assert r["channels"] == (3 if r["format"] == "bmp" else 1)


def test_decode_audio_meta_is_real(spark):
    audio = multimodal.synth_media(spark, 40, kind="audio")
    rows = multimodal.decode_audio_meta(audio).collect()
    for r in rows:
        assert r["decode_err"] is None
        assert r["sample_rate"] == 8000 and r["bits"] == 16 and r["n_channels"] == 1
        expect_frames = 1000 + (r["media_id"] % 64) * 250
        assert r["n_frames"] == expect_frames
        assert r["duration_ms"] == int(expect_frames * 1000 / 8000)


def test_unknown_format_surfaces_error(spark):
    import pandas as pd

    junk = spark.createDataFrame(
        [(1, "image", b"not an image at all", {"codec": "??"})],
        schema=multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.decode_image_meta(junk).first()
    assert r["decode_err"] == "unknown_format"
    assert r["width"] is None and r["height"] is None


def test_media_kernel_headers_pure():
    """Kernel-level: handcrafted GIF + JPEG + truncated headers."""
    from webfilter.kernels import media as mk

    gif = b"GIF89a" + (7).to_bytes(2, "little") + (5).to_bytes(2, "little") + b"\x00" * 10
    assert mk.parse_image(gif) == {
        "width": 7, "height": 5, "channels": 3, "format": "gif", "err": None}
    # minimal JPEG: SOI + SOF0 (height=10, width=20, 3 components)
    import struct

    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 9, 8, 10, 20, 3)
    jpg = b"\xff\xd8" + sof
    p = mk.parse_image(jpg)
    assert (p["width"], p["height"], p["channels"], p["err"]) == (20, 10, 3, None)
    # truncated BMP -> parse_error, not garbage
    t = mk.parse_image(b"BM\x01\x02")
    assert t["err"] and t["width"] is None
    # bmp/png/wav generators round-trip through their parsers
    assert mk.parse_image(mk.make_bmp(33, 9, seed=4))["width"] == 33
    assert mk.parse_image(mk.make_png(21, 11, seed=4))["height"] == 11
    w = mk.parse_wav(mk.make_wav(4000, 16000, seed=1))
    assert (w["n_frames"], w["sample_rate"], w["duration_ms"]) == (4000, 16000, 250)


def test_features_normalized(media):
    feats = multimodal.extract_features(media).collect()
    assert all(len(r["feature"]) == multimodal.EMBED_DIM for r in feats)
    for r in feats[:10]:
        norm = sum(x * x for x in r["feature"]) ** 0.5
        assert abs(norm - 1.0) < 1e-3


def test_frame_sampling_explodes(media):
    frames = multimodal.sample_frames(media.limit(20), every_ms=1000)
    pdf = frames.toPandas()
    assert pdf.groupby("media_id").size().min() >= 1
    # frame timestamps are strictly increasing per media
    for _, g in pdf.groupby("media_id"):
        ts = g.sort_values("frame_idx")["frame_ts_ms"].tolist()
        assert ts == sorted(ts) and len(set(ts)) == len(ts)


def test_feature_similarity_composes_with_simsearch(spark, media):
    """media features flow into the same ANN operators as text
    embeddings (schema compatibility check)."""
    from webfilter.simsearch import brute_force_topk

    feats = multimodal.extract_features(media).withColumnRenamed("media_id", "vec_id") \
        .withColumnRenamed("feature", "embedding")
    q = feats.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(feats, q, k=2)
    rows = top.filter(F.col("rank") == 1).collect()
    assert all(r["query_id"] == r["vec_id"] for r in rows)
