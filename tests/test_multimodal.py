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
    assert row["meta"]["codec"] == "fake"
    assert media.count() == 200


def test_decode_image_meta(media):
    meta = multimodal.decode_image_meta(media)
    rows = meta.collect()
    assert len(rows) == 200
    assert all(r["width"] >= 160 and r["height"] >= 90 for r in rows)
    # deterministic: same bytes -> same dims on re-run
    again = {r["media_id"]: (r["width"], r["height"]) for r in multimodal.decode_image_meta(media).collect()}
    assert all((r["width"], r["height"]) == again[r["media_id"]] for r in rows)


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
