"""Multimodal plumbing tests: schemas, batch shapes, determinism, and the
loud NotImplementedError for real media."""

import pytest
from pyspark.sql import functions as F

from biomedical_ner_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, n=30).persist()


def test_feature_extraction_shapes(spark, media):
    feats = mm.extract_features(media, feat_dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.feat) == 16
        assert abs(sum(x * x for x in r.feat) - 1.0) < 1e-5  # normalized
        assert r.sha and r.n_bytes > 0
    # deterministic across runs
    a = sorted((r.media_id, tuple(r.feat)) for r in rows)
    b = sorted(
        (r.media_id, tuple(r.feat))
        for r in mm.extract_features(media, feat_dim=16).collect()
    )
    assert a == b


def test_resize_preserves_aspect(spark, media):
    out = mm.resize_images(media, max_side=32).collect()
    assert len(out) == media.where(F.col("kind") == "image").count()
    src = {r.media_id: (r.meta_width, r.meta_height) for r in media.collect()}
    for r in out:
        w0, h0 = src[r.media_id]
        assert max(r.width, r.height) == 32
        # aspect preserved within integer rounding (relative tolerance:
        # small integer dims quantize, e.g. 288x48 -> 32x5)
        ratio0 = w0 / h0
        assert abs(r.width / r.height - ratio0) / ratio0 < 0.15


def test_frame_sampling_flatmap(spark, media):
    frames = mm.sample_frames(media, every_ms=250)
    vids = media.where(F.col("kind") == "video").collect()
    got = frames.groupBy("media_id").count().collect()
    want = {v.media_id: (v.meta_duration_ms + 249) // 250 for v in vids}
    assert {r.media_id: r["count"] for r in got} == want


def test_real_media_raises_not_implemented(spark):
    df = spark.createDataFrame(
        [(0, "image", "image/png", bytearray(b"\x89PNG_not_really"), 1, 1, 1)],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        mm.extract_features(df).collect()
