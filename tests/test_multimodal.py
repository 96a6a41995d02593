"""Multimodal plumbing: schema/batch shape through mapInPandas is real;
feature extraction is deterministic in payload bytes; the decode stub
raises cleanly."""

import pytest

from logparse_spark.operators import multimodal as mm


def test_extract_features_shape_and_determinism(spark):
    media = mm.synth_media(spark, n=30)
    a = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in
         mm.extract_features(media.repartition(7)).collect()}
    assert len(a) == 30
    assert all(len(v) == mm.FEATURE_DIM for v in a.values())
    assert a == b  # partitioning-independent


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG fake")


def test_frame_sampling(spark):
    media = mm.synth_media(spark, n=12)
    frames = mm.sample_frames(media, every_n=5).collect()
    assert frames
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_id.values():
        assert idxs == sorted(idxs)
        assert all(i % 5 == 0 for i in idxs)


def test_resize_plan(spark):
    media = mm.synth_media(spark, n=12)
    for r in mm.resize_plan(media, max_side=128).collect():
        assert max(r["out_width"], r["out_height"]) <= 129  # ceil slack
        assert r["scale"] <= 1.0
