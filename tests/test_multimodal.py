"""Multimodal plumbing tests: the Spark-side contract (schema, batching,
explosion arithmetic) is real; decode is the deterministic fake."""

from __future__ import annotations

import pytest

from pysparkflow.llmops.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
    real_decode,
    resize_plan,
)


def _media(spark):
    rows = [
        (1, "image", b"\x89PNGfake1", (640, 480, None, None)),
        (2, "image", b"\x89PNGfake2", (100, 50, None, None)),
        (3, "audio", b"RIFFfake", (None, None, 16000, None)),
        (4, "video", b"\x00\x00ftypfake", (1920, 1080, None, 95)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_schema_and_determinism(spark):
    out = extract_features(_media(spark)).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 9
    assert len(by_id[1]["features"]) == FEATURE_DIM
    # deterministic: same payload → same features across runs
    out2 = {r["media_id"]: r["features"] for r in extract_features(_media(spark)).collect()}
    assert out2[1] == by_id[1]["features"]
    assert out2[1] != out2[2]


def test_frame_sample(spark):
    got = frame_sample(_media(spark), every_n=10).select("media_id", "frame_idx").collect()
    idxs = sorted(r["frame_idx"] for r in got)
    assert idxs == list(range(0, 95, 10))  # 0,10,...,90
    assert {r["media_id"] for r in got} == {4}


def test_resize_plan(spark):
    got = {r["media_id"]: r for r in resize_plan(_media(spark), max_side=224).collect()}
    assert got[1]["out_width"] == 224 and got[1]["out_height"] == 168
    assert got[2]["scale"] == 1.0 and got[2]["out_width"] == 100


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image")
