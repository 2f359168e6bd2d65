"""Multimodal tests: the Spark-side contract (schema, batching,
explosion arithmetic) plus the REAL pure-numpy decoders (PPM/PGM/BMP/WAV)
against hand-packed bytes independent of the parser code."""

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


# ---------------------------------------------------------------- real decoders


def test_real_decode_unknown_magic_raises():
    # compressed formats (JPEG here) stay honestly undecodable without codecs
    with pytest.raises(NotImplementedError, match="magic"):
        real_decode(b"\xff\xd8\xff\xe0rest", "image")


def test_ppm_p6_decode_with_header_comment():
    from pysparkflow.llmops.multimodal import decode_media

    # 3x2 RGB, header with a comment line; pixel bytes chosen by hand
    raster = bytes(range(10, 10 + 3 * 2 * 3))  # 10..27 row-major RGB
    payload = b"P6\n# synthetic test image\n3 2\n255\n" + raster
    kind, (arr, maxval) = decode_media(payload)
    assert kind == "image" and maxval == 255
    assert arr.shape == (2, 3, 3)
    assert arr[0, 0, 0] == 10 and arr[0, 0, 2] == 12
    assert arr[1, 2, 2] == 27  # last byte bottom-right blue
    v = real_decode(payload, "image")
    assert len(v) == FEATURE_DIM
    assert (v[0], v[1], v[2]) == (3.0, 2.0, 3.0)
    assert v[5] == 10.0 and v[6] == 27.0  # min/max
    assert v[15] == 1.0  # modality tag


def test_pgm_p5_decode():
    from pysparkflow.llmops.multimodal import decode_media

    payload = b"P5\n4 1\n255\n" + bytes([0, 100, 200, 255])
    kind, (arr, maxval) = decode_media(payload)
    assert arr.shape == (1, 4, 1)
    assert list(arr[0, :, 0]) == [0, 100, 200, 255]


def test_bmp_24bit_bottom_up_decode():
    import struct

    from pysparkflow.llmops.multimodal import decode_media

    # 2x2 BMP, bottom-up, stride 8 (6 data + 2 pad). Logical image:
    #   top row:    red   green
    #   bottom row: blue  white
    # stored bottom-up as BGR: bottom row first
    row_bottom = bytes([255, 0, 0,   255, 255, 255]) + b"\x00\x00"  # blue, white
    row_top = bytes([0, 0, 255,   0, 255, 0]) + b"\x00\x00"         # red, green
    pixeldata = row_bottom + row_top
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixeldata), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixeldata), 0, 0, 0, 0)
    kind, (arr, maxval) = decode_media(header + dib + pixeldata)
    assert kind == "image" and arr.shape == (2, 2, 3)
    assert list(arr[0, 0]) == [255, 0, 0]      # top-left red (RGB)
    assert list(arr[0, 1]) == [0, 255, 0]      # top-right green
    assert list(arr[1, 0]) == [0, 0, 255]      # bottom-left blue
    assert list(arr[1, 1]) == [255, 255, 255]  # bottom-right white


def test_bmp_top_down_negative_height():
    import struct

    from pysparkflow.llmops.multimodal import decode_media

    # 1x2 top-down (height = -2): rows stored top-first
    rows = bytes([0, 0, 255]) + b"\x00" + bytes([255, 0, 0]) + b"\x00"
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 1, -2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    kind, (arr, _) = decode_media(header + dib + rows)
    assert list(arr[0, 0]) == [255, 0, 0]  # top row red
    assert list(arr[1, 0]) == [0, 0, 255]  # bottom row blue


def test_wav_pcm16_stereo_decode_with_extra_chunk():
    import struct

    import numpy as np

    from pysparkflow.llmops.multimodal import decode_media

    sr = 8000
    samples = [(16384, -16384), (0, 32767), (-32768, 0)]
    data = b"".join(struct.pack("<hh", left, r) for left, r in samples)
    fmt = struct.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16)
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"  # decoder must skip this
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + lst
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    kind, (arr, got_sr) = decode_media(payload)
    assert kind == "audio" and got_sr == sr
    assert arr.shape == (3, 2)
    np.testing.assert_allclose(arr[0], [0.5, -0.5])
    np.testing.assert_allclose(arr[2, 0], -1.0)
    v = real_decode(payload, "audio")
    assert (v[0], v[1], v[2]) == (8000.0, 2.0, 3.0)
    assert v[15] == 2.0  # modality tag


def test_wav_pcm8_mono_decode():
    import struct

    import numpy as np

    from pysparkflow.llmops.multimodal import decode_media

    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    data = bytes([128, 255, 0, 192])
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    _, (arr, sr) = decode_media(payload)
    np.testing.assert_allclose(arr[:, 0], [0.0, 127 / 128, -1.0, 0.5])


def test_synth_ppm_roundtrip_matches_formula():
    import numpy as np

    from pysparkflow.llmops.multimodal import decode_media, synth_ppm

    for did in (0, 7, 123, 497):
        payload = synth_ppm(did)
        _, (arr, _) = decode_media(payload)
        h, w, c = arr.shape
        assert (w, h, c) == (16 + did % 8, 8 + did % 5, 3)
        # independent recompute of the generating formula, scalar loop
        for (y, x, ch) in [(0, 0, 0), (h - 1, w - 1, 2), (1, 2, 1)]:
            assert arr[y, x, ch] == (did * 7 + x * 3 + y * 5 + ch * 11) % 256


def test_decode_stats_spark_matches_local(spark):
    import numpy as np

    from pysparkflow.llmops.multimodal import decode_media, decode_stats, synth_ppm

    ids = spark.createDataFrame([(0,), (7,), (123,)], "doc_id long")
    got = {r["media_id"]: r for r in decode_stats(ids).collect()}
    for did in (0, 7, 123):
        _, (arr, _) = decode_media(synth_ppm(did))
        a = arr.astype("int64")
        h, w, c = arr.shape
        r = got[did]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        assert r["n_bytes"] == len(synth_ppm(did))
        assert r["mean_px"] == round(float(a.mean()), 6)
        assert r["tl_px"] == arr[0, 0, 0] and r["br_px"] == arr[-1, -1, -1]
        wx = np.arange(w)[None, :, None]
        wy = np.arange(h)[:, None, None]
        wc = np.arange(c)[None, None, :]
        assert r["wsum"] == int((a * (wx + 7 * wy + 13 * wc)).sum())
