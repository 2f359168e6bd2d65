"""Real PNG codec (llmops/multimodal.py::_parse_png / synth_png).

The decoder is stdlib zlib + numpy unfiltering; the tests pin it against
the closed-form raster formula (all five scanline filters exercised —
synth_png cycles filter = y % 5 and every synthetic image has h >= 8),
against hand-built PNGs for the gray / RGBA paths, and against the
declared NotImplementedError boundary (palette, 16-bit, interlace).
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from pysparkflow.llmops.multimodal import (
    _PNG_MAGIC,
    _parse_png,
    decode_media,
    decode_stats,
    synth_png,
    synth_ppm,
)


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + typ
        + body
        + zlib.crc32(typ + body).to_bytes(4, "big")
    )


def _png(w, h, color_type, raster_rows, bit_depth=8, interlace=0):
    """Minimal hand encoder, filter 0 on every row."""
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, interlace])
    )
    raw = b"".join(b"\x00" + r for r in raster_rows)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_synth_png_matches_formula_all_filters():
    for did in (0, 1, 3, 6, 7, 11, 399, 70007):
        arr, maxval = _parse_png(synth_png(did))
        w, h = 16 + did % 8, 8 + did % 5
        assert maxval == 255 and arr.shape == (h, w, 3)
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        expect = (did * 7 + x * 3 + y * 5 + c * 11) % 256
        assert np.array_equal(arr, expect.astype(np.uint8)), did


def test_png_and_ppm_decode_identically():
    for did in (0, 5, 14, 42):
        a, _ = decode_media(synth_png(did))[1]
        b, _ = decode_media(synth_ppm(did))[1]
        assert np.array_equal(a, b)


def test_grayscale_and_rgba_paths():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    arr, _ = _parse_png(_png(4, 3, 0, [r.tobytes() for r in gray]))
    assert arr.shape == (3, 4, 1)
    assert np.array_equal(arr[..., 0], gray)
    rgba = np.arange(32, dtype=np.uint8).reshape(2, 16)
    arr, _ = _parse_png(_png(4, 2, 6, [r.tobytes() for r in rgba]))
    assert arr.shape == (2, 4, 4)
    assert np.array_equal(arr.reshape(2, 16), rgba)


def test_declared_unsupported_variants_raise():
    row = [bytes(4)]
    with pytest.raises(NotImplementedError):  # palette
        _parse_png(_png(4, 1, 3, row))
    with pytest.raises(NotImplementedError):  # 16-bit
        _parse_png(_png(2, 1, 0, [bytes(4)], bit_depth=16))
    with pytest.raises(NotImplementedError):  # Adam7
        _parse_png(_png(4, 1, 0, row, interlace=1))


def test_truncated_raster_raises():
    bad = _png(4, 2, 0, [bytes(4)])  # header says 2 rows, one provided
    with pytest.raises(ValueError):
        _parse_png(bad)


def test_decode_stats_png_matches_ppm_raster_stats(spark):
    ids = spark.createDataFrame([(i,) for i in range(0, 70, 7)], "doc_id long")
    png = decode_stats(ids, codec="png").drop("n_bytes")
    ppm = decode_stats(ids, codec="ppm").drop("n_bytes")
    assert sorted(map(tuple, png.collect())) == sorted(map(tuple, ppm.collect()))
