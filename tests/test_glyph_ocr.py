"""Unit tests for the stdlib glyph-OCR tier (`ai/glyph_ocr.py`) and its
wiring into the AI3 image dispatch (`ai/image_ocr.py` ->
`ai/backends.py`): real fixed-pitch text recognition with no optional
dependency, marker fallback preserved for unreadable payloads."""

from __future__ import annotations

import json

import pytest

from unstructured_data_pipeline_spark.ai import glyph_ocr as G
from unstructured_data_pipeline_spark.ai.backends import DeterministicStubBackend
from unstructured_data_pipeline_spark.ai.image_ocr import (
    extract_image_text,
    make_minimal_bmp,
)
from unstructured_data_pipeline_spark.operators.multimodal import (
    _png_pixels,
    make_minimal_png,
)


@pytest.mark.parametrize("scale", [1, 2, 3])
@pytest.mark.parametrize("invert", [False, True])
def test_roundtrip_scales_and_polarity(scale, invert):
    png = G.render_text_png("HELLO WORLD 42", scale=scale, invert=invert)
    assert G.recognize_text(png) == "HELLO WORLD 42"


def test_full_charset_roundtrip():
    chars = "".join(sorted(G.FONT_5X7)).replace(" ", "")
    png = G.render_text_png(chars, scale=1)
    assert G.recognize_text(png) == chars


def test_multiline():
    png = G.render_text_png("UNITED STATES\nSAUDI ARABIA", scale=2)
    assert G.recognize_text(png) == "UNITED STATES\nSAUDI ARABIA"


def _flip(png: bytes, points: list[tuple[int, int]]) -> bytes:
    w, h, _ch, raw = _png_pixels(png)
    raw = bytearray(raw)
    for y, x in points:
        raw[y * w + x] ^= 0xFF
    return make_minimal_png(
        width=w, height=h, rows=[bytes(raw[y * w : (y + 1) * w]) for y in range(h)]
    )


def test_noise_within_hamming_budget_recognizes():
    png = _flip(G.render_text_png("QUARTZ 2026", scale=1), [(2, 2), (5, 3)])
    assert G.recognize_text(png) == "QUARTZ 2026"


def test_excess_noise_falls_back_not_misreads():
    """Beyond the Hamming/margin budget the WHOLE image reads as None
    (caller falls back to the marker) — never silently wrong text."""
    pts = [(1 + i % 7, 1 + i) for i in range(6)]
    png = _flip(G.render_text_png("QUARTZ 2026", scale=1), pts)
    assert G.recognize_text(png) is None


def test_subpixel_noise_absorbed_by_majority_at_scale3():
    png = _flip(G.render_text_png("NATION_7", scale=3), [(3, 3)])
    assert G.recognize_text(png) == "NATION_7"


def test_non_grid_images_fall_back():
    assert G.recognize_text(make_minimal_bmp(8, 8)) is None  # solid, flat
    assert G.recognize_text(make_minimal_png(10, 10)) is None
    assert G.recognize_text(b"not an image") is None


def test_all_space_cells_read_as_none_not_empty(  # round-13 review #1
):
    """A grid-geometry image whose every cell reads as space must return
    None (callers only fall back on None — an empty string would
    silently replace the deterministic marker in the AI3 envelope)."""
    # 13x9: valid s=1 geometry (two cells), one dark pixel in the top
    # margin row passes the contrast gate but sits outside every sample
    # block, so both cells match ' '
    rows = [bytes([255] * 13) for _ in range(9)]
    rows[0] = bytes([255, 255, 255, 0] + [255] * 9)
    png = make_minimal_png(width=13, height=9, rows=rows)
    assert G.recognize_text(png) is None
    assert extract_image_text(png) is None


def test_bmp_pixel_decode_matches_png():
    """_bmp_pixels: 24-bit bottom-up BMP of glyph pixels reads the same
    text as the PNG rendering."""
    import struct

    png = G.render_text_png("BMP TIER", scale=2)
    w, h, _ch, gray = _png_pixels(png)
    row_pad = (4 - (3 * w) % 4) % 4
    pixels = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = b"".join(bytes([gray[y * w + x]] * 3) for x in range(w))
        pixels += row + b"\x00" * row_pad
    hdr = 14 + 40
    bmp = struct.pack("<2sIHHI", b"BM", hdr + len(pixels), 0, 0, hdr)
    bmp += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    assert G.recognize_text(bmp + pixels) == "BMP TIER"


def test_dispatch_reads_glyph_png_and_keeps_marker_for_solid():
    """backends.ocr: a glyph PNG now yields the recognized text in the
    envelope; a solid BMP keeps the pre-r13 deterministic marker."""
    b = DeterministicStubBackend()
    env = json.loads(b.ocr(G.render_text_png("INVOICE 123", scale=2)))
    assert env["source"] == "image" and env["content"] == "INVOICE 123"
    env2 = json.loads(b.ocr(make_minimal_bmp(4, 4, (10, 20, 30))))
    assert env2["source"] == "image"
    assert env2["content"].startswith("<image:bmp:")
    # the hook itself: None for unreadable, text for readable
    assert extract_image_text(make_minimal_bmp(4, 4)) is None
    assert extract_image_text(G.render_text_png("OK", scale=1)) == "OK"


def test_renderer_rejects_out_of_charset():
    with pytest.raises(KeyError):
        G.render_text_png("lowercase")
