"""Image-OCR tier (ai/image_ocr.py): stdlib sniffing always works; the
Pillow+pytesseract extraction tier is exercised only where installed
(skip-if-absent), mirroring the pdf.py tiering tests.  Reference parity:
PARSE_DOCUMENT accepts jpg/png uploads (`app.py:365`)."""

from __future__ import annotations

import json

import pytest

from unstructured_data_pipeline_spark.ai.backends import DeterministicStubBackend
from unstructured_data_pipeline_spark.ai.image_ocr import (
    extract_image_text,
    make_minimal_bmp,
    ocr_available,
    sniff_image_format,
)


def test_sniff_image_format_magics():
    assert sniff_image_format(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16) == "png"
    assert sniff_image_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_image_format(b"GIF89a\x01\x00") == "gif"
    assert sniff_image_format(b"GIF87a\x01\x00") == "gif"
    assert sniff_image_format(make_minimal_bmp()) == "bmp"
    assert sniff_image_format(b"%PDF-1.4") is None
    assert sniff_image_format(b"plain text") is None
    assert sniff_image_format(b"") is None
    assert sniff_image_format(None) is None


def test_make_minimal_bmp_wellformed():
    bmp = make_minimal_bmp(4, 4, (10, 20, 30))
    # BM magic + declared total size == actual length
    assert bmp[:2] == b"BM"
    assert int.from_bytes(bmp[2:6], "little") == len(bmp)
    # the repo's own stdlib decoder agrees on mime + geometry
    from unstructured_data_pipeline_spark.operators.multimodal import _decode_image

    assert _decode_image(bmp)[:3] == ("image/bmp", 4, 4)


def test_extract_image_text_absent_tier_returns_none():
    """Without Pillow+pytesseract the hook must return None (caller falls
    back to the deterministic marker), never raise."""
    if ocr_available():
        pytest.skip("OCR tier installed; absent-tier behavior not observable")
    assert extract_image_text(make_minimal_bmp()) is None
    assert extract_image_text(b"not an image") is None


def test_backend_ocr_dispatches_image_branch():
    """Content sniffing routes image bytes to the image envelope; content is
    real OCR text when the tier is installed, the marker otherwise —
    either way non-empty and source='image'."""
    env = json.loads(DeterministicStubBackend().ocr(make_minimal_bmp()))
    assert env["source"] == "image"
    assert env["mode"] == "layout"
    if not ocr_available():
        assert env["content"].startswith("<image:bmp:")


def test_backend_ocr_text_and_pdf_branches_unchanged():
    b = DeterministicStubBackend()
    env = json.loads(b.ocr("hello world".encode()))
    assert env["content"] == "hello world" and "source" not in env
    env = json.loads(b.ocr(b"\xfe\x80binary"))  # invalid utf-8, no image magic
    assert env["content"].startswith("<binary:")


@pytest.mark.skipif(not ocr_available(), reason="Pillow+pytesseract not installed")
def test_extract_image_text_real_tier():
    """With the real tier: render text into an image and extract it back."""
    import io

    from PIL import Image, ImageDraw

    img = Image.new("RGB", (220, 60), (255, 255, 255))
    ImageDraw.Draw(img).text((10, 20), "HELLO 42", fill=(0, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    text = extract_image_text(buf.getvalue())
    assert text is not None and "HELLO" in text.upper()
