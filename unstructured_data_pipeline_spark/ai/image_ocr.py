"""Optional image-OCR tier for AI3's image branch (SURVEY.md section 2.9).

Reference parity: ``PARSE_DOCUMENT`` accepts jpg/png uploads alongside pdf
(`app/Auto-Magic Document AI.py:365`, `:212-215`).  The engine's OCR entry
point (:meth:`..ai.backends.DeterministicStubBackend.ocr`) dispatches on
content sniffing; this module supplies the image half of that dispatch:

- :func:`sniff_image_format` — stdlib magic-byte detection (PNG/JPEG/GIF/
  BMP), always available, pure function of the bytes;
- :func:`extract_image_text` — real text-from-image when BOTH Pillow and
  pytesseract are importable (neither ships in this container), otherwise
  ``None`` so the caller falls back to its deterministic marker.  Failures
  inside the OCR library also return ``None`` — the AI7 error-envelope
  contract is the caller's job, this hook never raises.

The import-try tiering mirrors ``ai/pdf.py`` (pypdfium2 tier + pure-Python
fallback): plug in the real engine where installed, stay deterministic and
testable where not.
"""

from __future__ import annotations

import io

_MAGICS: tuple[tuple[bytes, str], ...] = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"BM", "bmp"),
)


def sniff_image_format(content: bytes | None) -> str | None:
    """Return 'png'/'jpeg'/'gif'/'bmp' for recognized magic bytes, else None."""
    if not content:
        return None
    for magic, fmt in _MAGICS:
        if content[: len(magic)] == magic:
            return fmt
    return None


def ocr_available() -> bool:
    """True when the optional Pillow+pytesseract tier is importable."""
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError:
        return False
    return True


def extract_image_text(content: bytes) -> str | None:
    """Text from an image payload, tiered like ``ai/pdf.py``:

    1. the stdlib glyph tier (:mod:`.glyph_ocr`) for machine-rendered
       fixed-pitch text — deterministic, always available, and
       confident-or-None, so it goes FIRST: on a grid image pytesseract
       would return approximate text and shadow the exact read,
       diverging by installed library tier (round-13 review);
    2. Pillow+pytesseract when both are importable (free-form scans the
       glyph tier declines);
    3. ``None`` — the payload is not a recognized image, or no tier can
       read it — so the caller decides the fallback (deterministic
       marker), keeping this hook pure and exception-free.
    """
    if sniff_image_format(content) is None:
        return None
    from unstructured_data_pipeline_spark.ai.glyph_ocr import recognize_text

    text = recognize_text(content)
    if text:
        return text
    try:
        import pytesseract
        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(content)) as img:
            scanned = pytesseract.image_to_string(img)
    except Exception:  # noqa: BLE001 — any engine failure -> marker fallback
        return None
    return scanned.strip() or None


def make_minimal_bmp(
    width: int = 4, height: int = 4, rgb: tuple[int, int, int] = (0, 0, 0)
) -> bytes:
    """Uncompressed 24-bit bottom-up BMP of one solid color, stdlib-only.

    The image-branch counterpart of ``pdf.make_minimal_pdf``: a real,
    well-formed container any image library opens, used to exercise the
    sniff->OCR dispatch end-to-end without Pillow in the render path.
    """
    import struct

    row = bytes(rgb[::-1]) * width + b"\x00" * ((4 - (3 * width) % 4) % 4)
    pixels = row * height
    header_size = 14 + 40
    bmp = struct.pack("<2sIHHI", b"BM", header_size + len(pixels), 0, 0, header_size)
    bmp += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return bmp + pixels
