"""Multimodal decode tiers: REAL stdlib parsing for PNG/GIF/BMP/JPEG headers,
24-bit BMP pixels, and WAV PCM; deterministic-fake fallbacks for everything
else.  Fixtures are generated in-test with stdlib only."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from unstructured_data_pipeline_spark.operators.multimodal import (
    _bmp_pixel_stats,
    _decode_audio,
    _decode_image,
    _parse_wav,
)


def make_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Uncompressed 24-bit bottom-up BMP of one solid color."""
    row = bytes(rgb[::-1]) * width  # BGR order
    row += b"\x00" * ((-len(row)) % 4)
    pixels = row * height
    header_size = 14 + 40
    total = header_size + len(pixels)
    bmp = struct.pack("<2sIHHI", b"BM", total, 0, 0, header_size)
    bmp += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixels), 2835, 2835, 0, 0)
    return bmp + pixels


def make_png(width: int, height: int) -> bytes:
    """PNG signature + IHDR only (enough for header-tier decode)."""
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00" * 4
    )


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * 8


def make_jpeg(width: int, height: int) -> bytes:
    """SOI + APP0 + SOF0 skeleton (enough for the marker walk)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", height, width
    ) + b"\x03\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_wav(rate: int, samples: list[float], width: int = 2, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            w.writeframes(
                struct.pack(f"<{len(samples)}h",
                            *[int(max(-1, min(1, s)) * 32767) for s in samples])
            )
        else:
            w.writeframes(bytes(int((s + 1) * 127.5) for s in samples))
    return buf.getvalue()


def test_real_image_header_decode():
    assert _decode_image(make_png(640, 480)) == ("image/png", 640, 480)
    assert _decode_image(make_gif(31, 17)) == ("image/gif", 31, 17)
    assert _decode_image(make_bmp(8, 4, (255, 0, 0)))[:3] == ("image/bmp", 8, 4)
    assert _decode_image(make_jpeg(1920, 1080)) == ("image/jpeg", 1920, 1080)


def test_unknown_format_gets_deterministic_fake_geometry():
    a = _decode_image(b"\x00\x01gibberish")
    b = _decode_image(b"\x00\x01gibberish")
    assert a == b
    assert a[0] == "application/octet-stream"
    assert 64 <= a[1] < 256 and 64 <= a[2] < 256


def test_bmp_pixel_stats_real():
    # solid red: mean_r=1, mean_g=0, mean_b=0, gray std=0
    stats = _bmp_pixel_stats(make_bmp(5, 3, (255, 0, 0)))
    assert stats is not None
    mr, mg, mb, std = stats
    assert mr == pytest.approx(1.0) and mg == 0.0 and mb == 0.0
    assert std == pytest.approx(0.0, abs=1e-6)
    # solid mid-gray: all means 0.5-ish, std 0
    stats2 = _bmp_pixel_stats(make_bmp(4, 4, (128, 128, 128)))
    assert stats2[0] == pytest.approx(128 / 255)
    # non-BMP -> None (fake tier takes over)
    assert _bmp_pixel_stats(b"not a bmp") is None


def test_wav_decode_real_16bit():
    rate, pcm = _parse_wav(make_wav(44100, [0.0, 0.5, -0.5, 1.0]))
    assert rate == 44100
    assert len(pcm) == 4
    assert pcm[1] == pytest.approx(0.5, abs=1e-3)
    assert pcm[2] == pytest.approx(-0.5, abs=1e-3)


def test_wav_decode_stereo_downmix_and_8bit():
    stereo = make_wav(8000, [1.0, -1.0, 0.5, 0.5], nch=2)  # 2 frames x 2 ch
    rate, pcm = _parse_wav(stereo)
    assert rate == 8000 and len(pcm) == 2
    assert pcm[0] == pytest.approx(0.0, abs=1e-2)  # (1 + -1)/2
    assert pcm[1] == pytest.approx(0.5, abs=1e-2)
    rate8, pcm8 = _parse_wav(make_wav(16000, [0.0, 0.25], width=1))
    assert rate8 == 16000 and len(pcm8) == 2


def test_non_wav_audio_falls_back_deterministically():
    rate, pcm = _decode_audio(b"\x01\x02\x03mp3ish")
    assert rate == 16000 and len(pcm) == 9
    assert _decode_audio(b"\x01\x02\x03mp3ish") == (rate, pcm)


def test_image_features_spark_pipeline_with_real_bmp(spark):
    from unstructured_data_pipeline_spark.operators.multimodal import image_features

    df = spark.createDataFrame(
        [("red.bmp", make_bmp(6, 6, (255, 0, 0))),
         ("p.png", make_png(320, 200)),
         ("x.bin", b"opaque")],
        "path string, content binary",
    )
    got = {r["id"]: r for r in image_features(df, dim=6).collect()}
    assert got["red.bmp"]["mime"] == "image/bmp"
    assert got["red.bmp"]["width"] == 6
    assert got["red.bmp"]["feat"][0] == pytest.approx(1.0)  # real mean_r
    assert got["p.png"]["width"] == 320 and got["p.png"]["height"] == 200
    assert got["x.bin"]["mime"] == "application/octet-stream"


def test_audio_features_spark_pipeline_with_real_wav(spark):
    import math

    from unstructured_data_pipeline_spark.operators.multimodal import audio_features

    tone = [math.sin(2 * math.pi * 440 * i / 8000) for i in range(800)]
    df = spark.createDataFrame(
        [("tone.wav", make_wav(8000, tone)), ("noise.bin", bytes(range(64)))],
        "path string, content binary",
    )
    got = {r["id"]: r for r in audio_features(df).collect()}
    t = got["tone.wav"]
    assert t["sample_rate"] == 8000
    assert t["n_samples"] == 800
    # sine RMS = 1/sqrt(2); 440 Hz over 0.1 s -> ~88 zero crossings
    assert t["rms"] == pytest.approx(1 / math.sqrt(2), rel=0.01)
    assert 80 <= t["zero_crossings"] <= 96
    assert got["noise.bin"]["sample_rate"] == 16000  # fake tier


def test_png_decode_roundtrip_every_filter():
    """The stdlib PNG decoder must reconstruct the EXACT raw scanlines
    through every RFC 2083 filter type (None/Sub/Up/Average/Paeth) — the
    encoder forward-filters a gradient that exercises all predictors."""
    from unstructured_data_pipeline_spark.operators.multimodal import (
        _png_pixels,
        make_minimal_png,
    )

    w, h = 5, 4
    rows = [
        bytes(((x * 37 + y * 91 + c * 13) % 256) for x in range(w) for c in range(3))
        for y in range(h)
    ]
    for ft in range(5):
        png = make_minimal_png(w, h, rows=rows, filter_type=ft)
        decoded = _png_pixels(png)
        assert decoded is not None, f"filter {ft} failed to decode"
        dw, dh, ch, raw = decoded
        assert (dw, dh, ch) == (w, h, 3)
        assert [raw[y * w * 3 : (y + 1) * w * 3] for y in range(dh)] == rows, (
            f"filter {ft} reconstruction mismatch"
        )


def test_png_pixel_stats_solid_and_gray():
    from unstructured_data_pipeline_spark.operators.multimodal import (
        _png_pixel_stats,
        make_minimal_png,
    )

    stats = _png_pixel_stats(make_minimal_png(4, 4, rgb=(255, 0, 0)))
    assert stats is not None
    mr, mg, mb, std = stats
    assert (round(mr, 6), round(mg, 6), round(mb, 6)) == (1.0, 0.0, 0.0)
    assert std < 1e-7  # solid color -> (numerically) zero variance
    # grayscale path: 1-channel scanlines replicate luma across RGB slots
    gray_rows = [bytes([128] * 3) for _ in range(3)]
    g = _png_pixel_stats(make_minimal_png(3, 3, rows=gray_rows))
    assert g is not None and g[0] == g[1] == g[2]


def test_png_feature_vector_leads_with_real_stats():
    from unstructured_data_pipeline_spark.operators.multimodal import (
        _feature_vector,
        _png_pixel_stats,
        make_minimal_png,
    )

    png = make_minimal_png(4, 4, rgb=(0, 255, 0))
    feat = _feature_vector(png, dim=8)
    assert feat[:4] == _png_pixel_stats(png)  # real stats prefix
    assert len(feat) == 8  # fake tier fills the remainder deterministically


def test_png_decoder_rejects_unsupported_shapes():
    """16-bit / interlaced / palette payloads fall through to the next
    tier (None), never a wrong decode."""
    import struct
    import zlib

    from unstructured_data_pipeline_spark.operators.multimodal import _png_pixels

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # palette (color type 3) is out of tier
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
        + chunk(b"IEND", b"")
    )
    assert _png_pixels(png) is None
    assert _png_pixels(b"\x89PNG\r\n\x1a\ntruncated") is None
    assert _png_pixels(b"not a png") is None


def test_png_decoder_rejects_zero_height_geometry():
    """A WELL-FORMED PNG declaring height=0 with a valid empty IDAT used
    to decode to a zero-pixel image and crash `_png_pixel_stats` with
    ZeroDivisionError inside the featurization UDF instead of degrading
    to the fake tier (ADVICE r7) — degenerate geometry must return None."""
    import struct
    import zlib

    from unstructured_data_pipeline_spark.operators.multimodal import (
        _feature_vector,
        _png_pixel_stats,
        _png_pixels,
    )

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    for w, h in [(4, 0), (0, 4), (0, 0)]:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * ((3 * w + 1) * h)))
            + chunk(b"IEND", b"")
        )
        assert _png_pixels(png) is None, (w, h)
        assert _png_pixel_stats(png) is None, (w, h)
        # the full featurization path must not raise either
        assert len(_feature_vector(png)) == 8


def test_png_roundtrip_property_random_images():
    """Property: ANY 8-bit image content through ANY filter type decodes
    back to the exact raw scanlines (hypothesis-driven over sizes, channel
    counts, pixel data, and filter choice)."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    from unstructured_data_pipeline_spark.operators.multimodal import (
        _png_pixels,
        make_minimal_png,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 7),
        gray=st.booleans(),
        ft=st.integers(0, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, gray, ft, seed):
        import random

        rng = random.Random(seed)
        ch = 1 if gray else 3
        rows = [bytes(rng.randrange(256) for _ in range(w * ch)) for _ in range(h)]
        png = make_minimal_png(w, h, rows=rows, filter_type=ft)
        decoded = _png_pixels(png)
        assert decoded is not None
        dw, dh, dch, raw = decoded
        assert (dw, dh, dch) == (w, h, ch)
        assert [raw[y * w * ch : (y + 1) * w * ch] for y in range(h)] == rows

    check()
