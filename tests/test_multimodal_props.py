"""Property-based round-trips for the pure-numpy media codecs (round 4):
arbitrary pixel contents and shapes must survive BMP and MBMP encode/decode
bit-exactly — padding, channel order, and row order included."""

import numpy as np
from hypothesis import given, settings, strategies as st

from sparkts.datagen import bmp_from_text, encode_bmp, encode_bmp_video
from sparkts.operators.multimodal import decode_bmp, parse_bmp_video


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_any_shape(h, w, seed):
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    buf = encode_bmp(px)
    # file size follows the 4-byte-stride formula exactly
    stride = w * 3 + (4 - (w * 3) % 4) % 4
    assert len(buf) == 54 + h * stride
    np.testing.assert_array_equal(decode_bmp(buf), px)


@settings(max_examples=25, deadline=None)
@given(
    n_frames=st.integers(1, 8),
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_mbmp_container_roundtrip(n_frames, h, w, seed):
    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
              for _ in range(n_frames)]
    buf = encode_bmp_video(frames)
    out = parse_bmp_video(buf)
    assert len(out) == n_frames
    for got, want in zip(out, frames):
        np.testing.assert_array_equal(decode_bmp(got), want)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=1, max_size=400))
def test_bmp_from_text_pixels_are_the_repeated_bytes(text):
    """The graded media_features contract: pixels ARE the repeated text
    bytes in RGB interleave — for any printable-ASCII document."""
    buf = bmp_from_text(text, width=17, height=15)
    px = decode_bmp(buf)
    assert px.shape == (15, 17, 3)
    raw = text.encode()
    need = 17 * 15 * 3
    reps = -(-need // len(raw))
    want = np.frombuffer((raw * reps)[:need], dtype=np.uint8)
    np.testing.assert_array_equal(px.reshape(-1), want)


# --------------------------------------------------------------------------- #
# PNG codec (round 5): encode_png / decode_png
# --------------------------------------------------------------------------- #

from sparkts.datagen import encode_png, png_from_text  # noqa: E402
from sparkts.operators.multimodal import decode_png  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(h, w, seed):
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    buf = encode_png(px)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    np.testing.assert_array_equal(decode_png(buf), px)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(2, 16),
    w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_png_roundtrip_every_filter_type(h, w, seed, data):
    """All five scanline filters (None/Sub/Up/Average/Paeth) must invert
    bit-exactly, in any per-row combination."""
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    buf = encode_png(px, filters=filters)
    np.testing.assert_array_equal(decode_png(buf), px)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=1, max_size=400))
def test_png_from_text_pixels_are_the_repeated_bytes(text):
    """png_from_text cycles through all five filter types row by row —
    the decode must still recover the exact repeated document bytes."""
    buf = png_from_text(text, width=17, height=15)
    px = decode_png(buf)
    assert px.shape == (15, 17, 3)
    raw = text.encode()
    need = 17 * 15 * 3
    reps = -(-need // len(raw))
    want = np.frombuffer((raw * reps)[:need], dtype=np.uint8)
    np.testing.assert_array_equal(px.reshape(-1), want)


def test_png_rejects_unsupported_variants():
    import pytest as _pytest
    import struct, zlib
    # grayscale (color type 0) IHDR → NotImplementedError, not garbage
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))
    buf = sig + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with _pytest.raises(NotImplementedError):
        decode_png(buf)
    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")


# --------------------------------------------------------------------------- #
# JPEG codec (round 5): encode_jpeg / decode_jpeg
# --------------------------------------------------------------------------- #

from sparkts.operators.jpeg import decode_jpeg, encode_jpeg  # noqa: E402


def _smooth_image(h, w, seed):
    """JPEG-friendly content: bandlimited sinusoids + mild noise."""
    r = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        128 + 100 * np.sin(xx / 7.0) * np.cos(yy / 9.0),
        128 + 80 * np.cos(xx / 5.0 + r.rand() * 6),
        128 + 60 * np.sin((xx + yy) / 11.0),
    ], axis=-1)
    return np.clip(img + r.normal(0, 3, (h, w, 3)), 0, 255).astype(np.uint8)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40),
       seed=st.integers(0, 2**31 - 1))
def test_jpeg_roundtrip_within_quantization_error(h, w, seed):
    """JPEG is lossy — the roundtrip invariant is shape preservation plus
    bounded reconstruction error at high quality (q95 quantizes the DC
    and low-frequency AC coefficients finely)."""
    img = _smooth_image(h, w, seed)
    buf = encode_jpeg(img, quality=95)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    dec = decode_jpeg(buf)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(float) - img.astype(float)).mean() < 5.0


@settings(max_examples=15, deadline=None)
@given(h=st.integers(1, 32), w=st.integers(1, 32),
       seed=st.integers(0, 2**31 - 1))
def test_jpeg_roundtrip_pure_noise_q95(h, w, seed):
    """Worst-case content (white noise saturates every AC band): still
    decodes to the right shape with error bounded by the q95 tables."""
    img = np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(float) - img.astype(float)).mean() < 12.0


def test_jpeg_constant_image_is_near_exact():
    # a flat block has only a DC coefficient → error ≤ rounding
    img = np.full((24, 16, 3), 137, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(dec.astype(float) - 137.0).max() <= 2.0


def test_jpeg_decode_dispatch_and_resize():
    from sparkts.operators.multimodal import _decode_image

    img = _smooth_image(19, 27, 7)
    buf = encode_jpeg(img, quality=90)
    np.testing.assert_array_equal(_decode_image(buf), decode_jpeg(buf))


def test_jpeg_rejects_unsupported_variants():
    import pytest as _pytest
    import struct

    img = _smooth_image(8, 8, 1)
    buf = bytearray(encode_jpeg(img, quality=90))
    # flip SOF0 → SOF2 (progressive) keeping lengths intact
    i = buf.find(b"\xff\xc0")
    assert i > 0
    buf[i + 1] = 0xC2
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))
    with _pytest.raises(ValueError):
        decode_jpeg(b"definitely not a jpeg")
    # 2x2 luma subsampling in SOF → NotImplementedError
    buf = bytearray(encode_jpeg(img, quality=90))
    i = buf.find(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) nc(1) then [cid hv tq]*3
    buf[i + 2 + 2 + 5 + 1 + 1] = 0x22
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))


def test_jpeg_tolerates_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    (libjpeg-family encoders emit them) — the header scan must skip them
    rather than reading a bogus segment length."""
    img = _smooth_image(16, 16, 3)
    buf = encode_jpeg(img, quality=90)
    # inject fill bytes before the DQT and SOF0 markers
    for marker in (b"\xff\xdb", b"\xff\xc0"):
        i = buf.find(marker)
        buf = buf[:i] + b"\xff\xff\xff" + buf[i:]
    dec = decode_jpeg(buf)
    assert dec.shape == img.shape
    np.testing.assert_array_equal(dec, decode_jpeg(encode_jpeg(img, 90)))
