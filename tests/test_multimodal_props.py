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
