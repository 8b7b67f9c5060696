"""Stdlib-PNG codec: golden-byte decode for every filter type (0-4)
and color type (gray, gray+alpha, RGB, RGBA, palette), loud failure
on truncation/corruption, and the multimodal kernel wiring.

The forward filtering here is implemented INDEPENDENTLY of the
decoder (scalar spec transcription, W3C PNG §6 / RFC 2083), so a
round-trip through decode_png cross-checks the unfiltering math
rather than mirroring it.
"""

import struct
import zlib

import numpy as np
import pytest

from dataflow_python_etl_spark.operators import codecs
from dataflow_python_etl_spark.operators.multimodal import (
    decode_image_meta,
    resize_payload,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_bytes(w, h, color, raw, depth=8, interlace=0, extra=(), n_idat=1):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    comp = zlib.compress(raw)
    cut = len(comp) // n_idat or 1
    idats = [comp[i : i + cut] for i in range(0, len(comp), cut)]
    return (
        codecs.PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + b"".join(_chunk(t, b) for t, b in extra)
        + b"".join(_chunk(b"IDAT", part) for part in idats)
        + _chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _forward_filter(pixels: np.ndarray, bpp: int, filters) -> bytes:
    """Scanline-filter true pixel bytes per the spec (scalar, forward
    direction — the encoder side the decoder must invert)."""
    h, stride = pixels.shape
    out = bytearray()
    prev = [0] * stride
    for y, f in zip(range(h), filters):
        row = [int(v) for v in pixels[y]]
        filt = []
        for x in range(stride):
            a = row[x - bpp] if x - bpp >= 0 else 0
            b = prev[x]
            c = prev[x - bpp] if x - bpp >= 0 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            elif f == 4:
                pred = _paeth(a, b, c)
            filt.append((row[x] - pred) % 256)
        out.append(f)
        out += bytes(filt)
        prev = row
    return bytes(out)


def _rand_pixels(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)  # noqa: NPY002


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_every_filter_type_rgb(ftype):
    """One image per filter type: forward-filter independently,
    decode, recover the exact pixels."""
    px = _rand_pixels(6, 5, 3, seed=ftype + 1)
    # row 0 can't reference "up": the spec treats prior row as zeros,
    # which the forward filter above also does — still exercises it
    raw = _forward_filter(px.reshape(6, 15), 3, [ftype] * 6)
    got = codecs.decode_png(_png_bytes(5, 6, 2, raw))
    assert got.shape == (6, 5, 3)
    assert (got == px).all()


def test_decode_mixed_filters_per_row():
    px = _rand_pixels(5, 4, 3, seed=99)
    raw = _forward_filter(px.reshape(5, 12), 3, [0, 1, 2, 3, 4])
    got = codecs.decode_png(_png_bytes(4, 5, 2, raw))
    assert (got == px).all()


@pytest.mark.parametrize(
    "color,ch,shape",
    [(0, 1, (4, 3)), (4, 2, (4, 3, 2)), (2, 3, (4, 3, 3)), (6, 4, (4, 3, 4))],
)
def test_decode_color_types(color, ch, shape):
    px = _rand_pixels(4, 3, ch, seed=color + 7)
    raw = _forward_filter(px.reshape(4, 3 * ch), ch, [4, 3, 2, 1])
    got = codecs.decode_png(_png_bytes(3, 4, color, raw))
    assert got.shape == shape
    assert (got == px).all()


def test_decode_palette():
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = _forward_filter(idx, 1, [0, 0])
    png = _png_bytes(2, 2, 3, raw, extra=[(b"PLTE", palette)])
    got = codecs.decode_png(png)
    assert got.shape == (2, 2, 3)
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 1].tolist() == [0, 255, 0]
    assert got[1, 0].tolist() == [0, 0, 255]
    # index beyond the palette is corruption, not silent black
    bad = _png_bytes(2, 2, 3, raw, extra=[(b"PLTE", palette[:3])])
    with pytest.raises(ValueError, match="PLTE range"):
        codecs.decode_png(bad)


def test_multi_idat_concatenation():
    px = _rand_pixels(8, 8, 3, seed=5)
    raw = _forward_filter(px.reshape(8, 24), 3, [1] * 8)
    got = codecs.decode_png(_png_bytes(8, 8, 2, raw, n_idat=3))
    assert (got == px).all()


def test_golden_hardcoded_2x2():
    """Fully hand-assembled golden bytes: 2×2 RGB, filter 0 rows."""
    raw = bytes([0, 255, 0, 0, 0, 255, 0]) + bytes([0, 0, 0, 255, 255, 255, 255])
    png = _png_bytes(2, 2, 2, raw)
    got = codecs.decode_png(png)
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 1].tolist() == [0, 255, 0]
    assert got[1, 0].tolist() == [0, 0, 255]
    assert got[1, 1].tolist() == [255, 255, 255]


def test_encode_decode_roundtrip():
    for ch in (1, 2, 3, 4):
        px = _rand_pixels(7, 9, ch, seed=ch)
        out = codecs.decode_png(codecs.encode_png(px))
        assert (out == px).all(), f"channels={ch}"
        assert codecs.sniff_format(codecs.encode_png(px)) == "image/png"


def test_truncation_and_corruption_are_loud():
    px = _rand_pixels(4, 4, 3, seed=3)
    raw = _forward_filter(px.reshape(4, 12), 3, [0] * 4)
    png = _png_bytes(4, 4, 2, raw)
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_png(png[:-8])  # IEND cut off
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_png(png[: len(png) // 2])
    flipped = bytearray(png)
    flipped[len(png) // 2] ^= 0xFF  # corrupt a byte inside IDAT
    with pytest.raises(ValueError, match="CRC|corrupt"):
        codecs.decode_png(bytes(flipped))
    # declared raster larger than IDAT inflates to
    short = _png_bytes(4, 4, 2, raw[: len(raw) - 5])
    with pytest.raises(ValueError, match="size mismatch"):
        codecs.decode_png(short)


def test_unsupported_variants_gated_not_garbled():
    px = _rand_pixels(2, 2, 3, seed=1)
    raw = _forward_filter(px.reshape(2, 6), 3, [0, 0])
    # sub-byte packed depths remain gated; garbage stays loud
    with pytest.raises(NotImplementedError, match="8/16-bit"):
        codecs.decode_png(_png_bytes(2, 2, 0, raw, depth=4))
    with pytest.raises(ValueError, match="not a PNG"):
        codecs.decode_png(b"GIF89a......")


def test_adam7_interlaced_roundtrip():
    passes = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
              (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))
    for (h, w) in ((9, 11), (8, 8), (1, 1), (3, 2)):
        px = _rand_pixels(h, w, 3, seed=h * 31 + w)
        raw = b""
        for xs, xst, ys, yst in passes:
            rows = list(range(ys, h, yst))
            cols = list(range(xs, w, xst))
            if not rows or not cols:
                continue
            for r in rows:
                line = b"".join(bytes(px[r, c]) for c in cols)
                raw += b"\x00" + line  # filter 0 per scanline
        out = codecs.decode_png(_png_bytes(w, h, 2, raw, interlace=1))
        assert np.array_equal(out, px), (h, w)


def test_16bit_png_roundtrip():
    rng = np.random.default_rng(42)
    for color, ch in ((0, 1), (2, 3), (6, 4)):
        h, w = 5, 7
        px16 = rng.integers(0, 1 << 16, (h, w, ch), dtype=np.uint16)
        flat = px16.astype(">u2").tobytes()
        stride = w * ch * 2
        raw = b"".join(
            b"\x00" + flat[r * stride : (r + 1) * stride] for r in range(h)
        )
        out = codecs.decode_png(_png_bytes(w, h, color, raw, depth=16))
        assert out.dtype == np.uint16
        expect = px16.reshape(h, w) if ch == 1 else px16
        assert np.array_equal(out, expect), color
    # 16-bit palette is invalid, not gated
    with pytest.raises(ValueError, match="palette"):
        codecs.decode_png(_png_bytes(2, 2, 3, b"\x00ab\x00cd" * 2, depth=16))


def test_decode_image_meta_png():
    """q30's meta kernel path: a real PNG yields real dimensions and
    the pixel-sum checksum."""
    px = np.full((3, 5, 3), 7, dtype=np.uint8)
    meta = decode_image_meta(codecs.encode_png(px), real_decode=True)
    assert meta["format"] == "image/png"
    assert (meta["width"], meta["height"]) == (5, 3)
    assert meta["checksum"] == 7 * 3 * 5 * 3


def test_resize_png_rgba_roundtrips_through_png():
    """The resize kernel re-encodes alpha-bearing pixels as PNG
    (netpbm can't carry alpha) — output decodes to the target shape
    with nearest-neighbor semantics."""
    px = _rand_pixels(2, 2, 4, seed=11)
    out = resize_payload(codecs.encode_png(px), 4, 4, real_decode=True)
    assert codecs.sniff_format(out) == "image/png"
    got = codecs.decode_png(out)
    assert got.shape == (4, 4, 4)
    for y in range(4):
        for x in range(4):
            assert (got[y, x] == px[y // 2, x // 2]).all()
    # RGB still comes back as netpbm
    rgb = _rand_pixels(2, 2, 3, seed=12)
    out_rgb = resize_payload(codecs.encode_png(rgb), 2, 2, real_decode=True)
    assert out_rgb[:2] == b"P6"
    assert (codecs.decode_pnm(out_rgb) == rgb).all()
