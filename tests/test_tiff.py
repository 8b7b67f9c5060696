"""Baseline-TIFF codec: lossless roundtrips through the fixture
encoder (uncompressed + literal PackBits), plus independently-built
streams for the paths the encoder doesn't emit — TIFF LZW with the
spec's early-change width growth, PackBits repeat runs, big-endian
byte order, multi-strip layout, WhiteIsZero inversion, palette
ColorMap — and loud failure on truncation/unsupported layouts."""

import struct

import numpy as np
import pytest

from dataflow_python_etl_spark.operators import codecs
from dataflow_python_etl_spark.operators.codecs import decode_tiff, encode_tiff
from dataflow_python_etl_spark.operators.multimodal import decode_image_meta


def _img(seed=5, h=13, w=17, ch=3):
    rng = np.random.default_rng(seed)
    shape = (h, w, ch) if ch > 1 else (h, w)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def test_roundtrip_uncompressed_and_packbits():
    img = _img()
    for comp in (1, 32773):
        enc = encode_tiff(img, compression=comp)
        assert codecs.sniff_format(enc) == "image/tiff"
        assert np.array_equal(decode_tiff(enc), img)
    g = _img(ch=1)
    assert np.array_equal(decode_tiff(encode_tiff(g)), g)


def _tiff(entries, extra, strip, bo="<"):
    """Hand-built single-IFD TIFF; entries = [(tag,typ,count,val|'X'|'S')]
    where 'X' patches to the extra block and 'S' to the strip."""
    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    extra_off = 8 + 2 + 12 * len(entries) + 4
    strip_off = extra_off + len(extra)
    ifd = struct.pack(bo + "H", len(entries))
    for tag, typ, count, val in sorted(entries):
        if val == "X":
            val = extra_off
        elif val == "S":
            val = strip_off
        # inline values are LEFT-justified in the 4-byte field (spec
        # §2): a count-1 SHORT must occupy the FIRST two bytes, which
        # packing as a 4-byte int only does in little-endian files
        if typ == 3 and count == 1:
            ifd += struct.pack(bo + "HHI", tag, typ, count)
            ifd += struct.pack(bo + "HH", val, 0)
        else:
            ifd += struct.pack(bo + "HHII", tag, typ, count, val)
    ifd += struct.pack(bo + "I", 0)
    return header + ifd + extra + strip


def test_packbits_repeat_runs():
    # 6x4 gray: rows of constant bytes → repeat-run encoding
    img = np.repeat(np.arange(6, dtype=np.uint8)[:, None] * 40, 4, axis=1)
    strip = b""
    for row in img:
        strip += bytes([257 - 4 if False else 253]) + bytes([row[0]])  # 257-253=4 repeats
    payload = _tiff(
        [(256, 4, 1, 4), (257, 4, 1, 6), (258, 3, 1, 8), (259, 3, 1, 32773),
         (262, 3, 1, 1), (273, 4, 1, "S"), (277, 3, 1, 1), (278, 4, 1, 6),
         (279, 4, 1, len(strip), )],
        b"", strip,
    )
    assert np.array_equal(decode_tiff(payload), img)


def _tiff_lzw_compress(data: bytes) -> bytes:
    """Independent TIFF-LZW writer: MSB-first, CLEAR/EOI, EARLY width
    change at next_code == 2^k - 1 (TIFF 6.0 §13, unlike GIF)."""
    clear, eoi = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    acc = nbits = 0
    out = bytearray()

    def put(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    put(clear)
    run = b""
    for b in data:
        c = bytes([b])
        if run + c in table:
            run += c
            continue
        put(table[run])
        if next_code < 4094:
            table[run + c] = next_code
            next_code += 1
            # decoder widens when ITS table size == 2^width - 1;
            # its size tracks next_code exactly
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        run = c
    put(table[run])
    put(eoi)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_strip_against_independent_compressor():
    rng = np.random.default_rng(3)
    img = np.tile(rng.integers(0, 6, (4, 16), dtype=np.uint8) * 40, (8, 1))
    strip = _tiff_lzw_compress(img.tobytes())
    assert len(strip) < img.size  # the table really compressed
    payload = _tiff(
        [(256, 4, 1, 16), (257, 4, 1, 32), (258, 3, 1, 8), (259, 3, 1, 5),
         (262, 3, 1, 1), (273, 4, 1, "S"), (277, 3, 1, 1), (278, 4, 1, 32),
         (279, 4, 1, len(strip))],
        b"", strip,
    )
    assert np.array_equal(decode_tiff(payload), img)


def test_big_endian_and_white_is_zero():
    img = _img(ch=1, h=4, w=6)
    strip = img.tobytes()
    payload = _tiff(
        [(256, 4, 1, 6), (257, 4, 1, 4), (258, 3, 1, 8), (259, 3, 1, 1),
         (262, 3, 1, 0), (273, 4, 1, "S"), (277, 3, 1, 1), (278, 4, 1, 4),
         (279, 4, 1, len(strip))],
        b"", strip, bo=">",
    )
    assert np.array_equal(decode_tiff(payload), 255 - img)  # inverted


def test_multi_strip_layout():
    img = _img(ch=1, h=6, w=5, seed=9)
    s1, s2 = img[:4].tobytes(), img[4:].tobytes()
    # strips appended after the IFD+offsets extra block
    extra = struct.pack("<II", 0, 0) + struct.pack("<II", len(s1), len(s2))
    base_extra_off = 8 + 2 + 12 * 9 + 4
    off1 = base_extra_off + len(extra)
    extra = struct.pack("<II", off1, off1 + len(s1)) + struct.pack(
        "<II", len(s1), len(s2)
    )
    payload = _tiff(
        [(256, 4, 1, 5), (257, 4, 1, 6), (258, 3, 1, 8), (259, 3, 1, 1),
         (262, 3, 1, 1), (273, 4, 2, "X"), (277, 3, 1, 1), (278, 4, 1, 4),
         (279, 4, 2, base_extra_off + 8)],
        extra, s1 + s2,
    )
    assert np.array_equal(decode_tiff(payload), img)


def test_palette_colormap():
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    cmap = []
    pal8 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    for c in range(3):
        chan = [0] * 256
        for i, rgb in enumerate(pal8):
            chan[i] = rgb[c] << 8  # 16-bit ColorMap per spec
        cmap.extend(chan)
    extra = struct.pack("<768H", *cmap)
    payload = _tiff(
        [(256, 4, 1, 2), (257, 4, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
         (262, 3, 1, 3), (273, 4, 1, "S"), (277, 3, 1, 1), (278, 4, 1, 2),
         (279, 4, 1, 4), (320, 3, 768, "X")],
        extra, idx.tobytes(),
    )
    out = decode_tiff(payload)
    assert out.shape == (2, 2, 3)
    assert [tuple(out[i // 2, i % 2]) for i in range(4)] == pal8


def test_unsupported_and_truncated_are_loud():
    img = _img()
    enc = encode_tiff(img)
    with pytest.raises(ValueError):
        decode_tiff(enc[:40])
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"NOPE" + bytes(30))
    # tiled layout gated
    strip = img[:, :, 0].tobytes()
    payload = _tiff(
        [(256, 4, 1, 17), (257, 4, 1, 13), (258, 3, 1, 8), (259, 3, 1, 1),
         (262, 3, 1, 1), (273, 4, 1, "S"), (277, 3, 1, 1), (278, 4, 1, 13),
         (279, 4, 1, len(strip)), (322, 4, 1, 16)],
        b"", strip,
    )
    with pytest.raises(NotImplementedError, match="tiled"):
        decode_tiff(payload)


def test_multimodal_kernel_wiring():
    img = _img(h=10, w=14)
    meta = decode_image_meta(encode_tiff(img), real_decode=True)
    assert meta["format"] == "image/tiff"
    assert (meta["width"], meta["height"]) == (14, 10)
