"""Baseline-JPEG codec (ITU-T T.81 SOF0): encoder↔decoder roundtrips
at several geometries (4:4:4, 4:2:0, odd dimensions, restart
intervals), loud failure on truncation/corruption/unsupported modes,
and the multimodal kernel wiring.

The encoder is not a mirror of the decoder: it uses its own
fixed-length canonical huffman tables (written into DHT) while the
decoder builds its tables generically from whatever DHT the file
carries — the same path real-world Annex-K streams go through — and
the forward DCT/quantize math is cross-checked by the inverse, not
shared with it.
"""

import struct

import numpy as np
import pytest

from dataflow_python_etl_spark.operators import codecs
from dataflow_python_etl_spark.operators.codecs import decode_jpeg, encode_jpeg
from dataflow_python_etl_spark.operators.multimodal import (
    decode_image_meta,
    resize_payload,
)


def _smooth_rgb(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [np.clip(yy * 4, 0, 255), np.clip(xx * 3, 0, 255), np.clip(yy + xx, 0, 255)],
        axis=-1,
    ).astype(np.uint8)


def _rmse(a, b):
    d = a.astype(np.int64) - b.astype(np.int64)
    return float(np.sqrt((d * d).mean()))


def test_flat_image_roundtrips_exactly():
    # a flat field is DC-only energy: quantization cannot move it
    img = np.full((16, 24), 130, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (16, 24) and out.dtype == np.uint8
    assert int(np.abs(out.astype(int) - 130).max()) == 0


def test_smooth_rgb_444_roundtrip_tight():
    img = _smooth_rgb()
    enc = encode_jpeg(img, quality=92)
    assert codecs.sniff_format(enc) == "image/jpeg"
    out = decode_jpeg(enc)
    assert out.shape == img.shape
    assert _rmse(out, img) < 2.0  # measured 0.66 at q92

def test_subsampled_420_roundtrip():
    img = _smooth_rgb()
    out = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert out.shape == img.shape
    # chroma is box-downsampled then replicated: looser but bounded
    assert _rmse(out, img) < 4.0  # measured 1.3


def test_odd_dimensions_crop_exactly():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (31, 37, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(img, quality=85)).shape == (31, 37, 3)
    assert decode_jpeg(encode_jpeg(img, quality=85, subsample=True)).shape == (31, 37, 3)
    gray = rng.integers(0, 256, (17, 9), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quality=100))
    assert out.shape == (17, 9)
    # q100 quant tables are mostly 1s: near-lossless on gray
    assert int(np.abs(out.astype(int) - gray.astype(int)).max()) <= 2


def test_restart_intervals_decode_identically():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    with_rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=3))
    assert np.array_equal(plain, with_rst)
    sub = decode_jpeg(encode_jpeg(img, quality=90, subsample=True, restart_interval=2))
    assert sub.shape == img.shape


def test_encoder_deterministic():
    img = _smooth_rgb(24, 24)
    assert encode_jpeg(img, quality=90) == encode_jpeg(img, quality=90)


def test_truncated_stream_is_loud():
    enc = encode_jpeg(_smooth_rgb(), quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 2])


def test_corrupt_entropy_prefix_is_loud():
    enc = encode_jpeg(np.full((8, 8), 99, dtype=np.uint8), quality=90)
    sos = enc.find(b"\xff\xda")
    seg_len = struct.unpack_from(">H", enc, sos + 2)[0]
    first_entropy = sos + 2 + seg_len
    # 0xF8 = huffman prefix 15, unused by the encoder's 12-entry
    # 4-bit DC table → must be rejected, never silently skipped
    bad = enc[:first_entropy] + b"\xf8" + enc[first_entropy + 1 :]
    with pytest.raises(ValueError, match="huffman"):
        decode_jpeg(bad)


def test_progressive_and_cmyk_stay_gated():
    # SOF2 (progressive): marker walk must refuse before any scan
    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + b"\xff\xc2" + struct.pack(">H", len(sof2) + 2) + sof2
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(payload)
    # 4-component (Adobe CMYK) SOF0
    sof0 = struct.pack(">BHHB", 8, 8, 8, 4) + b"".join(
        bytes([i + 1, 0x11, 0]) for i in range(4)
    )
    payload = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="component"):
        decode_jpeg(payload)


def test_not_a_jpeg_is_loud():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")


def test_multimodal_kernel_wiring():
    img = _smooth_rgb(20, 28)
    enc = encode_jpeg(img, quality=92)
    meta = decode_image_meta(enc, real_decode=True)
    assert meta["format"] == "image/jpeg"
    assert (meta["width"], meta["height"]) == (28, 20)
    assert meta["checksum"] == int(decode_jpeg(enc).astype("int64").sum()) % 1_000_000_007
    # resize path: decode → nearest resample → re-encode (netpbm out)
    resized = resize_payload(enc, 14, 10, real_decode=True)
    assert codecs.sniff_format(resized) == "image/x-portable-pixmap"
    assert codecs.decode_pnm(resized).shape == (10, 14, 3)
