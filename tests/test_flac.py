"""FLAC codec (RFC 9639): lossless roundtrip through the verbatim
fixture encoder, plus rice/fixed-predictor/LPC/mid-side frames built
INDEPENDENTLY in the tests (spec-transcribed writers, not shared with
the decoder), CRC verification, loud truncation/corruption failure,
and the audio feature-kernel wiring.
"""

import numpy as np
import pytest

from dataflow_python_etl_spark.operators import codecs
from dataflow_python_etl_spark.operators.codecs import (
    crc8_flac,
    crc16_flac,
    decode_audio,
    decode_flac,
    encode_flac,
    encode_wav,
)


class _W:
    """Independent MSB-first bit writer for hand-built frames."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, k):
        self.acc = (self.acc << k) | (int(v) & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def unary(self, q):
        for _ in range(q):
            self.put(0, 1)
        self.put(1, 1)

    def rice(self, e, k):
        u = (e << 1) ^ (e >> 63) if e >= 0 else (-e << 1) - 1
        self.unary(u >> k)
        self.put(u, k)

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)


def _streaminfo(sample_rate, n_channels, bps, total):
    si = (
        (sample_rate << 44)
        | ((n_channels - 1) << 41)
        | ((bps - 1) << 36)
        | total
    )
    body = (
        (4096).to_bytes(2, "big") * 2
        + b"\x00\x00\x00" * 2
        + si.to_bytes(8, "big")
        + bytes(16)
    )
    return codecs.FLAC_MAGIC + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(blocksize, ch_code, bps_code):
    w = _W()
    w.put(0x3FFE, 14)
    w.put(0, 2)
    w.put(7, 4)       # 16-bit blocksize at end
    w.put(0, 4)       # rate from STREAMINFO
    w.put(ch_code, 4)
    w.put(bps_code, 3)
    w.put(0, 1)
    w.put(0, 8)       # frame number 0
    w.put(blocksize - 1, 16)
    hdr = bytes(w.buf)
    return hdr + bytes([crc8_flac(hdr)])


def _finish(hdr, body_writer):
    body_writer.align()
    frame = hdr + bytes(body_writer.buf)
    return frame + crc16_flac(frame).to_bytes(2, "big")


def test_verbatim_roundtrip_exact():
    rng = np.random.default_rng(5)
    t = np.arange(5000)
    sig = (3000 * np.sin(t / 20) + rng.integers(-200, 200, len(t))).astype(np.int64)
    enc = encode_flac(sig, sample_rate=8000, block_size=1024)
    assert codecs.sniff_format(enc) == "audio/flac"
    rate, out = decode_flac(enc)
    assert rate == 8000
    assert np.array_equal(out, sig.astype(np.float64))


def test_fixed_predictor_rice_frame():
    # smooth signal: order-2 fixed predictor leaves small residuals
    n = 256
    t = np.arange(n)
    sig = np.round(1000 * np.sin(t / 15)).astype(np.int64)
    res = [int(sig[i] - (2 * sig[i - 1] - sig[i - 2])) for i in range(2, n)]
    w = _W()
    w.put(0, 1)
    w.put(8 + 2, 6)   # FIXED order 2
    w.put(0, 1)
    w.put(int(sig[0]), 16)
    w.put(int(sig[1]), 16)
    w.put(0, 2)       # rice method 0 (4-bit params)
    w.put(0, 4)       # partition order 0
    w.put(3, 4)       # rice k = 3
    for e in res:
        w.rice(e, 3)
    payload = _streaminfo(8000, 1, 16, n) + _finish(_frame_header(n, 0, 4), w)
    rate, out = decode_flac(payload)
    assert rate == 8000
    assert np.array_equal(out, sig.astype(np.float64))


def test_lpc_frame():
    n = 192
    rng = np.random.default_rng(9)
    sig = np.cumsum(rng.integers(-50, 50, n)).astype(np.int64)
    order, coefs, shift, prec = 2, [3, -1], 1, 4
    res = [
        int(sig[i] - ((coefs[0] * sig[i - 1] + coefs[1] * sig[i - 2]) >> shift))
        for i in range(order, n)
    ]
    w = _W()
    w.put(0, 1)
    w.put(32 | (order - 1), 6)  # LPC order 2
    w.put(0, 1)
    w.put(int(sig[0]), 16)
    w.put(int(sig[1]), 16)
    w.put(prec - 1, 4)
    w.put(shift, 5)
    for c in coefs:
        w.put(c, prec)
    w.put(0, 2)
    w.put(0, 4)
    w.put(5, 4)
    for e in res:
        w.rice(e, 5)
    payload = _streaminfo(16000, 1, 16, n) + _finish(_frame_header(n, 0, 4), w)
    rate, out = decode_flac(payload)
    assert np.array_equal(out, sig.astype(np.float64))


def test_constant_subframe_and_raw_escape_partition():
    n = 64
    w = _W()
    w.put(0, 1)
    w.put(0, 6)       # CONSTANT
    w.put(0, 1)
    w.put(-123, 16)
    payload = _streaminfo(8000, 1, 16, n) + _finish(_frame_header(n, 0, 4), w)
    _, out = decode_flac(payload)
    assert np.array_equal(out, np.full(n, -123.0))

    # raw-escape rice partition: k=escape(15), then 5-bit width
    sig = np.arange(n, dtype=np.int64)  # order-1 residuals all 1
    w = _W()
    w.put(0, 1)
    w.put(8 + 1, 6)   # FIXED order 1
    w.put(0, 1)
    w.put(0, 16)      # warmup s[0]=0
    w.put(0, 2)
    w.put(0, 4)
    w.put(15, 4)      # escape
    w.put(6, 5)       # raw width 6
    for _ in range(n - 1):
        w.put(1, 6)
    payload = _streaminfo(8000, 1, 16, n) + _finish(_frame_header(n, 0, 4), w)
    _, out = decode_flac(payload)
    assert np.array_equal(out, sig.astype(np.float64))


def test_mid_side_stereo_mixdown():
    n = 128
    rng = np.random.default_rng(3)
    left = rng.integers(-5000, 5000, n).astype(np.int64)
    right = rng.integers(-5000, 5000, n).astype(np.int64)
    mid = (left + right) >> 1
    side = left - right
    w = _W()
    for vals, bits in ((mid, 16), (side, 17)):
        w.put(0, 1)
        w.put(1, 6)   # VERBATIM
        w.put(0, 1)
        for s in vals:
            w.put(int(s), bits)
    payload = _streaminfo(8000, 2, 16, n) + _finish(_frame_header(n, 10, 4), w)
    _, out = decode_flac(payload)
    assert np.allclose(out, (left + right) / 2.0)


def test_crc_corruption_and_truncation_are_loud():
    sig = np.arange(500, dtype=np.int64)
    enc = bytearray(encode_flac(sig))
    enc[-20] ^= 0xFF  # flip a byte inside the last frame body
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(enc))
    enc2 = encode_flac(sig)
    with pytest.raises(ValueError):
        decode_flac(enc2[: len(enc2) // 2])
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"fLaX" + bytes(40))


def test_audio_feature_kernel_flac_equals_wav(spark):
    from dataflow_python_etl_spark.operators.multimodal import extract_audio_features

    rng = np.random.default_rng(7)
    sig = rng.integers(-8000, 8000, 4096).astype(np.int64)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(sig.astype("<i2")))),
            (2, bytearray(encode_flac(sig))),
        ],
        "doc_id long, payload binary",
    )
    rows = extract_audio_features(df, window_bytes=1024, real_decode=True).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append((r.window_idx, r.rms, r.peak, r.zero_crossings))
    # identical samples through two containers → identical features
    assert sorted(by_asset[1]) == sorted(by_asset[2])
    assert len(by_asset[1]) == 4


def test_flac_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.integers(-(1 << 15), (1 << 15) - 1), min_size=1, max_size=700),
        st.sampled_from([64, 100, 4096]),
    )
    def prop(vals, bs):
        sig = np.array(vals, dtype=np.int64)
        rate, out = decode_flac(encode_flac(sig, sample_rate=44100, block_size=bs))
        assert rate == 44100
        assert np.array_equal(out, sig.astype(np.float64))

    prop()
