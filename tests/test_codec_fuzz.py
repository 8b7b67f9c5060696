"""Decoder robustness: arbitrary bytes — including buffers that start
with a valid magic — must raise ValueError/NotImplementedError,
never hang, crash the interpreter, or return garbage pixels/samples.
Every decoder is total over its declared formats and LOUD outside
them (the operators.codecs module contract)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataflow_python_etl_spark.operators import codecs

MAGICS = [
    b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b"GIF87a",
    b"BM", b"P6", b"P5", b"fLaC", b"RIFF", b"RIFFxxxxWAVE", b"II*\x00", b"MM\x00*",
]


@settings(max_examples=120, deadline=None)
@given(st.sampled_from(MAGICS), st.binary(max_size=400))
def test_image_decoders_never_garble(prefix, junk):
    payload = prefix + junk
    try:
        fmt, px = codecs.decode_image(payload)
    except (ValueError, NotImplementedError):
        return
    # a successful decode of fuzz bytes must at least be well-formed
    assert isinstance(px, np.ndarray) and px.size >= 1


@settings(max_examples=80, deadline=None)
@given(st.sampled_from([b"", b"fLaC", b"RIFF", b"RIFFxxxxWAVE"]), st.binary(max_size=400))
def test_audio_decoders_never_garble(prefix, junk):
    payload = prefix + junk
    try:
        rate, samples = codecs.decode_audio(payload)
    except (ValueError, NotImplementedError):
        return
    assert rate > 0 and isinstance(samples, np.ndarray)


def test_truncations_of_valid_payloads_are_loud():
    """Every strict prefix of a real payload either raises or (for
    container formats whose trailing bytes are optional) decodes to
    the same pixels — never to silently different content."""
    img = (np.arange(96, dtype=np.uint8).reshape(4, 8, 3) * 2)
    sig = np.arange(300, dtype=np.int64)
    payloads = [
        ("png", codecs.encode_png(img), codecs.decode_png),
        ("jpeg", codecs.encode_jpeg(img), codecs.decode_jpeg),
        ("gif", codecs.encode_gif(img), codecs.decode_gif),
        ("ppm", codecs.encode_ppm(img), codecs.decode_pnm),
        ("tiff", codecs.encode_tiff(img), codecs.decode_tiff),
        ("tiff-pb", codecs.encode_tiff(img, compression=32773), codecs.decode_tiff),
        ("flac", codecs.encode_flac(sig), codecs.decode_flac),
        ("wav", codecs.encode_wav(sig.astype("<i2")), codecs.decode_wav),
    ]
    for name, payload, decode in payloads:
        want = decode(payload)
        for cut in range(10, len(payload) - 1, max(len(payload) // 23, 1)):
            try:
                got = decode(payload[:cut])
            except (ValueError, NotImplementedError):
                continue
            if isinstance(want, tuple):
                assert got[0] == want[0] and np.array_equal(got[1], want[1]), (name, cut)
            else:
                assert np.array_equal(got, want), (name, cut)
