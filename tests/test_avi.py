"""MJPEG AVI container (VERDICT r9 #2): the video tier becomes
container-independent the way WAV==FLAC made audio — same frames as
animated GIF and as MJPEG AVI must fingerprint identically through
the real decode path, so a re-containerized duplicate is caught at
Jaccard 1.0. The AVI walk reuses the baseline-JPEG decoder per frame;
JPEG is lossy, so the pinned equality is the 64-bit aHash (8x8 block
means), with fixtures whose 8-px-aligned high-contrast tiles keep
every aHash bit far from its threshold under quality-95 coding."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataflow_python_etl_spark.operators import codecs
from dataflow_python_etl_spark.operators.codecs import (
    decode_avi_frames,
    decode_jpeg,
    decode_video_frames,
    encode_avi,
    encode_gif,
    encode_jpeg,
    sniff_format,
)


def _tile_frames(n=4, hw=64):
    """(hw, hw, 3) frames of 8x8-aligned 0/255 tiles — aHash bits sit
    at the extremes, immune to JPEG quantization noise."""
    out = []
    for i in range(n):
        r = np.random.RandomState(100 + i)
        tiles = r.randint(0, 2, (hw // 8, hw // 8)) * 255
        g = np.kron(tiles, np.ones((8, 8))).astype(np.uint8)
        out.append(np.dstack([g, g, g]))
    return out


def test_avi_roundtrip_matches_direct_jpeg():
    """decode(encode_avi(frames)) == decode_jpeg(encode_jpeg(frame))
    per frame — the container adds nothing and loses nothing beyond
    the JPEG codec itself."""
    frames = _tile_frames(5)
    avi = encode_avi(frames, fps=5)
    assert sniff_format(avi) == "video/x-msvideo"
    dec = decode_avi_frames(avi)
    assert len(dec) == 5
    for f, d in zip(frames, dec):
        assert np.array_equal(d, decode_jpeg(encode_jpeg(f, quality=95)))


def test_avi_loud_gates():
    frames = _tile_frames(2)
    avi = encode_avi(frames)
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_frames(b"RIFF\x08\x00\x00\x00WAVExxxx")
    with pytest.raises(ValueError):
        decode_avi_frames(avi[:40])  # truncated mid-header
    with pytest.raises(NotImplementedError, match="not MJPEG"):
        decode_avi_frames(avi.replace(b"vidsMJPG", b"vidsH264"))
    with pytest.raises(ValueError, match="unsupported video container"):
        decode_video_frames(b"\x00" * 32)


def test_avi_truncation_never_garbles():
    """Every strict prefix either raises or decodes to a PREFIX of
    the full frame list (a cut at a chunk boundary loses trailing
    frames, never alters decoded ones) — the fuzz-contract shape of
    test_codec_fuzz, adapted to a multi-frame container."""
    frames = _tile_frames(3)
    avi = encode_avi(frames)
    want = decode_avi_frames(avi)
    for cut in range(12, len(avi) - 1, max(len(avi) // 37, 1)):
        try:
            got = decode_avi_frames(avi[:cut])
        except (ValueError, NotImplementedError):
            continue
        assert len(got) <= len(want)
        for g, w in zip(got, want):
            assert np.array_equal(g, w), cut


@settings(max_examples=80, deadline=None)
@given(
    st.sampled_from([b"", b"RIFF", b"RIFFxxxxAVI ", b"GIF89a"]),
    st.binary(max_size=400),
)
def test_video_decoders_never_garble(prefix, junk):
    payload = prefix + junk
    try:
        frames = decode_video_frames(payload)
    except (ValueError, NotImplementedError):
        return
    assert frames and all(isinstance(f, np.ndarray) for f in frames)


def test_gif_avi_container_independence_through_spark(spark):
    """THE marquee pin (the video twin of WAV==FLAC): identical
    frames shipped as animated GIF and as MJPEG AVI produce the SAME
    per-frame hash sequence through video_frame_hashes, and
    video_near_dup_pairs flags the re-containerized copy at exactly
    Jaccard 1.0."""
    from dataflow_python_etl_spark.operators.multimodal import (
        video_frame_hashes,
        video_near_dup_pairs,
    )

    frames = _tile_frames(4)
    other = _tile_frames(3, hw=64)
    # shift the unrelated clip's randomness so it shares no frames
    other = [255 - f for f in other]
    rows = [
        (1, bytearray(encode_gif(frames))),
        (2, bytearray(encode_avi(frames))),
        (3, bytearray(encode_avi(other))),
    ]
    df = spark.createDataFrame(rows, "video_id long, payload binary")
    got = video_frame_hashes(df).collect()
    seqs: dict[int, list[int]] = {}
    for r in got:
        seqs.setdefault(r["video_id"], []).append(r["frame_hash"])
    assert seqs[1] == seqs[2]  # GIF == AVI, order included
    assert not set(seqs[1]) & set(seqs[3])
    pairs = video_near_dup_pairs(df, min_jaccard_ppm=500_000).collect()
    assert [(p["vid_a"], p["vid_b"], p["jaccard_ppm"]) for p in pairs] == [
        (1, 2, 1_000_000)
    ]


def test_sample_frames_real_decode_avi(spark):
    """sample_frames(real_decode=True) accepts MJPEG AVI and yields
    the same sampled frame pixels as the GIF twin of the clip."""
    from dataflow_python_etl_spark.operators.codecs import decode_pnm
    from dataflow_python_etl_spark.operators.multimodal import sample_frames

    frames = _tile_frames(6)
    rows = [(1, bytearray(encode_avi(frames)))]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = sample_frames(df, id_col="asset_id", n_frames=3, real_decode=True).collect()
    assert [r["frame_idx"] for r in got] == [0, 1, 2]
    # sampled pixels are the decoded-JPEG frames at the picked indices
    picks = np.unique(np.linspace(0, 5, 3).round().astype(int))
    for r, fi in zip(got, picks):
        want = decode_jpeg(encode_jpeg(frames[fi], quality=95))
        assert np.array_equal(decode_pnm(bytes(r["frame"])), want)
