"""Audio near-dup tier: portable energy-profile fingerprint over REAL
decoded samples + pigeonhole Hamming banding (q150; VERDICT r7
missing-item 1 — the audio leg of the near-dup matrix)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.codecs import encode_flac, encode_wav
from dataflow_python_etl_spark.operators.multimodal import (
    _AUDIO_GAIN,
    audio_fingerprint64,
    audio_near_dup_pairs,
    audio_phash,
    synthetic_audio_corpus,
)

SF_DIR = "/root/testdata/sf0.001"


def _rng_clip(seed, n=2048, amp=4000):
    rng = np.random.RandomState(seed)
    return rng.randint(-amp, amp, size=n).astype(np.int64)


def test_fingerprint_gain_invariance_exact():
    """The defining property, exact by construction: a global gain
    scales every window energy by g^2, which cannot flip a strict
    comparison between two energies — zero bit flips, not 'few'."""
    base = _rng_clip(7, amp=2000)
    h0 = audio_fingerprint64(base)
    for g in (2, 3, 4, 8):
        assert audio_fingerprint64(base * g) == h0


def test_fingerprint_local_edit_bounded_and_far_clip_far():
    """A content swap of two windows changes exactly two energies;
    each energy feeds exactly two successive-difference bits, so
    hamming <= 4 by construction. An unrelated clip is far."""
    base = _rng_clip(11)
    win = 2048 // 64
    swapped = base.copy()
    a = swapped[13 * win : 14 * win].copy()
    swapped[13 * win : 14 * win] = swapped[37 * win : 38 * win]
    swapped[37 * win : 38 * win] = a
    d = bin(
        (audio_fingerprint64(base) ^ audio_fingerprint64(swapped))
        & ((1 << 64) - 1)
    ).count("1")
    assert 0 < d <= 4
    far = _rng_clip(99)
    d_far = bin(
        (audio_fingerprint64(base) ^ audio_fingerprint64(far)) & ((1 << 64) - 1)
    ).count("1")
    assert d_far >= 15


def test_fingerprint_guards_and_half_sample_exactness():
    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint64(np.arange(63))
    # a stereo mixdown produces exact .5 values; the x2 lift keeps the
    # fingerprint exact (and the uniform x2 cannot move any bit)
    clip = _rng_clip(13).astype(np.float64)
    halves = clip + 0.5
    assert isinstance(audio_fingerprint64(halves), int)


def test_audio_phash_container_independent(spark):
    """The fingerprint is a property of the SAMPLES: the same clip
    encoded as WAV and FLAC (both lossless) hashes identically
    through the real per-container decoders."""
    clip = _rng_clip(29, amp=3000)
    rows = [
        (1, bytearray(encode_wav(clip))),
        (2, bytearray(encode_flac(clip))),
    ]
    df = spark.createDataFrame(rows, "audio_id long, payload binary")
    got = {r["audio_id"]: r["phash"] for r in audio_phash(df).collect()}
    assert got[1] == got[2]


def test_banded_pairs_equal_brute_force_two_geometries(spark):
    """Pigeonhole exactness pin (the q25/q59/q143 discipline, for
    audio): banded pairs at radius 6 match brute-force all-pairs
    Hamming exactly, at BOTH 8-band and 16-band geometries."""
    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, SF_DIR, "documents").limit(150)
    clips = synthetic_audio_corpus(docs)
    sig = audio_phash(clips)
    hashes = {r["audio_id"]: r["phash"] for r in sig.collect()}
    ids = sorted(hashes)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                brute.add((a, b, d))
    for n_bands in (8, 16):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in audio_near_dup_pairs(
                clips, max_hamming=6, n_bands=n_bands
            ).collect()
        }
        assert got == brute, f"n_bands={n_bands}"
    unpersist_all()


def test_planted_structure_and_discriminative_corpus(spark):
    """Planted variants behave per the corpus contract: every doc's
    gain variant pairs with its base at hamming 0, the window-swap
    variant pairs within radius <= 4, and the far variant never pairs
    with its own base. The cross-doc pair volume stays proportional
    to REAL text duplication (the global-mean fingerprint this
    replaced put ~6% of all cross-clip pairs inside radius 6)."""
    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, SF_DIR, "documents").limit(200)
    n_docs = docs.where(F.length("text") > 0).count()
    clips = synthetic_audio_corpus(docs)
    pairs = audio_near_dup_pairs(clips, max_hamming=6, n_bands=8).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    base_gain = {
        (a, b): h for (a, b), h in got.items() if a % 10 == 0 and b == a + 1
    }
    base_swap = {
        (a, b): h for (a, b), h in got.items() if a % 10 == 0 and b == a + 2
    }
    assert len(base_gain) == n_docs and set(base_gain.values()) == {0}
    assert len(base_swap) == n_docs and max(base_swap.values()) <= 4
    assert not any(
        a % 10 == 0 and b == a + 3 for (a, b) in got
    ), "far variant paired with its own base"
    # cross-doc pairs stay a small multiple of the planted volume
    cross = [(a, b) for (a, b) in got if a // 10 != b // 10]
    assert len(cross) <= 2 * n_docs
    unpersist_all()
