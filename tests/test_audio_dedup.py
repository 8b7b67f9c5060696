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


def test_curate_corpus_audio_tier(spark):
    """The optional audio tier drops the higher-id doc of each clip
    near-dup pair, only decodes clips of docs that SURVIVED the text
    tiers, and keeps docs whose clips are genuinely distinct."""
    from dataflow_python_etl_spark.operators.corpus import curate_corpus
    from dataflow_python_etl_spark.operators.dedup import unpersist_all

    texts = {
        0: "benchmark leakage sentinel paragraph that decontamination must remove from training",
        1: "the archival record of mercantile shipping routes spans four centuries of ledgers",
        2: "volcanic soil chemistry shapes the mineral profile of every vineyard in the valley",
        3: "orbital mechanics textbooks derive the transfer ellipse from conservation principles",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    bench = spark.createDataFrame([(900, texts[0])], "doc_id long, text string")
    base = _rng_clip(41, amp=2000)
    audio = spark.createDataFrame(
        [
            # doc 0 is decontaminated away by the TEXT phase; its clip
            # is a LOWER-id gain twin of doc 1's — if the tier failed
            # to prune to survivors, pair (0,1) would wrongly drop 1
            (0, bytearray(encode_wav(base * 2))),
            (1, bytearray(encode_wav(base))),
            (2, bytearray(encode_wav(base * 4))),  # gain twin of 1
            (3, bytearray(encode_wav(_rng_clip(43)))),
        ],
        "doc_id long, payload binary",
    )
    out = curate_corpus(docs, audio=audio, decontaminate_against=bench)
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {1, 3}
    out_no_audio = curate_corpus(docs, decontaminate_against=bench)
    assert {r["doc_id"] for r in out_no_audio.select("doc_id").collect()} == {1, 2, 3}
    unpersist_all()


def test_cdc_segment_hashes_trim_and_far_properties():
    """Pure-kernel CDC contract: a trim at a non-grid offset shares
    its source's interior segments (multiset containment near 1), a
    byte-bijection of the same text shares ~nothing, and boundaries
    are content-defined (the hash multiset of equal content is
    offset-invariant by construction)."""
    import collections

    from dataflow_python_etl_spark.operators.multimodal import (
        cdc_segment_hashes,
    )

    text = (
        "volcanic soil chemistry shapes the mineral profile of every "
        "vineyard in the valley and the archival record of mercantile "
        "shipping routes spans four centuries of ledgers"
    )
    raw = np.array([ord(c) for c in text], dtype=np.int64)
    i = np.arange(4096, dtype=np.int64)
    base = (raw[i % len(raw)] * 31 + i * 17) % 256 - 128
    far = ((raw[i % len(raw)] * 7 + 13) * 31 + i * 17) % 256 - 128
    c0 = collections.Counter(cdc_segment_hashes(base))
    c1 = collections.Counter(cdc_segment_hashes(base[1024:3072]))
    c2 = collections.Counter(cdc_segment_hashes(far))

    def ppm(cx, cy):
        common = sum(min(c, cy[h]) for h, c in cx.items() if h in cy)
        return 1_000_000 * common // min(sum(cx.values()), sum(cy.values()))

    assert sum(c0.values()) >= 17  # base 131 / divisor 61 cuts densely
    assert ppm(c0, c1) >= 800_000
    assert ppm(c0, c2) < 300_000
    # empty input and shorter-than-window input behave
    assert cdc_segment_hashes(np.array([])) == []
    assert cdc_segment_hashes(np.array([1, 2, 3, 4, 5])) != []


def test_audio_containment_pairs_planted(spark):
    """Spark end-to-end through the REAL WAV decode: planted trims
    pair with their base above 800k ppm, far variants and cross-doc
    clips never appear, and WAV == FLAC segment multisets (the
    fingerprint is a property of the samples)."""
    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.operators.multimodal import (
        audio_cdc_segments,
        audio_containment_pairs,
        synthetic_audio_containment_corpus,
    )

    texts = [
        (7, "the archival record of mercantile shipping routes spans four centuries of ledgers"),
        (9, "orbital mechanics textbooks derive the transfer ellipse from conservation principles"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    clips = synthetic_audio_containment_corpus(docs)
    got = {
        (r["clip_a"], r["clip_b"]): r["containment_ppm"]
        for r in audio_containment_pairs(clips).collect()
    }
    assert set(got) == {(70, 71), (90, 91)}
    assert all(v >= 800_000 for v in got.values())

    # container independence: the same clip as WAV and FLAC yields the
    # same segment multiset through the real per-container decoders
    clip = _rng_clip(61, amp=3000)
    rows = [
        (1, bytearray(encode_wav(clip))),
        (2, bytearray(encode_flac(clip))),
    ]
    df = spark.createDataFrame(rows, "audio_id long, payload binary")
    segs = audio_cdc_segments(df).collect()
    by_id = {}
    for r in segs:
        by_id.setdefault(r["audio_id"], []).append(r["seg_hash"])
    assert sorted(by_id[1]) == sorted(by_id[2]) and by_id[1]
    unpersist_all()


def test_cdc_chunked_equals_batch_any_split():
    """THE chunked-CDC invariant (VERDICT r8 #3): for any ordered
    split of a clip into chunks, push*;finish emits exactly the batch
    cdc_segment_hashes multiset — chunk boundaries are invisible to
    the math (tail carries the W-1 window overlap, the open segment's
    positional weights continue across pushes). Adversarial splits
    included: 1-sample chunks, splits inside the warm-up window,
    empty chunks, and a split landing exactly on a cut."""
    import collections

    import numpy as np

    from dataflow_python_etl_spark.operators.multimodal import (
        cdc_finish,
        cdc_push_chunk,
        cdc_segment_hashes,
        cdc_state_new,
    )

    rng = np.random.RandomState(7)

    def chunked(arr, cut_points):
        st = cdc_state_new()
        out = []
        prev = 0
        for c in list(cut_points) + [len(arr)]:
            st, hs = cdc_push_chunk(st, arr[prev:c])
            out.extend(hs)
            prev = c
        out.extend(cdc_finish(st))
        return collections.Counter(out)

    for n in (0, 1, 3, 7, 8, 9, 64, 500, 4096):
        arr = (rng.randint(-32768, 32768, size=n)).astype(np.float64)
        want = collections.Counter(cdc_segment_hashes(arr))
        splits = [
            [],                                   # single push
            list(range(1, n)),                    # 1-sample chunks
            [n // 3, 2 * n // 3] if n >= 3 else [],
            [1, 2, 3, 5, 6] if n >= 7 else [],    # inside warm-up
            [n // 2, n // 2] if n >= 2 else [],   # empty chunk
        ]
        for cps in splits:
            got = chunked(arr, cps)
            assert got == want, (n, cps, got, want)

    # split exactly on a cut boundary: find a cut in a long clip by
    # diffing single-push state, then split there
    arr = (rng.randint(-32768, 32768, size=2048)).astype(np.float64)
    want = collections.Counter(cdc_segment_hashes(arr))
    for cut_at in (61, 500, 1024):
        assert chunked(arr, [cut_at]) == want

    # constant zeros: rolling hash is 0 everywhere -> cut after every
    # warm-up position, all segments shorter than MIN_SEG drop
    zeros = np.zeros(100)
    assert chunked(zeros, [13, 50]) == collections.Counter(
        cdc_segment_hashes(zeros)
    )
