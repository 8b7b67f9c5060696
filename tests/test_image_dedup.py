"""Image near-dup tier: portable aHash over REAL decoded pixels +
pigeonhole Hamming banding (q143; VERDICT r6 directive 2)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.codecs import (
    encode_png,
    encode_ppm,
    encode_tiff,
)
from dataflow_python_etl_spark.operators.multimodal import (
    ahash64,
    image_near_dup_pairs,
    image_phash,
    synthetic_image_corpus,
)

SF_DIR = "/root/testdata/sf0.001"


def _rng_img(seed, h=32, w=32, channels=None):
    rng = np.random.RandomState(seed)
    shape = (h, w) if channels is None else (h, w, channels)
    return rng.randint(0, 256, size=shape).astype(np.uint8)


def test_ahash_brightness_invariance_exact():
    """aHash's defining property, exact by the integer cross-multiply
    construction: adding a constant to EVERY pixel cancels on both
    sides of s*N > T*n — zero bit flips, not 'few'."""
    base = _rng_img(7).astype(np.int64)
    h0 = ahash64(base.astype(np.uint8))
    for shift in (1, 9, 100, 255):
        assert ahash64(((base + shift) % 256).astype(np.uint8)) == h0 or (
            # wrap-around breaks constancy; only non-wrapping shifts
            # are true brightness shifts
            (base + shift).max() > 255
        )
    # guaranteed non-wrapping shift
    dim = (base // 2).astype(np.uint8)
    assert ahash64(dim + 50) == ahash64(dim)


def test_ahash_small_edit_small_hamming_and_inversion_far():
    base = _rng_img(11)
    edited = base.copy()
    edited[0, 0] = (int(edited[0, 0]) + 128) % 256
    edited[16, 16] = (int(edited[16, 16]) + 128) % 256
    d = bin((ahash64(base) ^ ahash64(edited)) & ((1 << 64) - 1)).count("1")
    assert d <= 2  # one pixel per touched 4x4 block
    inv = (255 - base.astype(np.int64)).astype(np.uint8)
    d_inv = bin((ahash64(base) ^ ahash64(inv)) & ((1 << 64) - 1)).count("1")
    assert d_inv >= 50  # complement modulo mean-ties


def test_ahash_rgb_and_nonsquare_and_guards():
    rgb = _rng_img(13, h=40, w=24, channels=3)
    h_rgb = ahash64(rgb)
    # luma weights: a pure-gray RGB image hashes like its gray plane
    gray = _rng_img(17)
    as_rgb = np.stack([gray, gray, gray], axis=2)
    assert ahash64(as_rgb) == ahash64(gray)
    # alpha ignored
    rgba = np.concatenate([rgb, _rng_img(19, 40, 24, 1)], axis=2)
    assert ahash64(rgba) == h_rgb
    with pytest.raises(ValueError, match="too small"):
        ahash64(_rng_img(23, h=4, w=4))
    with pytest.raises(ValueError, match="expected"):
        ahash64(np.zeros((8, 8, 5), dtype=np.uint8))


def test_image_phash_format_independent(spark):
    """The fingerprint is a property of the PIXELS: the same image
    encoded as PNG, PPM, and TIFF (all lossless) hashes identically
    through the real per-format decoders."""
    img = _rng_img(29, channels=3)
    rows = [
        (1, bytearray(encode_png(img))),
        (2, bytearray(encode_ppm(img))),
        (3, bytearray(encode_tiff(img))),
    ]
    df = spark.createDataFrame(rows, "image_id long, payload binary")
    got = {r["image_id"]: r["phash"] for r in image_phash(df).collect()}
    assert got[1] == got[2] == got[3]


def test_banded_pairs_equal_brute_force_two_geometries(spark):
    """Pigeonhole exactness pin (the q25/q59 discipline, for images):
    banded pairs at radius 6 match brute-force all-pairs Hamming
    exactly, at BOTH 8-band and 16-band geometries — band width
    changes candidate generation, never the result."""
    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, SF_DIR, "documents")
    imgs = synthetic_image_corpus(docs)
    sig = image_phash(imgs)
    hashes = {r["image_id"]: r["phash"] for r in sig.collect()}
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
            for r in image_near_dup_pairs(
                imgs, max_hamming=6, n_bands=n_bands
            ).collect()
        }
        assert got == brute, f"n_bands={n_bands}"
    unpersist_all()
    # planted structure: every doc's brightness variant pairs with its
    # base at hamming 0; a doc's INVERTED variant never pairs with its
    # own base/bright/edit variants (inversions of two near-identical
    # docs may legitimately pair with each other — inversion preserves
    # mutual distances)
    doc_ids = {r[0] for r in docs.select("doc_id").collect()}
    zero = {(a, b) for a, b, d in brute if d == 0}
    assert all((i * 10, i * 10 + 1) in zero for i in doc_ids)
    pairs_only = {(a, b) for a, b, _ in brute}
    assert all(
        (i * 10 + v, i * 10 + 3) not in pairs_only
        for i in doc_ids
        for v in range(3)
    )


def test_banded_pairs_validation():
    from dataflow_python_etl_spark.operators.dedup import hamming_banded_pairs

    with pytest.raises(ValueError, match="exactness"):
        hamming_banded_pairs(None, "id", "sig", max_hamming=8, n_bands=8)
    with pytest.raises(ValueError, match="divide evenly"):
        hamming_banded_pairs(None, "id", "sig", max_hamming=3, n_bands=7)


def test_curate_corpus_image_tier(spark):
    """The optional image tier drops the higher-id doc of each image
    near-dup pair, only consults images of docs that SURVIVED the text
    tiers, and keeps docs whose images are genuinely distinct."""
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
    base = _rng_img(31)
    dim = (base // 2).astype(np.uint8)
    images = spark.createDataFrame(
        [
            # doc 0 is decontaminated away by the TEXT phase; its image
            # is a LOWER-id twin of doc 1's — if the tier failed to
            # prune to survivors, pair (0,1) would wrongly drop doc 1
            (0, bytearray(encode_png(dim + 5))),
            (1, bytearray(encode_png(dim))),
            (2, bytearray(encode_png(dim + 9))),  # brightness twin of 1
            (3, bytearray(encode_png(_rng_img(37)))),
        ],
        "doc_id long, payload binary",
    )
    out = curate_corpus(
        docs, images=images, image_max_hamming=6, decontaminate_against=bench
    )
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {1, 3}
    # without the image tier, 1/2/3 all survive (texts are distinct)
    out_no_img = curate_corpus(docs, decontaminate_against=bench)
    assert {r["doc_id"] for r in out_no_img.select("doc_id").collect()} == {1, 2, 3}
    unpersist_all()


def test_banded_pairs_combine_exact_and_validated(spark):
    """The Manku-style band-COMBINATION geometry (key = k bands
    concatenated) returns exactly the single-band result — exact by
    pigeonhole whenever max_hamming <= n_bands - k — while shrinking
    the collision key space from 2^8 to 2^16 per key (the fix for the
    q150 probe's superlinear candidate growth at 80k clips)."""
    from dataflow_python_etl_spark.operators.dedup import hamming_banded_pairs

    rng = np.random.RandomState(17)
    base = int(rng.randint(0, 1 << 62))
    rows = []
    for i in range(16):
        v = base
        for bit in rng.choice(64, size=i, replace=False):
            v ^= 1 << int(bit)
        rows.append((i, v - (1 << 63) if v >= (1 << 63) else v))
    sig = spark.createDataFrame(rows, "id: long, sig: long")
    want = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hamming_banded_pairs(sig, "id", "sig", 6, 8, combine=1).collect()
    }
    for n_bands, k in ((8, 2), (16, 2), (16, 3)):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in hamming_banded_pairs(
                sig, "id", "sig", 6, n_bands, combine=k
            ).collect()
        }
        assert got == want and want, (n_bands, k)
    # the radius-5 workload unlocks combine=3 on the DEFAULT 8-band
    # geometry (C(8,3)=56 24-bit keys — another ~2^8/2 collision-mass
    # cut over combine=2 for 2x index rows): still brute-force-equal
    want5 = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hamming_banded_pairs(sig, "id", "sig", 5, 8, combine=1).collect()
    }
    got5 = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hamming_banded_pairs(sig, "id", "sig", 5, 8, combine=3).collect()
    }
    assert got5 == want5 and want5
    # exactness bound: radius 7 over 8 bands leaves no clean PAIR
    with pytest.raises(ValueError, match="exactness"):
        hamming_banded_pairs(sig, "id", "sig", 7, 8, combine=2)
    # ... and radius 6 over 8 bands leaves no clean 3-combination
    with pytest.raises(ValueError, match="exactness"):
        hamming_banded_pairs(sig, "id", "sig", 6, 8, combine=3)
