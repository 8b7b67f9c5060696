"""Video near-dup tier: per-frame aHash sets + exact-integer Jaccard
(q151; VERDICT r7 missing-item 2 — completes the near-dup matrix:
text, image, audio, video)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.codecs import encode_gif
from dataflow_python_etl_spark.operators.multimodal import (
    synthetic_video_corpus,
    video_frame_hashes,
    video_near_dup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _rng_frames(seed, n_frames=4, hw=16):
    rng = np.random.RandomState(seed)
    # <=256 global colors: grayscale RGB
    return [
        np.repeat(rng.randint(0, 256, size=(hw, hw, 1)), 3, axis=2).astype(
            np.uint8
        )
        for _ in range(n_frames)
    ]


def test_frame_hashes_fan_out_and_order_independence(spark):
    frames = _rng_frames(7)
    rows = [
        (1, bytearray(encode_gif(frames))),
        (2, bytearray(encode_gif(frames[::-1]))),
    ]
    df = spark.createDataFrame(rows, "video_id long, payload binary")
    got = video_frame_hashes(df).collect()
    by_vid = {}
    for r in got:
        by_vid.setdefault(r["video_id"], []).append(r["frame_hash"])
    assert len(by_vid[1]) == len(by_vid[2]) == 4  # one row per frame
    assert set(by_vid[1]) == set(by_vid[2])  # re-mux invariance
    assert by_vid[1] == by_vid[2][::-1]  # but order is preserved per video


def test_pair_jaccard_exact_integer_and_threshold(spark):
    """Jaccard is exact-integer: (1e6*common) div union, thresholded
    by cross-multiply — verified against a hand-computed overlap."""
    fa = _rng_frames(11, n_frames=4)
    fb = fa[:3] + _rng_frames(13, n_frames=2)  # 3 common, union 6 -> J=0.5
    fc = _rng_frames(17, n_frames=4)           # disjoint
    rows = [
        (1, bytearray(encode_gif(fa))),
        (2, bytearray(encode_gif(fb))),
        (3, bytearray(encode_gif(fc))),
    ]
    df = spark.createDataFrame(rows, "video_id long, payload binary")
    got = {
        (r["vid_a"], r["vid_b"]): (r["n_common"], r["jaccard_ppm"])
        for r in video_near_dup_pairs(df, min_jaccard_ppm=500_000).collect()
    }
    from dataflow_python_etl_spark.operators.dedup import unpersist_all

    unpersist_all()
    assert got == {(1, 2): (3, 500_000)}  # J = 0.5 lands ON the gate
    # a stricter gate excludes it
    got2 = video_near_dup_pairs(df, min_jaccard_ppm=600_000).collect()
    unpersist_all()
    assert got2 == []


def test_planted_corpus_structure(spark):
    """Corpus contract: reversed variants at Jaccard exactly 1.0,
    one-frame edits >= 5/7, inverted variants never paired with
    their base."""
    from dataflow_python_etl_spark.operators.dedup import unpersist_all
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, SF_DIR, "documents").limit(120)
    n_docs = docs.where(F.length("text") > 0).count()
    vids = synthetic_video_corpus(docs)
    pairs = video_near_dup_pairs(vids, min_jaccard_ppm=500_000).collect()
    unpersist_all()
    got = {(r["vid_a"], r["vid_b"]): r["jaccard_ppm"] for r in pairs}
    rev = {(a, b): j for (a, b), j in got.items() if a % 10 == 0 and b == a + 1}
    edit = {(a, b): j for (a, b), j in got.items() if a % 10 == 0 and b == a + 2}
    assert len(rev) == n_docs and set(rev.values()) == {1_000_000}
    assert len(edit) == n_docs and min(edit.values()) >= 714_285
    assert not any(a % 10 == 0 and b == a + 3 for (a, b) in got)
