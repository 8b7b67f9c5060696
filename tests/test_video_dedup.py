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


def test_curate_corpus_video_tier(spark):
    """The optional video tier drops the higher-id doc of each
    frame-hash-set near-dup pair (re-ordered copies score Jaccard
    1.0), only decodes clips of docs that SURVIVED the text tiers,
    and keeps docs whose clips are genuinely distinct."""
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
    fa = _rng_frames(51)
    videos = spark.createDataFrame(
        [
            # doc 0 is decontaminated away by the TEXT phase; its clip
            # is a LOWER-id re-mux of doc 1's — if the tier failed to
            # prune to survivors, pair (0,1) would wrongly drop doc 1
            (0, bytearray(encode_gif(fa[::-1]))),
            (1, bytearray(encode_gif(fa))),
            (2, bytearray(encode_gif(fa[::-1]))),  # re-mux twin of 1
            (3, bytearray(encode_gif(_rng_frames(53)))),
        ],
        "doc_id long, payload binary",
    )
    out = curate_corpus(docs, videos=videos, decontaminate_against=bench)
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {1, 3}
    out_no_vid = curate_corpus(docs, decontaminate_against=bench)
    assert {r["doc_id"] for r in out_no_vid.select("doc_id").collect()} == {1, 2, 3}
    unpersist_all()
