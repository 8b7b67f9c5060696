"""Streaming multimodal ingest: online image near-dup filtering
(VERDICT r7 gap 3 — `stream_dedup_ingest` covered text only; a live
crawl could not dedup images online)."""

from __future__ import annotations

import time

import numpy as np
from pyspark.sql import functions as F

from dataflow_python_etl_spark.operators.codecs import encode_png
from dataflow_python_etl_spark.streaming.pipeline import stream_image_dedup_ingest


def _img(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    # pixels in [0, 200]: +10 stays non-wrapping, a TRUE brightness shift
    return rng.randint(0, 200, size=(32, 32)).astype(np.uint8)


def _rows(spark, *pairs):
    data = [(i, bytearray(encode_png(px))) for i, px in pairs]
    return spark.createDataFrame(data, "image_id: long, payload: binary")


def _poll_ids(spark, path, want, timeout=120.0, id_col="image_id", q=None):
    """Delegates to the shared INSTRUMENTED poll (VERDICT r8 #2):
    pass ``q`` (a LIVE query only — never after q.stop()) so the
    loop re-triggers the source listing and a timeout raises with
    status + recent progress instead of a bare list mismatch. The
    old 30 s deadline was the round-8 flake's exposure: a loaded
    500-test JVM can stall a decode-heavy micro-batch past it."""
    from tests.streaming_poll import await_sink

    return await_sink(spark, q, path, id_col, want, timeout=timeout)


def test_stream_image_dedup_ingest_online_filtering(spark, tmp_path):
    """In-batch perceptual dups, cross-batch dups (vs the persisted
    fingerprint index), and brightness-shift invariance — all decided
    ONLINE, batch payloads decoded once, corpus payloads never
    re-read."""
    a, b, c, d = _img(1), _img(2), _img(3), _img(4)
    a_bright = a + 10  # aHash-identical by construction (hamming 0)
    src = str(tmp_path / "imgs_in")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: 2 is a brightness-shifted copy of 1 (in-batch dup)
    _rows(spark, (1, a), (2, a_bright), (3, b)).coalesce(1).write.parquet(src)
    q = stream_image_dedup_ingest(
        spark.readStream.schema("image_id long, payload binary").parquet(src),
        corpus,
        index,
        ckpt,
    )
    q.processAllAvailable()
    assert _poll_ids(spark, corpus, [1, 3], q=q) == [1, 3]

    # batch 2: 11 copies corpus image 3 (cross-batch, via the index);
    # 12 unique; 13 copies 12 in-batch; 0 copies corpus image 1
    # despite the LOWER id — the corpus is immutable, 0 must drop
    _rows(spark, (0, a), (11, b), (12, c), (13, c)).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    assert _poll_ids(spark, corpus, [1, 3, 12], q=q) == [1, 3, 12]

    # batch 3: replayed id anti-joined away; fresh image lands
    _rows(spark, (12, c), (14, d)).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    got3 = _poll_ids(spark, corpus, [1, 3, 12, 14], q=q)
    q.stop()
    assert got3 == [1, 3, 12, 14]

    # the persisted index covers exactly the corpus survivors, one
    # 16-byte fingerprint row each — the probe side of every future batch
    idx = spark.read.parquet(index)
    assert {r["image_id"] for r in idx.collect()} == {1, 3, 12, 14}
    assert set(idx.columns) == {"image_id", "phash"}


def test_stream_image_ingest_lost_index_rebuilt_and_missing_corpus_refused(
    spark, tmp_path
):
    """A lost index is rebuilt FROM the corpus before use (a partial
    index would blind later batches); a lost CORPUS with surviving
    artifacts fails loudly instead of rebuilding from one batch."""
    import shutil

    a, b = _img(21), _img(22)
    src = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    _rows(spark, (1, a)).coalesce(1).write.parquet(src)
    q = stream_image_dedup_ingest(
        spark.readStream.schema("image_id long, payload binary").parquet(src),
        corpus,
        index,
        str(tmp_path / "ckpt1"),
    )
    q.processAllAvailable()
    q.stop()

    # index vanishes; the next batch must still see image 1 as a dup
    shutil.rmtree(index)
    _rows(spark, (2, a + 5), (3, b)).coalesce(1).write.mode("append").parquet(src)
    q = stream_image_dedup_ingest(
        spark.readStream.schema("image_id long, payload binary").parquet(src),
        corpus,
        index,
        str(tmp_path / "ckpt1"),
    )
    q.processAllAvailable()
    q.stop()
    assert _poll_ids(spark, corpus, [1, 3]) == [1, 3]
    # rebuilt index covers the full corpus, not just the last batch
    assert {r["image_id"] for r in spark.read.parquet(index).collect()} == {1, 3}

    # corpus vanishes; restart must refuse
    shutil.rmtree(corpus)
    _rows(spark, (4, b + 5)).coalesce(1).write.mode("append").parquet(src)
    q = stream_image_dedup_ingest(
        spark.readStream.schema("image_id long, payload binary").parquet(src),
        corpus,
        index,
        str(tmp_path / "ckpt1"),
    )
    try:
        q.processAllAvailable()
        raise AssertionError("expected the restarted sink to fail")
    except Exception as e:
        assert "refusing to rebuild" in str(e)
    finally:
        q.stop()


def test_stream_audio_dedup_ingest_via_fingerprint_fn(spark, tmp_path):
    """The sink is kernel-agnostic: AUDIO clips stream through the same
    guards/index/banding machinery with ``fingerprint_fn=audio_phash``
    — a gain-scaled copy drops (hamming 0 by the strict-comparison
    construction), in-batch and cross-batch, and the persisted index
    keys on the caller's ``id_col``."""
    from dataflow_python_etl_spark.operators.codecs import encode_wav
    from dataflow_python_etl_spark.operators.multimodal import audio_phash

    def _clip(seed, n=2048, amp=2000):
        rng = np.random.RandomState(seed)
        return rng.randint(-amp, amp, size=n).astype(np.int64)

    def _arows(*pairs):
        data = [(i, bytearray(encode_wav(s))) for i, s in pairs]
        return spark.createDataFrame(data, "audio_id: long, payload: binary")

    a, b, c = _clip(31), _clip(32), _clip(33)
    src = str(tmp_path / "clips_in")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    # batch 1: clip 2 is a gain x4 copy of 1 (in-batch dup); 3 unique
    _arows((1, a), (2, a * 4), (3, b)).coalesce(1).write.parquet(src)
    q = stream_image_dedup_ingest(
        spark.readStream.schema("audio_id long, payload binary").parquet(src),
        corpus,
        index,
        str(tmp_path / "ckpt"),
        id_col="audio_id",
        fingerprint_fn=audio_phash,
    )
    q.processAllAvailable()
    assert _poll_ids(spark, corpus, [1, 3], id_col="audio_id", q=q) == [1, 3]

    # batch 2: 11 is a gain x2 copy of corpus clip 3 (cross-batch, via
    # the persisted index — clip 3's PAYLOAD is never re-read); 12 fresh
    _arows((11, b * 2), (12, c)).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    got = _poll_ids(spark, corpus, [1, 3, 12], id_col="audio_id", q=q)
    q.stop()
    assert got == [1, 3, 12]

    idx = spark.read.parquet(index)
    assert {r["audio_id"] for r in idx.collect()} == {1, 3, 12}
    assert set(idx.columns) == {"audio_id", "phash"}


def test_hamming_incremental_probe_matches_batch_form(spark):
    """hamming_banded_pairs_incremental == the batch form restricted
    to pairs touching a new id (the exactness contract the streaming
    sink relies on), and a no-corpus call degrades to in-batch pairs."""
    from dataflow_python_etl_spark.operators.dedup import (
        hamming_banded_pairs,
        hamming_banded_pairs_incremental,
    )

    rng = np.random.RandomState(5)
    base = int(rng.randint(0, 1 << 62))
    sigs = {}
    for i in range(8):
        v = base
        for bit in rng.choice(64, size=i, replace=False):
            v ^= 1 << int(bit)
        sigs[i] = v - (1 << 63) if v >= (1 << 63) else v
    rows = [(i, s) for i, s in sigs.items()]
    corpus = spark.createDataFrame(rows[:5], "id: long, sig: long")
    new = spark.createDataFrame(rows[5:], "id: long, sig: long")
    both = corpus.union(new)

    full = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hamming_banded_pairs(both, "id", "sig", 6, 8).collect()
    }
    want = {t for t in full if t[0] >= 5 or t[1] >= 5}
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hamming_banded_pairs_incremental(
            corpus, new, "id", "sig", 6, 8
        ).collect()
    }
    assert got == want and want  # non-vacuous
    got_solo = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hamming_banded_pairs_incremental(
            None, new, "id", "sig", 6, 8
        ).collect()
    }
    assert got_solo == {t for t in full if t[0] >= 5 and t[1] >= 5}


def _frames(seed, n_frames=4, hw=16):
    rng = np.random.RandomState(seed)
    return [
        np.repeat(rng.randint(0, 256, size=(hw, hw, 1)), 3, axis=2).astype(np.uint8)
        for _ in range(n_frames)
    ]


def test_stream_video_dedup_ingest_online_filtering(spark, tmp_path):
    """The set-fingerprint sink: re-ordered copies (Jaccard 1.0) and
    partial-overlap near-dups (3-of-4 frames, J=0.6) are dropped
    ONLINE — in-batch, and cross-batch via the persisted (video_id,
    frame_hash, n) index without re-reading corpus payloads."""
    from dataflow_python_etl_spark.operators.codecs import encode_gif
    from dataflow_python_etl_spark.streaming.pipeline import (
        stream_video_dedup_ingest,
    )

    fa, fb, fc, fd = _frames(71), _frames(72), _frames(73), _frames(74)
    src = str(tmp_path / "vids_in")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    def _vrows(*pairs):
        data = [(i, bytearray(encode_gif(fr))) for i, fr in pairs]
        return spark.createDataFrame(data, "video_id: long, payload: binary")

    # batch 1: 2 is a re-mux of 1 (in-batch, J=1.0); 3 unique
    _vrows((1, fa), (2, fa[::-1]), (3, fb)).coalesce(1).write.parquet(src)
    q = stream_video_dedup_ingest(
        spark.readStream.schema("video_id long, payload binary").parquet(src),
        corpus,
        index,
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    assert _poll_ids(spark, corpus, [1, 3], id_col="video_id", q=q) == [1, 3]

    # batch 2: 0 re-muxes corpus video 1 (lower id — corpus immutable,
    # 0 must drop); 11 shares 3 of 4 frames with corpus video 3
    # (J = 3/5 = 0.6 >= 0.5 -> drop); 12 fresh; 13 re-muxes 12 in-batch
    _vrows(
        (0, fa), (11, fb[:3] + _frames(75, n_frames=1)), (12, fc), (13, fc[::-1])
    ).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    assert _poll_ids(spark, corpus, [1, 3, 12], id_col="video_id", q=q) == [1, 3, 12]

    # batch 3: replayed id anti-joined away; fresh video lands
    _vrows((12, fc), (14, fd)).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    got3 = _poll_ids(spark, corpus, [1, 3, 12, 14], id_col="video_id", q=q)
    q.stop()
    assert got3 == [1, 3, 12, 14]

    idx = spark.read.parquet(index)
    assert {r["video_id"] for r in idx.collect()} == {1, 3, 12, 14}
    assert set(idx.columns) == {"video_id", "set_hash", "c", "n"}
    # c is the hash's multiplicity, n the video's total — denormalized
    for r in idx.collect():
        assert r["c"] == 1 and r["n"] == 4


def test_video_jaccard_incremental_matches_batch_form(spark):
    """video_jaccard_pairs_incremental == video_near_dup_pairs'
    scoring restricted to pairs touching a new id (the exactness
    contract the streaming sink relies on), including duplicate
    index rows (crash-replayed appends) being absorbed."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.multimodal import (
        video_jaccard_pairs_incremental,
    )

    # synthetic frame-hash fan-outs: videos 1-3 corpus, 4-5 new
    rows = [
        (1, 100), (1, 101), (1, 102), (1, 103),
        (2, 100), (2, 101), (2, 104), (2, 105),
        (3, 200), (3, 201),
        (4, 100), (4, 101), (4, 102), (4, 106),   # J(1,4)=3/5, J(2,4)=2/6
        (5, 200), (5, 201),                        # J(3,5)=1, J(4,5)=0
    ]
    all_h = spark.createDataFrame(rows, "video_id: long, frame_hash: long")
    corpus_h = all_h.where("video_id <= 3")
    new_h = all_h.where("video_id >= 4")
    # the batch form over the union, restricted to pairs touching 4/5
    sizes = all_h.groupBy("video_id").agg(F.count(F.lit(1)).alias("n"))
    want = set()
    import itertools

    by_vid = {}
    for r in rows:
        by_vid.setdefault(r[0], set()).add(r[1])
    for x, y in itertools.combinations(sorted(by_vid), 2):
        if y < 4:
            continue
        c = len(by_vid[x] & by_vid[y])
        u = len(by_vid[x] | by_vid[y])
        if 1_000_000 * c >= 300_000 * u:
            want.add((x, y, c, 1_000_000 * c // u))
    idx = corpus_h.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("video_id"))
    )
    # duplicate an index row (replayed append) — must not change scores
    idx_dup = idx.union(idx.limit(1))
    for index_frame in (idx, idx_dup):
        got = {
            (r["vid_a"], r["vid_b"], r["n_common"], r["jaccard_ppm"])
            for r in video_jaccard_pairs_incremental(
                index_frame, new_h, 300_000
            ).collect()
        }
        assert got == want and want
    # no-corpus call degrades to in-batch pairs only
    got_solo = {
        (r["vid_a"], r["vid_b"])
        for r in video_jaccard_pairs_incremental(None, new_h, 300_000).collect()
    }
    assert got_solo == {(x, y) for (x, y, _, _) in want if x >= 4}


def test_stream_audio_trim_dedup_ingest(spark, tmp_path):
    """The set-fingerprint sink is kernel- and metric-agnostic: audio
    clips stream with hash_fn=audio_cdc_segments + containment metric
    + multiset counts — a re-posted TRIM of an already-ingested
    recording is dropped online (the case the global-fingerprint sink
    cannot see), while unrelated clips land."""
    from dataflow_python_etl_spark.operators.codecs import encode_wav
    from dataflow_python_etl_spark.operators.multimodal import audio_cdc_segments
    from dataflow_python_etl_spark.streaming.pipeline import (
        stream_video_dedup_ingest,
    )

    def _clip(seed, n=4096, amp=2000):
        rng = np.random.RandomState(seed)
        return rng.randint(-amp, amp, size=n).astype(np.int64)

    def _arows(*pairs):
        data = [(i, bytearray(encode_wav(s))) for i, s in pairs]
        return spark.createDataFrame(data, "audio_id: long, payload: binary")

    full_a, full_b, other = _clip(81), _clip(82), _clip(83)
    src = str(tmp_path / "clips_in")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    # batch 1: 2 is a TRIM of 1 (in-batch containment dup); 3 unique
    _arows((1, full_a), (2, full_a[1024:3072]), (3, full_b)).coalesce(1).write.parquet(src)
    q = stream_video_dedup_ingest(
        spark.readStream.schema("audio_id long, payload binary").parquet(src),
        corpus,
        index,
        str(tmp_path / "ckpt"),
        id_col="audio_id",
        min_score_ppm=600_000,
        hash_fn=audio_cdc_segments,
        metric="containment",
        multiset=True,
    )
    q.processAllAvailable()
    assert _poll_ids(spark, corpus, [1, 3], id_col="audio_id", q=q) == [1, 3]

    # batch 2: 11 is a trim of corpus clip 3 (cross-batch, via the
    # persisted index — clip 3's payload never re-read); 12 fresh
    _arows((11, full_b[512:2560]), (12, other)).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    got = _poll_ids(spark, corpus, [1, 3, 12], id_col="audio_id", q=q)
    q.stop()
    assert got == [1, 3, 12]
    idx = spark.read.parquet(index)
    assert {r["audio_id"] for r in idx.collect()} == {1, 3, 12}
    assert set(idx.columns) == {"audio_id", "set_hash", "c", "n"}


def test_set_fingerprint_containment_incremental_matches_batch(spark):
    """set_fingerprint_pairs_incremental(containment, multiset) == the
    batch audio_containment_pairs restricted to pairs touching a new
    id — the exactness contract the audio-trim streaming mode relies
    on (the jaccard/distinct mode is pinned via the video twin)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.codecs import encode_wav
    from dataflow_python_etl_spark.operators.multimodal import (
        audio_cdc_segments,
        audio_containment_pairs,
        set_fingerprint_pairs_incremental,
    )

    def _clip(seed, n=4096):
        rng = np.random.RandomState(seed)
        return rng.randint(-2000, 2000, size=n).astype(np.int64)

    a, b = _clip(91), _clip(92)
    clips = [
        (1, a), (2, b), (3, a[1024:3072]),          # corpus: 3 trims 1
        (4, a[512:2560]), (5, b[2048:4096]), (6, _clip(93)),  # new
    ]
    rows = [(i, bytearray(encode_wav(s))) for i, s in clips]
    all_df = spark.createDataFrame(rows, "audio_id long, payload binary")
    thr = 600_000
    batch_pairs = {
        (r["clip_a"], r["clip_b"], r["n_common"], r["containment_ppm"])
        for r in audio_containment_pairs(all_df, min_containment_ppm=thr).collect()
    }
    want = {t for t in batch_pairs if t[0] >= 4 or t[1] >= 4}
    corpus_df = all_df.where("audio_id <= 3")
    new_df = all_df.where("audio_id >= 4")
    idx = (
        audio_cdc_segments(corpus_df)
        .groupBy("audio_id", "seg_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("n", F.sum("c").over(Window.partitionBy("audio_id")))
    )
    got = {
        (r["id_a"], r["id_b"], r["n_common"], r["score_ppm"])
        for r in set_fingerprint_pairs_incremental(
            idx, audio_cdc_segments(new_df),
            metric="containment", min_score_ppm=thr, multiset=True,
        ).collect()
    }
    assert got == want and want  # non-vacuous: trims must pair


def _words(seed: int, n: int) -> list[str]:
    rng = np.random.RandomState(seed)
    return [f"w{seed}x{v}" for v in rng.randint(0, 10_000, size=n)]


def test_text_containment_incremental_matches_batch(spark):
    """text_shingle_hashes + set_fingerprint_pairs_incremental
    (containment, distinct) == the batch dedup.containment_pairs
    restricted to pairs touching a new id — the exactness contract
    stream_text_containment_ingest relies on (xxhash64 compression is
    collision-free at test scale, and the ppm scores must agree with
    the exact integer cross-multiply recomputed from raw shingle
    sets)."""
    from pyspark.sql import Window

    from dataflow_python_etl_spark.operators.dedup import (
        containment_pairs,
        text_shingle_hashes,
    )
    from dataflow_python_etl_spark.operators.multimodal import (
        set_fingerprint_pairs_incremental,
    )

    base, other = _words(51, 120), _words(52, 120)
    docs = [
        (1, " ".join(base)),                         # corpus
        (2, " ".join(other)),                        # corpus
        (3, " ".join(base[10:50])),                  # corpus: chunk of 1
        (4, " ".join(base[40:90] + other[:5])),      # new: mostly inside 1
        (5, " ".join(other[60:] + _words(53, 8))),   # new: tail of 2 + noise
        (6, " ".join(_words(54, 60))),               # new: fresh
    ]
    all_df = spark.createDataFrame(docs, "doc_id long, text string")
    thr = 600_000
    batch_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in containment_pairs(all_df, threshold_ppm=thr).collect()
    }
    want_pairs = {t for t in batch_pairs if t[0] >= 4 or t[1] >= 4}
    corpus_df = all_df.where("doc_id <= 3")
    new_df = all_df.where("doc_id >= 4")
    idx = (
        text_shingle_hashes(corpus_df)
        .groupBy("doc_id", "shingle_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("n", F.sum("c").over(Window.partitionBy("doc_id")))
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["score_ppm"])
        for r in set_fingerprint_pairs_incremental(
            idx, text_shingle_hashes(new_df),
            metric="containment", min_score_ppm=thr, multiset=False,
        ).collect()
    }
    assert set(got) == want_pairs and want_pairs
    # scores: exact integer ppm over the raw shingle sets
    sets = {
        i: {tuple(t.split()[k : k + 3]) for k in range(len(t.split()) - 2)}
        for i, t in docs
    }
    for (x, y), (c, ppm) in got.items():
        cc = len(sets[x] & sets[y])
        assert c == cc
        assert ppm == 1_000_000 * cc // min(len(sets[x]), len(sets[y]))


def test_stream_text_containment_ingest_online_filtering(spark, tmp_path):
    """A crawl item embedding an already-ingested document verbatim is
    dropped ONLINE — in-batch and cross-batch via the persisted
    shingle-hash index — while docs too short to shingle always
    survive (no-rows kernel contract)."""
    from dataflow_python_etl_spark.streaming.pipeline import (
        stream_text_containment_ingest,
    )

    long_a, long_b, fresh = _words(61, 150), _words(62, 150), _words(63, 80)
    src = str(tmp_path / "docs_in")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    def _drows(*pairs):
        return spark.createDataFrame(
            [(i, " ".join(w)) for i, w in pairs], "doc_id: long, text: string"
        )

    # batch 1: 2 is a verbatim chunk of 1 (containment 1.0, Jaccard
    # ~0.25 — the subset case); 3 unique
    _drows((1, long_a), (2, long_a[30:70]), (3, long_b)).coalesce(1).write.parquet(src)
    q = stream_text_containment_ingest(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        corpus,
        index,
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    assert _poll_ids(spark, corpus, [1, 3], id_col="doc_id", q=q) == [1, 3]

    # batch 2: 11 embeds a chunk of corpus doc 3 (cross-batch, via the
    # index — doc 3's text never re-read); 12 fresh; 13 chunks 12
    # in-batch; 14 is too short to shingle (2 words) and must land
    _drows(
        (11, long_b[100:140]),
        (12, fresh),
        (13, fresh[20:60]),
        (14, ["tiny", "doc"]),
    ).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    assert _poll_ids(spark, corpus, [1, 3, 12, 14], id_col="doc_id", q=q) == [1, 3, 12, 14]

    # batch 3: replayed id anti-joined away; fresh doc lands
    _drows((12, fresh), (15, _words(64, 50))).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    got3 = _poll_ids(spark, corpus, [1, 3, 12, 14, 15], id_col="doc_id", q=q)
    q.stop()
    assert got3 == [1, 3, 12, 14, 15]

    idx = spark.read.parquet(index)
    # doc 14 contributed no index rows (too short to shingle)
    assert {r["doc_id"] for r in idx.collect()} == {1, 3, 12, 15}
    assert set(idx.columns) == {"doc_id", "set_hash", "c", "n"}
    # distinct-shingle kernel: every multiplicity is 1
    assert all(r["c"] == 1 for r in idx.collect())
