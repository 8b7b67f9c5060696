"""Chunked-CDC streaming near-dup ingest for LONG video (VERDICT r9
#7, completing SURVEY §8 candidate 6): recordings arrive as ordered
BYTE ranges of an MJPEG AVI stream — boundaries need not align with
frames or RIFF chunks — and are fingerprinted with a bounded-buffer
incremental parser. Core pins drive apply_chunked_video_batch
DIRECTLY (the module-level-applier precedent); one thin readStream
e2e covers the wiring. Stream-source test writes are .coalesce(1)
(the round-9 atomic-visibility rule)."""

import collections
import json
import os

import numpy as np
import pytest

from dataflow_python_etl_spark.operators.codecs import encode_avi
from dataflow_python_etl_spark.operators.multimodal import (
    ahash64,
    video_cdc_finish,
    video_cdc_push_chunk,
    video_cdc_state_new,
)

CHUNK_DDL = "clip_id long, chunk_seq long, data binary, is_last boolean"


def _frames(n, seed0=0, hw=32, invert=False):
    out = []
    for i in range(n):
        r = np.random.RandomState(seed0 + i)
        g = np.kron(
            r.randint(0, 2, (hw // 8, hw // 8)) * 255, np.ones((8, 8))
        ).astype(np.uint8)
        if invert:
            g = 255 - g
        out.append(np.dstack([g, g, g]))
    return out


def _chunk_rows(clip_id, payload, n_chunks, first_seq=0, last=True):
    bounds = np.linspace(0, len(payload), n_chunks + 1).astype(int)
    return [
        (
            clip_id,
            first_seq + i,
            bytearray(payload[bounds[i] : bounds[i + 1]]),
            last and i == n_chunks - 1,
        )
        for i in range(n_chunks)
    ]


def _paths(tmp_path):
    return {
        "seg_path": str(tmp_path / "hashes"),
        "state_path": str(tmp_path / "state"),
        "index_path": str(tmp_path / "index"),
        "corpus_path": str(tmp_path / "corpus"),
    }


def _apply(spark, rows, batch_id, paths, **kw):
    from dataflow_python_etl_spark.streaming.pipeline import (
        apply_chunked_video_batch,
    )

    apply_chunked_video_batch(
        spark.createDataFrame(rows, CHUNK_DDL), batch_id, **paths, **kw
    )


def test_push_chunk_split_invariance_property():
    """For ANY chunking of the byte stream, push*;finish emits exactly
    the batch decode's frame-hash sequence — the cdc_push_chunk
    invariant, video edition."""
    from dataflow_python_etl_spark.operators.codecs import decode_avi_frames

    avi = encode_avi(_frames(5, seed0=40), fps=5)
    want = [ahash64(f) for f in decode_avi_frames(avi)]
    rng = np.random.RandomState(9)
    for _ in range(60):
        splits = sorted(rng.randint(0, len(avi), size=rng.randint(0, 10)))
        st, got, prev = video_cdc_state_new(), [], 0
        for s in list(splits) + [len(avi)]:
            st, hs = video_cdc_push_chunk(st, avi[prev:s])
            got += hs
            prev = s
        video_cdc_finish(st)
        assert got == want, splits
    # worst case: byte at a time, buffer stays bounded by one frame
    st, got, hwm = video_cdc_state_new(), [], 0
    for i in range(len(avi)):
        st, hs = video_cdc_push_chunk(st, avi[i : i + 1])
        got += hs
        hwm = max(hwm, len(st["buf"]))
    video_cdc_finish(st)
    assert got == want
    assert hwm < len(avi) // 2  # never buffers the whole stream


def test_chunked_video_ingest_matches_batch_arithmetic(spark, tmp_path):
    """The marquee parity pin: a clip streamed as byte chunks ACROSS
    batches produces exactly the batch video_frame_hashes set; a
    re-encoded copy (same frames, Jaccard 1.0) is dropped online
    with the exact batch video_near_dup_pairs arithmetic; an
    unrelated clip survives."""
    from dataflow_python_etl_spark.operators.multimodal import (
        video_frame_hashes,
        video_near_dup_pairs,
    )

    paths = _paths(tmp_path)
    fa = _frames(6, seed0=0)
    A = encode_avi(fa)                      # the long recording
    B = encode_avi(fa, quality=95)          # re-encode: same hash set
    C = encode_avi(_frames(4, seed0=0, invert=True))  # unrelated

    _apply(spark, _chunk_rows(1, A, 4), 0, paths)
    got = spark.read.parquet(paths["corpus_path"]).collect()
    assert [r["clip_id"] for r in got] == [1]

    # streamed hash set == batch video_frame_hashes of the whole clip
    clips = spark.createDataFrame(
        [(1, bytearray(A))], "video_id long, payload binary"
    )
    want_set = {
        r["frame_hash"] for r in video_frame_hashes(clips).collect()
    }
    seg = spark.read.parquet(paths["seg_path"])
    assert {r["frame_hash"] for r in seg.collect()} == want_set

    # batches 1+2: B and C each split ACROSS the two batches
    b_rows = _chunk_rows(2, B, 6)
    c_rows = _chunk_rows(3, C, 4)
    _apply(spark, [r for r in b_rows if r[1] < 3] + [c_rows[0]], 1, paths)
    assert spark.read.parquet(paths["corpus_path"]).count() == 1
    st = {r["clip_id"]: r for r in spark.read.parquet(paths["state_path"]).collect()}
    assert set(st) == {2, 3} and st[2]["next_seq"] == 3
    _apply(spark, [r for r in b_rows if r[1] >= 3] + c_rows[1:], 2, paths)

    got = sorted(
        r["clip_id"] for r in spark.read.parquet(paths["corpus_path"]).collect()
    )
    assert got == [1, 3]  # re-encode dropped, unrelated survived
    assert spark.read.parquet(paths["state_path"]).count() == 0

    # the drop used the batch operator's exact arithmetic
    pair = video_near_dup_pairs(
        spark.createDataFrame(
            [(1, bytearray(A)), (2, bytearray(B))],
            "video_id long, payload binary",
        )
    ).collect()
    assert len(pair) == 1 and pair[0]["jaccard_ppm"] == 1_000_000


def test_chunked_video_replay_after_index_before_corpus(spark, tmp_path):
    """The round-10 crash window, pinned on the video sink from
    birth: index partition B written, corpus partition not, state not
    swapped — replay must converge to the clean-run surfaces (the
    probe excludes ingest_batch == B)."""
    import shutil

    paths = _paths(tmp_path)
    A = encode_avi(_frames(5, seed0=0))
    _apply(spark, _chunk_rows(1, A, 3), 0, paths)

    X = encode_avi(_frames(5, seed0=20))            # batch-1 survivor
    Y = encode_avi(_frames(5, seed0=20), quality=95)  # its re-encode
    rows_b1 = _chunk_rows(2, X, 2) + _chunk_rows(3, Y, 2)

    backup = str(tmp_path / "state_backup")
    shutil.copytree(paths["state_path"], backup)
    _apply(spark, rows_b1, 1, paths)

    def snapshot():
        return {
            p: sorted(tuple(r) for r in spark.read.parquet(paths[p]).collect())
            for p in ("seg_path", "index_path", "corpus_path", "state_path")
        }

    expected = snapshot()
    assert sorted(
        r["clip_id"] for r in spark.read.parquet(paths["corpus_path"]).collect()
    ) == [1, 2]

    shutil.rmtree(os.path.join(paths["corpus_path"], "ingest_batch=1"))
    shutil.rmtree(paths["state_path"])
    shutil.copytree(backup, paths["state_path"])
    _apply(spark, rows_b1, 1, paths)  # replay
    assert snapshot() == expected

    # ledger intact: a further replay is a recorded no-op
    _apply(spark, rows_b1, 1, paths)
    assert snapshot() == expected


def test_chunked_video_loud_guards(spark, tmp_path):
    """Out-of-order chunks, mid-clip is_last, and a truncated stream
    at finish must all FAIL LOUDLY."""
    from pyspark.errors.exceptions.captured import PythonException

    paths = _paths(tmp_path)
    A = encode_avi(_frames(3, seed0=5))
    _apply(spark, _chunk_rows(1, A, 2), 0, paths)

    with pytest.raises(PythonException, match="out of order"):
        _apply(spark, _chunk_rows(2, A, 2, first_seq=1), 1, paths)
    with pytest.raises(PythonException, match="non-final chunk"):
        rows = [(3, s, d, True) for (_c, s, d, _l) in _chunk_rows(3, A, 2)]
        _apply(spark, rows, 1, paths)
    with pytest.raises(PythonException, match="truncated"):
        _apply(spark, _chunk_rows(4, A[: len(A) // 2], 2), 1, paths)


def test_chunked_video_restart_mid_first_recording(spark, tmp_path):
    """ADVICE r10 high: the corpus dir is only created when a clip
    FINISHES, but the carry state swaps every batch — so a stream
    whose first recording spans micro-batches reaches batch 1 with
    state present and corpus legitimately absent. The old
    state-existence restart guard killed exactly that stream; the
    ledger's corpus_written flag must let it proceed."""
    paths = _paths(tmp_path)
    A = encode_avi(_frames(5, seed0=70))
    rows = _chunk_rows(1, A, 4)
    _apply(spark, rows[:2], 0, paths)  # partial chunks only: no is_last
    assert os.path.exists(paths["state_path"])
    assert not os.path.exists(paths["corpus_path"])
    led = json.load(open(os.path.join(paths["state_path"], "_applied_batch.json")))
    assert led == {"batch_id": 0, "corpus_written": False}
    _apply(spark, rows[2:], 1, paths)  # must NOT raise "corpus missing"
    assert [
        r["clip_id"] for r in spark.read.parquet(paths["corpus_path"]).collect()
    ] == [1]


def test_chunked_video_lost_corpus_still_refuses(spark, tmp_path):
    """The guard's real job survives the ADVICE fix: once a COMMITTED
    batch recorded corpus_written, a missing corpus on a later entry
    is genuine data loss and must raise."""
    import shutil

    paths = _paths(tmp_path)
    A = encode_avi(_frames(4, seed0=80))
    _apply(spark, _chunk_rows(1, A, 2), 0, paths)
    assert os.path.exists(paths["corpus_path"])
    shutil.rmtree(paths["corpus_path"])
    B = encode_avi(_frames(4, seed0=81))
    with pytest.raises(RuntimeError, match="corpus .* is missing"):
        _apply(spark, _chunk_rows(2, B, 2), 1, paths)


def test_boundary_truncation_raises():
    """ADVICE r10 medium: a stream truncated EXACTLY on a RIFF chunk
    boundary inside movi leaves the carry buffer empty with
    abs < end — video_cdc_finish must still raise, matching
    decode_avi_frames' loud error on the same bytes (the documented
    batch/chunked error-parity invariant)."""
    from dataflow_python_etl_spark.operators.codecs import decode_avi_frames

    avi = encode_avi(_frames(3, seed0=90))
    # locate chunk boundaries inside movi: push byte-at-a-time and
    # record positions where the carry buffer empties with skip
    # exhausted while abs < end — exactly the states the old
    # `buf and` conjunct silently accepted.
    st, cuts = video_cdc_state_new(), []
    for i in range(len(avi)):
        st, _ = video_cdc_push_chunk(st, avi[i : i + 1])
        if (
            not st["buf"]
            and st["skip"] == 0
            and st["abs"] < st["end"]
            and st["n_frames"] > 0
        ):
            cuts.append(i + 1)
    assert cuts, "no mid-movi chunk boundary found in the fixture"
    for cut in (cuts[0], cuts[-1]):
        st2, _ = video_cdc_push_chunk(video_cdc_state_new(), avi[:cut])
        with pytest.raises(ValueError, match="truncated"):
            video_cdc_finish(st2)
        with pytest.raises(ValueError, match="overruns container|truncated"):
            decode_avi_frames(avi[:cut])


def test_stream_chunked_video_e2e(spark, tmp_path):
    """Thin readStream wiring check (atomic .coalesce(1) source
    writes): a re-encode split across micro-batches is dropped, its
    source survives."""
    from dataflow_python_etl_spark.streaming.pipeline import (
        stream_chunked_video_dedup_ingest,
    )

    paths = _paths(tmp_path)
    A = encode_avi(_frames(4, seed0=60))
    B = encode_avi(_frames(4, seed0=60), quality=95)
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(_chunk_rows(1, A, 3), CHUNK_DDL).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = stream_chunked_video_dedup_ingest(
        spark.readStream.schema(CHUNK_DDL).option("maxFilesPerTrigger", 1).parquet(src),
        corpus_path=paths["corpus_path"],
        index_path=paths["index_path"],
        seg_path=paths["seg_path"],
        state_path=paths["state_path"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        assert sorted(
            r["clip_id"]
            for r in spark.read.parquet(paths["corpus_path"]).collect()
        ) == [1]
        spark.createDataFrame(_chunk_rows(2, B, 2), CHUNK_DDL).coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert sorted(
            r["clip_id"]
            for r in spark.read.parquet(paths["corpus_path"]).collect()
        ) == [1]
        assert spark.read.parquet(paths["state_path"]).count() == 0
    finally:
        q.stop()
