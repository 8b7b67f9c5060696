"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``
(BASELINE.json north star; SURVEY.md §2.4).

The container has no image/audio libraries, so ``real_decode=True``
covers exactly the containers decodable with stdlib + numpy via
``operators.codecs`` — netpbm (P5/P6), 24-bit BI_RGB BMP, 8/16-bit
PNG (incl. Adam7), baseline sequential JPEG, GIF (incl. animated
frames), baseline TIFF, PCM WAV, and FLAC; what remains
(progressive JPEG, MP3/AAC, video containers) raises
``NotImplementedError`` at the Pillow/ffmpeg integration point
(guessing at those bitstreams would be silently wrong). The default
path remains a
deterministic fake so oracle comparisons over arbitrary payloads stay
stable. The schema contract, Arrow batch shape, and
partition-parallel ``mapInPandas`` plumbing are identical on both
paths, so swapping in Pillow/ffmpeg later is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata contract for a decoded asset.
ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def decode_image_meta(payload: bytes, real_decode: bool = False) -> dict:
    """Decode one image payload to metadata.

    ``real_decode=True`` REALLY decodes supported containers
    (P5/P6 netpbm, 24-bit BMP, 8/16-bit PNG incl. Adam7, baseline
    sequential JPEG, GIF, baseline TIFF — stdlib + numpy, see
    ``operators.codecs``) and
    raises ``NotImplementedError`` for the rest (progressive JPEG,
    video — the Pillow/opencv integration point).
    """
    if real_decode:
        from dataflow_python_etl_spark.operators import codecs

        fmt, pixels = codecs.decode_image(bytes(payload))
        h, w = pixels.shape[:2]
        return {
            "n_bytes": len(payload),
            "format": fmt,
            "width": w,
            "height": h,
            "checksum": int(pixels.astype("int64").sum()) % 1_000_000_007,
        }
    # Deterministic fake: metadata derived from payload bytes so tests
    # and oracle comparisons are stable.
    n = len(payload)
    checksum = 0
    for i, b in enumerate(payload[:64]):
        checksum = (checksum * 131 + b + i) % 1_000_000_007
    return {
        "n_bytes": n,
        "format": "fake/raw",
        "width": (n % 640) + 1,
        "height": (n % 480) + 1,
        "checksum": checksum,
    }


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: a ``binary`` payload column (here
    UTF-8 bytes of the text; in production, image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_asset_meta(
    df: DataFrame, id_col: str = "doc_id", real_decode: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the binary column in columnar batches; the Python
    kernel sees a pandas DataFrame per batch — the shape a real
    decode/resize/frame-sample kernel would use. Partition-parallel:
    no shuffle, no driver collect.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_meta(p, real_decode) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "checksum": [m["checksum"] for m in metas],
                }
            )
            yield out

    return df.select(id_col, "payload").mapInPandas(kernel, ASSET_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_payload(payload: bytes, width: int, height: int, real_decode: bool = False) -> bytes:
    """Resize one image payload. ``real_decode=True`` decodes P5/P6
    netpbm, 24-bit BMP, non-interlaced 8-bit PNG, and baseline JPEG
    (stdlib+numpy), nearest-neighbor resamples, and re-encodes —
    netpbm for gray/RGB, PNG for alpha-bearing pixels (netpbm cannot
    carry alpha); formats outside public-spec reach raise
    ``NotImplementedError`` (the Pillow integration point). The default is a deterministic fake
    that samples the payload bytes down/up to ``width*height`` — byte
    count and content are reproducible, so tests can pin the batch
    contract."""
    if real_decode:
        from dataflow_python_etl_spark.operators import codecs

        _fmt, pixels = codecs.decode_image(bytes(payload))
        resized = codecs.resize_nearest(pixels, width, height)
        if resized.ndim == 3 and resized.shape[2] in (2, 4):
            return codecs.encode_png(resized)
        return codecs.encode_ppm(resized)
    target = width * height
    n = len(payload)
    if n == 0:
        return b"\x00" * target
    return bytes(payload[(i * n) // target] for i in range(target))


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    real_decode: bool = False,
) -> DataFrame:
    """mapInPandas resize over binary payloads: one output row per
    asset, fixed-size payload out. Partition-parallel, no shuffle —
    at 100 TB the only knob that matters is input split size
    (``spark.sql.files.maxPartitionBytes``) so each Arrow batch of
    payloads fits executor memory."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "payload": [
                        resize_payload(p, width, height, real_decode)
                        for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    frame_ms: int = 1000,
    id_col: str = "doc_id",
    real_decode: bool = False,
) -> DataFrame:
    """Video frame sampling as a fan-out mapInPandas: each binary
    payload (a 'video') yields up to ``n_frames`` evenly spaced frame
    rows (frame_idx, ts_ms, frame bytes). The generator shape — one
    input batch to a LARGER output batch — is the part worth pinning:
    a real ffmpeg kernel swaps in per chunk without touching the plan.

    ``real_decode=True`` REALLY decodes animated GIF (the one moving-
    picture container with a pure-stdlib decoder, see
    ``operators.codecs.decode_gif_frames``), samples ``n_frames``
    evenly across the animation, and re-encodes each sampled frame
    (netpbm for RGB, PNG when a transparency plane is present);
    other containers (mp4/webm/...) raise ``NotImplementedError`` —
    the ffmpeg integration point. The default fake 'decoder' slices
    the payload into ``n_frames`` equal chunks; a zero-length payload
    yields no frames (mirrors a corrupt video being skipped, and
    tests pin that rows can disappear)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from dataflow_python_etl_spark.operators import codecs

        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for asset_id, payload in zip(pdf[id_col], pdf["payload"]):
                n = len(payload)
                if n == 0:
                    continue
                if real_decode:
                    if codecs.sniff_format(bytes(payload)) != "image/gif":
                        raise NotImplementedError(
                            "real frame sampling currently decodes animated "
                            "GIF only — plug ffmpeg here for mp4/webm"
                        )
                    decoded = codecs.decode_gif_frames(bytes(payload))
                    picks = np.unique(
                        np.linspace(
                            0, len(decoded) - 1, min(n_frames, len(decoded))
                        ).round().astype(int)
                    )
                    for k, fi in enumerate(picks):
                        px = decoded[fi]
                        ids.append(int(asset_id))
                        idxs.append(k)
                        tss.append(int(fi) * frame_ms)
                        frames.append(
                            codecs.encode_png(px)
                            if px.ndim == 3 and px.shape[2] == 4
                            else codecs.encode_ppm(px)
                        )
                    continue
                step = max(n // n_frames, 1)
                for k in range(min(n_frames, n)):
                    ids.append(int(asset_id))
                    idxs.append(k)
                    tss.append(k * frame_ms)
                    frames.append(bytes(payload[k * step : k * step + step]))
            yield pd.DataFrame(
                {"asset_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "ts_ms": pd.Series(tss, dtype="int64"),
                 "frame": pd.Series(frames, dtype=object)}
            )

    return df.select(id_col, "payload").mapInPandas(kernel, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    window_bytes: int = 1024,
    id_col: str = "doc_id",
    real_decode: bool = False,
) -> DataFrame:
    """Windowed audio features over binary payloads — the audio leg of
    the multimodal family (image: :func:`resize_images`, video:
    :func:`sample_frames`). By default payload bytes are treated as
    8-bit PCM (centered at 128); ``real_decode=True`` decodes the
    payload as PCM RIFF/WAVE (8/16-bit, multichannel mixed down) or
    FLAC (rice/LPC per RFC 9639) — pure numpy, see
    ``operators.codecs.decode_audio`` — and windows the decoded
    samples (``window_bytes`` then counts SAMPLES). Each
    window yields RMS energy, peak amplitude, and zero-crossing count
    — the numpy kernel shape a real librosa/ffmpeg decode would feed.
    Fan-out mapInPandas: no shuffle, one output row per window.
    """
    import numpy as np

    from dataflow_python_etl_spark.operators import codecs

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, rms, peak, zc = [], [], [], [], []
            for asset_id, payload in zip(pdf[id_col], pdf["payload"]):
                if real_decode:
                    _rate, samples = codecs.decode_audio(bytes(payload))
                else:
                    samples = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                        np.float64
                    ) - 128.0
                for w in range(0, len(samples) // window_bytes):
                    win = samples[w * window_bytes : (w + 1) * window_bytes]
                    ids.append(int(asset_id))
                    widx.append(w)
                    rms.append(round(float(np.sqrt(np.mean(win * win))), 6))
                    peak.append(int(np.max(np.abs(win))))
                    zc.append(int(np.count_nonzero(np.diff(np.sign(win)))))
            yield pd.DataFrame(
                {"asset_id": pd.Series(ids, dtype="int64"),
                 "window_idx": pd.Series(widx, dtype="int32"),
                 "rms": pd.Series(rms, dtype="float64"),
                 "peak": pd.Series(peak, dtype="int32"),
                 "zero_crossings": pd.Series(zc, dtype="int32")}
            )

    return df.select(id_col, "payload").mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)
