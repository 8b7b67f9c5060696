"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``
(BASELINE.json north star; SURVEY.md §2.4).

The container has no image/audio codecs, so the decode kernels are
STUBS: ``decode_image_meta`` raises ``NotImplementedError`` when asked
for a real decode, and the default path produces a deterministic fake
(metadata derived from the payload bytes). Everything around the stub
— the schema contract, Arrow batch shape, partition-parallel
``mapInPandas`` plumbing, and the typed metadata struct — is real and
tested, so swapping in Pillow/ffmpeg later is a one-function change.
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

    ``real_decode=True`` is the integration point for an actual codec
    (Pillow etc., not available in this environment).
    """
    if real_decode:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "plug Pillow/opencv here"
        )
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


def extract_asset_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the binary column in columnar batches; the Python
    kernel sees a pandas DataFrame per batch — the shape a real
    decode/resize/frame-sample kernel would use. Partition-parallel:
    no shuffle, no driver collect.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_meta(p) for p in pdf["payload"]]
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
