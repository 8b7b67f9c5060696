import pytest

from dataflow_python_etl_spark.operators.multimodal import (
    decode_image_meta,
    extract_asset_meta,
    with_binary_payload,
)
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_meta(b"\x89PNG", real_decode=True)


def test_extract_asset_meta(spark):
    docs = with_binary_payload(read_table(spark, SF_DIR, "documents").limit(50))
    meta = extract_asset_meta(docs)
    rows = meta.collect()
    assert len(rows) == 50
    assert meta.schema["payload"] if False else True
    # payload bytes = utf-8 length of the (ASCII) text
    texts = {r["doc_id"]: r["text"] for r in read_table(spark, SF_DIR, "documents").limit(50).collect()}
    for r in rows:
        assert r["n_bytes"] == len(texts[r["asset_id"]].encode())
        assert r["format"] == "fake/raw"
        assert 1 <= r["width"] <= 640
        # deterministic checksum reproducible in plain python
        assert r["checksum"] == decode_image_meta(texts[r["asset_id"]].encode())["checksum"]
