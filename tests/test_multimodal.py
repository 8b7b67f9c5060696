import struct

import numpy as np
import pytest

from dataflow_python_etl_spark.operators import codecs
from dataflow_python_etl_spark.operators.multimodal import (
    decode_image_meta,
    extract_asset_meta,
    resize_payload,
    with_binary_payload,
)
from dataflow_python_etl_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"

# Golden bytes: a 2×2 P6 PPM — pixels (R,G,B) = red, green, blue, white
PPM_2X2 = b"P6\n# test\n2 2\n255\n" + bytes(
    [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
)


def _bmp_24(pixels_rgb: np.ndarray) -> bytes:
    """Hand-packed bottom-up 24-bit BI_RGB BMP (golden-byte fixture)."""
    h, w = pixels_rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in pixels_rgb[::-1]:  # bottom-up
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # RGB → BGR
        line += b"\x00" * (stride - len(line))
        raster += line
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 14 + 40)
    return file_header + info + bytes(raster)


def test_compressed_formats_stay_stubbed():
    # baseline JPEG is now REALLY decoded; a garbage body fails loudly
    with pytest.raises(ValueError):
        decode_image_meta(b"\xff\xd8\xff\xe0....", real_decode=True)
    # PNG is now REALLY decoded; a truncated one fails loudly instead
    with pytest.raises(ValueError, match="truncated"):
        decode_image_meta(b"\x89PNG\r\n\x1a\n....", real_decode=True)
    # video containers remain honestly gated
    with pytest.raises(NotImplementedError):
        decode_image_meta(b"\x00\x00\x00\x18ftypmp42....", real_decode=True)


def test_real_decode_ppm_golden():
    meta = decode_image_meta(PPM_2X2, real_decode=True)
    assert meta["format"] == "image/x-portable-pixmap"
    assert (meta["width"], meta["height"]) == (2, 2)
    # checksum = sum of all pixel values: 3*255 + 255 + 255 + 255
    assert meta["checksum"] == 255 * 6
    pixels = codecs.decode_pnm(PPM_2X2)
    assert pixels.shape == (2, 2, 3)
    assert pixels[0, 0].tolist() == [255, 0, 0]
    assert pixels[1, 1].tolist() == [255, 255, 255]


def test_real_decode_bmp_golden():
    rgb = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]], dtype=np.uint8
    )
    payload = _bmp_24(rgb)
    meta = decode_image_meta(payload, real_decode=True)
    assert meta["format"] == "image/bmp"
    assert (meta["width"], meta["height"]) == (2, 2)
    assert (codecs.decode_bmp(payload) == rgb).all()  # padding + BGR + bottom-up undone


def test_real_resize_roundtrip():
    # 2×2 → 4×4 nearest-neighbor: each source pixel becomes a 2×2 block
    out = resize_payload(PPM_2X2, 4, 4, real_decode=True)
    pixels = codecs.decode_pnm(out)
    assert pixels.shape == (4, 4, 3)
    src = codecs.decode_pnm(PPM_2X2)
    for y in range(4):
        for x in range(4):
            assert (pixels[y, x] == src[y // 2, x // 2]).all()


def test_real_decode_wav_golden():
    # 16-bit mono: a known square wave → exact RMS/peak/zero-crossings
    samples = np.tile([1000, 1000, -1000, -1000], 256).astype(np.int16)
    payload = codecs.encode_wav(samples, sample_rate=8000)
    rate, decoded = codecs.decode_wav(payload)
    assert rate == 8000 and len(decoded) == 1024
    assert (decoded == samples.astype(np.float64)).all()
    # stereo mixdown: L/R average
    stereo = np.empty(8, dtype=np.int16)
    stereo[0::2] = [100, 200, 300, 400]
    stereo[1::2] = [300, 400, 500, 600]
    st_payload = codecs.encode_wav(stereo)
    patched = st_payload.replace(
        struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16),
        struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16),
    )
    _, mono = codecs.decode_wav(patched)
    assert mono.tolist() == [200.0, 300.0, 400.0, 500.0]


def test_audio_features_real_wav_e2e(spark):
    from dataflow_python_etl_spark.operators.multimodal import extract_audio_features

    samples = np.tile([1000, 1000, -1000, -1000], 256).astype(np.int16)
    payload = codecs.encode_wav(samples)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id: long, payload: binary")
    rows = extract_audio_features(df, window_bytes=512, real_decode=True).collect()
    assert len(rows) == 2  # 1024 samples / 512-sample windows
    for r in rows:
        assert r["rms"] == 1000.0
        assert r["peak"] == 1000
        assert r["zero_crossings"] == 255  # 512/4 cycles × 2 crossings − edge


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


def test_decode_wav_rejects_truncated_payload():
    import pytest

    samples = np.tile([1000, -1000], 64).astype(np.int16)
    payload = codecs.encode_wav(samples, sample_rate=8000)
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_wav(payload[: len(payload) - 40])  # data chunk cut short
    # fmt chunk shorter than the 16-byte PCM header: ValueError, not struct.error
    short_fmt = payload[:12] + b"fmt " + struct.pack("<I", 4) + payload[20:24]
    with pytest.raises(ValueError):
        codecs.decode_wav(short_fmt)


def test_synthetic_multimodal_payloads_plant_structure(spark):
    """The q153 plant contract: image payloads of (2k, 2k+1) are
    byte-identical; audio of (3k, 3k+2) differ in bytes (x2 gain) but
    share the energy-difference fingerprint; video of (5k, 5k+4)
    differ in bytes (reversed frames) but share the frame-hash SET."""
    from dataflow_python_etl_spark.operators.codecs import (
        decode_audio,
        decode_gif_frames,
    )
    from dataflow_python_etl_spark.operators.multimodal import (
        ahash64,
        audio_fingerprint64,
        synthetic_multimodal_payloads,
    )

    texts = [
        (i, f"document number {i} with some distinct words about topic {i * 7}")
        for i in range(10)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in synthetic_multimodal_payloads(docs).collect()}
    assert set(rows) == set(range(10))
    # image: (2k, 2k+1) byte-identical
    assert bytes(rows[2]["image"]) == bytes(rows[3]["image"])
    assert bytes(rows[0]["image"]) != bytes(rows[4]["image"])
    # audio: (3k, 3k+2) gain copy — different bytes, equal fingerprint
    for a, b in ((0, 2), (3, 5), (6, 8)):
        pa = bytes(rows[a]["clip"]); pb = bytes(rows[b]["clip"])
        assert pa != pb
        fa = audio_fingerprint64(decode_audio(pa)[1])
        fb = audio_fingerprint64(decode_audio(pb)[1])
        assert fa == fb
    # video: (5k, 5k+4) reversed — different bytes, equal hash set
    pa = bytes(rows[5]["video"]); pb = bytes(rows[9]["video"])
    assert pa != pb
    sa = {ahash64(px) for px in decode_gif_frames(pa)}
    sb = {ahash64(px) for px in decode_gif_frames(pb)}
    assert sa == sb and len(sa) >= 2


def test_spread_for_fanout_parallelizes_single_split_input(spark):
    """Every driver test table is ONE scan split (< 128 MB), so a
    payload-deriving kernel without the spread runs on one core
    (q151's measured 102 s). The synthetic corpora must fan their
    metadata-sized input across the cluster's parallelism."""
    from dataflow_python_etl_spark.operators.multimodal import (
        synthetic_multimodal_payloads,
    )
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    assert docs.rdd.getNumPartitions() <= 2  # the premise: ~one split
    pay = synthetic_multimodal_payloads(docs)
    assert (
        pay.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
