"""Pure-stdlib/numpy codecs for multimodal containers — the
real-decode integration point behind ``operators.multimodal``'s
kernels (SURVEY.md §2.4 multimodal).

The sandbox has no image/audio libraries, but netpbm (P5/P6), BI_RGB
24-bit BMP, and PCM WAV are plain headers over raw sample arrays —
decodable with ``struct`` + ``numpy`` alone — and PNG's DEFLATE layer
is stdlib ``zlib``, so non-interlaced 8-bit PNG (gray, gray+alpha,
RGB, RGBA, and palette) decodes here too: chunk walk + CRC check,
one ``zlib.decompress``, then numpy scanline unfiltering (filters
0–4 per the W3C PNG spec / RFC 2083 §6). Entropy-coded formats with
no stdlib decompressor (JPEG/MP3/...) still raise
``NotImplementedError``: guessing at their bitstreams without a
codec would be silently wrong.

All functions are deterministic and total over their declared formats;
malformed payloads raise ``ValueError`` (loud, per-row inside the
mapInPandas kernels — a corrupt asset should fail the task, not emit
garbage metadata).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNM_MAGICS = (b"P5", b"P6")
PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes) -> str | None:
    """Best-effort container sniff by magic bytes. Returns a MIME-ish
    tag for the formats this module can decode, else None."""
    if payload[:2] == b"P6":
        return "image/x-portable-pixmap"
    if payload[:2] == b"P5":
        return "image/x-portable-graymap"
    if payload[:2] == b"BM":
        return "image/bmp"
    if payload[:8] == PNG_SIGNATURE:
        return "image/png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    return None


def _parse_pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, raster_offset) for binary netpbm.
    Handles arbitrary whitespace and ``#`` comments in the header."""
    magic = payload[:2]
    if magic not in _PNM_MAGICS:
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload):
            c = payload[pos : pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":  # comment runs to end of line
                nl = payload.find(b"\n", pos)
                if nl < 0:
                    raise ValueError("unterminated netpbm comment")
                pos = nl + 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated netpbm header")
        vals.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxval = vals
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported netpbm maxval {maxval} (8-bit only)")
    return magic, w, h, maxval, pos


def decode_pnm(payload: bytes) -> np.ndarray:
    """P6 → (h, w, 3) uint8 RGB; P5 → (h, w) uint8 grayscale."""
    magic, w, h, _maxval, off = _parse_pnm_header(payload)
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(payload) - off < need:
        raise ValueError(f"netpbm raster truncated: need {need} bytes")
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) or (h, w) uint8 → binary P6/P5 bytes."""
    if pixels.ndim == 3 and pixels.shape[2] == 3:
        magic = b"P6"
        h, w = pixels.shape[:2]
    elif pixels.ndim == 2:
        magic = b"P5"
        h, w = pixels.shape
    else:
        raise ValueError(f"expected (h,w,3) or (h,w), got {pixels.shape}")
    header = magic + b"\n%d %d\n255\n" % (w, h)
    return header + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed (BI_RGB) 24-bit BMP → (h, w, 3) uint8 RGB.

    Handles both bottom-up (positive height, the common case) and
    top-down (negative height) row order, and the 4-byte row padding.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP is supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = stride * h
    if len(payload) - data_offset < need:
        raise ValueError(f"BMP raster truncated: need {need} bytes")
    rows = np.frombuffer(payload, dtype=np.uint8, count=need, offset=data_offset)
    arr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        arr = arr[::-1]
    return arr[:, :, ::-1]  # BGR on disk → RGB


# PNG color type → samples per pixel (8-bit depth only; type 3 indexes
# the PLTE palette and expands to RGB after unfiltering).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, body) for each chunk, verifying lengths and CRCs.
    Truncation and corruption raise ValueError (loud, per the module
    contract) rather than yielding a partial image."""
    pos = 8
    saw_iend = False
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        if pos + 12 + length > len(payload):
            raise ValueError(
                f"PNG truncated: chunk {ctype!r} declares {length} bytes, "
                f"{len(payload) - pos - 8} remain"
            )
        body = payload[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        if ctype == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if not saw_iend:
        raise ValueError("PNG truncated: missing IEND chunk")


def _paeth_predictor(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over a scanline (spec §6.6)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering → (h, w*bpp) uint8.

    Filter 0 (None) and 2 (Up) are whole-row vectorized; 1 (Sub) is a
    per-lane cumulative sum (recon[x] = Σ filt mod 256); 3 (Average)
    and 4 (Paeth) have a true left-neighbor dependency, so they walk
    pixels within the row with numpy ops over the bpp channel lane.
    """
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG raster size mismatch: got {len(raw)} bytes, "
            f"expected {h * (1 + stride)}"
        )
    data = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters, rows = data[:, 0], data[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, filt = int(filters[y]), rows[y]
        if f == 0:
            recon = filt.copy()
        elif f == 1:  # Sub: left neighbor, per channel lane
            recon = (
                np.cumsum(filt.reshape(w, bpp).astype(np.uint64), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: previous scanline, fully vectorized
            recon = filt + prev  # uint8 wraps mod 256 by construction
        elif f == 3:  # Average of left and up, sequential in x
            recon = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(0, stride, bpp):
                px = filt[x : x + bpp] + ((left + prev[x : x + bpp]) >> 1).astype(
                    np.uint8
                )
                recon[x : x + bpp] = px
                left = px.astype(np.uint16)
        elif f == 4:  # Paeth, sequential in x
            recon = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint8)
            upleft = np.zeros(bpp, dtype=np.uint8)
            for x in range(0, stride, bpp):
                up = prev[x : x + bpp]
                px = filt[x : x + bpp] + _paeth_predictor(left, up, upleft)
                recon[x : x + bpp] = px
                left, upleft = px, up
        else:
            raise ValueError(f"PNG scanline {y}: invalid filter type {f}")
        out[y] = recon
        prev = recon
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG → uint8 pixels: gray → (h, w),
    gray+alpha → (h, w, 2), RGB → (h, w, 3), RGBA → (h, w, 4);
    palette (color type 3) expands through PLTE to (h, w, 3).

    Pure stdlib ``zlib`` + numpy: chunk walk with CRC verification,
    one decompress of the concatenated IDAT stream, scanline
    unfiltering per the spec. Interlaced (Adam7), 16-bit, and
    sub-byte depths raise ``NotImplementedError`` (decodable in
    principle, not needed for the pipeline's fixtures); corrupt or
    truncated payloads raise ``ValueError``.
    """
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    ihdr: bytes | None = None
    plte: bytes | None = None
    trns: bytes | None = None
    idat: list[bytes] = []
    for ctype, body in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing or malformed IHDR chunk")
    if not idat:
        raise ValueError("PNG has no IDAT chunks")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if w == 0 or h == 0:
        raise ValueError(f"PNG has empty dimensions {w}x{h}")
    if comp != 0 or filt != 0:
        raise ValueError(
            f"invalid PNG compression/filter method ({comp}/{filt})"
        )
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG is not supported")
    if depth != 8:
        raise NotImplementedError(f"only 8-bit PNG is supported (depth={depth})")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {color}")
    bpp = _PNG_CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT stream corrupt: {e}") from e
    flat = _png_unfilter(raw, w, h, bpp)
    if color == 3:
        if plte is None or len(plte) % 3 or not plte:
            raise ValueError("palette PNG missing or malformed PLTE chunk")
        if trns is not None:
            raise NotImplementedError(
                "palette PNG with tRNS transparency is not supported"
            )
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = flat.reshape(h, w)
        if int(idx.max()) >= len(palette):
            raise ValueError("palette PNG index out of PLTE range")
        return palette[idx]
    if bpp == 1:
        return flat.reshape(h, w)
    return flat.reshape(h, w, bpp)


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 pixels → non-interlaced 8-bit PNG bytes ((h,w) gray,
    (h,w,2) gray+alpha, (h,w,3) RGB, (h,w,4) RGBA). Deterministic:
    filter 0 on every scanline, fixed zlib level. Fixture generator
    and sink-side sibling of :func:`decode_png` (same role
    :func:`encode_wav` plays for audio)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color, bpp = 0, 1
    elif px.ndim == 3 and px.shape[2] in (2, 3, 4):
        color = {2: 4, 3: 2, 4: 6}[px.shape[2]]
        bpp = px.shape[2]
    else:
        raise ValueError(f"expected (h,w[,2|3|4]) uint8, got {px.shape}")
    h, w = px.shape[:2]
    raw = np.zeros((h, 1 + w * bpp), dtype=np.uint8)
    raw[:, 1:] = px.reshape(h, w * bpp)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> tuple[str, np.ndarray]:
    """(format_tag, pixel array) for any decodable image container."""
    fmt = sniff_format(payload)
    if fmt in ("image/x-portable-pixmap", "image/x-portable-graymap"):
        return fmt, decode_pnm(payload)
    if fmt == "image/bmp":
        return fmt, decode_bmp(payload)
    if fmt == "image/png":
        return fmt, decode_png(payload)
    raise NotImplementedError(
        "no pure-numpy decoder for this payload (compressed or unknown "
        "container) — plug Pillow/opencv here"
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width[, channels])."""
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot resize an empty image")
    # pixel-center sampling: output pixel i maps to floor((i+.5)*in/out)
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return pixels[ys][:, xs]


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM RIFF/WAVE → (sample_rate, float64 mono samples centered at
    0). 8-bit (unsigned) and 16-bit (signed LE) PCM; multi-channel is
    mixed down by mean — the shape feature extraction wants."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_body, data_body = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            # a silently-short slice would decode a fraction of the
            # audio and emit garbage features; fail loudly instead
            raise ValueError(
                f"WAV truncated: chunk {cid!r} declares {size} bytes, "
                f"{len(payload) - pos - 8} remain"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data_body = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_body is None or data_body is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt_body) < 16:
        raise ValueError(f"WAV fmt chunk too short: {len(fmt_body)} bytes")
    audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", fmt_body, 0)
    bits = struct.unpack_from("<H", fmt_body, 14)[0]
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit PCM WAV is supported (format={audio_format}, bits={bits})"
        )
    if bits == 8:
        samples = np.frombuffer(data_body, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        n = len(data_body) // 2
        samples = np.frombuffer(data_body, dtype="<i2", count=n).astype(np.float64)
    if n_channels > 1:
        samples = samples[: (len(samples) // n_channels) * n_channels]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return sample_rate, samples


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Mono 16-bit PCM WAV bytes from an int16-range sample array
    (test-fixture helper; also the shape a synthetic-audio source
    would emit)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
