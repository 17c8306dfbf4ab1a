"""Real media codecs, stdlib-only: WAV/PCM and PNG implemented from
their public specifications (RIFF/WAVE; RFC 2083 PNG with all five
scanline filters) — no PIL, no librosa, no soundfile.

Context: operators/multimodal.py documents that the container ships no
media libraries, so its feature extraction runs behind a clearly-marked
deterministic stub. This module removes that excuse for the two
formats whose decoding needs nothing beyond ``struct`` and ``zlib``:

- WAV: RIFF chunk walk → fmt (PCM16/PCM8) → frames → per-channel
  counts, RMS and peak over real samples.
- PNG: signature → IHDR → concatenated IDATs → zlib inflate → undo
  the per-scanline filter (None/Sub/Up/Average/Paeth) → RGB/RGBA or
  grayscale pixels → dimensions + per-channel means.

``media_features`` runs both through ONE Arrow-batched mapInPandas
pass with magic-byte sniffing — the same plumbing shape as
multimodal.extract_features, but the decode is real. Encoders
(``encode_wav``, ``encode_png``) exist so tests can round-trip
synthetic fixtures; encode_png writes filter-0 scanlines while the
decoder handles all five filter types (pinned by hand-built frames in
tests/test_media.py).

At 100 TB: decode is embarrassingly parallel map-side work over a
binary column; batches stream through Arrow, features come back
columnar, and no executor ever holds more than one batch of payloads.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame


# ------------------------------------------------------------ WAV


def encode_wav(samples: list[int], sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal PCM16 little-endian WAV writer (one fmt + one data
    chunk) for test fixtures; ``samples`` are interleaved int16."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE PCM decode: chunk walk (tolerating extra chunks like
    LIST/fact), PCM16 or PCM8, any channel count. Returns sample_rate,
    channels, n_samples (per channel), rms, peak."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    if bits == 16:
        n = len(data) // 2
        vals = struct.unpack(f"<{n}h", data[: n * 2])
        scale = 32768.0
    else:
        vals = tuple(b - 128 for b in data)  # PCM8 is unsigned
        scale = 128.0
    if not vals:
        return {
            "kind": "wav",
            "sample_rate": sample_rate,
            "channels": channels,
            "n_samples": 0,
            "rms": 0.0,
            "peak": 0.0,
        }
    rms = (sum(v * v for v in vals) / len(vals)) ** 0.5 / scale
    peak = max(abs(v) for v in vals) / scale
    return {
        "kind": "wav",
        "sample_rate": sample_rate,
        "channels": channels,
        "n_samples": len(vals) // max(channels, 1),
        "rms": rms,
        "peak": peak,
    }


# ------------------------------------------------------------ PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2) -> bytes:
    """Minimal PNG writer: 8-bit, filter 0 scanlines, one IDAT.
    ``pixels`` is row-major packed samples (len = w*h*channels)."""
    ch = _PNG_CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError("pixel buffer size mismatch")
    raw = b"".join(
        b"\x00" + pixels[y * width * ch : (y + 1) * width * ch] for y in range(height)
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> dict:
    """PNG decode per RFC 2083: 8-bit depth, color types 0/2/4/6,
    non-interlaced; all five scanline filters. Returns width, height,
    channels, per-channel means, and the unfiltered pixel bytes."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + clen  # len + tag + body + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    width, height, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color_type not in _PNG_CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color_type} interlace={interlace}"
        )
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(idat)
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter {f} on row {y}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    n_px = width * height
    means = [
        sum(out[c::ch]) / n_px if n_px else 0.0 for c in range(ch)
    ]
    return {
        "kind": "png",
        "width": width,
        "height": height,
        "channels": ch,
        "means": means,
        "pixels": bytes(out),
    }


# ------------------------------------------------------------ Spark op


def media_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched real-decode feature extraction: sniff each
    payload's magic bytes, run the matching stdlib decoder on the
    executor, and return one typed feature row per input — corrupt or
    unknown payloads yield kind='error' instead of failing the batch
    (the DLQ-friendly contract)."""
    import pandas as pd

    other_cols = [c for c in df.columns if c != payload_col]

    def batches(it):
        for pdf in it:
            rows = []
            for payload in pdf[payload_col]:
                b = bytes(payload) if payload is not None else b""
                try:
                    if b[:4] == b"RIFF":
                        d = decode_wav(b)
                        rows.append(
                            (d["kind"], d["sample_rate"], d["n_samples"],
                             float(d["rms"]), None, None, None)
                        )
                    elif b[:8] == _PNG_SIG:
                        d = decode_png(b)
                        m = d["means"]
                        rows.append(
                            ("png", None, None, None, d["width"], d["height"],
                             float(sum(m) / len(m)))
                        )
                    else:
                        rows.append(("error", None, None, None, None, None, None))
                except Exception:
                    rows.append(("error", None, None, None, None, None, None))
            out = pd.DataFrame(
                rows,
                columns=["kind", "sample_rate", "n_samples", "rms", "width", "height", "mean_px"],
            )
            for c in other_cols:
                out[c] = pdf[c].values
            yield out[other_cols + ["kind", "sample_rate", "n_samples", "rms", "width", "height", "mean_px"]]

    schema = ", ".join(
        [f"{c} {t}" for c, t in zip(other_cols, [dict(df.dtypes)[c] for c in other_cols])]
        + [
            "kind string", "sample_rate long", "n_samples long", "rms double",
            "width long", "height long", "mean_px double",
        ]
    )
    return df.mapInPandas(batches, schema)


# ------------------------------------------------------------ BMP
# Windows bitmap, BITMAPINFOHEADER flavor (public spec; the 14-byte
# BITMAPFILEHEADER + 40-byte info header + bottom-up BGR rows padded
# to 4-byte boundaries). 24-bit uncompressed only — the container
# every image tool can read.


def encode_bmp(width: int, height: int, pixels_rgb: bytes) -> bytes:
    """Minimal 24-bit BMP writer; ``pixels_rgb`` is top-down RGB
    (3 bytes/px, row-major) and is re-ordered to the format's
    bottom-up BGR padded rows."""
    if len(pixels_rgb) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    row_pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = pixels_rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))
        rows.append(bytes(row) + b"\x00" * row_pad)
    body = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def decode_bmp(payload: bytes) -> dict:
    """BITMAPINFOHEADER decode (24-bit, BI_RGB, bottom-up). Returns
    width, height, mean_r/g/b and the overall mean_px."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (offset,) = struct.unpack("<I", payload[10:14])
    size, width, height, planes, bpp, comp = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if size != 40 or bpp != 24 or comp != 0 or height <= 0:
        raise ValueError("unsupported BMP flavor")
    row_pad = (-(width * 3)) % 4
    stride = width * 3 + row_pad
    sr = sg = sb = 0
    for y in range(height):
        base = offset + y * stride
        row = payload[base : base + width * 3]
        if len(row) != width * 3:
            raise ValueError("truncated BMP pixel data")
        sb += sum(row[0::3])
        sg += sum(row[1::3])
        sr += sum(row[2::3])
    n = width * height
    return {
        "width": width,
        "height": height,
        "mean_r": sr / n,
        "mean_g": sg / n,
        "mean_b": sb / n,
        "mean_px": (sr + sg + sb) / (3 * n),
    }
