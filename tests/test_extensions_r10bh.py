"""Round-10 multimodal II block invariants + BMP golden bytes."""

from __future__ import annotations

import struct

from .conftest import SF_DIR


def test_bmp_golden_bytes():
    """2x2 image: exact header fields, bottom-up BGR rows, row pad."""
    from kcore_spark.operators.media import decode_bmp, encode_bmp

    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    b = encode_bmp(2, 2, px)
    assert b[:2] == b"BM"
    assert struct.unpack("<I", b[2:6])[0] == len(b) == 70
    assert struct.unpack("<I", b[10:14])[0] == 54
    size, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", b[14:34])
    assert (size, w, h, planes, bpp, comp) == (40, 2, 2, 1, 24, 0)
    # bottom row first: pixel (0,1) = RGB(70,80,90) stored as BGR
    assert b[54:57] == bytes([90, 80, 70])
    # 2px * 3 bytes = 6, padded to 8 per row
    assert b[60:62] == b"\x00\x00"
    dec = decode_bmp(b)
    assert (dec["width"], dec["height"]) == (2, 2)
    assert dec["mean_r"] == 55.0 and dec["mean_b"] == 75.0


def test_bmp_decode_query(spark):
    """Every selected doc decodes to its formula dimensions."""
    from kcore_spark.queries.extensions_r10bh import q_bmp_decode

    rows = q_bmp_decode(spark, SF_DIR).collect()
    assert len(rows) >= 5
    for r in rows:
        assert r.width == 4 + r.doc_id % 6
        assert r.height == 3 + r.doc_id % 5
        assert abs(r.mean_px - (r.mean_r + r.mean_g + r.mean_b) / 3) < 1e-9


def test_media_size_audit(spark):
    """Both kinds present; sizes within the spec-formula range."""
    from kcore_spark.queries.extensions_r10bh import q_media_size_audit

    rows = {r.kind: r for r in q_media_size_audit(spark, SF_DIR).collect()}
    assert set(rows) == {"bmp", "wav"}
    assert rows["wav"].min_bytes >= 44 + 2 * 160
    assert rows["bmp"].min_bytes >= 54 + 3 * 12


def test_image_histogram_mass(spark):
    """Bins partition the pixels of each gradient image."""
    from kcore_spark.queries.extensions_r10bh import q_image_histogram

    rows = q_image_histogram(spark, SF_DIR).collect()
    assert len(rows) >= 5
    for r in rows:
        assert r.b0 + r.b1 + r.b2 + r.b3 == r.n_px
        assert r.n_px == (6 + r.doc_id % 7) * (4 + r.doc_id % 6)
