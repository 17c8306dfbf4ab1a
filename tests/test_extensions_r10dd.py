"""Round-10 geo-encoding block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def _ref_geohash(lat, lon, precision=5):
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    bits, ch, even, out = 0, 0, True, []
    while len(out) < precision:
        if even:
            mid = (lon_r[0] + lon_r[1]) / 2
            # '>=': boundary-exact coordinates belong to the UPPER bin —
            # canonical geohash semantics, matching _geohash5's floor
            # quantization (ADVICE r10: '>' diverged at exact midpoints)
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_r[0] = mid
            else:
                ch = ch << 1
                lon_r[1] = mid
        else:
            mid = (lat_r[0] + lat_r[1]) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_r[0] = mid
            else:
                ch = ch << 1
                lat_r[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(b32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_matches_reference_algorithm(spark):
    import pyspark.sql.functions as F

    from kcore_spark.queries.extensions_r10dd import _geohash5, _points

    rows = (
        _points(spark, SF_DIR)
        .select("lat", "lon", _geohash5(F.col("lat"), F.col("lon")).alias("gh"))
        .limit(40)
        .collect()
    )
    assert rows
    for r in rows:
        assert r.gh == _ref_geohash(r.lat, r.lon)


def test_prefix_curve_monotone(spark):
    from kcore_spark.queries.extensions_r10dd import q_geohash_prefix_curve

    rows = q_geohash_prefix_curve(spark, SF_DIR).collect()
    assert [r.plen for r in rows] == [2, 3, 4]
    cells = [r.n_cells for r in rows]
    assert cells == sorted(cells)  # finer prefixes -> more cells
    occ = [r.max_occupancy for r in rows]
    assert occ == sorted(occ, reverse=True)


def test_quadkey_shape(spark):
    from kcore_spark.queries.extensions_r10dd import q_quadkey_encode

    rows = q_quadkey_encode(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert len(r.quadkey4) == 4
        assert set(r.quadkey4) <= set("0123")
