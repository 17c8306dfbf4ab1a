"""asof_join strategy parity: the range and union-window rewrites (and
the auto picker) must produce identical rows — same matches, same
latest-row-wins and largest-tiebreak-wins semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from kcore_spark.operators.relational import asof_join


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 100, 50),   # key 1: right rows at 40,45 → pick ts=45
            (2, 100, 44),   # key 1: only ts<=44 → pick ts=40
            (3, 100, 39),   # key 1: nothing at-or-before → dropped (inner)
            (4, 200, 10),   # key 2: tie at ts=10 → largest tiebreak wins
            (5, 300, 99),   # key 3: no right rows at all → dropped
        ],
        "eid long, k long, t long",
    )
    right = spark.createDataFrame(
        [
            (100, 40, 7, 400),
            (100, 45, 8, 450),
            (200, 10, 1, 111),
            (200, 10, 2, 222),  # same ts, larger tiebreak → wins
        ],
        "rk long, rt long, tb long, val long",
    )
    return left, right


def _run(spark, strategy):
    left, right = _fixture(spark)
    out = asof_join(
        left, right, "k", "rk", "t", "rt", ["tb", "val"], tiebreak="tb",
        strategy=strategy,
    )
    return sorted(
        (r.eid, r.tb, r.val) for r in out.select("eid", "tb", "val").collect()
    )


EXPECTED = [(1, 8, 450), (2, 7, 400), (4, 2, 222)]


def test_union_window_semantics(spark):
    assert _run(spark, "union_window") == EXPECTED


def test_range_semantics(spark):
    assert _run(spark, "range") == EXPECTED


def test_auto_matches(spark):
    assert _run(spark, "auto") == EXPECTED


def test_auto_picks_union_window_on_blowup(spark, monkeypatch):
    """A high pair-fan shape must route to union_window: one left key
    with many left rows × many right rows crosses the blow-up limit."""
    from kcore_spark.operators import relational as R

    left = spark.createDataFrame(
        [(i, 1, 1000 + i) for i in range(200)], "eid long, k long, t long"
    )
    right = spark.createDataFrame(
        [(1, i, i, i * 10) for i in range(100)], "rk long, rt long, tb long, val long"
    )
    picked = {}
    orig = R._asof_join_range

    def spy(*a, **kw):
        picked["range"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(R, "_asof_join_range", spy)
    # ratio = (200*100) / (200+100) ≈ 67 > 8 → union_window, spy unused
    out = asof_join(left, right, "k", "rk", "t", "rt", ["val"], strategy="auto")
    assert out.count() == 200
    assert "range" not in picked
