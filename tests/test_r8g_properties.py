"""Property-based pins for the r8g rank statistics: the Spark
implementations must match brute-force Python reimplementations on
randomized small inputs (hypothesis drives the inputs; examples kept
small because each one is a parquet round-trip)."""

from __future__ import annotations

import datetime
import math

from hypothesis import given, settings
from hypothesis import strategies as st

_T0 = datetime.datetime(2024, 1, 1)


def _brute_mwu(a: list[int], b: list[int]) -> tuple[float, float]:
    """Midrank U1 and tie-corrected z, straight from the textbook."""
    pooled = sorted(a + b)
    ranks = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        for v in (pooled[i],):
            ranks[v] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    r1 = sum(ranks[v] for v in a)
    n1, n2 = len(a), len(b)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    from collections import Counter

    tie3 = sum(t**3 - t for t in Counter(pooled).values())
    var = n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    return u1, round(z, 8)


def _brute_ks(a: list[int], b: list[int]) -> int:
    n1, n2 = len(a), len(b)
    best = 0
    for v in sorted(set(a + b)):
        c1 = sum(1 for x in a if x <= v)
        c2 = sum(1 for x in b if x <= v)
        best = max(best, abs(c1 * n2 - c2 * n1))
    return best


@settings(max_examples=6, deadline=None)
@given(
    a=st.lists(st.integers(min_value=-50, max_value=50), min_size=2, max_size=12),
    b=st.lists(st.integers(min_value=-50, max_value=50), min_size=2, max_size=12),
)
def test_mwu_and_ks_match_brute_force(spark, tmp_path_factory, a, b):
    from kcore_spark.queries.extensions_r8g import q_ks_test, q_mann_whitney

    # variance is 0 when every pooled value ties; brute z would divide by 0
    if len(set(a + b)) == 1:
        return
    tmp = tmp_path_factory.mktemp("mwu")
    rows = []
    eid = 0
    for v in a:
        rows.append((eid, _T0, eid, "click", v / 10000.0))
        eid += 1
    for v in b:
        rows.append((eid, _T0, eid, "purchase", v / 10000.0))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))

    got = q_mann_whitney(spark, str(tmp)).first()
    u1, z = _brute_mwu(a, b)
    assert float(got["u1"]) == u1
    assert abs(got["z_score"] - z) < 1e-8

    ks = q_ks_test(spark, str(tmp)).first()
    assert ks["d_numerator"] == _brute_ks(a, b)
