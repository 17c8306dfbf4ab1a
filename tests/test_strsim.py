"""DuckDB-parity fuzz for operators/strsim.py: Spark has no
jaro_winkler builtin, so the Python implementation that backs
q_jaro_winkler_linkage is pinned bit-for-bit against DuckDB's
jaro_winkler_similarity over random pairs (incl. empty strings,
repeats, transposition-heavy pairs) plus the classic textbook pairs."""

from __future__ import annotations

import random

import duckdb
import pytest

from kcore_spark.operators.strsim import jaro, jaro_winkler


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_textbook_pairs(con):
    for a, b in [
        ("MARTHA", "MARHTA"),
        ("DIXON", "DICKSONX"),
        ("JELLYFISH", "SMELLYFISH"),
        ("DWAYNE", "DUANE"),
        ("hot ring", "old ring"),
        ("abc", "abc"),
        ("", "abc"),
        ("", ""),
    ]:
        exp = con.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert abs(jaro_winkler(a, b) - exp) < 1e-12, (a, b, exp, jaro_winkler(a, b))


def test_random_fuzz_vs_duckdb(con):
    rng = random.Random(91)
    for _ in range(2000):
        a = "".join(rng.choice("abcde xyz") for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice("abcde xyz") for _ in range(rng.randint(0, 14)))
        exp = con.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert abs(jaro_winkler(a, b) - exp) < 1e-12, (a, b, exp)


def test_jaro_properties():
    rng = random.Random(17)
    for _ in range(300):
        a = "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
        b = "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
        j = jaro(a, b)
        assert 0.0 <= j <= 1.0
        assert jaro(a, b) == jaro(b, a)  # symmetric
        assert jaro_winkler(a, b) >= j - 1e-15  # boost never decreases
