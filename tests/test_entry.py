"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path


def _load_entry():
    path = Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_query_and_oracle_keys_align():
    mod = _load_entry()
    qs = mod.queries()
    osql = mod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(osql) <= set(qs)
    for name, sql in osql.items():
        assert isinstance(sql, str) and sql.strip().upper().startswith(("SELECT", "WITH")), name
