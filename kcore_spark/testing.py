"""Oracle-comparison harness mirroring the driver's correctness gate.

Runs a Spark query and its DuckDB oracle SQL over the same parquet
fixtures, canonicalizes both results (columns sorted by name, doubles
rounded to 12 dp, rows sorted), and compares row count, schema (column
names) and a value hash. Used by tests/ so every queries() entry is
verified locally before the driver does the same at sf0.01.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kcore_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def canon_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{round(v, 12):.12f}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(str(canon_val(x)) for x in v) + "]"
        return str(v)

    out = df.map(canon_val)
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def value_hash(df: pd.DataFrame) -> str:
    c = _canon(df)
    payload = "\n".join("\x1f".join(row) for row in c.itertuples(index=False, name=None))
    return hashlib.sha256(payload.encode()).hexdigest()


@dataclass
class CompareResult:
    name: str
    rows_spark: int
    rows_oracle: int
    cols_spark: tuple[str, ...]
    cols_oracle: tuple[str, ...]
    hash_spark: str
    hash_oracle: str

    @property
    def ok(self) -> bool:
        return (
            self.rows_spark == self.rows_oracle
            and tuple(sorted(self.cols_spark)) == tuple(sorted(self.cols_oracle))
            and self.hash_spark == self.hash_oracle
        )

    def diff_summary(self) -> str:
        return (
            f"{self.name}: rows {self.rows_spark} vs {self.rows_oracle}; "
            f"cols {sorted(self.cols_spark)} vs {sorted(self.cols_oracle)}; "
            f"hash {'MATCH' if self.hash_spark == self.hash_oracle else 'MISMATCH'}"
        )


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    sp = spark_df.toPandas()
    du = con.sql(oracle_sql).df()
    # the Spark side has fully executed; drop any per-query persisted
    # intermediates so a long test run keeps executor storage flat
    from kcore_spark.caching import release_transients

    release_transients()
    return CompareResult(
        name=name,
        rows_spark=len(sp),
        rows_oracle=len(du),
        cols_spark=tuple(sp.columns),
        cols_oracle=tuple(du.columns),
        hash_spark=value_hash(sp),
        hash_oracle=value_hash(du),
    )


def show_diff(spark_df: DataFrame, oracle_sql: str, con, n: int = 10) -> None:
    """Dev helper: print first differing canonical rows."""
    a = _canon(spark_df.toPandas())
    b = _canon(con.sql(oracle_sql).df())
    for i in range(min(len(a), len(b))):
        ra, rb = tuple(a.iloc[i]), tuple(b.iloc[i])
        if ra != rb:
            print(f"row {i}:\n  spark : {ra}\n  oracle: {rb}")
            n -= 1
            if n <= 0:
                return
    if len(a) != len(b):
        print(f"length differs: spark={len(a)} oracle={len(b)}")


_SPARK: SparkSession | None = None


def shared_spark() -> SparkSession:
    """One session for the whole test run (Spark startup ~5 s)."""
    global _SPARK
    if _SPARK is None:
        from kcore_spark.session import get_spark

        _SPARK = get_spark("kcore_spark_tests", shuffle_partitions=8)
    return _SPARK
