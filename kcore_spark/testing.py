"""Oracle-comparison harness mirroring the driver's correctness gate.

Runs a Spark query and its DuckDB oracle SQL over the same parquet
fixtures, canonicalizes both results (columns sorted by name, doubles
rounded to 12 dp, rows sorted), and compares row count, schema (column
names) and a value hash. Used by tests/ so every queries() entry is
verified locally before the driver does the same at sf0.01.

CROSS-ENGINE CANONICALIZATION RULES (VERDICT r10 #4 — the consolidated
checklist every new query batch MUST follow; each rule below was
learned from a real sf0.001/sf0.01 hash mismatch and fixed at the
root. Apply them when WRITING the query, not post-hoc):

1. MONEY IN INTEGER CENTS. Sum prices as ``CAST(x*100 AS BIGINT)``
   (or a DECIMAL with pinned scale) and divide at the END. Raw double
   SUM order differs between Spark partial aggregation and DuckDB and
   flips the last ulp. Helpers: ``operators/relational.py``'s
   decimal-exact ``dsum``/``davg``.
2. KILODOLLAR (OR SMALLER) UNITS BEFORE DOUBLE MOMENTS. Second moments
   of cent-scale values overflow 2^53 at tiny SFs already (q_binseg_sse
   prefix sums; q_meta_random_effects tau^2). Rescale to units that
   keep x^2 sums comfortably inside exact-integer double range, or use
   DECIMAL cross-moments.
3. MEANS ARE DECIMAL-EXACT TOO. ``AVG(double_col)`` inherits the
   summation-order problem (q_between_estimator): compute
   decimal-exact SUM / exact COUNT, then divide once.
4. ROUND-THEN-DECIMAL FOR SURFACED AGGREGATES. A surfaced double must
   be bit-identical on both engines: produce it as
   ``ROUND(decimal_expr, k)`` cast to double, never a raw double
   aggregate. The compare rounds to 12 dp — that does NOT save a
   last-ulp flip at the 12th digit.
5. DATES AS EPOCH BIGINTS. DuckDB DATE through the pandas compare path
   renders as a timestamp, and at least one DATE + INTERVAL produced a
   wrong value under ``.df()``. Surface every date result as an epoch
   BIGINT (days or seconds) on BOTH sides. Timestamps: µs precision or
   epoch-second BIGINTs.
6. TOTAL-ORDER TIE-BREAKS BEFORE ANY LIMIT/TOP-K. Every LIMIT / top-k /
   QUALIFY must be fully tie-broken by a unique key on both sides, or
   the two engines legitimately return different row SETS.
7. ALIAS EVERY COMPUTED COLUMN IDENTICALLY on the Spark and SQL sides —
   the compare sorts columns by NAME before hashing.
8. INTEGER DIVISION / MODULO / CAST CORNERS: Spark truncates toward
   zero on cast-to-int, DuckDB rounds — use TRUNC-matched oracle
   expressions (see extensions_r10dk "dialect pins IV").

If a new batch needs a unit trick at sf0.001 after following all eight,
the fix belongs in the QUERY (root cause), never in the compare.
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
