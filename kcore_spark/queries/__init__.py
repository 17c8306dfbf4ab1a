"""Query inventory (SURVEY §2.3) — the contract for the correctness gate.

Each module exposes ``QUERIES: dict[str, QuerySpec]``. A QuerySpec pairs
the Spark implementation (spark, sf_dir) -> DataFrame with its DuckDB
oracle SQL (or None for non-SQL-expressible ops → rows-only check).

Determinism rules applied throughout (FIXTURES.md):
- every computed column aliased identically on both sides;
- decimal-exact sums surfaced as double (bit-stable under any
  aggregation order — see operators/relational.py);
- LIMIT/top-k always fully tie-broken by a unique key;
- timestamps surfaced at µs precision or as epoch-second BIGINTs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def all_queries() -> dict[str, QuerySpec]:
    from kcore_spark.queries import (
        dedup,
        events,
        packing_q,
        quality_q,
        ranking,
        sampling_q,
        recursive,
        scale_q,
        scalars,
        setops,
        similarity,
        sources_q,
        streaming,
        subqueries,
        text,
        timeseries,
        topiclog,
        tpch,
        tpch2,
        tpch3,
        udfs,
        windows,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        tpch,
        tpch2,
        windows,
        setops,
        scalars,
        events,
        dedup,
        similarity,
        text,
        streaming,
        topiclog,
        udfs,
        subqueries,
        sources_q,
        recursive,
        tpch3,
        ranking,
        timeseries,
        scale_q,
        packing_q,
        sampling_q,
        quality_q,
    ):
        for k, v in mod.QUERIES.items():
            if k in out:
                raise ValueError(f"duplicate query name: {k}")
            out[k] = v
    return out
