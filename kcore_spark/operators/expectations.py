"""Declarative data-quality expectations, evaluated in ONE pass.

The dbt-tests / Great-Expectations shape re-expressed Spark-first:
each expectation compiles to a conditional-count aggregate, the whole
suite folds into a single partial-aggregated job over one scan (at
100 TB the table is read once, not once per check), and uniqueness —
the one check that genuinely needs a shuffle — rides its own groupBy
but still never materializes duplicates, only counts them.

Expectations:
- not_null(col)
- unique(col, ...)          (composite keys allowed)
- accepted_values(col, [..])
- in_range(col, lo, hi)     (inclusive)
- matches(col, regex)
- relationship(col, other_df, other_col)  (referential integrity via
  left-anti count — broadcast when the dimension side is small)

Returns one row per expectation: (expectation, column, violations,
n_rows) — a CI gate asserts violations == 0.

Provenance: declared analytics surface of OUR engine (SURVEY §2.3 N);
the reference implements no operators (ApiVersions only,
`/root/reference/pkg/kafka/kafka_api.go:84-97`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ExpectationSuite:
    df: DataFrame
    _agg_checks: list[tuple[str, str, F.Column]] = field(default_factory=list)
    _extra: list[DataFrame] = field(default_factory=list)

    # ------------------------------------------ single-pass checks

    def not_null(self, col: str) -> "ExpectationSuite":
        self._agg_checks.append(
            ("not_null", col, F.sum(F.col(col).isNull().cast("long")))
        )
        return self

    def accepted_values(self, col: str, values: list) -> "ExpectationSuite":
        self._agg_checks.append(
            (
                "accepted_values",
                col,
                F.sum(
                    (~F.col(col).isin(values) | F.col(col).isNull()).cast("long")
                ),
            )
        )
        return self

    def in_range(self, col: str, lo, hi) -> "ExpectationSuite":
        self._agg_checks.append(
            (
                "in_range",
                col,
                F.sum(
                    (
                        F.col(col).isNull()
                        | (F.col(col) < F.lit(lo))
                        | (F.col(col) > F.lit(hi))
                    ).cast("long")
                ),
            )
        )
        return self

    def matches(self, col: str, pattern: str) -> "ExpectationSuite":
        self._agg_checks.append(
            (
                "matches",
                col,
                F.sum(
                    (
                        F.col(col).isNull() | ~F.col(col).rlike(pattern)
                    ).cast("long")
                ),
            )
        )
        return self

    # ------------------------------------------ shuffle-needing checks

    def unique(self, *cols: str) -> "ExpectationSuite":
        name = ",".join(cols)
        dupes = (
            self.df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .agg(
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("violations")
            )
            .select(
                F.lit("unique").alias("expectation"),
                F.lit(name).alias("column"),
                F.col("violations").cast("long"),
            )
        )
        self._extra.append(dupes)
        return self

    def relationship(
        self, col: str, other: DataFrame, other_col: str
    ) -> "ExpectationSuite":
        """Referential integrity: every non-null value of `col` exists
        in other[other_col]. Left-anti join counts orphans; Spark
        broadcasts the dimension side when it is small."""
        orphans = (
            self.df.where(F.col(col).isNotNull())
            .join(
                other.select(F.col(other_col).alias("__ref")).distinct(),
                F.col(col) == F.col("__ref"),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(
                F.lit("relationship").alias("expectation"),
                F.lit(col).alias("column"),
                F.col("violations").cast("long"),
            )
        )
        self._extra.append(orphans)
        return self

    # ------------------------------------------ evaluation

    def run(self) -> DataFrame:
        """One job for every aggregate check + one per shuffle check,
        unioned into (expectation, column, violations, n_rows)."""
        n_rows = F.count(F.lit(1))
        aggs = [n_rows.alias("__n_rows")] + [
            c.alias(f"__c{i}") for i, (_, _, c) in enumerate(self._agg_checks)
        ]
        base = self.df.agg(*aggs)
        rows = base.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(kind).alias("expectation"),
                            F.lit(col).alias("column"),
                            F.coalesce(F.col(f"__c{i}"), F.lit(0))
                            .cast("long")
                            .alias("violations"),
                        )
                        for i, (kind, col, _) in enumerate(self._agg_checks)
                    ]
                )
            ).alias("e"),
            F.col("__n_rows").alias("n_rows"),
        ).select("e.expectation", "e.column", "e.violations", "n_rows")
        total = self.df.count()
        for extra in self._extra:
            rows = rows.unionByName(
                extra.withColumn("n_rows", F.lit(total).cast("long"))
            )
        return rows
