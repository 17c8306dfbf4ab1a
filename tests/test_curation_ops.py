"""Round-6 curation/sketch block: count-min guarantees, split
determinism/ratios, PII redaction behavior, snapshot-diff
classification, sweep-line concurrency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kcore_spark.operators.sketches import cms_estimate, count_min_sketch

SF = "/root/testdata/sf0.01"


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    df = spark.range(1000).select(
        (F.col("id") % 50).cast("string").alias("k")
    )  # 50 keys × 20 each
    sketch = count_min_sketch(df, F.col("k"), depth=4, width=256)
    # sketch size is bounded by depth×width regardless of cardinality
    assert sketch.count() <= 4 * 256
    keys = df.select("k").distinct()
    est = cms_estimate(sketch, keys, F.col("k"), depth=4, width=256)
    rows = {r["k"]: r["est"] for r in est.collect()}
    assert len(rows) == 50
    # CMS guarantee: estimates never fall below the true count
    assert all(v >= 20 for v in rows.values())
    # with 50 keys in 256 buckets and min-over-4-rows, expect exactness
    # for the large majority (an all-collide outcome would be a hash bug)
    exact = sum(1 for v in rows.values() if v == 20)
    assert exact >= 40


def test_cms_is_deterministic(spark):
    df = spark.range(200).select((F.col("id") % 7).cast("string").alias("k"))
    a = count_min_sketch(df, F.col("k")).orderBy("j", "bucket").collect()
    b = count_min_sketch(df, F.col("k")).orderBy("j", "bucket").collect()
    assert a == b


def test_dataset_split_is_deterministic_and_ratioed(spark):
    from kcore_spark.queries.curation_q import q_dataset_split

    out = q_dataset_split(spark, SF).collect()
    again = q_dataset_split(spark, SF).collect()
    assert out == again
    totals: dict[str, int] = {}
    for r in out:
        totals[r["split"]] = totals.get(r["split"], 0) + r["n_docs"]
    n = sum(totals.values())
    # 80/10/10 within sampling noise at ~500 docs
    assert 0.7 < totals["train"] / n < 0.9
    assert 0.03 < totals["val"] / n < 0.2
    assert 0.03 < totals["test"] / n < 0.2


def test_pii_redaction_removes_all_planted_pii(spark):
    from kcore_spark.queries.curation_q import (
        _PII_EMAIL,
        _PII_LONGNUM,
        _PII_PHONE,
        q_pii_redact,
    )

    out = q_pii_redact(spark, SF)
    rows = out.collect()
    assert sum(r["n_emails"] for r in rows) > 0
    assert sum(r["n_phones"] for r in rows) > 0
    # every doc planted with PII (id % 7 == 0) was detected
    import duckdb

    n_planted = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet') WHERE doc_id % 7 = 0"
    ).fetchone()[0]
    assert sum(r["n_docs_with_pii"] for r in rows) == n_planted
    # and redaction is idempotent: scrubbing the scrubbed text finds nothing
    probe = spark.createDataFrame(
        [("x <EMAIL> y <PHONE> z <NUM>",)], "t string"
    ).select(
        F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), F.lit(0))).alias("e"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), F.lit(0))).alias("p"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_LONGNUM), F.lit(0))).alias("n"),
    )
    r = probe.first()
    assert (r["e"], r["p"], r["n"]) == (0, 0, 0)


def test_table_diff_partitions_every_key_once(spark):
    from kcore_spark.queries.curation_q import q_table_diff

    rows = {r["status"]: r for r in q_table_diff(spark, SF).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    import duckdb

    n_orders = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    # every v1 key lands in exactly one of removed/changed/unchanged
    assert (
        rows["removed"]["n_keys"]
        + rows["changed"]["n_keys"]
        + rows["unchanged"]["n_keys"]
        == n_orders
    )
    assert rows["changed"]["n_price_changed"] == rows["changed"]["n_keys"]


def test_max_concurrent_matches_bruteforce_on_small_input(spark):
    from kcore_spark.queries.curation_q import q_max_concurrent

    out = {r["event_type"]: r["max_concurrent"] for r in q_max_concurrent(spark, SF).collect()}
    # brute force at one sampled event type: count overlapping 30-min slots
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("event_type") == "click")
        .select(F.unix_millis(F.col("ts").cast("timestamp")).alias("t"))
        .collect()
    )
    ts = sorted(r["t"] for r in ev)
    slot = 30 * 60 * 1000
    best = 0
    for t in ts:
        # concurrency the instant event t starts: starts in (t-slot, t]
        best = max(best, sum(1 for u in ts if t - slot < u <= t))
    assert out["click"] == best


def test_minhash_error_estimates_bounded(spark):
    from kcore_spark.queries.curation_q import q_minhash_error

    rows = q_minhash_error(spark, SF).collect()
    assert rows, "LSH candidates expected at sf0.01"
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["true_jaccard"] <= 1.0
        # 6-component signatures quantize estimates to sixths
        assert abs(r["est_jaccard"] * 6 - round(r["est_jaccard"] * 6)) < 1e-9


def test_expectations_catch_planted_violations(spark):
    from kcore_spark.operators.expectations import ExpectationSuite

    rows = [
        (1, "O", 10.0, "ok@x"),
        (1, "O", 20.0, "ok@x"),     # duplicate id
        (2, "Z", -5.0, "bad"),      # bad status, out of range, bad format
        (3, None, 30.0, None),      # null status + null email
        (9, "F", 40.0, "ok@x"),     # orphan ref (no dim row 9)
    ]
    df = spark.createDataFrame(rows, "id long, status string, amt double, email string")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "ref long")
    out = {
        (r["expectation"], r["column"]): r["violations"]
        for r in (
            ExpectationSuite(df)
            .not_null("status")
            .accepted_values("status", ["O", "F"])
            .in_range("amt", 0, 100)
            .matches("email", r"^[a-z]+@[a-z]+$")
            .unique("id")
            .relationship("id", dim, "ref")
            .run()
            .collect()
        )
    }
    assert out[("not_null", "status")] == 1
    assert out[("accepted_values", "status")] == 2  # 'Z' and NULL
    assert out[("in_range", "amt")] == 1
    assert out[("matches", "email")] == 2  # 'bad' and NULL
    assert out[("unique", "id")] == 1  # one extra copy of id=1
    assert out[("relationship", "id")] == 1  # id=9 orphan
    # every row also reports the table size
    n = {r for r in out}  # keys sanity
    assert len(n) == 6
