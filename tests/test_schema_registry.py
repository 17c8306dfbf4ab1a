"""Schema registry: version lifecycle, the compatibility matrix
(BACKWARD/FORWARD/FULL/NONE incl. widenings and transitivity), and
the producer-side validate_batch gate."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kcore_spark.sources.schema_registry import (
    IncompatibleSchemaError,
    SchemaRegistry,
    check_compatibility,
)


def s(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


V1 = s(("id", T.LongType(), False), ("name", T.StringType(), True))


@pytest.fixture()
def reg():
    with tempfile.TemporaryDirectory(prefix="kcore_sr_") as d:
        yield SchemaRegistry(d)


# ------------------------------------------------- compatibility matrix


def test_backward_allows_new_nullable_field():
    v2 = s(("id", T.LongType(), False), ("name", T.StringType(), True), ("tag", T.StringType(), True))
    assert check_compatibility(V1, v2, "BACKWARD")


def test_backward_rejects_new_required_field():
    v2 = s(("id", T.LongType(), False), ("must", T.StringType(), False))
    assert not check_compatibility(V1, v2, "BACKWARD")


def test_backward_allows_dropping_a_field():
    v2 = s(("id", T.LongType(), False))
    assert check_compatibility(V1, v2, "BACKWARD")
    # ...but FORWARD rejects it when the dropped field was required
    v0 = s(("id", T.LongType(), False), ("req", T.StringType(), False))
    assert not check_compatibility(v0, s(("id", T.LongType(), False)), "FORWARD")


def test_widenings_are_readable_but_narrowings_are_not():
    wide = s(("id", T.LongType(), False))
    narrow = s(("id", T.IntegerType(), False))
    assert check_compatibility(narrow, wide, "BACKWARD")  # int -> long ok
    assert not check_compatibility(wide, narrow, "BACKWARD")
    dbl = s(("x", T.DoubleType(), True))
    flt = s(("x", T.FloatType(), True))
    assert check_compatibility(flt, dbl, "BACKWARD")
    assert not check_compatibility(dbl, flt, "BACKWARD")


def test_full_requires_both_directions():
    v2 = s(("id", T.LongType(), False), ("tag", T.StringType(), True))
    assert check_compatibility(V1, v2, "BACKWARD")
    assert check_compatibility(V1, v2, "FULL")  # tag nullable both ways
    v3 = s(("id", T.LongType(), False))  # drops nullable name: still FULL-ok
    assert check_compatibility(V1, v3, "FULL")
    v4 = s(("id", T.LongType(), False), ("name", T.StringType(), False))
    assert not check_compatibility(V1, v4, "FULL")  # name now required


def test_nested_struct_and_array_compat():
    inner1 = s(("a", T.IntegerType(), False))
    inner2 = s(("a", T.LongType(), False), ("b", T.StringType(), True))
    outer1 = s(("n", inner1, True), ("xs", T.ArrayType(T.IntegerType()), True))
    outer2 = s(("n", inner2, True), ("xs", T.ArrayType(T.LongType()), True))
    assert check_compatibility(outer1, outer2, "BACKWARD")
    assert not check_compatibility(outer2, outer1, "BACKWARD")


# ------------------------------------------------- registry lifecycle


def test_register_versions_and_idempotence(reg):
    assert reg.register("orders-value", V1) == 1
    assert reg.register("orders-value", V1) == 1  # idempotent re-register
    v2 = s(("id", T.LongType(), False), ("name", T.StringType(), True), ("tag", T.StringType(), True))
    assert reg.register("orders-value", v2) == 2
    assert reg.latest_version("orders-value") == 2
    assert reg.get("orders-value", 1) == V1
    assert reg.get("orders-value") == v2
    assert reg.subjects() == ["orders-value"]


def test_register_rejects_incompatible(reg):
    reg.register("s", V1)
    bad = s(("id", T.LongType(), False), ("must", T.StringType(), False))
    with pytest.raises(IncompatibleSchemaError):
        reg.register("s", bad)
    reg.set_mode("s", "NONE")
    assert reg.register("s", bad) == 2  # NONE allows anything


def test_transitive_check_covers_all_priors(reg):
    reg.register("s", V1)
    v2 = s(("id", T.LongType(), False), ("name", T.StringType(), True), ("tag", T.StringType(), True))
    reg.register("s", v2)
    # compatible with v2 (renames tag->tag2 nullable) but ALSO checked
    # against v1 — still fine since all new fields nullable
    v3 = s(("id", T.LongType(), False), ("tag2", T.StringType(), True))
    assert reg.register("s", v3) == 3


# ------------------------------------------------- producer-side gate


def test_validate_batch_flags_corrupt_and_missing_required(spark, reg):
    reg.register("ev-value", s(("id", T.LongType(), False), ("kind", T.StringType(), True)))
    rows = [
        ('{"id": 1, "kind": "a"}',),
        ('{"kind": "missing-id"}',),  # required field absent
        ("not json at all",),
        ('{"id": 4}',),  # nullable kind absent: fine
    ]
    df = spark.createDataFrame(rows, "value string")
    out = reg.validate_batch(df, "ev-value").collect()
    assert [r["__valid"] for r in out] == [True, False, False, True]
    assert out[0]["__parsed"]["id"] == 1
    # binary payloads (the topic-log value type) validate identically
    bdf = spark.createDataFrame(rows, "value string").select(
        F.encode("value", "utf-8").alias("value")
    )
    bout = reg.validate_batch(bdf, "ev-value").collect()
    assert [r["__valid"] for r in bout] == [True, False, False, True]
