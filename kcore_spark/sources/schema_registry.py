"""Schema registry: versioned value schemas per subject with
compatibility gating — the Confluent-Schema-Registry-shaped component
a Kafka deployment uses to keep producers and consumers agreeing on
payload shape. Re-expressed Spark-native: schemas ARE Spark
StructTypes (stored as their canonical JSON), validation is
``from_json`` against the registered schema, and the store is the
same atomic-rename file layout the topic log uses.

Semantics (mirroring the public registry contract):

- A SUBJECT (conventionally ``<topic>-value``) holds an ordered list
  of schema versions, 1-based.
- ``register`` appends a new version iff it passes the subject's
  compatibility mode against the latest version (and, for the
  transitive modes, against every prior version):
  BACKWARD   — data written with the PREVIOUS schema is readable by
               the NEW one: every field the new schema requires
               (non-nullable) must exist in the old with a readable
               type; new fields must be nullable (else old data has
               no value for them).
  FORWARD    — data written with the NEW schema is readable by the
               PREVIOUS one (the mirror-image check).
  FULL       — both.
  NONE       — anything goes.
- Readable type = identical, or a safe widening (int→long,
  float→double, int/long→double) — the promotions every columnar
  reader performs losslessly.
- ``validate_batch`` is the producer-side gate: parse a binary/string
  JSON payload column with the latest schema in FAILFAST-free mode
  and report (valid, corrupt) counts — the cheap pre-produce check a
  pipeline runs before appending to a governed topic.

Provenance: the reference declares the Kafka event-streaming model
(`/root/reference/README.md:17`) with no schema governance; this is
the standard ecosystem companion, built on public Spark schema JSON.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODES = ("BACKWARD", "FORWARD", "FULL", "NONE")

# safe widenings: (writer_type, reader_type)
_PROMOTIONS = {
    ("integer", "long"),
    ("integer", "double"),
    ("long", "double"),
    ("float", "double"),
}


def _readable(writer: T.DataType, reader: T.DataType) -> bool:
    """Can data written as `writer` be read as `reader`?"""
    if writer == reader:
        return True
    w, r = writer.typeName(), reader.typeName()
    if (w, r) in _PROMOTIONS:
        return True
    if isinstance(writer, T.StructType) and isinstance(reader, T.StructType):
        return _compatible(writer, reader)
    if isinstance(writer, T.ArrayType) and isinstance(reader, T.ArrayType):
        return _readable(writer.elementType, reader.elementType)
    if isinstance(writer, T.MapType) and isinstance(reader, T.MapType):
        return _readable(writer.keyType, reader.keyType) and _readable(
            writer.valueType, reader.valueType
        )
    return False


def _compatible(writer: T.StructType, reader: T.StructType) -> bool:
    """Struct-level readability: every field the reader REQUIRES must
    be present in the writer with a readable type; reader fields
    absent from the writer must be nullable (they read as null);
    writer fields unknown to the reader are ignored."""
    wf = {f.name: f for f in writer.fields}
    for f in reader.fields:
        if f.name in wf:
            if not _readable(wf[f.name].dataType, f.dataType):
                return False
            # nullability narrowing: a reader that REQUIRES the field
            # cannot read data whose writer allowed nulls in it
            if wf[f.name].nullable and not f.nullable:
                return False
        elif not f.nullable:
            return False
    return True


def check_compatibility(
    old: T.StructType, new: T.StructType, mode: str = "BACKWARD"
) -> bool:
    """Is `new` an acceptable successor of `old` under `mode`?"""
    if mode == "NONE":
        return True
    if mode == "BACKWARD":
        return _compatible(old, new)
    if mode == "FORWARD":
        return _compatible(new, old)
    if mode == "FULL":
        return _compatible(old, new) and _compatible(new, old)
    raise ValueError(f"unknown compatibility mode {mode!r}; pick one of {MODES}")


class IncompatibleSchemaError(ValueError):
    pass


class SchemaRegistry:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------ storage

    def _subject_dir(self, subject: str) -> str:
        return os.path.join(self.root, subject)

    def _versions(self, subject: str) -> list[int]:
        d = self._subject_dir(subject)
        if not os.path.isdir(d):
            return []
        out = []
        for fn in os.listdir(d):
            if fn.startswith("v") and fn.endswith(".json"):
                try:
                    out.append(int(fn[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    # ------------------------------------------------------ API

    def mode(self, subject: str) -> str:
        p = os.path.join(self._subject_dir(subject), "_mode")
        if os.path.exists(p):
            with open(p) as f:
                return f.read().strip()
        return "BACKWARD"

    def set_mode(self, subject: str, mode: str) -> None:
        if mode not in MODES:
            raise ValueError(f"unknown compatibility mode {mode!r}; pick one of {MODES}")
        d = self._subject_dir(subject)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f"_mode.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(mode)
        os.replace(tmp, os.path.join(d, "_mode"))

    def register(self, subject: str, schema: T.StructType) -> int:
        """Register a schema version. Identical-to-latest re-register
        returns the existing version (idempotent, like the public
        registry); an incompatible schema raises. Transitivity: the
        new schema is checked against EVERY prior version — the
        stricter stance, so a consumer pinned to any historical
        version keeps working."""
        versions = self._versions(subject)
        if versions:
            latest = self.get(subject, versions[-1])
            if latest.jsonValue() == schema.jsonValue():
                return versions[-1]
            mode = self.mode(subject)
            for v in versions:
                if not check_compatibility(self.get(subject, v), schema, mode):
                    raise IncompatibleSchemaError(
                        f"schema is {mode}-incompatible with {subject} v{v}"
                    )
        d = self._subject_dir(subject)
        os.makedirs(d, exist_ok=True)
        v = (versions[-1] + 1) if versions else 1
        tmp = os.path.join(d, f"v{v}.json.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(schema.jsonValue(), f)
        os.replace(tmp, os.path.join(d, f"v{v}.json"))
        return v

    def get(self, subject: str, version: int | None = None) -> T.StructType:
        versions = self._versions(subject)
        if not versions:
            raise KeyError(f"unknown subject {subject!r}")
        v = versions[-1] if version is None else version
        if v not in versions:
            raise KeyError(f"{subject} has no version {v}; available: {versions}")
        with open(os.path.join(self._subject_dir(subject), f"v{v}.json")) as f:
            return T.StructType.fromJson(json.load(f))

    def latest_version(self, subject: str) -> int:
        versions = self._versions(subject)
        if not versions:
            raise KeyError(f"unknown subject {subject!r}")
        return versions[-1]

    def subjects(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root) if self._versions(d)
        )

    # ------------------------------------------------- producer gate

    def validate_batch(
        self, df: DataFrame, subject: str, payload_col: str = "value"
    ) -> DataFrame:
        """Producer-side validation: parse the JSON payload column
        (binary or string) against the subject's latest schema and
        return the input with two extra columns — ``__valid`` (the
        payload parsed AND every non-nullable schema field is present
        non-null) and ``__parsed`` (the typed struct). One column
        expression riding whatever scan feeds the produce; callers
        route invalid rows to a DLQ (see q_stream_dlq_split for the
        routing shape)."""
        schema = self.get(subject)
        payload = F.col(payload_col)
        if dict(df.dtypes)[payload_col] == "binary":
            payload = F.decode(payload, "utf-8")
        parsed = F.from_json(payload, schema)
        required_ok = [
            parsed.getField(f.name).isNotNull()
            for f in schema.fields
            if not f.nullable
        ]
        valid = parsed.isNotNull()
        for c in required_ok:
            valid = valid & c
        return df.withColumn("__parsed", parsed).withColumn("__valid", valid)
