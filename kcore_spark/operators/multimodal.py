"""Multimodal column plumbing (SURVEY §2.3 J): opaque binary payloads
with typed metadata, processed via Arrow-batched mapInPandas.

The image/audio decode libraries are not in this container, so the
decode step HERE is STUBBED (deterministic byte-level features instead
of pixels — see ``decode_stub``). Everything around the stub is real:
the binary column schema, the mapInPandas batch shape (pandas
DataFrames of bytes), partition preservation, and the typed metadata
struct. Swapping ``decode_stub`` for PIL/librosa is a one-function
change, and the Spark plan is identical.

r7 addendum: for the two formats decodable with the STDLIB alone the
stub excuse is gone — operators/media.py implements REAL WAV/PCM and
PNG (all five scanline filters) decoding from the public specs, with
the same mapInPandas plumbing (``media_features``) and round-trip
tests. This module's fake-payload queries stay as the oracle-checked
plumbing pins (their outputs are SQL-replicable; zlib inflation is
not), media.py is the real-decode path.

Scale: mapInPandas streams Arrow batches through Python — the only
sane shape for per-payload native decode at 100 TB (one Python worker
per core, no per-row pickling, no driver involvement). Batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<n_bytes: long, declared_chars: long>"
)

FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, first_byte long, last_byte long"


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Synthesize a binary payload column from text (fixture stand-in
    for real image/audio bytes) plus a typed metadata struct."""
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("n_chars").cast("long").alias("declared_chars"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB for the real media decode (no PIL/librosa in container).

    Returns deterministic byte-level features so the pipeline is
    testable end-to-end. A real deployment replaces this body with
    e.g. PIL.Image.open(io.BytesIO(payload)) and emits real features.
    """
    if payload is None or len(payload) == 0:
        return {"n_bytes": 0, "first_byte": -1, "last_byte": -1}
    return {"n_bytes": len(payload), "first_byte": payload[0], "last_byte": payload[-1]}


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                    "last_byte": [f["last_byte"] for f in feats],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Evenly-spaced frame sampling over binary payloads — the video
    counterpart of extract_features, demonstrating the 1→N mapInPandas
    shape (each input row yields n_frames output rows inside the same
    Arrow batch; no explode/shuffle involved).

    Frame i of a payload of b bytes starts at floor(i*b/n) and spans
    frame_bytes bytes (clipped at the end) — with a real video lib this
    is keyframe extraction at fixed timestamps; the byte-window stand-in
    keeps the batch shape, schema and partitioning identical.
    """

    def batches(it):
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = len(payload) if payload is not None else 0
                for i in range(n_frames):
                    if b == 0:
                        continue
                    off = (i * b) // n_frames
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[off : off + frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(batches, FRAME_SCHEMA)


ENERGY_SCHEMA = "doc_id long, window_idx int, n_samples int, energy long"


def waveform_energy(media: DataFrame, window: int = 64) -> DataFrame:
    """Windowed energy over a byte waveform — the audio counterpart of
    frame_sample: payload bytes stand in for PCM samples, per-window
    sum stands in for RMS energy (a real deployment decodes with
    librosa/soundfile and sums squared samples; batch shape, schema
    and the 1→N expansion are identical).
    """

    def batches(it):
        for pdf in it:
            ids, idxs, ns, energies = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = payload if payload is not None else b""
                for w in range((len(b) + window - 1) // window):
                    chunk = b[w * window : (w + 1) * window]
                    ids.append(doc_id)
                    idxs.append(w)
                    ns.append(len(chunk))
                    energies.append(sum(chunk))
            yield pd.DataFrame(
                {"doc_id": ids, "window_idx": idxs, "n_samples": ns, "energy": energies}
            )

    return media.mapInPandas(batches, ENERGY_SCHEMA)
