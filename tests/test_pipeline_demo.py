"""The composed curation pipeline holds its invariants end-to-end."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/scripts")

from pipeline_demo import run

from .conftest import SF_DIR_MED


def test_pipeline_invariants(spark):
    s = run(SF_DIR_MED)
    # monotone shrinkage through the cleaning stages
    assert (
        s["raw"]
        >= s["after_exact_dedup"]
        >= s["after_near_dedup"]
        >= s["after_containment"]
        >= s["after_quality_filter"]
        >= s["after_classifier_gate"]
    )
    # near-dedup actually removed the planted near-duplicates
    assert s["after_near_dedup"] < s["after_exact_dedup"]
    # after the dedup stages, no eval doc shares exact text with train
    assert s["eval_leaked"] == 0
    # everything surviving has an embedding (1:1 doc↔vec at fixture SFs)
    assert s["with_embeddings"] == s["after_classifier_gate"]
    assert s["languages"] == 5
    assert s["total_tokens"] > 0
    assert s["centroid_rows"] % 64 == 0  # labels × 64 dims
