"""Structural invariants of the round-9 batch-Q pipeline transforms
(n-gram scrub, curation funnel, shard manifest)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_scrub_never_grows_and_scrubs_known_repeat(spark):
    """tokens_after <= tokens_before per source; on a constructed doc
    with a verbatim repeated phrase the scrub must remove exactly the
    second occurrence's span."""
    from kcore_spark.queries.extensions_r9q import q_repeated_ngram_scrub

    rows = q_repeated_ngram_scrub(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.tokens_after <= r.tokens_before
        assert 0.0 <= r.scrub_rate < 1.0


def test_scrub_exact_on_synthetic_doc(spark, tmp_path):
    """'a b c d a b c d' → the second 'a b c' dup-start at pos 4
    covers positions 4..6 (the window also reaches 7 via pos 5? no —
    only starts at 4 exist), leaving pos 7 ('d') and 0..3: 5 tokens."""
    import duckdb

    from kcore_spark.queries.extensions_r9q import q_repeated_ngram_scrub

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.execute("INSERT INTO d VALUES (1, 'a b c d a b c d', 'en', 's', 15)")
    con.execute(f"COPY d TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)")
    r = q_repeated_ngram_scrub(spark, str(tmp_path)).collect()[0]
    assert r.tokens_before == 8
    # dup 3-gram starts: pos4 ('a b c'), pos5 ('b c d') → covered
    # positions = union([2,4]..no: [p-2,p] window marks pos 4,5,6,7
    assert r.tokens_after == 4


def test_funnel_is_monotone(spark):
    from kcore_spark.queries.extensions_r9q import q_curation_funnel

    rows = q_curation_funnel(spark, SF_DIR).collect()
    ns = [r.n_docs for r in sorted(rows, key=lambda r: r.stage)]
    assert len(ns) == 5
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert rows[0].survival == 1.0 or ns[0] == 0


def test_shard_manifest_offsets_and_conservation(spark):
    """First doc of every shard has offset 0; shard byte totals
    conserve Σ(n_chars+1); heads are doc_id-ordered."""
    import duckdb

    from kcore_spark.queries.extensions_r9q import q_shard_manifest

    rows = q_shard_manifest(spark, SF_DIR).collect()
    assert rows
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        assert docs[0].offset == 0
        offs = [d.offset for d in docs]
        assert offs == sorted(offs)
    total = duckdb.sql(
        f"SELECT SUM(n_chars + 1) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert sum({r.shard: r.shard_bytes for r in rows}.values()) == total
