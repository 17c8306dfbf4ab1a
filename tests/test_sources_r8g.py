"""text + binaryFile sources: TSV round-trip (including a tab INSIDE
the text body, which the 4-limit split must keep intact) and real
media files listed, read and decoded through the binaryFile format."""

from __future__ import annotations


def _write_documents(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_text_source_roundtrip_preserves_embedded_tabs(spark, tmp_path):
    from kcore_spark.queries import sources_q

    sources_q._STAGED.clear()
    rows = [
        (1, "plain words", "en", "web"),
        (2, "tab\tinside body", "en", "web"),  # 4-limit split keeps it whole
        (3, "more words", "de", "web"),
    ]
    _write_documents(spark, tmp_path, rows)
    got = {
        (r["lang"], r["source"]): (r["n_docs"], r["id_sum"], r["chars"])
        for r in sources_q.q_text_source(spark, str(tmp_path)).collect()
    }
    assert got[("en", "web")] == (2, 3, len("plain words") + len("tab\tinside body"))
    assert got[("de", "web")] == (1, 3, len("more words"))
    sources_q._STAGED.clear()


def test_binaryfile_source_decodes_real_files(spark, tmp_path):
    from kcore_spark.queries import sources_q

    sources_q._STAGED.clear()
    # doc_ids 0 and 34 -> wav (even), 17 and 51 -> png (odd); only
    # multiples of 17 are staged
    rows = [(d, "x", "en", "web") for d in (0, 17, 34, 51, 5, 18)]
    _write_documents(spark, tmp_path, rows)
    got = {
        r["kind"]: (r["n_files"], r["id_sum"], r["total_units"])
        for r in sources_q.q_binaryfile_source(spark, str(tmp_path)).collect()
    }
    # wav: n_samples = 160 + (d % 5) * 40 -> d=0: 160, d=34: 160+4*40=320
    assert got["wav"] == (2, 34, 160 + 320)
    # png: (8 + d%9) * (4 + d%7) -> d=17: (8+8)*(4+3)=112, d=51: (8+6)*(4+2)=84
    assert got["png"] == (2, 68, 112 + 84)
    sources_q._STAGED.clear()
