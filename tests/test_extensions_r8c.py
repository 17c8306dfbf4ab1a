"""Round-8c extension operators: invariants the sf0.01 oracle parity
can't see — Kaplan-Meier survival on a hand-computable cohort, NDCG=1
for a perfect ranking, JL projection vs a pure-python reference,
logistic GD learning a separable axis, BPE merges on a corpus whose
merge sequence is derivable by hand, and chunk dedup dropping a
verbatim copy."""

from __future__ import annotations

import datetime
import hashlib

import pytest

from .conftest import SF_DIR


ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp, o_orderpriority string"
)


def _order(k, cust, day):
    return (k, cust, "F", 100.0, datetime.datetime(2024, 1, day), "1-URGENT")


# ---------------------------------------------------- Kaplan-Meier


def test_kaplan_meier_hand_computable_cohort(spark, tmp_path):
    """Durations (event): 1(e), 1(e), 2(e), 3(censored) →
    S(1)=1-2/4=0.5, S(2)=0.5·(1-1/2)=0.25, S(3)=0.25 (censor only)."""
    from kcore_spark.queries.extensions_r8c import q_kaplan_meier

    rows, k = [], 0
    for cust, span, n in ((1, 1, 10), (2, 1, 10), (3, 2, 10), (4, 3, 2)):
        for i in range(n):
            rows.append(_order(k, cust, 1 if i else 1 + span))
            k += 1
    spark.createDataFrame(rows, ORDERS_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {r["dur"]: r for r in q_kaplan_meier(spark, str(tmp_path)).collect()}
    assert out[1]["d"] == 2 and out[1]["n_risk"] == 4
    assert out[1]["survival"] == pytest.approx(0.5, abs=1e-9)
    assert out[2]["survival"] == pytest.approx(0.25, abs=1e-9)
    assert out[3]["c"] == 1 and out[3]["survival"] == pytest.approx(0.25, abs=1e-9)


# -------------------------------------------------------- Benford


def test_benford_shares_sum_to_one_and_law_is_pinned(spark):
    from kcore_spark.queries.extensions_r8c import q_benford_digits

    out = q_benford_digits(spark, SF_DIR).collect()
    assert [r["digit"] for r in out] == list(range(1, 10))
    assert sum(r["obs_share"] for r in out) == pytest.approx(1.0, abs=1e-6)
    import math

    for r in out:
        assert r["exp_share"] == pytest.approx(
            math.log10(1 + 1 / r["digit"]), abs=1e-8
        )
        assert r["chi2_contrib"] >= 0


# ----------------------------------------------------------- NDCG


def test_ndcg_is_one_for_perfect_ranking(spark, tmp_path):
    """acctbal strictly increasing with order count → the predicted
    ranking equals the ideal ranking → NDCG == 1 in every nation."""
    from kcore_spark.queries.extensions_r8c import q_ndcg_eval

    cust, orders, k = [], [], 0
    for c in range(1, 13):
        cust.append((c, f"c{c}", c % 2, float(c * 100), "SEG"))
        for _ in range(c):  # rel == custkey, aligned with acctbal
            orders.append(_order(k, c, 1 + k % 20))
            k += 1
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(orders, ORDERS_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = q_ndcg_eval(spark, str(tmp_path)).collect()
    assert len(out) == 2
    for r in out:
        assert r["ndcg"] == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------- random projection


def test_random_projection_matches_python_reference(spark):
    from kcore_spark.catalog import load_table
    from kcore_spark.queries.extensions_r8c import RP_IN, RP_OUT, q_random_projection

    got = {
        (r["vec_id"], r["dim"]): r["v"]
        for r in q_random_projection(spark, SF_DIR)
        .where("vec_id IN (0, 205)")
        .collect()
    }
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings")
        .where("vec_id IN (0, 205)")
        .collect()
    }
    for vid, e in emb.items():
        for j in range(RP_OUT):
            acc = 0.0
            for i in range(RP_IN):
                h = hashlib.md5(f"rp-{i}-{j}".encode()).hexdigest()
                acc += e[i] * (1.0 if h[0] in "01234567" else -1.0)
            assert got[(vid, j)] == pytest.approx(acc / 4.0, abs=1e-7), (vid, j)


# ------------------------------------------------------ logreg GD


def test_logreg_learns_the_separating_axis(spark, tmp_path):
    """y == (e[3] > 0): after 2 GD steps the largest |weight| must sit
    on axis 3 with positive sign."""
    from kcore_spark.queries.extensions_r8c import LR_DIM, q_logreg_gd

    rows = []
    for i in range(80):
        v = [0.01 * ((i + d) % 5) for d in range(LR_DIM)]
        v[3] = 2.0 if i % 2 == 0 else -2.0
        rows.append((i, v, 0 if i % 2 == 0 else 9))  # label<5 ⇔ e[3]>0
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = q_logreg_gd(spark, str(tmp_path)).collect()
    assert len(out) == LR_DIM
    top = max(out, key=lambda r: abs(r["weight"]))
    assert top["pos"] == 3 and top["weight"] > 0


# ------------------------------------------------------ BPE learn


def test_bpe_merges_hand_derivable(spark, tmp_path):
    """Corpus 'aaab aaab ab': merge1 'a a'(4) → merge2 'a b'(3) →
    merge3 'aa ab'(2) — the classic Sennrich walk-through shape."""
    from kcore_spark.queries.extensions_r8c import q_bpe_learn

    text = "aaab aaab ab"
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = [(r["step"], r["pair"], r["merged"], r["cnt"]) for r in q_bpe_learn(spark, str(tmp_path)).collect()]
    assert out == [
        (1, "a a", "aa", 4),
        (2, "a b", "ab", 3),
        (3, "aa ab", "aaab", 2),
    ]


# ---------------------------------------------------- chunk dedup


def test_chunk_dedup_drops_verbatim_copy(spark, tmp_path):
    from kcore_spark.queries.extensions_r8c import q_chunk_dedup

    text = " ".join(f"w{i % 9}" for i in range(25))  # 3 chunks (10/10/5)
    rows = [(1, text, "en", "s", len(text)), (2, text, "en", "s", len(text))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in q_chunk_dedup(spark, str(tmp_path)).collect()}
    assert out[1]["n_chunks"] == 3 and out[1]["retained_ratio"] == 1.0
    assert out[2]["n_chunks"] == 3 and out[2]["kept_chunks"] == 0


# ------------------------------------------------ tokenizer apply


def test_tokenizer_fertility_hand_derivable(spark, tmp_path):
    """Corpus 'aaab aaab ab ba': after the 3 learned merges, 'aaab'
    and 'ab' are single tokens while 'ba' stays 2 ('b a' was never
    frequent enough) → 4 words, 5 tokens, fertility 1.25."""
    from kcore_spark.queries.extensions_r8c import q_tokenizer_apply

    text = "aaab aaab ab ba"
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = q_tokenizer_apply(spark, str(tmp_path)).first()
    assert row["n_words"] == 4 and row["n_tokens"] == 5
    assert row["fertility"] == 1.25
