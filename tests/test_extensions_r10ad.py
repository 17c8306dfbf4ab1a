"""Round-10 LLM-planning block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_temperature_widens_distribution(spark):
    """Effective vocab is monotone in temperature and bounded by |V|."""
    from kcore_spark.queries.extensions_r10ad import q_sampling_temperature_mass

    rows = q_sampling_temperature_mass(spark, SF_DIR).collect()
    assert [r.temperature for r in rows] == [0.7, 1.0, 1.3]
    effs = [r.effective_vocab for r in rows]
    assert effs == sorted(effs)
    for r in rows:
        assert 1 <= r.effective_vocab <= r.vocab_size


def test_chinchilla_identities(spark):
    from kcore_spark.queries.extensions_r10ad import q_chinchilla_plan

    r = q_chinchilla_plan(spark, SF_DIR).collect()[0]
    assert r.optimal_params == r.train_tokens // 20
    assert abs(r.train_flops - 6.0 * r.optimal_params * r.train_tokens) < 1
