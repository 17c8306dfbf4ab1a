from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full-fixture replays, sweeps)"
    )


@pytest.fixture(scope="session")
def spark():
    from kcore_spark.testing import shared_spark

    return shared_spark()


@pytest.fixture(scope="session")
def duck():
    from kcore_spark.testing import duckdb_connection

    return duckdb_connection(SF_DIR)
