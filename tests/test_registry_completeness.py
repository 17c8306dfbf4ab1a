"""Registry single-source-of-truth guard (ADVICE r10 #2).

all_queries() is driven by ONE _MODULE_ORDER list; the failure the old
duplicated import-block + iteration-tuple design allowed — a module on
disk whose queries silently never reach the registry — is now caught by
_assert_module_order_complete(). Both directions pinned here. No
SparkSession needed.
"""

from __future__ import annotations

import os

import pytest

from kcore_spark import queries as qpkg


def test_module_order_matches_disk():
    """The committed state passes: every extensions_* file on disk is
    either registered directly or one of the three adjudicated r8g
    re-exports."""
    qpkg._assert_module_order_complete()


def test_module_order_has_no_ghost_entries():
    """Every name in _MODULE_ORDER corresponds to a real module file —
    a deleted/renamed file would otherwise fail only at import time
    inside all_queries()."""
    here = os.path.dirname(qpkg.__file__)
    for name in qpkg._MODULE_ORDER:
        assert os.path.isfile(os.path.join(here, f"{name}.py")), name


def test_unregistered_module_on_disk_fails_fast(monkeypatch):
    """A new extensions_* batch file committed without a _MODULE_ORDER
    entry must raise, not silently drop its queries."""
    here = os.path.dirname(qpkg.__file__)
    real = os.listdir(here)
    monkeypatch.setattr(
        os, "listdir", lambda p: real + ["extensions_r99_forgotten.py"]
    )
    with pytest.raises(RuntimeError, match="extensions_r99_forgotten"):
        qpkg._assert_module_order_complete()


def test_module_order_is_duplicate_free():
    assert len(qpkg._MODULE_ORDER) == len(set(qpkg._MODULE_ORDER))
