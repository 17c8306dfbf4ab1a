"""Bench output contract (VERDICT r10 #1).

The driver captures only a ~2,000-char tail of bench.py's stdout and
json-parses the LAST line. BENCH_r07..r10 all recorded parsed:null
because the single full-detail line (~170 per-query timings, >20 KB)
overflowed that capture. The fix: the final printed line is a COMPACT
summary (headline total + the 24 fixed HEADLINE timings only), and the
full dict moves to an earlier stdout line + BENCH_DETAIL.json. These
tests pin that contract so the extras list growing can never break the
driver's parse again. No SparkSession needed.
"""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

# Conservative bound: the driver keeps 2,000 chars; leave headroom for a
# trailing newline and any final WARN the JVM might still emit.
TAIL_BUDGET = 1800


def _fake_timings() -> dict[str, float]:
    # worst realistic case: every headline + every extra + the streaming
    # side-channels present, all with max-width values
    t = {name: 123.456 for name in bench.HEADLINE}
    for name in bench.EXTRAS:
        t[f"{name}_extra"] = 123.456
    t["q_stream_tumbling_counts_warm"] = 123.456
    t["q_stream_tumbling_counts_persist_cold"] = 123.456
    t["q_stream_tumbling_counts_incremental"] = 123.456
    return t


def test_compact_line_fits_driver_tail():
    timings = _fake_timings()
    full, compact = bench.build_output_lines(timings, 9999.999, 0.1)
    assert len(compact) <= TAIL_BUDGET, (
        f"compact bench line is {len(compact)} chars — would overflow the "
        f"driver's 2,000-char stdout tail (budget {TAIL_BUDGET})"
    )


def test_compact_line_parses_with_required_keys():
    timings = _fake_timings()
    _, compact = bench.build_output_lines(timings, 21.6, 0.1)
    obj = json.loads(compact)
    assert obj["metric"] == "headline_queries_total"
    assert obj["unit"] == "sec"
    assert obj["value"] == 21.6
    assert obj["sf"] == 0.1
    # per-query detail for the 24-query headline set is retained inline
    assert set(obj["queries"]) == set(bench.HEADLINE)
    assert obj["detail"] == "BENCH_DETAIL.json"  # default when unthreaded
    assert obj["n_queries"] == len(timings)
    # the compact line names the artifact actually written
    _, compact2 = bench.build_output_lines(
        timings, 21.6, 0.1, detail_name="BENCH_DETAIL_r13.json"
    )
    assert json.loads(compact2)["detail"] == "BENCH_DETAIL_r13.json"


def test_full_line_carries_every_timing():
    timings = _fake_timings()
    full, _ = bench.build_output_lines(timings, 21.6, 0.1)
    obj = json.loads(full)
    assert obj["queries"] == timings
    assert obj["runs_per_headline_query"] == 2


def test_error_isolation_surfaces_in_both_lines():
    """A flaky query must not cost the round's bench record: errors are
    carried in the full line and counted in the compact line, and the
    compact line still fits the driver tail in the all-errored worst
    case."""
    timings = _fake_timings()
    errs = {name: "RuntimeError: boom" for name in list(timings)[:30]}
    full, compact = bench.build_output_lines(timings, 21.6, 0.1, errors=errs)
    assert json.loads(full)["errors"] == errs
    cobj = json.loads(compact)
    assert cobj["n_errors"] == 30
    assert len(compact) <= TAIL_BUDGET
    # no errors → no n_errors key (clean rounds look like clean rounds)
    _, clean = bench.build_output_lines(timings, 21.6, 0.1)
    assert "n_errors" not in json.loads(clean)


def test_detail_path_env_override(tmp_path, monkeypatch):
    """BENCH_DETAIL_PATH redirects the full-detail artifact; with no env
    set the default is ROUND- and CPU-STAMPED
    (BENCH_DETAIL_r{N}_c{cpus}.json, N from the driver's
    PROGRESS.jsonl, cpus from SPARK_GRAFT_CPUS) and gitignored, so a
    driver/judge bench run with no env leaves the committed
    BENCH_DETAIL.json and `git status` untouched (r12 VERDICT "what's
    wrong" #4), and the driver's lower-core scaling rerun can no
    longer overwrite the same round's 32-core detail (r13 VERDICT
    "what's wrong" #5). The builder's closing gates refresh the
    committed artifact explicitly via the env var."""
    import os as _os
    import re as _re

    repo = _os.path.dirname(_os.path.abspath(bench.__file__))
    default = bench.default_detail_path()
    # In a driver checkout PROGRESS.jsonl exists -> round-stamped name;
    # in a bare checkout the fallback is the legacy fixed name.
    if _os.path.exists(_os.path.join(repo, "PROGRESS.jsonl")):
        assert _re.fullmatch(
            r"BENCH_DETAIL_r\d{2,}_c\d+\.json", _os.path.basename(default)
        ), default
        # ...and that name is covered by .gitignore so it never dirties
        # the tree (the whole point of the round-stamp)
        with open(_os.path.join(repo, ".gitignore")) as f:
            assert "BENCH_DETAIL_r*.json" in f.read()
    else:
        assert _os.path.basename(default) == "BENCH_DETAIL.json"
    monkeypatch.delenv("BENCH_DETAIL_PATH", raising=False)
    assert (_os.environ.get("BENCH_DETAIL_PATH") or default) == default
    override = str(tmp_path / "detail.json")
    monkeypatch.setenv("BENCH_DETAIL_PATH", override)
    assert (_os.environ.get("BENCH_DETAIL_PATH") or default) == override
    # the bench source actually honors the variable (no silent drift)
    import inspect

    src = inspect.getsource(bench)
    assert 'os.environ.get("BENCH_DETAIL_PATH")' in src
    assert "default_detail_path()" in src


def test_default_detail_path_round_parse(tmp_path, monkeypatch):
    """default_detail_path() derives the round from PROGRESS.jsonl's
    LAST line plus the cpu count from SPARK_GRAFT_CPUS (r13 VERDICT
    #5: the 8-core scaling rerun must not overwrite the same round's
    32-core detail) and falls back to the fixed name on any parse
    trouble."""
    import os as _os

    repo = _os.path.dirname(_os.path.abspath(bench.__file__))
    progress = _os.path.join(repo, "PROGRESS.jsonl")
    if _os.path.exists(progress):
        with open(progress, "rb") as f:
            last = f.read().strip().splitlines()[-1]
        rnd = json.loads(last)["round"]
        monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
        assert bench.default_detail_path() == _os.path.join(
            repo, f"BENCH_DETAIL_r{int(rnd):02d}_c8.json"
        )
        monkeypatch.delenv("SPARK_GRAFT_CPUS")
        assert bench.default_detail_path() == _os.path.join(
            repo, f"BENCH_DETAIL_r{int(rnd):02d}_c32.json"
        )


def test_headline_set_is_the_fixed_24():
    # The compact line's size budget assumes the headline set stays the
    # original 24-query set (comparability across rounds is a separate,
    # older contract — bench.py keeps extras out of the total for the
    # same reason). If this grows, re-check TAIL_BUDGET.
    assert len(bench.HEADLINE) == 24
