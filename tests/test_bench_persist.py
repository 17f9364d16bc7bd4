"""bench.py persist semantics: a later (possibly noisy) run must MIN-MERGE
into the round's existing committed record, never clobber it — the r8
verdict caught the driver's post-commit single run overwriting the quiet
min-of-N record (note field lost, 172.2s -> 199.5s)."""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_mod", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_persist_min_merges_existing_record(tmp_path):
    b = _load_bench()
    (tmp_path / "docs").mkdir()
    (tmp_path / "BENCH_r01.json").write_text("{}")  # round infers to 2
    old = {
        "metric": "catalog_suite_wall",
        "value": 10.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"a": 2.0, "b": 3.0, "c": 5.0, "failed_before": -1.0},
        "note": "quiet min-of-3",
        "merged_runs": 2,
        "load_avg_1m": 1.5,
        "last_rounds": {"graph_connected_components": 3, "kcore_parts": 9,
                        "coreness_hindex": 7},
    }
    rec = tmp_path / "docs" / "BENCH_LOCAL_r02.json"
    rec.write_text(json.dumps(old))
    b.__dict__["__file__"] = str(tmp_path / "bench.py")
    b._persist_full_bench(
        {
            "metric": "catalog_suite_wall",
            "value": 99,
            "unit": "sec",
            "sf": 0.1,
            # a: faster (wins), b: slower (old wins), c: -1 failure (old
            # wins), d: new query (taken), failed_before: first valid time
            "queries": {"a": 1.5, "b": 9.0, "c": -1.0, "d": 4.0, "failed_before": 2.5},
            # kcore updates; coreness_hindex FAILED this run (absent
            # from the new map) and must keep its old count
            "last_rounds": {"graph_connected_components": 3, "kcore_parts": 4},
        }
    )
    merged = json.loads(rec.read_text())
    assert merged["queries"] == {
        "a": 1.5,
        "b": 3.0,
        "c": 5.0,
        "d": 4.0,
        "failed_before": 2.5,
    }
    assert merged["value"] == 16.0  # recomputed from merged map
    assert merged["note"] == "quiet min-of-3"  # non-timing fields preserved
    assert merged["merged_runs"] == 3
    # iteration counts are a REGRESSION SIGNAL, not a timing: the
    # current run's values replace the stale stamp (r10 verdict ask #7)
    assert merged["last_rounds"] == {
        "graph_connected_components": 3,
        "kcore_parts": 4,
        "coreness_hindex": 7,
    }


def test_persist_fresh_record_written_plain(tmp_path):
    b = _load_bench()
    (tmp_path / "docs").mkdir()
    b.__dict__["__file__"] = str(tmp_path / "bench.py")
    b._persist_full_bench(
        {
            "metric": "catalog_suite_wall",
            "value": 5.0,
            "unit": "sec",
            "sf": 0.1,
            "queries": {"a": 5.0},
        }
    )
    rec = json.loads((tmp_path / "docs" / "BENCH_LOCAL_r01.json").read_text())
    assert rec["queries"] == {"a": 5.0}
    assert rec["value"] == 5.0
    assert "load_avg_1m" in rec and "cpus" in rec


def test_persist_sf_mismatch_never_merges_into_record(tmp_path):
    """A run at a different scale factor must not min-merge into the
    round record (its times would replace the record's wholesale while
    the record keeps claiming the old sf) -- it goes to a side file."""
    b = _load_bench()
    (tmp_path / "docs").mkdir()
    rec = tmp_path / "docs" / "BENCH_LOCAL_r01.json"
    old = {
        "metric": "catalog_suite_wall",
        "value": 10.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"a": 10.0},
        "note": "quiet",
    }
    rec.write_text(json.dumps(old))
    b.__dict__["__file__"] = str(tmp_path / "bench.py")
    b._persist_full_bench(
        {
            "metric": "catalog_suite_wall",
            "value": 0.5,
            "unit": "sec",
            "sf": 0.01,
            "queries": {"a": 0.5},
        }
    )
    unchanged = json.loads(rec.read_text())
    assert unchanged["queries"] == {"a": 10.0} and unchanged["sf"] == 0.1
    side = json.loads(
        (tmp_path / "docs" / "BENCH_LOCAL_r01_sf0.01.json").read_text()
    )
    assert side["queries"] == {"a": 0.5} and side["sf"] == 0.01
