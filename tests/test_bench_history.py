"""tools/bench_history.py — the durable per-query bench evidence
(VERDICT r13 #2). The salvage path must recover whatever a truncated
driver tail preserved without leaking the JSON summary fields into
the per-query map, and the tracked BENCH_HISTORY.jsonl must stay
parseable one-JSON-object-per-line."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench_history  # noqa: E402

_SUMMARY = {
    "value", "runs_per_query", "sf", "baseline_16_total_sec",
    "r2_22_total_sec", "n", "rc", "cpus",
}


def test_salvage_r13_driver_tail():
    e = bench_history.salvage_driver_tail(13)
    assert e["round"] == 13
    assert e["source"] == "driver-tail"
    assert e["partial"] is True  # r13's tail is cut mid-map
    # the pinned subtotals survived the truncation
    assert e["baseline_16_total_sec"] == 7.352
    assert e["r2_22_total_sec"] == 10.432
    # a healthy number of per-query entries, none of them summary keys
    assert len(e["queries"]) >= 50
    assert not _SUMMARY & set(e["queries"])
    # spot-check a known surviving entry
    assert e["queries"]["text_bm25_topk"] == 0.732


def test_salvage_complete_tail(tmp_path, monkeypatch):
    # a driver artifact whose tail IS the full JSON line parses fully
    full = {
        "metric": "headline_total_sec", "value": 1.5, "unit": "sec",
        "queries": {"a": 1.0, "b": 0.5}, "runs_per_query": 3,
        "sf": 0.1, "baseline_16_total_sec": 1.0,
        "r2_22_total_sec": 1.5,
    }
    art = {"n": 99, "rc": 0, "cpus": 32, "sf": 0.1,
           "tail": json.dumps(full), "parsed": None}
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(art))
    monkeypatch.setattr(bench_history, "REPO", str(tmp_path))
    e = bench_history.salvage_driver_tail(99)
    assert e["partial"] is False
    assert e["queries"] == {"a": 1.0, "b": 0.5}
    assert e["total_sec"] == 1.5


def test_history_file_is_valid_jsonl():
    hist = os.path.join(REPO, "BENCH_HISTORY.jsonl")
    assert os.path.exists(hist), "seeded at r14 open; appended each round"
    with open(hist) as f:
        lines = [json.loads(ln) for ln in f if ln.strip()]
    assert lines, "must hold at least the salvaged r13 line"
    for e in lines:
        assert {"round", "source", "queries", "partial"} <= set(e)
