"""Durable per-query bench history (VERDICT r13 #2).

The driver's ``BENCH_r{N}.json`` stores only the LAST 2000 chars of
bench.py's stdout; as the headline set grew past ~90 queries the
stored tail started truncating the earliest per-query entries (r13
lost ``wordcount`` .. ``text_dup_ngram_fraction``), so cross-round
regression triage can no longer rely on the driver artifact alone.
This tool appends one JSONL line per reading to a TRACKED
``BENCH_HISTORY.jsonl`` at the repo root:

    python tools/bench_history.py --round 14            # run bench.py
    python tools/bench_history.py --from-driver 13      # salvage tail

Line schema (stable keys; ``queries`` is the full per-query map for
``local`` lines and whatever the tail preserved for ``driver-tail``
lines, with ``partial: true`` marking the latter when entries were
lost to truncation):

    {"round", "source", "ts", "sf", "cpus", "runs_per_query",
     "total_sec", "baseline_16_total_sec", "r2_22_total_sec",
     "queries", "partial"}
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY = os.path.join(REPO, "BENCH_HISTORY.jsonl")

# a per-query timing inside the bench JSON: "name": 1.234
_PAIR = re.compile(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)')
_SUMMARY_KEYS = {
    "value", "runs_per_query", "sf",
    "baseline_16_total_sec", "r2_22_total_sec", "n", "rc", "cpus",
}


def _now_iso() -> str:
    return datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def salvage_driver_tail(rnd: int) -> dict:
    """Recover per-query timings + totals from a driver
    ``BENCH_r{N}.json`` whose ``tail`` may be truncated mid-map."""
    path = os.path.join(REPO, f"BENCH_r{rnd:02d}.json")
    with open(path) as f:
        d = json.load(f)
    tail = d.get("tail", "")
    # completeness = "the tail parses as the bench JSON object", not
    # "it starts with a particular key" — a complete tail whose key
    # order differs from today's bench.py output must not be
    # mis-classified as truncated and lossily regex-salvaged
    # (ADVICE r14)
    try:
        parsed = json.loads(tail)
        complete = isinstance(parsed, dict) and "queries" in parsed
    except json.JSONDecodeError:
        complete = False
    if complete:
        queries = parsed["queries"]
        summary = {k: parsed.get(k) for k in _SUMMARY_KEYS if k in parsed}
        summary["value"] = parsed.get("value")
    else:
        # truncated: regex-scan every "name": number pair, then pull
        # the summary fields out (they also match the pair pattern).
        # No truncated-name guard is needed: the driver keeps a
        # SUFFIX of stdout, so a half-cut name lost its opening quote
        # and can never match _PAIR — every match is a complete,
        # valid entry.
        pairs = dict(
            (k, float(v)) for k, v in _PAIR.findall(tail)
        )
        summary = {k: pairs.pop(k) for k in list(pairs) if k in _SUMMARY_KEYS}
        queries = pairs
    return {
        "round": rnd,
        "source": "driver-tail",
        "ts": _now_iso(),
        "sf": d.get("sf"),
        "cpus": d.get("cpus"),
        "runs_per_query": summary.get("runs_per_query"),
        "total_sec": summary.get("value"),
        "baseline_16_total_sec": summary.get("baseline_16_total_sec"),
        "r2_22_total_sec": summary.get("r2_22_total_sec"),
        "queries": queries,
        "partial": not complete,
    }


def run_local(rnd: int) -> dict:
    """Run bench.py in a subprocess and parse its single JSON line."""
    env = dict(os.environ)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    if res.returncode != 0 or not res.stdout.strip():
        raise RuntimeError(
            f"bench.py failed (rc={res.returncode}); nothing appended."
            f" stderr tail: {res.stderr[-2000:]}"
        )
    line = res.stdout.strip().splitlines()[-1]
    parsed = json.loads(line)
    sf_env = env.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    return {
        "round": rnd,
        "source": "local",
        "ts": _now_iso(),
        "sf": parsed.get("sf"),
        "cpus": int(env.get("SPARK_GRAFT_CPUS", os.cpu_count() or 0)),
        "runs_per_query": parsed.get("runs_per_query"),
        "total_sec": parsed.get("value"),
        "baseline_16_total_sec": parsed.get("baseline_16_total_sec"),
        "r2_22_total_sec": parsed.get("r2_22_total_sec"),
        "queries": parsed.get("queries", {}),
        "partial": False,
        "sf_dir": sf_env,
    }


def append(entry: dict) -> None:
    with open(HISTORY, "a") as f:
        f.write(json.dumps(entry, sort_keys=True) + "\n")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, help="round number for a local bench run")
    ap.add_argument(
        "--from-driver", type=int, metavar="N",
        help="salvage BENCH_rN.json's tail instead of running bench.py",
    )
    args = ap.parse_args()
    if args.from_driver is not None:
        entry = salvage_driver_tail(args.from_driver)
    elif args.round is not None:
        entry = run_local(args.round)
    else:
        ap.error("one of --round / --from-driver is required")
    append(entry)
    print(
        f"appended round={entry['round']} source={entry['source']} "
        f"queries={len(entry['queries'])} partial={entry['partial']} "
        f"total={entry['total_sec']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
