#!/usr/bin/env python
"""Sharded test-suite driver: the full suite across FRESH pytest processes.

One CPython/XLA process cannot hold the whole suite any more: ~600 jitted
programs accumulated over an hour segfault XLA's CPU compiler near the end
of the run (round-4 judge session: SIGSEGV at ~96% inside
``backend_compile_and_load``; the crashing test passes in isolation and
every remaining file passes in a fresh process).  This driver partitions
``tests/test_*.py`` into a handful of shards, runs each shard in its own
pytest process, and records a machine-checkable green-gate artifact.

Usage:
    python tools/run_suite.py               # full suite
    python tools/run_suite.py -m "not slow" # fast lane (extra pytest args)
    GOALNET_SUITE_SHARDS=8 python tools/run_suite.py

The record (per-shard files / return codes / durations / totals, plus the
git revision) is written to ``benchmarks/results/suite_run_last.json`` —
this file IS the green-gate evidence round logs must cite.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD_FP = os.path.join(REPO, "benchmarks", "results", "suite_run_last.json")

# pytest return codes that count as green for a shard: 0 = all passed,
# 5 = no tests collected (a shard whose every test a -m filter deselects)
GREEN_RCS = (0, 5)


def partition(files: list[str], n_shards: int) -> list[list[str]]:
    """Greedy size-balanced partition (file bytes ≈ duration proxy).

    Deterministic for a given file set; adapts as files are added — a new
    test file can never be silently dropped from the gate because membership
    comes from the glob, not a hand-maintained list.
    """
    sized = sorted(files, key=lambda f: (-os.path.getsize(f), f))
    shards: list[tuple[int, list[str]]] = [(0, []) for _ in range(n_shards)]
    for f in sized:
        i = min(range(n_shards), key=lambda k: shards[k][0])
        total, members = shards[i]
        shards[i] = (total + os.path.getsize(f), members + [f])
    return [sorted(members) for _, members in shards if members]


def main(argv: list[str]) -> int:
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    if not files:
        print("run_suite: no test files found", file=sys.stderr)
        return 2
    n_shards = int(os.environ.get("GOALNET_SUITE_SHARDS", 6))
    shards = partition(files, max(1, n_shards))

    results = []
    t_start = time.time()
    ok = True
    for i, members in enumerate(shards):
        rel = [os.path.relpath(f, REPO) for f in members]
        print(f"\n=== shard {i + 1}/{len(shards)}: {', '.join(rel)} ===", flush=True)
        t0 = time.time()
        proc = subprocess.run(
            # no explicit -q: pytest.ini's addopts already has one, and a
            # second -q (double-quiet) suppresses the count summary line
            # the record parses
            [sys.executable, "-m", "pytest", *rel, "-rs", *argv],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        dt = time.time() - t0
        tail = (proc.stdout or "").strip().splitlines()
        for line in tail[-12:]:
            print(line, flush=True)
        counts = dict(
            re.findall(r"(\d+) (passed|failed|error|errors|skipped|deselected)",
                       tail[-1] if tail else ""))
        green = proc.returncode in GREEN_RCS
        ok = ok and green
        results.append({
            "shard": i,
            "files": rel,
            "rc": proc.returncode,
            "green": green,
            "seconds": round(dt, 1),
            "counts": {v: int(k) for k, v in counts.items()},
        })
        if not green:
            print(f"--- shard {i + 1} FAILED (rc={proc.returncode}); stderr tail ---")
            for line in (proc.stderr or "").strip().splitlines()[-20:]:
                print(line)

    total_s = time.time() - t_start
    rev = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    agg: dict[str, int] = {}
    for r in results:
        for k, v in r["counts"].items():
            agg[k] = agg.get(k, 0) + v
    record = {
        "green": ok,
        "git_rev": rev,
        "argv": argv,
        "n_shards": len(shards),
        "total_seconds": round(total_s, 1),
        "totals": agg,
        "shards": results,
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.dirname(RECORD_FP), exist_ok=True)
    with open(RECORD_FP, "w") as f:
        json.dump(record, f, indent=1)
    print(f"\n=== suite {'GREEN' if ok else 'RED'}: {agg} in "
          f"{total_s / 60:.1f} min over {len(shards)} shards "
          f"(record: {os.path.relpath(RECORD_FP, REPO)}) ===")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
