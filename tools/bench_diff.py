#!/usr/bin/env python3
"""Bench regression gate: compare a graft.Bench JSON line against
BASELINE_LOCAL.md and fail on per-query regressions beyond the gate.

Usage:
  python3 tools/bench_diff.py BENCH.json [--gate 2.0]
  SPARK_GRAFT_SF_DIR=... java ... graft.Bench | tail -1 > /tmp/b.json \
      && python3 tools/bench_diff.py /tmp/b.json

Exit 0 = no query exceeds gate x its baseline; new queries (no baseline
row) are reported but never fail the gate.
"""
import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_baseline():
    base = {}
    for line in (REPO / "BASELINE_LOCAL.md").read_text().splitlines():
        m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", line)
        if m:
            base[m.group(1)] = float(m.group(2))
    return base


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("bench_json", help="graft.Bench output JSON line")
    p.add_argument("--gate", type=float, default=2.0,
                   help="max allowed slowdown vs baseline (default 2.0)")
    p.add_argument("--grace", type=float, default=1.0,
                   help="absolute seconds added to the threshold (default 1.0): "
                        "single-shot sub-second keys on this shared host are "
                        "bimodal by ~1s (GC/codegen landing inside the window), "
                        "so a purely relative gate flaps on them")
    p.add_argument("--floor", type=float, default=1.0,
                   help="baseline seconds below which the grace applies "
                        "(default 1.0): keys with a baseline at or above the "
                        "floor are already out of the noise floor, so they get "
                        "the bare relative gate — without this, an 8x "
                        "regression on a 0.15s key slid under the grace")
    ns = p.parse_args()
    gate = ns.gate
    grace = ns.grace
    floor = ns.floor
    bench = json.loads(Path(ns.bench_json).read_text())
    queries = bench["queries"]
    folded = [k for k in queries if k.startswith("_fast_")]
    if folded:
        sys.exit(
            f"ERROR: {ns.bench_json} contains folded keys {folded} — this is the "
            "truncated stdout line, which loses per-query names. Diff bench_full.json "
            "instead (graft.Bench writes it next to the repo root, or wherever "
            "SPARK_GRAFT_BENCH_FULL points).")
    base = load_baseline()
    failures, new = [], []
    for name in sorted(queries):
        t = queries[name]
        b = base.get(name)
        if b is None:
            new.append(name)
            print(f"NEW   {name:30s} {t:7.3f}s (no baseline)")
        elif t > gate * b + (grace if b < floor else 0.0):
            failures.append(name)
            g = grace if b < floor else 0.0
            print(f"FAIL  {name:30s} {t:7.3f}s > {gate:.1f}x baseline {b:.3f}s "
                  f"+ {g:.1f}s grace ({t / b:.2f}x)")
        else:
            print(f"ok    {name:30s} {t:7.3f}s vs {b:.3f}s ({t / b:.2f}x)")
    print(f"== {len(failures)} regression(s), {len(new)} new, "
          f"gate {gate:.1f}x + {grace:.1f}s ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
