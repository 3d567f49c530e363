#!/usr/bin/env python3
"""Per-query engine-vs-baseline ratio table from a bench artifact.

Joins BENCH_LOCAL.json (or any bench artifact) against BASELINE.md's
measured rows and prints queries sorted by ratio, flagging unclean reps
so a contended number is never read as a regression.

Usage: python3 tools/ratio_report.py [artifact.json] [--min-engine SEC]
"""
import json
import re
import sys


def baselines(path="BASELINE.md"):
    out = {}
    for line in open(path):
        m = re.match(r"\| (q\d+\w*) \| ([0-9.]+)", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def main():
    art = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "BENCH_LOCAL.json"
    min_engine = 0.0
    if "--min-engine" in sys.argv:
        min_engine = float(sys.argv[sys.argv.index("--min-engine") + 1])
    d = json.load(open(art))
    q = d.get("queries", {})
    unclean = set(d.get("unclean", []))
    base = baselines()
    rows = []
    for name, t in q.items():
        if t is None or t < 0 or name not in base or t < min_engine:
            continue
        rows.append((t / base[name], t, base[name], name, name in unclean))
    rows.sort(reverse=True)
    te = sum(r[1] for r in rows)
    tb = sum(r[2] for r in rows)
    print(f"{'ratio':>8} {'engine':>8} {'duckdb':>8}  query")
    for ratio, t, b, name, unc in rows:
        flag = " UNCLEAN" if unc else ""
        print(f"{ratio:8.2f} {t:8.3f} {b:8.3f}  {name}{flag}")
    print(f"\nmatched total: engine {te:.2f}s vs baseline {tb:.2f}s = "
          f"{te / tb:.2f}x over {len(rows)} queries "
          f"({sum(1 for r in rows if r[4])} unclean; probe_ok="
          f"{d.get('probe_ok')}, base_reps={d.get('base_reps')})")
    # a row where the ENGINE beats the oracle >5x AND which alone is
    # >20% of the whole denominator skews the total in the engine's
    # favor (q135: a compiled kernel vs the recursive-SQL replay, 25 s
    # of baseline on one line; q23/q93's long-standing small
    # inversions stay IN — they were always part of the historical
    # totals) — report the total both ways so the apples-to-apples
    # number is one read away (see the q135 BASELINE.md note)
    inv = [r for r in rows if r[0] < 0.2 and r[2] > 0.2 * tb]
    if inv:
        te2 = te - sum(r[1] for r in inv)
        tb2 = tb - sum(r[2] for r in inv)
        names = ", ".join(r[3] for r in inv)
        print(f"excl. inverted rows ({names}): engine {te2:.2f}s vs "
              f"baseline {tb2:.2f}s = {te2 / tb2:.2f}x")


if __name__ == "__main__":
    main()
