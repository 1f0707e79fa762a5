#!/usr/bin/env python3
"""Classify per-query bench deltas as noise vs regression.

Usage: bench_compare.py OLD_BENCH NEW_BENCH [--threshold 0.15]

Inputs are bench.json files (or BENCH_r{N}.json driver artifacts — the
parsed/tail forms are handled). When the NEW file carries a
{"metric":"spread"} line (round 8+), a query only counts as a REGRESSION
if the OLD median lies BELOW the new [min,max] band — i.e. even the
best new run is slower than the old median — AND the median moved more
than the threshold. Everything inside the band is classified as noise.

Exit code 1 if any regression is found (CI-gateable).
"""
import json
import sys


def load(path):
    """Return (medians, spread) from a bench.json or BENCH_r{N}.json."""
    medians, spread = {}, {}
    raw = open(path).read()
    # driver artifact: {"n":..,"tail":"...","parsed":{...}}
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and "tail" in d:
            for line in d["tail"].splitlines():
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    j = json.loads(line)
                except json.JSONDecodeError:
                    continue  # truncated head of the tail
                if j.get("metric") == "spread":
                    spread.update(j.get("queries", {}))
                elif "queries" in j:
                    medians.update(j["queries"])
            if not medians:
                # pre-round-8 artifact: the per-query line survives only
                # as a truncated tail — scrape the intact pairs
                import re
                for m in re.finditer(r'"([a-z0-9_]+)":(\d+\.\d+)', d["tail"]):
                    if m.group(1) not in ("value", "sf"):
                        medians[m.group(1)] = float(m.group(2))
            return medians, spread
    except json.JSONDecodeError:
        pass
    for line in raw.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        j = json.loads(line)
        if j.get("metric") == "spread":
            spread.update(j.get("queries", {}))
        elif "queries" in j:
            medians.update(j["queries"])
    return medians, spread


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 0.15
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a
                              else sys.argv[sys.argv.index(a) + 1])
    if len(args) != 2:
        sys.exit(__doc__)
    old_m, _ = load(args[0])
    new_m, new_s = load(args[1])
    shared = sorted(set(old_m) & set(new_m))
    added = sorted(set(new_m) - set(old_m))
    removed = sorted(set(old_m) - set(new_m))
    regressions, improvements, noise = [], [], []
    for q in shared:
        o, n = old_m[q], new_m[q]
        delta = (n - o) / o if o else 0.0
        band = new_s.get(q)
        if abs(delta) <= threshold:
            noise.append(q)
        elif delta < 0:
            improvements.append((q, o, n, delta))
        elif band and o >= band[0]:
            # old median inside the new run band: the move is within
            # observed run-to-run variance, not a code regression
            noise.append(q)
        else:
            regressions.append((q, o, n, delta, band))
    tot_o = sum(old_m[q] for q in shared)
    tot_n = sum(new_m[q] for q in shared)
    print(f"shared {len(shared)} queries: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({(tot_n - tot_o) / tot_o:+.1%}); "
          f"+{len(added)} new, -{len(removed)} removed, "
          f"{len(noise)} within noise")
    for q, o, n, d in sorted(improvements, key=lambda x: x[3]):
        print(f"  faster    {q:40s} {o:7.2f} -> {n:7.2f}  ({d:+.0%})")
    for q, o, n, d, band in sorted(regressions, key=lambda x: -x[3]):
        b = f" band=[{band[0]:.2f},{band[2]:.2f}]" if band else ""
        print(f"  REGRESSED {q:40s} {o:7.2f} -> {n:7.2f}  ({d:+.0%}){b}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
