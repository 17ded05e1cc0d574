#!/usr/bin/env python3
"""Emit SCALING.md from three graft.Bench detail files (sf0.001/0.01/0.1).

Stdlib-only analysis of the engine's own JSON output (this script is
build tooling, not part of the Spark library). The operative check: on
a 10x corpus step (sf0.01 -> sf0.1) a scale-linear operator's wall time
grows <= ~10x; a ratio beyond that with non-trivial absolute time marks
a super-linear plan (pair blowup, unpartitioned sort, driver-side
loop) and is flagged for triage in PLANS.md.
"""
import json
import math
import sys

FLAG_RATIO = 10.0   # 10x data -> >10x time = super-linear
FLAG_FLOOR = 0.5    # seconds at sf0.1; below this, ratios are JVM noise


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    b001, b01, b1 = (load(p) for p in sys.argv[1:4])
    qs = sorted(b1["queries"])
    calib = set(b1.get("calibration_queries", []))
    # write-pipeline tier: fixture-building queries (fresh upsert table
    # per run) — tagged in the table and totals so their COW-commit
    # floors don't read as scan costs; still flag-ELIGIBLE (a
    # super-linear commit path would be a real bug)
    wp = set(b1.get("write_pipeline_queries", []))

    rows = []
    flagged = []
    for q in qs:
        t0, t1, t2 = (b["queries"].get(q, -1.0) for b in (b001, b01, b1))
        r = t2 / t1 if t1 and t1 > 0 and t2 > 0 else float("nan")
        # log-log slope over the two decades sf0.001 -> sf0.1 (data grows
        # 100x): slope 1.0 = linear, 2.0 = quadratic; constant overhead
        # at the small points biases it DOWN, so the 0.01->0.1 ratio is
        # the stricter signal and drives the flag.
        slope = (math.log10(t2 / t0) / 2.0) if t0 and t0 > 0 and t2 > 0 else float("nan")
        rows.append((q, t0, t1, t2, r, slope))
        if q not in calib and t2 >= FLAG_FLOOR and r > FLAG_RATIO:
            flagged.append((q, t1, t2, r))

    def fmt(v, spec=".2f"):
        return "-" if (isinstance(v, float) and (math.isnan(v) or v < 0)) else format(v, spec)

    print("# Scaling sweep — does the plan survive a scale-up?")
    print()
    print("One idle-box session, plain-`java` launcher (scripts/run_scaling.sh),")
    print("identical JVM flags per point, staged-relation accounting: graft.Bench")
    print("at sf0.001 / sf0.01 / sf0.1. Corpus grows 10x per step. The check the")
    print("round-8 verdict asked for: a headline query whose sf0.01->sf0.1 wall")
    print(f"ratio exceeds ~{FLAG_RATIO:.0f}x (on >= {FLAG_FLOOR}s absolute) is super-linear —")
    print("the shape that becomes a 100 TB killer — and must be triaged.")
    print("`slope` is the log-log exponent over the full 100x span (1.0 = linear,")
    print("2.0 = quadratic); fixed per-query overhead (~0.05-0.3 s of plan/codegen")
    print("at every sf) biases slopes DOWN at small sf, so sub-linear ratios are")
    print("expected and benign — only the large-ratio tail matters.")
    print()
    for b, name in ((b001, "sf0.001"), (b01, "sf0.01"), (b1, "sf0.1")):
        print(f"- {name}: total {b['value']:.1f} s "
              f"(staging {b.get('staging_sec', 0):.1f} + headline {b['headline_sec']:.1f} "
              f"+ write-pipeline {b.get('write_pipeline_sec', 0):.1f} "
              f"+ calibration {b['calibration_sec']:.1f}), failures {b['failures']}")
    tot_r = b1["headline_sec"] / b01["headline_sec"]
    print(f"- headline total ratio sf0.01->sf0.1: **{tot_r:.2f}x** on 10x data")
    print()
    if flagged:
        print(f"## FLAGGED super-linear ({len(flagged)})")
        print()
        for q, t1, t2, r in sorted(flagged, key=lambda x: -x[3]):
            print(f"- `{q}`: {t1:.2f} s -> {t2:.2f} s = {r:.1f}x — triage in PLANS.md")
    else:
        print("## FLAGGED super-linear: none")
        print()
        print("No headline query exceeds the bar. The ratio tail (table below)")
        print("is inspected in PLANS.md's scaling triage section.")
    print()
    print("## Per-query wall seconds")
    print()
    print("| query | sf0.001 | sf0.01 | sf0.1 | 0.01->0.1 ratio | slope |")
    print("|---|---|---|---|---|---|")
    for q, t0, t1, t2, r, slope in sorted(rows, key=lambda x: -(x[4] if x[4] == x[4] else -1)):
        tier = " (calib)" if q in calib else (" (wp)" if q in wp else "")
        print(f"| `{q}`{tier} | {fmt(t0, '.3f')} | {fmt(t1, '.3f')} | {fmt(t2, '.3f')} "
              f"| {fmt(r)} | {fmt(slope)} |")


if __name__ == "__main__":
    main()
