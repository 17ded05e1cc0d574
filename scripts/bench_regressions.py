#!/usr/bin/env python3
"""Compute the >2x+1s per-query regression list of the BENCH_LOCAL.json
about to be committed against the PREVIOUS committed bench run, and
print it (r18 verdict #1: the round-close claim must be computed from
the exact artifact being committed, by this script, not by hand).

Baseline resolution: if the working-tree BENCH_LOCAL.json differs from
HEAD's, the baseline is HEAD's copy (the normal pre-commit gate flow);
if they are identical (artifact already committed this round), the
baseline is the version BEFORE the last commit that touched it — so the
list always compares this round's run to last round's, in either order
of commit-vs-gate.

Print-only by design: a listed line is a prompt for isolated triage
(see Bench's end-of-run reruns and the box-variance protocol), not an
automatic failure.
"""
import json
import subprocess
import sys

ART = "BENCH_LOCAL.json"


def git_show(ref):
    out = subprocess.run(["git", "show", f"{ref}:{ART}"],
                         capture_output=True, cwd="/root/repo")
    if out.returncode != 0:
        return None
    try:
        return json.loads(out.stdout)
    except Exception:
        return None


def main():
    try:
        with open(f"/root/repo/{ART}") as f:
            cur_txt = f.read()
        cur = json.loads(cur_txt)
    except Exception as e:
        print(f"[regressions] cannot read {ART}: {e}")
        return
    head = git_show("HEAD")
    if head is None:
        print(f"[regressions] no committed {ART} at HEAD; list: (none)")
        return
    head_txt = subprocess.run(["git", "show", f"HEAD:{ART}"],
                              capture_output=True, cwd="/root/repo",
                              text=True).stdout
    if cur_txt.strip() == head_txt.strip():
        # already committed: baseline = the version before the last
        # commit that changed the artifact
        log = subprocess.run(
            ["git", "log", "--format=%H", "-n", "2", "--", ART],
            capture_output=True, cwd="/root/repo", text=True).stdout.split()
        prev = git_show(log[1]) if len(log) > 1 else None
        if prev is None:
            print("[regressions] artifact committed and no prior version; "
                  "list: (none)")
            return
        base_desc = f"previous committed version ({log[1][:9]})"
    else:
        prev = head
        base_desc = "HEAD's committed version"
    pq = prev.get("queries", {})
    cq = cur.get("queries", {})
    reruns = cur.get("reruns", {})
    lines = []
    for name in sorted(cq):
        v, b = cq[name], pq.get(name)
        if b is None or b <= 0 or v <= 0:
            continue
        if v > 2 * b and v - b > 1.0:
            tag = " [rerun-min]" if name in reruns else ""
            lines.append(f"  {name}: {b:.2f}s -> {v:.2f}s ({v / b:.2f}x){tag}")
    print(f"[regressions] >2x+1s vs {base_desc}: "
          f"{len(lines) if lines else '(none)'}")
    for ln in lines:
        print(ln)
    if reruns:
        print(f"[regressions] end-of-run reruns recorded for "
              f"{len(reruns)}: {', '.join(sorted(reruns))}")


if __name__ == "__main__":
    main()
