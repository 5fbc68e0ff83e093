"""Standing bench-measurement protocol (r15 — the r13/r14 epoch
discipline made permanent, per the r14 verdict): min-merge two or more
complete full-sweep sidecars per query, then report every number as a
PER-QUERY RATIO vs the frozen clean anchor (re-frozen r17: the
two-sweep min-merge at aa36d7e, 100.523 s / 193 queries — the r12
anchor epoch became reproducible again in r16, so the bars stop being
epoch-scaled; the old anchor stays computable from git history at
78b65a1) instead of comparing absolute wall-clock
totals — two consecutive multiplicative host-throttle epochs made
totals uninterpretable round-over-round.

Usage:
    python scripts/sweep_merge.py sweep1.json sweep2.json [...]
        # prints the min-merged sidecar JSON to stdout and a ratio
        # report vs the anchor to stderr; does NOT write
        # BENCH_QUERIES.json — review, then copy over deliberately.

Regression bar (unchanged from r12-r14): a query is flagged only when
min-merged > 2x anchor + 0.3 s. Whole-board uniform moves are the
epoch, not regressions/speedups — adjudicate with
scripts/host_probe.py (controls-bracketed isolated medians) before
believing any flagged row.
"""
from __future__ import annotations

import json
import statistics
import subprocess
import sys

ANCHOR_COMMIT = "aa36d7e"  # r17 two-sweep min-merge, 100.523 s / 193
ANCHOR_DESC = f"r17 min-merge at {ANCHOR_COMMIT} (100.523 s)"


def anchor_queries() -> dict[str, float]:
    out = subprocess.run(
        ["git", "show", f"{ANCHOR_COMMIT}:BENCH_QUERIES.json"],
        capture_output=True, text=True, check=True).stdout
    return {k: float(v) for k, v in json.loads(out)["queries"].items()}


def _merge_outliers(paths: list[str],
                    sweeps: list[dict]) -> dict[str, list[dict]]:
    out: dict[str, list[dict]] = {}
    for p, s in zip(paths, sweeps):
        for q, rec in s.get("remeasured_outliers", {}).items():
            out.setdefault(q, []).append({**rec, "source_sweep": p})
    return out


def main() -> None:
    paths = sys.argv[1:]
    if len(paths) < 2:
        sys.exit("need >= 2 full-sweep sidecar paths to min-merge")
    sweeps = []
    for p in paths:
        with open(p) as f:
            sweeps.append(json.load(f))
    names = set(sweeps[0]["queries"])
    for p, s in zip(paths[1:], sweeps[1:]):
        if set(s["queries"]) != names:
            sys.exit("sweeps cover different query sets — all inputs "
                     "must be complete full sweeps")
        # The merged header is copied from sweeps[0]; refuse inputs it
        # would misdescribe (mixed SFs/metrics min-merge to nonsense).
        for k in ("metric", "unit", "sf"):
            if s.get(k) != sweeps[0].get(k):
                sys.exit(f"sweep {p} disagrees on {k!r} "
                         f"({s.get(k)!r} vs {sweeps[0].get(k)!r}) — "
                         "only like-for-like full sweeps can be merged")
        m0 = (sweeps[0].get("method") or {}).get("name")
        ms = (s.get("method") or {}).get("name")
        if ms != m0:
            sys.exit(f"sweep {p} used per-sweep method {ms!r} vs "
                     f"{m0!r} — mixed methods can't be min-merged")
    merged = {q: min(s["queries"][q] for s in sweeps) for q in names}
    sidecar = {
        **{k: sweeps[0][k] for k in ("metric", "unit", "sf")},
        "value": round(sum(merged.values()), 3),
        "n_queries": len(merged),
        "method": {
            "name": "min-merge-of-full-sweeps",
            "n_sweeps": len(paths),
            "per_sweep_method": sweeps[0].get("method"),
            "anchor": ANCHOR_DESC,
            "note": ("per-query MIN of complete median3-interleaved "
                     "sweeps; regression bar = 2x anchor + 0.3 s; "
                     "whole-board uniform moves are host-throttle "
                     "epochs (adjudicate with scripts/host_probe.py), "
                     "not regressions"),
        },
        "queries": merged,
        # Provenance: keep EVERY sweep's outlier record (as a list per
        # query, each tagged with its source sweep) — a dict-merge let
        # a later sweep's record shadow the one that supplied the kept
        # min timing.
        "remeasured_outliers": _merge_outliers(paths, sweeps),
        "notes": sweeps[0].get("notes", ""),
    }
    anchor = anchor_queries()
    ratios = sorted(
        ((merged[q] / anchor[q], q) for q in names if q in anchor),
        reverse=True)
    flagged = [(q, merged[q], anchor[q]) for q in names
               if q in anchor and merged[q] > 2 * anchor[q] + 0.3]
    rs = [r for r, _ in ratios]
    if rs:
        # index on len-1 so n<=10 doesn't degenerate to the maximum
        p90 = sorted(rs)[min(int(0.9 * (len(rs) - 1)), len(rs) - 1)]
        print(f"anchored {len(rs)}/{len(names)} queries | ratio p50 "
              f"{statistics.median(rs):.2f} p90 "
              f"{p90:.2f} max {rs[0]:.2f} "
              f"({ratios[0][1]})", file=sys.stderr)
    else:  # every query postdates the anchor — report, don't crash
        print(f"anchored 0/{len(names)} queries — no ratio stats",
              file=sys.stderr)
    print(f"over 2x+0.3s bar: {len(flagged)}", file=sys.stderr)
    for q, m, a in sorted(flagged, key=lambda t: -t[1] / t[2]):
        print(f"  FLAG {q}: merged {m:.3f}s vs anchor {a:.3f}s",
              file=sys.stderr)
    new = sorted(q for q in names if q not in anchor)
    if new:
        print(f"not in anchor (post-anchor registrations): {' '.join(new)}",
              file=sys.stderr)
    json.dump(sidecar, sys.stdout, indent=1, sort_keys=True)
    print()


if __name__ == "__main__":
    main()
