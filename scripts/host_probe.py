"""Host-throttle adjudication probe (the r11-r14 control protocol as a
one-liner): interleaved median-of-N of steady control queries at sf0.1,
optionally bracketing a list of target queries, printed as one JSON
line. Does NOT touch BENCH_QUERIES.json — this is evidence for the
sidecar's `remeasured_outliers` / notes, not a measurement to keep.

Readings and their meaning (see docs/BACKLOG.md "idle host" bullet):
- control ratio ~1.0-1.15x its committed full-sweep value: clean
  window — full-sweep numbers taken now are comparable round-to-round.
- ~1.25-1.4x sustained and uniform across controls: the throttle-epoch
  class (r13/r14) — run TWO full sweeps and min-merge; diff per-query
  ratios, not totals.
- multi-second spikes on single samples with steady neighbors: the
  stall class (r11/r12) — isolated median-of-3 with a steady control
  adjudicates individual outliers.
- NOTE (REVISED r15 — the old 10-40% probe-warmth caveat is obsolete
  under the current epoch): short-session probe ratios and full-sweep
  per-query ratios are NOT comparable magnitudes. In r15 this probe
  read 4.5-8.4x while the same windows' min-merged full sweeps sat at
  per-query p50 1.38x with in-sweep controls at 1.24-1.35x — the
  fresh-session penalty dwarfs the throttle itself. Use probe ratios
  ONLY relatively (window improving/worsening vs another probe from
  the same round); claim clean-window/epoch magnitudes ONLY from
  in-sweep control values (BENCH_QUERIES.json notes record them per
  sweep). If a probe ever drops near ~2x, that likely means the epoch
  lifted: take a full sweep immediately and read its in-sweep
  controls against the 1.15x bar.

Usage:
    python scripts/host_probe.py                 # controls only
    python scripts/host_probe.py q1,q2,...       # bracket targets too
    python scripts/host_probe.py --watch 480     # WARM watch mode:
        one long-lived session re-reads the controls every N seconds
        and prints one JSON line per reading. Because the session
        stays warm, watch readings are comparable to IN-SWEEP control
        values (the fresh-session penalty the r15 note warns about
        applies only to the first reading) — this is the
        clean-window detector the r16 standing instruction needs:
        when a watch reading's ratio drops to ~1.0-1.15x, stop the
        watcher and take a full sweep immediately. Each reading costs
        ~2 s of host time per interval, negligible contamination; do
        NOT leave it running during a sweep.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, run_query
from data_pipeline_eng_project_1_spark.plans import queries as Q
from data_pipeline_eng_project_1_spark.session import get_spark

#: (name, committed r12 full-sweep value) — the cleanest anchor sweep
#: on record (BENCH_QUERIES.json at commit 78b65a1). Two controls of
#: different shapes so a plan-specific effect can't masquerade as a
#: host effect.
CONTROLS = (("stats_agg_lineitem", 0.196), ("filter_project_cast", 0.142))
N = 5


def watch(interval_s: int) -> None:
    """Warm clean-window watcher: emit one JSON reading of the two
    controls every ``interval_s`` seconds from ONE long-lived session
    (median-of-3 per control per reading), until killed."""
    spark = get_spark("host-probe-watch", cores=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    builders = {s.name: s.builder for s in Q.specs()}
    for name, _ in CONTROLS:
        run_query(spark, builders[name], SF_DIR)  # warm
    while True:
        out = {"watch": True, "utc": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()), "controls": {}}
        for name, steady in CONTROLS:
            s = [round(run_query(spark, builders[name], SF_DIR), 3)
                 for _ in range(3)]
            med = statistics.median(s)
            out["controls"][name] = {
                "samples": s, "median": med,
                "ratio_vs_r12_sweep": round(med / steady, 2)}
        print(json.dumps(out), flush=True)
        time.sleep(interval_s)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--watch":
        watch(int(sys.argv[2]) if len(sys.argv) > 2 else 480)
        return
    targets = sys.argv[1].split(",") if len(sys.argv) > 1 else []
    known = {s.name for s in Q.specs()}
    unknown = [t for t in targets if t not in known]
    if unknown:  # fail BEFORE spending a Spark session on a typo
        sys.exit(f"host_probe: unknown target query name(s) {unknown} — "
                 f"pass registered names from plans.queries.specs()")
    spark = get_spark("host-probe", cores=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    builders = {s.name: s.builder for s in Q.specs()}
    for name, _ in CONTROLS:
        run_query(spark, builders[name], SF_DIR)  # warm
    for t in targets:
        run_query(spark, builders[t], SF_DIR)
    out: dict = {"sf_dir": SF_DIR, "controls": {}, "targets": {},
                 "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    for name, steady in CONTROLS:
        s = [round(run_query(spark, builders[name], SF_DIR), 3)
             for _ in range(N)]
        med = statistics.median(s)
        out["controls"][name] = {
            "samples": s, "median": med,
            "ratio_vs_r12_sweep": round(med / steady, 2)}
    for t in targets:
        s = []
        for _ in range(3):
            # bracket every target sample with a control sample so the
            # window's state is recorded alongside the measurement; the
            # bracket readings live under their OWN key (r15 advice fix:
            # appending them to 'samples' made the printed median/ratio
            # silently exclude trailing entries shown in the same list)
            cname, _ = CONTROLS[0]
            out["controls"][cname].setdefault("bracket_samples", []).append(
                round(run_query(spark, builders[cname], SF_DIR), 3))
            s.append(round(run_query(spark, builders[t], SF_DIR), 3))
        out["targets"][t] = {"samples": s,
                             "median": round(statistics.median(s), 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
