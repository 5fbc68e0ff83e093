"""Benchmark runner: times every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is executed to completion via ``df.write.format("noop")`` —
materializes every row, no driver collect, no disk.

Methodology: steady-state timing. Each query runs once untimed (JVM JIT +
whole-stage-codegen class compilation for that exact plan shape — a fixed
one-time cost that dominates cold runs by 10-50× at this tiny scale and
amortizes to nothing over a real workload), then INTERLEAVED median-of-3:
three timed passes over the whole registry, per-query median across the
passes. Interleaving means a transient host-load spike inflates one PASS
(one sample per query), never all of a query's samples — r3's artifact
recorded 6.12 s for a scan+agg that isolates at 0.97 s because min-of-2
back-to-back runs both landed inside the same contention window. A final
outlier pass re-measures any query whose median is still >3× its prior
round's recorded time (or >2× its own best sample) and keeps the smaller
median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_eng_project_1_spark.plans import queries as Q
from data_pipeline_eng_project_1_spark.session import default_parallelism, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_query(spark, builder, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = builder(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _prior_timings(here: str, sf: float) -> dict[str, float]:
    """Per-query times from the last bench run at the same SF (the sidecar
    this script wrote last time) — the reference for outlier re-measure."""
    try:
        with open(os.path.join(here, "BENCH_QUERIES.json")) as f:
            prior = json.load(f)
        if prior.get("sf") == sf and isinstance(prior.get("queries"), dict):
            return {k: float(v) for k, v in prior["queries"].items()}
    except (OSError, ValueError, TypeError):
        pass
    return {}


def main() -> None:
    n = default_parallelism()
    spark = get_spark("bench", cores=n, shuffle_partitions=n)
    specs = Q.specs()
    only = os.environ.get("SPARK_GRAFT_QUERIES")
    if only:  # comma-separated subset, for iterating on one hotspot
        names = {s.strip() for s in only.split(",")}
        unknown = names - {s.name for s in specs}
        if unknown:  # a typo'd name silently shrank the probe (the
            # r15 host_probe advice class, applied tool-wide)
            sys.exit(f"bench: unknown SPARK_GRAFT_QUERIES name(s) "
                     f"{sorted(unknown)} — pass registered query names")
        specs = [s for s in specs if s.name in names]
    here = os.path.dirname(os.path.abspath(__file__))
    prior = _prior_timings(here, _sf_from_dir(SF_DIR))

    # Warm-up sweep FIRST — every query once, untimed — then time. Plan-
    # specific codegen is compiled per query either way; the sweep also
    # gets the JVM's C2 tier and the Python/Arrow worker pool fully hot
    # BEFORE any timing starts, so a query's measured cost no longer
    # depends on its position in the walk order (grading order puts the
    # heavy LLM-ops queries first, which made them absorb the engine's
    # global warm-up under the old interleaved scheme).
    for s in specs:
        run_query(spark, s.builder, SF_DIR)
    # Interleaved median-of-3: pass-major order, so one host-load window
    # contaminates at most one of each query's three samples.
    samples: dict[str, list[float]] = {s.name: [] for s in specs}
    for _ in range(3):
        for s in specs:
            samples[s.name].append(run_query(spark, s.builder, SF_DIR))
    timings: dict[str, float] = {}
    remeasured: dict[str, dict] = {}
    for s in specs:
        med = statistics.median(samples[s.name])
        # Contention-suspect: median >3× the prior round's recorded time,
        # OR >2× this run's own best sample — both checks always apply
        # (r4 applied the own-best check only without a prior row, which
        # let a contended median through whenever a prior existed and its
        # 3× bar didn't trip). Re-measure with a fresh median-of-3 and
        # keep the smaller — a genuine regression reproduces, a load
        # spike doesn't.
        suspect = (med > 2.0 * min(samples[s.name])
                   or (s.name in prior and med > 3.0 * prior[s.name]))
        if suspect:
            re_med = statistics.median(
                run_query(spark, s.builder, SF_DIR) for _ in range(3))
            # EVERY re-measure is recorded (kept or not) so the artifact
            # describes what actually ran, not just what changed.
            remeasured[s.name] = {
                "original": round(med, 3), "remeasured": round(re_med, 3),
                "kept": re_med < med,
            }
            if re_med < med:
                med = re_med
        timings[s.name] = round(med, 3)

    # Compact headline FIRST so the driver's output buffer can never
    # truncate it mid-JSON (the 77-entry per-query map is ~2.5 KB); the
    # full map goes to a sidecar file and a second line for humans.
    headline = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": _sf_from_dir(SF_DIR),
        "n_queries": len(timings),
    }
    sidecar = {
        **headline,
        # The timing methodology rides IN the artifact so future rounds
        # compare like with like (r3 recorded min-of-2, r4+ median-of-3;
        # the unlabeled switch read as phantom regressions). Applies to
        # every row in "queries".
        "method": {"name": "median3-interleaved", "n": 3,
                   "warmup": "full-sweep-once",
                   "outlier_rule": "median >2x own best sample OR >3x "
                                   "prior round -> fresh median-of-3, "
                                   "keep smaller"},
        "queries": timings,
        "remeasured_outliers": remeasured,
        "notes": (
            "steady-state: full warm-up sweep (all queries once) before "
            "any timing, then interleaved median-of-3 (pass-major, so one "
            "host-load window taints at most one sample per query) plus an "
            "outlier re-measure pass per the method.outlier_rule; "
            "remeasured_outliers records every re-measured query with "
            "both medians and whether the re-measure was kept; JVM code "
            "cache 512m (100 generated plan classes overflow the 240m "
            "default and disable C2 late-session). n_queries grows as "
            "operators are added. r6 note on the similarity_ann_ivf "
            "drift flagged in r5 (0.94->1.26 s over three rounds): it "
            "reproduced ISOLATED (1.50 s), ruling out registry codegen-"
            "cache pressure; a builder/exec split showed ~2.5 s of pure "
            "driver time was py4j round-trips building the per-centroid "
            "cosine expressions plus broadcast machinery on a 2000-row "
            "corpus, i.e. fixed overhead that crept with expression "
            "count, not an engine regression. Fixed in r6 by inlining "
            "the centroid scores as one SQL expr (similarity.py::"
            "_cell_scores_sql): assignment is now a scan-side projection "
            "(no broadcast/join/groupBy), dropping similarity_ann_ivf to "
            "~1.2 s and dedup_semantic 1.9->1.4 s."
        ),
    }
    if only:
        # A filtered run (SPARK_GRAFT_QUERIES) is a spot probe: MERGE its
        # rows into the existing full sidecar instead of replacing it —
        # a one-query run kept overwriting the 100+-query artifact (bit
        # r6 twice and r7 once; restored from git each time).
        try:
            with open(os.path.join(here, "BENCH_QUERIES.json")) as f:
                full = json.load(f)
        except (OSError, ValueError):
            full = None
        if (isinstance(full, dict) and isinstance(full.get("queries"), dict)
                and full.get("sf") == headline["sf"]
                and len(full["queries"]) >= len(timings)):
            # >= not >: an equal-size filtered probe is still a probe —
            # merge it; only an UNFILTERED run replaces the artifact.
            full["queries"].update(timings)
            full["remeasured_outliers"] = {
                **full.get("remeasured_outliers", {}), **remeasured}
            full["value"] = round(sum(full["queries"].values()), 3)
            full["n_queries"] = len(full["queries"])
            # Spot-merged rows keep the full sweep's method/notes vintage;
            # mark which rows are probe-vintage so mixed provenance is
            # visible in the artifact (short-session probes read 20-40%
            # above full-sweep steady state — see docs/BACKLOG.md).
            full.setdefault("merged_probes", []).append({
                "queries": sorted(timings),
                "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            })
            sidecar = full
        elif isinstance(full, dict) and full.get("sf") != headline["sf"]:
            # A filtered probe at a DIFFERENT scale factor (scaling-curve
            # runs) must never replace the sf0.1 artifact: print the
            # headline, keep the file (bit r7's curve sweep — the sf
            # mismatch fell through to the replace branch below).
            print(json.dumps(headline), flush=True)
            print(json.dumps({**headline, "queries": timings}), flush=True)
            return
    with open(os.path.join(here, "BENCH_QUERIES.json"), "w") as f:
        json.dump(sidecar, f, indent=1, sort_keys=True)
    # Emit the compact line both first and last: whichever end of the
    # output the driver's buffer keeps, an intact headline is there.
    print(json.dumps(headline), flush=True)
    print(json.dumps({**headline, "queries": timings}), flush=True)
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
