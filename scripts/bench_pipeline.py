"""Throughput benchmark for the flashscore ETL pipeline (the reference's
actual workload), to set against the reference's hard ceiling of
<=0.5 match rows/s (time.sleep(2) + 2 Snowflake round-trips per inserted
row, dags/utils.py:213-217).

Synthesizes N match records across F JSON dump files (the reference's
one-file-per-scrape layout), runs plans/flashscore.run_pipeline once
untimed (JIT/codegen warm-up) and once timed, and prints one JSON line:

    {"matches": N, "files": F, "wall_sec": s, "rows_per_sec": r}

Usage: python scripts/bench_pipeline.py [n_matches] [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_eng_project_1_spark.plans.flashscore import run_pipeline
from data_pipeline_eng_project_1_spark.session import get_spark

BOOKMAKERS = ["Betclic.fr", "Unibet.fr", "Bwin.fr", "France Pari",
              "NetBet", "Winamax", "bet365", "1xBet"]


def _record(i: int) -> dict:
    return {
        "current_status": "Finished" if i % 10 else "Scheduled",
        "current_country": f"Country{i % 40}",
        "current_tournament": f"League{i % 15}",
        "participant_home": f"Home{i}",
        "participant_away": f"Away{i}",
        "participant_home_current_score": str(i % 6),
        "participant_away_current_score": str((i * 7) % 5),
        "year": 2023, "month": 1 + i % 12, "day": 1 + i % 28,
        "hour": i % 24, "minute": i % 60,
        "match_hour": f"{i % 24}:{i % 60}",
        "lineups_data": {
            "Team1": [{"name": f"H{i}_{p}"} for p in range(11)],
            "Team2": [{"name": f"A{i}_{p}"} for p in range(11 if i % 7 else 9)],
        },
        "bookmakers_data": [
            {"bookmaker": b, "odds": [f"{1 + j}.{i % 10}" for j in range(3)]}
            for j, b in enumerate(BOOKMAKERS[: 2 + i % 7])
        ],
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("bench_pipeline")

    src = tempfile.mkdtemp(prefix="fs_src_")
    per = -(-n // n_files)
    for f in range(n_files):
        recs = [_record(i) for i in range(f * per, min((f + 1) * per, n))]
        with open(os.path.join(src, f"dump_{f}.json"), "w") as fh:
            json.dump(recs, fh)

    try:
        for out, timed in ((tempfile.mkdtemp(prefix="fs_out_"), False),
                           (tempfile.mkdtemp(prefix="fs_out_"), True)):
            t0 = time.monotonic()
            run_pipeline(spark, src, out, mode="overwrite")
            wall = time.monotonic() - t0
            loaded = spark.read.parquet(f"{out}/MATCH_FINISHED").count()
            if timed:
                print(json.dumps({
                    "matches": n, "files": n_files,
                    "loaded_finished_rows": loaded,
                    "wall_sec": round(wall, 3),
                    "rows_per_sec": round(loaded / wall, 1),
                    "reference_ceiling_rows_per_sec": 0.5,
                }))
            shutil.rmtree(out, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    main()
