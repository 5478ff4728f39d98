"""Task-skew probe: run skew-sensitive queries with the Spark UI's REST
API on, and report per-query the MAX vs MEDIAN task duration of the
heaviest stage — the straggler evidence SCALE.md records for the
hostile-skew soak.

    SPARK_GRAFT_SF_DIR=.scratch/sf10skew python tools/skew_probe.py [q ...]

One JSON line: {query: {"sec": wall, "stage": id, "tasks": n,
"med_ms": .., "max_ms": .., "skew": max/med}}.  A skew ratio near 1
means the shuffle partitioning (salting, AQE skew split, two-level
caps) absorbed the hot keys; a large ratio marks a straggler.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _force_eval  # noqa: E402
from verified_sources_spark.plans.queries import QUERIES  # noqa: E402
from verified_sources_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "events_keep_latest_per_user",   # mega-user keyed dedup
    "merge_upsert_events",           # mega-user merge anti-join
    "sessionize_events",             # mega-user sessionization
    "window_running_total",          # per-user running window
    "domain_cap_docs",               # mega-domain salted top-N
    "lsh_candidate_pairs_docs",      # boilerplate hot buckets
    "q3_shipping_priority",          # hot l_orderkey join (AQE skew split)
    "q1_pricing_summary",            # baseline: agg skew-insensitive
]


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("skew-probe", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        before = {s["stageId"] for s in _api(base, "/stages")}
        t0 = time.monotonic()
        _force_eval(fn(spark, sf_dir))
        wall = round(time.monotonic() - t0, 2)
        stages = [
            s
            for s in _api(base, "/stages?status=complete")
            if s["stageId"] not in before and s.get("numCompleteTasks", 0) > 0
        ]
        # heaviest stage = most total executor run time (the one skew hurts)
        worst = None
        for s in sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:1]:
            q = _api(
                base,
                f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0",
            )
            med_ms, max_ms = q["executorRunTime"]
            worst = {
                "sec": wall,
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "med_ms": round(med_ms),
                "max_ms": round(max_ms),
                "skew": round(max_ms / med_ms, 1) if med_ms else None,
            }
        out[name] = worst or {"sec": wall}
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
