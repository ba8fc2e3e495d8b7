"""Benchmark harness: run every registry query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line on stdout:
    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

All logs go to stderr so stdout stays machine-readable. Each query is
executed to completion through a ``noop`` sink (full plan runs on the
cluster; no driver-side materialization skews the timing).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from options_data_pipeline_spark.plans import registry
    from options_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    log(f"bench: sf_dir={sf_dir} master={spark.sparkContext.master}")

    # untimed warmup: JVM JIT, codegen, shuffle service, parquet footer
    # caches — one shuffle job + one scan so the first timed query isn't
    # dominated by session startup
    from pyspark.sql import functions as F

    from options_data_pipeline_spark.sources.tables import load_table

    t0 = time.perf_counter()
    spark.range(1_000_000).groupBy(F.col("id") % 7).count().count()
    load_table(spark, sf_dir, "events").count()
    log(f"  warmup: {time.perf_counter()-t0:.2f}s (untimed)")

    timings: dict[str, float] = {}

    # The near-dup pair table is a session ARTIFACT (operators/artifacts.py):
    # derived once per corpus snapshot, then shared by every dedup/curation
    # query — the artifact-store behavior the engine has in production. Time
    # the build explicitly here so the total still pays for it exactly once
    # and the per-query numbers below mean "with the artifact store warm".
    from options_data_pipeline_spark.operators import artifacts
    from options_data_pipeline_spark.plans.text import planted_near_dup_pairs

    build_runs = []
    for _ in range(2):
        artifacts._CACHE.clear()  # force a real rebuild: min-of-2 like every entry
        t0 = time.perf_counter()
        planted_near_dup_pairs(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        build_runs.append(time.perf_counter() - t0)
    timings["near_dup_artifact_build"] = round(min(build_runs), 3)
    log(
        f"  near_dup_artifact_build: {min(build_runs):.2f}s "
        f"(runs: {', '.join(f'{r:.2f}' for r in build_runs)})"
    )

    for name, fn in registry.queries().items():
        # two executions, report the min: the first pays plan compilation
        # and fills OS page cache; the min is the steady-state number a
        # warmed cluster would see and is far less noisy on a shared host
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        log(f"  {name}: {min(runs):.2f}s (runs: {', '.join(f'{r:.2f}' for r in runs)})")

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
