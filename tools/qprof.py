"""Per-query profiling helper for the optimization rounds.

Times selected registry queries through the noop sink (guide §1.4) on
the bench session (guide §1.1: isolate the computation, label the jobs)
and optionally dumps ``explain('formatted')`` to ``plans/$QPROF_PLANS/``
(default ``plans/r15/``).

Usage:
    python tools/qprof.py [--explain TAG] [--runs N] q1 q2 ...
    python tools/qprof.py --top 30          # 30 slowest from BENCH_DETAIL

Explain files land at plans/<round>/<query>_<TAG>.txt (TAG = before/after).
Timing protocol matches bench.py (min of N noop-sink executions) so the
numbers are comparable with the committed detail.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--explain", default=None, help="dump explain files with this tag")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from options_data_pipeline_spark.plans import registry
    from options_data_pipeline_spark.session import get_spark

    names = list(args.queries)
    if args.top:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            detail = json.load(fh)["queries"]
        qmap_names = set(registry.queries())
        names += [
            q
            for q, _ in sorted(detail.items(), key=lambda kv: -kv[1])
            if q in qmap_names
        ][: args.top]

    spark = get_spark(app_name="qprof")
    qmap = registry.queries()
    # warmup identical to bench.py
    from pyspark.sql import functions as F

    from options_data_pipeline_spark.sources.tables import load_table

    spark.range(1_000_000).groupBy(F.col("id") % 7).count().count()
    load_table(spark, args.sf_dir, "events").count()

    plans_dir = os.path.join(REPO, "plans", os.environ.get("QPROF_PLANS", "r15"))
    os.makedirs(plans_dir, exist_ok=True)
    out: dict[str, float] = {}
    for name in names:
        fn = qmap.get(name)
        if fn is None:
            print(f"{name}: NOT IN REGISTRY", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"qprof:{name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 3)
        print(
            f"  {name}: {min(runs):.2f}s (runs: "
            f"{', '.join(f'{r:.2f}' for r in runs)})",
            file=sys.stderr, flush=True,
        )
        if args.explain:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            with open(
                os.path.join(plans_dir, f"{name}_{args.explain}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
