"""A/B a session-conf change over a representative query subset.

Interleaved rounds (variant A then B per query, repeated), min-of-N per
variant, plus a canary timing per round so a host-load swing during the
experiment is visible in the record. Usage:

    python tools/conf_ab.py --conf k=v[,k=v] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    confs = dict(kv.split("=", 1) for kv in args.conf.split(","))

    from pyspark.sql import functions as F

    from options_data_pipeline_spark.plans import registry
    from options_data_pipeline_spark.session import get_spark
    from options_data_pipeline_spark.sources.tables import load_table

    spark = get_spark(app_name="conf-ab")
    qmap = registry.queries()
    spark.range(1_000_000).groupBy(F.col("id") % 7).count().count()
    ev = load_table(spark, args.sf_dir, "events")
    ev.count()

    baseline = {k: spark.conf.get(k, None) for k in confs}
    best: dict[tuple[str, str], float] = {}
    for rnd in range(args.rounds):
        t0 = time.perf_counter()
        ev.groupBy("event_type").agg(F.sum("value")).write.mode(
            "overwrite"
        ).format("noop").save()
        print(
            f"canary r{rnd}: {time.perf_counter()-t0:.2f}s",
            file=sys.stderr, flush=True,
        )
        for name in args.queries:
            for tag, vals in (("A", baseline), ("B", confs)):
                for k, v in vals.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
                t0 = time.perf_counter()
                qmap[name](spark, args.sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                dt = time.perf_counter() - t0
                key = (name, tag)
                best[key] = min(best.get(key, 1e9), dt)
                print(
                    f"r{rnd} {name} [{tag}]: {dt:.2f}s",
                    file=sys.stderr, flush=True,
                )
    for k, v in baseline.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    out = {}
    for name in args.queries:
        a, b = best[(name, "A")], best[(name, "B")]
        out[name] = {"A": round(a, 3), "B": round(b, 3),
                     "B_over_A": round(b / a, 3)}
    ta = sum(best[(n, "A")] for n in args.queries)
    tb = sum(best[(n, "B")] for n in args.queries)
    out["_total"] = {"A": round(ta, 3), "B": round(tb, 3),
                     "B_over_A": round(tb / ta, 3)}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
