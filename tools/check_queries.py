"""Adjudicate a SUBSET of registry queries against the DuckDB oracle.

Usage:
    python tools/check_queries.py q1 q2 ... [--sf /root/testdata/sf0.01]

Same hashing/compare logic as tools/driver_sim.py, but only for the named
queries — the fast loop while iterating on one operator.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from driver_sim import TABLES, canonical_hash, schemas_match  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("check-queries")
        .getOrCreate()
    )

    import __spark_entry__ as E

    ddb = duckdb.connect()
    for t in TABLES:
        ddb.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = E.queries()
    oracles = E.oracle_sql()
    fail = 0
    for name in names:
        t0 = time.monotonic()
        try:
            spdf = queries[name](spark, sf_dir).toPandas()
            if name not in oracles:
                from options_data_pipeline_spark.plans.goldens import (
                    golden_for,
                )

                golden = golden_for(name, sf_dir)
                if golden is None:
                    print(f"{name}: weak/no_oracle rows={len(spdf)}")
                elif canonical_hash(spdf) == golden:
                    print(
                        f"{name}: ok (golden_hash) rows={len(spdf)} "
                        f"({time.monotonic() - t0:.1f}s)"
                    )
                else:
                    fail += 1
                    print(f"{name}: FAIL golden_hash rows={len(spdf)}")
                continue
            opdf = ddb.execute(oracles[name]).fetchdf()
            ok = (
                len(spdf) == len(opdf)
                and schemas_match(spdf, opdf)
                and canonical_hash(spdf) == canonical_hash(opdf)
            )
            dt = time.monotonic() - t0
            if ok:
                print(f"{name}: ok rows={len(spdf)} ({dt:.1f}s)")
            else:
                fail += 1
                print(
                    f"{name}: FAIL spark_rows={len(spdf)} "
                    f"oracle_rows={len(opdf)} "
                    f"spark_cols={sorted(spdf.columns)} "
                    f"oracle_cols={sorted(opdf.columns)} ({dt:.1f}s)"
                )
        except Exception as exc:  # noqa: BLE001
            fail += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:500])
    return 1 if fail else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())
