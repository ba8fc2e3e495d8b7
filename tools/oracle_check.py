"""Subset oracle check for the optimization loop: compare named registry
queries against their DuckDB oracles on a VANILLA session (driver
contract), at one or more scale dirs.

Usage:
    python tools/oracle_check.py [--sf d1,d2] q1 q2 ...

Exits non-zero on any mismatch. Full-registry adjudication stays
tools/driver_sim.py; this is the fast inner loop.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests._compare import canonical_hash, schemas_match  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    args = sys.argv[1:]
    sf_dirs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    if args and args[0] == "--sf":
        sf_dirs = args[1].split(",")
        args = args[2:]
    names = args
    if not names:
        print("no queries given", file=sys.stderr)
        return 2

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("oracle-check")
        .getOrCreate()
    )
    import __spark_entry__ as E

    queries = E.queries()
    oracles = E.oracle_sql()
    bad = 0
    for sf_dir in sf_dirs:
        ddb = duckdb.connect()
        for t in TABLES:
            ddb.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            if name not in queries:
                print(f"{sf_dir} {name}: NOT IN REGISTRY")
                bad += 1
                continue
            spdf = queries[name](spark, sf_dir).toPandas()
            if name not in oracles:
                from options_data_pipeline_spark.plans.goldens import (
                    golden_for,
                )

                golden = golden_for(name, sf_dir)
                ok = golden is not None and canonical_hash(spdf) == golden
                print(f"{sf_dir} {name}: golden {'OK' if ok else 'FAIL'}")
                bad += 0 if ok else 1
                continue
            opdf = ddb.execute(oracles[name]).fetchdf()
            ok = (
                len(spdf) == len(opdf)
                and schemas_match(spdf, opdf)
                and canonical_hash(spdf) == canonical_hash(opdf)
            )
            print(
                f"{sf_dir} {name}: rows {len(spdf)}/{len(opdf)} "
                f"{'OK' if ok else 'HASH/SCHEMA FAIL'}"
            )
            bad += 0 if ok else 1
        ddb.close()
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
