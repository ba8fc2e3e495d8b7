"""Driver simulator: run the __spark_entry__ contract exactly as the
external driver does, over the FULL registry, and emit a
CORRECTNESS_r*-format JSON artifact.

The external driver samples ~50 queries per round; this tool adjudicates
all of them so every registry entry has a committed correctness row
(VERDICT r2 ask #1a). It deliberately builds a VANILLA SparkSession (no
engine helper) so any session conf the engine forgot to self-apply
surfaces here, not in the driver's run.

Usage:
    python tools/driver_sim.py [sf_dir] [out_json]

Defaults: sf_dir=/root/testdata/sf0.01, out_json=stdout summary +
CORRECTNESS_SELF.json next to the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Single source of truth for the compare canon — shared with the pytest
# t2 gate so the self-harness can never drift lenient again
# (VERDICT r5 #2). Strictness lives in tests/_compare.py.
from tests._compare import canonical_hash, schemas_match  # noqa: E402,F401

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "CORRECTNESS_SELF.json")
    )

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("driver-sim")
        .getOrCreate()
    )

    import __spark_entry__ as E

    # entry smoke check, exactly like the driver
    rows = E.entry(spark).collect()
    print(f"entry(): {len(rows)} rows", file=sys.stderr)

    ddb = duckdb.connect()
    for t in TABLES:
        ddb.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = E.queries()
    oracles = E.oracle_sql()
    # Golden-hash adjudication for no-oracle entries (VERDICT r9 ask #1):
    # a committed canonical hash per scale value-pins queries the DuckDB
    # oracle can't express (pca_project). Labeled distinctly so the
    # artifact shows WHICH axis adjudicated each row.
    from options_data_pipeline_spark.plans.goldens import golden_for
    report: dict[str, dict] = {}
    # The per-query flush goes to a `.partial` sidecar; the final
    # artifact lands at out_path via one atomic rename. Round 7's
    # end-of-round snapshot committed a mid-run in-place write and
    # clobbered the 206-entry sf0.01 artifact down to 1 entry (VERDICT
    # r7 #1) — with the sidecar, a commit can only ever capture either
    # the previous complete artifact or the new complete one.
    partial_path = out_path + ".partial"
    resume = "--resume" in sys.argv
    if resume:
        # newest-wins between sidecar and committed artifact (ADVICE r8:
        # a crashed fresh run leaves a small stale sidecar that must not
        # shadow a newer, more complete committed artifact), and entries
        # for queries since removed from the registry are dropped so a
        # resumed run can never carry ghosts into the final artifact
        priors = [p for p in (partial_path, out_path) if os.path.exists(p)]
        if priors:
            newest = max(priors, key=os.path.getmtime)
            with open(newest) as fh:
                report = json.load(fh)
            report = {k: v for k, v in report.items() if k in queries}
    n_ok = n_weak = n_fail = 0
    for name in sorted(queries):
        if resume and name in report:
            row = report[name]
            if row.get("hash_match"):
                n_ok += 1
                continue
            if row.get("err") == "no_oracle":
                if golden_for(name, sf_dir) is not None:
                    pass  # golden now exists: fall through and re-run
                else:
                    n_weak += 1
                    continue
            # failed rows re-run on resume (the fix being retested)
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.monotonic()
        try:
            spdf = queries[name](spark, sf_dir).toPandas()
            row["spark_rows"] = len(spdf)
            if name not in oracles:
                golden = golden_for(name, sf_dir)
                if golden is not None:
                    row["adjudication"] = "golden_hash"
                    row["hash_match"] = canonical_hash(spdf) == golden
                    if row["hash_match"]:
                        n_ok += 1
                    else:
                        row["err"] = "golden_hash_mismatch"
                        n_fail += 1
                else:
                    row["err"] = "no_oracle"
                    n_weak += 1
            else:
                opdf = ddb.execute(oracles[name]).fetchdf()
                row["oracle_rows"] = len(opdf)
                row["rows_match"] = len(spdf) == len(opdf)
                row["schema_match"] = schemas_match(spdf, opdf)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and canonical_hash(spdf) == canonical_hash(opdf)
                )
                if row["hash_match"]:
                    n_ok += 1
                else:
                    n_fail += 1
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
            n_fail += 1
        report[name] = row
        # flush after every query so a timeout still leaves a usable
        # artifact that --resume can extend — but to the SIDECAR, never
        # in place over the committed artifact
        with open(partial_path, "w") as fh:
            json.dump(report, fh, indent=2)
        status = (
            "ok"
            if row["hash_match"]
            else ("weak" if row["err"] == "no_oracle" else "FAIL")
        )
        print(
            f"{name}: {status} ({time.monotonic() - t0:.1f}s)",
            file=sys.stderr,
        )

    with open(partial_path, "w") as fh:
        json.dump(report, fh, indent=2)
    os.replace(partial_path, out_path)  # atomic: complete or absent
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": len(queries),
                "ok": n_ok,
                "weak_no_oracle": n_weak,
                "fail": n_fail,
                "out": out_path,
            }
        )
    )
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
