"""Declarative data-quality expectations (single-pass where possible).

The reference's quality posture is ad-hoc (gap scans, row-count probes,
reconciliation — reference src/pipeline/aggregators/base.py's guard
clauses); production pipelines declare table CONTRACTS instead and
evaluate them as one job per ingest batch. This module is that contract
evaluator, Deequ-shaped but Spark-native:

- **Narrow rules** (`not_null`, `in_range`, `in_set`, `matches`) all
  fold into ONE conditional-sum aggregate over a single scan — adding a
  rule adds a column to the aggregate, never a pass.
- **`unique`** needs the key histogram: one map-side-combined groupBy;
  violations = rows carrying a duplicated key (count > 1 keys weighted
  by their count).
- **`foreign_key`** is a broadcast left-anti count against the distinct
  reference keys (dimension-sized, so the anti join broadcasts).

``check`` returns one row per rule: (rule, total_rows, violations,
passed) — the shape a scheduler gates a publish step on. Total cost for
R rules: 1 + #unique + #foreign_key scans, independent of R otherwise.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    cols: tuple[str, ...]
    params: tuple = field(default=())


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", "narrow", (col,))


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"in_range({col},{lo},{hi})", "narrow", (col,), (lo, hi))


def in_set(col: str, values: tuple) -> Rule:
    return Rule(
        f"in_set({col},{'|'.join(map(str, values))})", "narrow", (col,), tuple(values)
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(f"matches({col},{pattern})", "narrow", (col,), (pattern,))


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", "unique", tuple(cols))


_AS_OF_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2}(\.\d{1,6})?)?$"
)
_MAX_AGE_RE = re.compile(
    r"^(\d+)\s+(second|minute|hour|day|week|month|year)s?$"
)


def fresh(ts_col: str, as_of: str, max_age: str) -> Rule:
    """The table's newest ``ts_col`` must be within ``max_age`` (an
    interval string, e.g. ``'2 hours'``) of ``as_of`` (an explicit
    timestamp string — deterministic, never wall-clock). Violations is 0
    or 1: staleness is a table property, not a row property.

    Both params are validated here against strict formats and the bound
    is built with Column APIs (never spliced into ``F.expr`` — the same
    discipline the row rules follow; ADVICE r4)."""
    if not _AS_OF_RE.match(as_of):
        raise ValueError(
            f"fresh(): as_of must be 'YYYY-MM-DD[ HH:MM:SS[.ffffff]]', "
            f"got {as_of!r}"
        )
    if not _MAX_AGE_RE.match(max_age):
        raise ValueError(
            f"fresh(): max_age must be "
            f"'<n> <second|minute|hour|day|week|month|year>[s]', "
            f"got {max_age!r}"
        )
    return Rule(f"fresh({ts_col},{as_of},{max_age})", "fresh", (ts_col,), (as_of, max_age))


def _fresh_bound(as_of: str, max_age: str):
    """Column-API freshness bound: as_of - max_age, no string splicing."""
    n, unit = _MAX_AGE_RE.match(max_age).groups()
    # a date-only as_of parses as midnight, matching the pre-r5 grammar
    kw = {
        "second": "secs",
        "minute": "mins",
        "hour": "hours",
        "day": "days",
        "week": "weeks",
        "month": "months",
        "year": "years",
    }[unit]
    return F.to_timestamp(F.lit(as_of)) - F.make_interval(
        **{kw: F.lit(int(n))}
    )


def foreign_key(col: str, ref: DataFrame, ref_col: str) -> Rule:
    # the ref frame rides in params (not hashable; dataclass eq unused here)
    return Rule(f"foreign_key({col})", "fk", (col,), (ref, ref_col))


def _violation(rule: Rule) -> Column:
    c = F.col(rule.cols[0])
    if rule.name.startswith("not_null"):
        cond = c.isNull()
    elif rule.name.startswith("in_range"):
        lo, hi = rule.params
        cond = c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    elif rule.name.startswith("in_set"):
        cond = c.isNull() | ~c.isin(list(rule.params))
    elif rule.name.startswith("matches"):
        (pattern,) = rule.params
        cond = c.isNull() | ~c.rlike(pattern)
    else:  # pragma: no cover - constructors above are the only makers
        raise ValueError(f"unknown narrow rule {rule.name}")
    # coalesce: SUM over an empty frame is NULL — an empty batch must
    # report violations=0 / passed=true, not a three-valued gate
    return F.coalesce(F.sum(cond.cast("long")), F.lit(0)).cast("long")


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; one result row per rule with
    columns (rule, total_rows, violations, passed)."""
    if not rules:
        raise ValueError("check() needs at least one rule")
    narrow = [r for r in rules if r.kind == "narrow"]
    results: list[DataFrame] = []

    if narrow:
        # positional aliases + Column-API structs: rule names carry user
        # text (regex patterns, set values) and must never be spliced
        # into SQL strings or used as identifiers (review r4)
        agg = df.agg(
            F.count(F.lit(1)).alias("_n"),
            *[_violation(r).alias(f"_v{i}") for i, r in enumerate(narrow)],
        )
        structs = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.col(f"_v{i}").alias("violations"),
                )
                for i, r in enumerate(narrow)
            ]
        )
        results.append(
            agg.select(F.explode(structs).alias("_r"), "_n").select(
                F.col("_r.rule").alias("rule"),
                F.col("_n").cast("long").alias("total_rows"),
                F.col("_r.violations").cast("long").alias("violations"),
            )
        )

    for r in rules:
        if r.kind == "fresh":
            as_of, max_age = r.params
            bound = _fresh_bound(as_of, max_age)
            results.append(
                df.agg(
                    F.count(F.lit(1)).cast("long").alias("total_rows"),
                    F.when(F.max(F.col(r.cols[0])) >= bound, 0)
                    .otherwise(1)
                    .cast("long")
                    .alias("violations"),
                ).select(F.lit(r.name).alias("rule"), "total_rows", "violations")
            )
        elif r.kind == "unique":
            dup_rows = (
                df.groupBy(*r.cols)
                .agg(F.count(F.lit(1)).alias("_c"))
                .agg(
                    F.coalesce(
                        F.sum(
                            F.when(F.col("_c") > 1, F.col("_c")).otherwise(0)
                        ),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("violations"),
                    F.coalesce(F.sum("_c"), F.lit(0))
                    .cast("long")
                    .alias("total_rows"),
                )
            )
            results.append(
                dup_rows.select(
                    F.lit(r.name).alias("rule"), "total_rows", "violations"
                )
            )
        elif r.kind == "fk":
            ref, ref_col = r.params
            refs = ref.select(F.col(ref_col).alias(r.cols[0])).distinct()
            results.append(
                df.select(r.cols[0])
                .join(F.broadcast(refs), r.cols[0], "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
                .crossJoin(
                    df.agg(F.count(F.lit(1)).cast("long").alias("total_rows"))
                )
                .select(F.lit(r.name).alias("rule"), "total_rows", "violations")
            )

    out = results[0]
    for r_df in results[1:]:
        out = out.unionByName(r_df)
    return out.select(
        "rule", "total_rows", "violations", (F.col("violations") == 0).alias("passed")
    )
