"""Skew-resilient join: deterministic salting.

AQE's skew-join handling (enabled in the session factory) splits
oversized *shuffle* partitions at runtime, but a broadcast-ineligible
join against a dimension with a handful of pathologically hot keys still
benefits from classic salting: replicate each dim row ``n_salts`` times,
scatter fact rows across the salt space, and join on (key, salt) so a
hot key's rows spread over ``n_salts`` tasks instead of one straggler.

The fact-side salt is ``xxhash64`` over the whole row — NOT ``rand()``:
task retries and replays must land every row on the same salt or results
become nondeterministic under failure (the same reason every other
"random" choice in this engine is hash-derived).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on``, salted ``n_salts`` ways.

    Result is exactly ``fact.join(dim, on, how)`` (oracle-checkable);
    only the physical distribution changes. Supports inner/left joins
    (the dim side is replicated, so right/full would multiply rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)
    ).cast("int")
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact_s.join(dim_s, [*on, "__salt"], how).drop("__salt")
