"""Source/sink format breadth: the engine's tables round-trip through
every Spark-native columnar/row format without value drift. Parquet is
the canonical store; ORC matters for lakehouse interop, CSV/JSON for
export surfaces."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from options_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_DIR


def _hashed(df):
    cols = sorted(df.columns)
    return (
        df.select(F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")))
        .first()[0]
    )


@pytest.mark.parametrize("fmt", ["orc", "parquet"])
def test_columnar_roundtrip_bitexact(spark, tmp_path, fmt):
    src = load_table(spark, SF_DIR, "supplier")
    path = str(tmp_path / f"t.{fmt}")
    src.write.format(fmt).mode("overwrite").save(path)
    back = spark.read.format(fmt).load(path)
    assert back.schema == src.schema
    assert _hashed(back) == _hashed(src)


def test_csv_roundtrip_with_header_and_schema(spark, tmp_path):
    src = load_table(spark, SF_DIR, "region")
    path = str(tmp_path / "t.csv")
    src.write.option("header", True).mode("overwrite").csv(path)
    back = spark.read.schema(src.schema).option("header", True).csv(path)
    assert _hashed(back) == _hashed(src)


def test_json_lines_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "t.json")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    assert _hashed(back) == _hashed(src)
