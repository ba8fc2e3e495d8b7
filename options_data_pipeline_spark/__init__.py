"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference crypto OHLC/options pipeline
(nickhopes/options-data-pipeline), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory (UTC, AQE, parquet nanos handling)
- ``schemas``    : explicit StructTypes for every domain table
- ``sources``    : parquet table registry + REST collector adapters
- ``functions``  : scalar expression library (rounding, calendar anchors,
                   instrument parsing, pct change)
- ``operators``  : relational operators (session OHLC rollup, option OHLC,
                   gap scan, dedup, similarity, text stats)
- ``io``         : keyed-upsert / insert-if-absent sinks (MERGE emulation)
- ``streaming``  : Structured Streaming micro-batch equivalents
- ``plans``      : query registry binding operators to the benchmark tables,
                   each with a DuckDB oracle SQL twin
"""

__version__ = "0.1.0"
