"""sdg_big_data_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``worldbank/SDG-big-data`` (see SURVEY.md), re-expressed Spark-first:
declarative DataFrame plans optimized by Catalyst, pandas-UDF islands only
where built-in operators cannot express the semantics, and every operator
designed for 100 TB / 1000-executor scale even though tests run on
``local[*]``.

Layout
------
- ``session``    — SparkSession factory (UTC, AQE, Arrow, tuned shuffle)
- ``sources``    — readers / writers / incremental-append protocol
- ``operators``  — relational, window, join, sampling, dedup, similarity,
                   spatial, grouped-map and panel operators
- ``functions``  — scalar function families (text, datetime, hashing)
- ``plans``      — the declared query catalog (driver correctness contract)
- ``streaming``  — incremental batch & Structured Streaming wrappers
"""

__version__ = "0.1.0"
