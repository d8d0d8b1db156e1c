"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query names map to SURVEY.md §2 rows (p## = §2a primitives, c## = §2b
composites, x## = §2c extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbms_data_anonymity_differential_privacy_spark import queries_registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: k-anonymize customer with QI = (nationkey, mktsegment,
    acctbal equal-width bin), k=5 (SURVEY §7 Milestone 0)."""
    return queries_registry.flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(queries_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(queries_registry.ORACLE_SQL)
