"""Named queries for the driver contract (__spark_entry__.py).

Each SURVEY §2 operator registers (a) a Spark callable ``(spark, sf_dir)
-> DataFrame`` and (b) where SQL-expressible, an equivalent DuckDB oracle
SQL string over the pre-registered parquet views. Column names/aliases are
kept identical on both sides (the driver sorts columns by name before
value-hashing). Float aggregate outputs are rounded identically on both
sides to absorb summation-order ulp noise.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.functions.binning import bin_equal_width
from dbms_data_anonymity_differential_privacy_spark.operators import kanonymity as ka
from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

# Customer QI set used throughout (FIXTURES.md §A): nationkey + mktsegment +
# 5-bin equal-width acctbal.
CUST_QI = ["c_nationkey", "c_mktsegment", "acctbal_bin"]

# DuckDB CTE for the binned customer relation — the SQL twin of
# bin_equal_width(customer, 'c_acctbal', 5) with identical arithmetic.
BINNED_CUSTOMER_CTE = (
    "binned AS (SELECT t.*, CAST(CASE WHEN mm.mn = mm.mx THEN 0 ELSE "
    "LEAST(FLOOR((c_acctbal - mm.mn) * 5 / (mm.mx - mm.mn)), 4) END AS INT) AS acctbal_bin "
    "FROM customer t CROSS JOIN "
    "(SELECT MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx FROM customer) mm)"
)


def query(name: str, sql: str | None = None):
    """Register a named query and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def binned_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bin_equal_width(load_table(spark, sf_dir, "customer"), "c_acctbal", 5, "acctbal_bin")


# --------------------------------------------------------------------------
# C1 — flagship: k-anonymity by suppression (SURVEY §2b C1, §7 M0).
# Reference: naive-suppresion.py:29-40.
# --------------------------------------------------------------------------
@query(
    "c01_k_anonymize_suppress",
    f"""
    WITH {BINNED_CUSTOMER_CTE},
    f AS (SELECT *, COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment, acctbal_bin) AS __cnt
          FROM binned)
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, acctbal_bin
    FROM f WHERE __cnt >= 5
    """,
)
def c01_k_anonymize_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binned_customer(spark, sf_dir)
    return ka.k_anonymize_suppress(b, CUST_QI, 5)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry() target: same operator with the 2-col QI so the result is
    non-empty even at sf0.001 (the 3-col QI suppresses ~100% of 150 rows)."""
    b = binned_customer(spark, sf_dir)
    return ka.k_anonymize_suppress(b, ["c_mktsegment", "acctbal_bin"], 5)
