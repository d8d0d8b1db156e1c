"""X43 — one-pass column profiling."""

from __future__ import annotations

import pandas as pd
import pytest

from dbms_data_anonymity_differential_privacy_spark.operators.profile import profile_columns


@pytest.fixture(scope="module")
def crafted(spark):
    pdf = pd.DataFrame(
        {
            "a": [1, 2, 2, None, 5],
            "b": ["x", None, None, "y", "x"],
            "c": [1.5, 1.5, 1.5, 1.5, 1.5],
        }
    )
    return spark.createDataFrame(pdf.astype({"a": "Int64"}))


def test_exact_profile_values(crafted):
    rows = {r["col_name"]: r for r in profile_columns(crafted).collect()}
    assert set(rows) == {"a", "b", "c"}
    a = rows["a"]
    assert (a["n_rows"], a["n_nulls"], a["n_distinct"]) == (5, 1, 3)
    assert a["min_value"] == "1.000000000" and a["max_value"] == "5.000000000"
    b = rows["b"]
    assert (b["n_nulls"], b["n_distinct"]) == (2, 2)
    assert b["min_value"] == "x" and b["max_value"] == "y"
    c = rows["c"]
    assert (c["n_nulls"], c["n_distinct"]) == (0, 1)
    assert c["min_value"] == c["max_value"] == "1.500000000"


def test_approx_profile_within_band(spark, sf001):
    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    cols = ["l_orderkey", "l_returnflag"]
    exact = {r["col_name"]: r["n_distinct"] for r in profile_columns(li, cols).collect()}
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in profile_columns(li, cols, exact=False).collect()
    }
    for c in cols:
        # HLL++ default rsd is 5%; allow 3 sigma
        assert abs(approx[c] - exact[c]) <= max(2, 0.15 * exact[c])


def test_unknown_column_raises(crafted):
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(crafted, ["nope"])


def test_profile_is_one_scan(spark, sf001):
    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    plan = profile_columns(li, ["l_orderkey", "l_returnflag"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_default_profiles_every_column(spark, sf001):
    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    out = profile_columns(li)
    assert {r["col_name"] for r in out.collect()} == set(li.columns)
