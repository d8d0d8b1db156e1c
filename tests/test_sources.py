"""P1 CSV scan semantics: explicit schema, '?' → NULL, space stripping
(reference naive-suppresion.py:13-17)."""

from __future__ import annotations

from pyspark.sql import types as T

from dbms_data_anonymity_differential_privacy_spark import read_adult_csv


def test_adult_csv_shape(spark, tmp_path):
    csv = tmp_path / "adult.csv"
    csv.write_text(
        "39, State-gov, 77516, Bachelors, 13, Never-married, Adm-clerical, "
        "Not-in-family, White, Male, 2174, 0, 40, United-States, <=50K\n"
        "50, ?, 83311, Bachelors, 13, Married, Exec-managerial, Husband, "
        "White, Male, 0, 0, 13, ?, >50K\n"
    )
    df = read_adult_csv(spark, str(csv))
    rows = df.collect()
    assert len(rows) == 2
    # leading spaces stripped, ints parsed with declared types
    assert rows[0]["workclass"] == "State-gov"
    assert rows[0]["age"] == 39
    assert df.schema["age"].dataType == T.LongType()
    # '?' sentinel became NULL
    assert rows[1]["workclass"] is None
    assert rows[1]["native-country"] is None
    # drop-null (P2) removes the second row
    assert df.na.drop("any").count() == 1


def test_events_ts_converted(spark, sf0001):
    from dbms_data_anonymity_differential_privacy_spark import load_table

    ev = load_table(spark, sf0001, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
