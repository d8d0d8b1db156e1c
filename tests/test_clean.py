"""Invariants for text cleaning / boilerplate filtering (operators/clean.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.clean import (
    clean_text,
    filter_boilerplate_lines,
)


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return df.select(clean_text(F.col("text")).alias("c")).collect()[0]["c"]


def test_clean_strips_markup_controls_and_exotic_spaces(spark):
    assert _one(spark, '<a href="x">hello</a> world') == "hello world"
    assert _one(spark, "a\x00b\x07c\x1fd") == "abcd"
    assert _one(spark, "a b c　d") == "a b c d"
    assert _one(spark, "  a \t\n  b  ") == "a b"
    # \x0b removed as control (NOT collapsed as whitespace — the Java/RE2
    # \s divergence the step order exists for)
    assert _one(spark, "a\x0bb") == "ab"


def test_clean_is_idempotent(spark):
    dirty = '<p>x</p>  y\x07  z'
    once = _one(spark, dirty)
    assert _one(spark, once) == once


def test_line_filter_rules(spark):
    text = "\n".join(
        [
            "This line has enough words to survive easily.",  # kept
            "short line.",  # < 5 words
            "This line has plenty of words but no terminal punctuation",  # no terminal
            "Please subscribe to our list for updates today!",  # blocklist
            "",  # empty
            'A second survivor with five proper words here."',  # kept (quote terminal)
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = filter_boilerplate_lines(df).collect()[0]
    assert row["n_lines"] == 6
    assert row["n_kept"] == 2
    assert row["text_filtered"].splitlines() == [
        "This line has enough words to survive easily.",
        'A second survivor with five proper words here."',
    ]


def test_line_filter_all_dropped_yields_empty(spark):
    df = spark.createDataFrame([(1, "no punct here at\nall short")], "doc_id long, text string")
    row = filter_boilerplate_lines(df).collect()[0]
    assert row["n_kept"] == 0
    assert row["text_filtered"] == ""
