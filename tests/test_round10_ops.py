"""Round-10 operator fixes (ADVICE r9 lows).

- connected_components frees each superseded round's localCheckpoint
  blocks eagerly instead of waiting for driver GC (dedup.py).
- msttr honors a caller-supplied id column (text.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_cc_distributed_frees_per_round_checkpoints(spark):
    """A chain graph forces many label-propagation rounds; after the
    result is consumed, only the FINAL labels checkpoint may remain —
    per-round blocks must not accumulate until GC."""
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import connected_components

    n = 12  # chain 0-1-...-12: diameter forces many rounds, < max_iter
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    spark.catalog.clearCache()
    before = _n_persistent(spark)
    out = connected_components(pairs, driver_threshold=0)
    rows = {r["id"]: r["comp"] for r in out.collect()}
    assert rows == {i: 0 for i in range(n + 1)}
    after = _n_persistent(spark)
    # final labels checkpoint (1) is the only permissible residue; the
    # pre-fix behavior left one block set PER ROUND (>= 5 here) plus the
    # symmetric edge checkpoint
    assert after - before <= 1, (before, after)
    # and the returned relation stays readable after the internal frees
    assert out.count() == n + 1


def test_cc_shortcut_frees_per_round_checkpoints(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.dedup import connected_components

    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    spark.catalog.clearCache()
    before = _n_persistent(spark)
    out = connected_components(pairs, driver_threshold=0, shortcut=True)
    assert {r["comp"] for r in out.collect()} == {0}
    assert _n_persistent(spark) - before <= 1


def test_msttr_custom_id_col(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.text import msttr

    text = " ".join(f"w{i % 7}" for i in range(20))
    df = spark.createDataFrame(
        [(1, "en", text), (2, "en", text), (3, "de", text)],
        "my_id long, lang string, text string",
    )
    out = msttr(df, segment_tokens=10, id_col="my_id").collect()
    by_group = {r["group"]: r for r in out}
    assert by_group["en"]["n_segments"] == 4  # 2 docs x 2 full segments
    assert by_group["de"]["n_segments"] == 2
    # w0..w6 cycle: a 10-token segment has 7 distinct types
    assert by_group["en"]["msttr_r"] == pytest.approx(0.7)

    # the default stays doc_id and matches a renamed-column run
    df2 = df.withColumnRenamed("my_id", "doc_id")
    out2 = {r["group"]: r["msttr_r"] for r in msttr(df2, segment_tokens=10).collect()}
    assert out2 == {r["group"]: r["msttr_r"] for r in out}

    # a frame without the id column fails loudly (the pre-fix bug:
    # hard-coded doc_id despite the configurable signature)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        msttr(df, segment_tokens=10).collect()


def test_free_local_checkpoint_contract(spark):
    from dbms_data_anonymity_differential_privacy_spark.operators.util import free_local_checkpoint

    ck = spark.range(100).selectExpr("id", "id * 2 AS y").localCheckpoint(eager=True)
    before = _n_persistent(spark)
    assert free_local_checkpoint(ck) is True
    assert _n_persistent(spark) == before - 1
    # non-checkpoint relations are refused (returns False, no-op)
    plain = spark.range(10).withColumn("z", F.col("id") + 1)
    assert free_local_checkpoint(plain) is False
