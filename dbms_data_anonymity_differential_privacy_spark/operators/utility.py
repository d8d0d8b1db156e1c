"""Utility evaluation — SURVEY §2b C10.

Reference (``naive-suppresion.py:92-118``, ``clustering-anon.py:95-113``,
``t-closeness.py:150-169``): label-encode categoricals → 70/30 split
(seed 42) → RandomForest → accuracy; run on the original AND the
anonymized table, report the drop.

MLlib port: StringIndexer → VectorAssembler → randomSplit([.7,.3], 42) →
RandomForestClassifier → MulticlassClassificationEvaluator('accuracy').
sklearn's RNG is not reproducible in MLlib, so this is a rows-only check
with tolerance-band tests (SURVEY §7 hard part (b)).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _accuracy(
    df: DataFrame,
    target: str,
    features: Sequence[str],
    n_trees: int,
    seed: int,
) -> float:
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import StringIndexer, VectorAssembler

    dtypes = dict(df.dtypes)
    work = df
    feat_cols = []
    for c in features:
        if dtypes[c] == "string":
            work = (
                StringIndexer(
                    inputCol=c,
                    outputCol=f"__idx_{c}",
                    handleInvalid="keep",
                    stringOrderType="alphabetAsc",
                )
                .fit(work)
                .transform(work)
            )
            feat_cols.append(f"__idx_{c}")
        else:
            feat_cols.append(c)
    work = (
        StringIndexer(inputCol=target, outputCol="__label", stringOrderType="alphabetAsc")
        .fit(work)
        .transform(work)
    )
    assembled = VectorAssembler(inputCols=feat_cols, outputCol="__features").transform(work)
    train, test = assembled.randomSplit([0.7, 0.3], seed=seed)
    rf = RandomForestClassifier(
        numTrees=n_trees, seed=seed, featuresCol="__features", labelCol="__label"
    )
    model = rf.fit(train)
    pred = model.transform(test)
    ev = MulticlassClassificationEvaluator(
        labelCol="__label", predictionCol="prediction", metricName="accuracy"
    )
    return float(ev.evaluate(pred))


def utility_accuracy(
    original: DataFrame,
    anonymized: DataFrame,
    target: str,
    features: Sequence[str],
    n_trees: int = 50,
    seed: int = 42,
) -> DataFrame:
    """C10 — single-row DataFrame: accuracy on original, on anonymized, and
    the drop (reference prints exactly these three, t-closeness.py:173-176).
    """
    spark = original.sparkSession

    def safe_acc(df: DataFrame) -> float | None:
        # heavily-suppressed relations can be empty (or single-class after
        # a split) — MLlib refuses those with "requirement failed"; report
        # NULL accuracy instead of crashing the whole evaluation
        if df.limit(2).count() < 2:
            return None
        try:
            return _accuracy(df, target, features, n_trees, seed)
        except Exception:
            return None

    acc_o = safe_acc(original)
    acc_a = safe_acc(anonymized)
    drop = (acc_o - acc_a) if (acc_o is not None and acc_a is not None) else None
    return spark.createDataFrame(
        [(acc_o, acc_a, drop)],
        "accuracy_original double, accuracy_anonymized double, accuracy_drop double",
    ).select(
        F.round("accuracy_original", 9).alias("accuracy_original"),
        F.round("accuracy_anonymized", 9).alias("accuracy_anonymized"),
        F.round("accuracy_drop", 9).alias("accuracy_drop"),
    )
