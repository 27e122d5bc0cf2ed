"""Quality classifier (operators/classifier.py): learns a planted
separable signal, is invariant to partitioning (4 dp), and keeps the
whole path UDF-free."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cov_tiles_spark.operators.classifier import (
    logreg_score,
    logreg_train,
    quality_features,
)

COLS = ["f_len", "f_punct", "f_space", "f_stop"]


def _docs(spark, n=400):
    # even ids: "the"-rich English-ish prose; odd ids: punctuation soup
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, "the quick fox jumps over the lazy dog " * (3 + i % 5), 1))
        else:
            rows.append((i, "x;y;z!!! ??? ;;; !!!" * (2 + i % 7), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _features(df):
    feats = quality_features(F.col("text"))
    return df.select("doc_id", "label", *[v.alias(k) for k, v in feats.items()])


def test_learns_planted_signal(spark):
    fdf = _features(_docs(spark)).cache()
    model = logreg_train(fdf, COLS, "label")
    scored = fdf.select("label", logreg_score(model, COLS).alias("p")).toPandas()
    acc = ((scored["p"] >= 0.5).astype(int) == scored["label"]).mean()
    assert acc == 1.0
    # confident margins on a separable corpus
    assert scored[scored.label == 1]["p"].min() > 0.9
    assert scored[scored.label == 0]["p"].max() < 0.1


def test_partitioning_invariance(spark):
    base = _features(_docs(spark, n=300))
    m1 = logreg_train(base.repartition(2).cache(), COLS, "label")
    m2 = logreg_train(base.repartition(16).cache(), COLS, "label")
    w1 = np.array([m1["bias"]] + m1["weights"])
    w2 = np.array([m2["bias"]] + m2["weights"])
    # only summation order differs between the two partitionings
    assert np.allclose(w1, w2, rtol=0, atol=1e-9)


def test_constant_feature_contributes_nothing(spark):
    fdf = (
        _features(_docs(spark, n=200))
        .withColumn("f_const", F.lit(3.5))
        .cache()
    )
    m = logreg_train(fdf, COLS + ["f_const"], "label")
    # std-0 feature standardizes to 0 everywhere -> weight stays 0
    assert m["weights"][-1] == 0.0
    assert m["stds"][-1] == 1.0


def test_empty_and_unicode_text_features(spark):
    """Empty text yields all-zero features (no div-by-zero); non-ASCII
    text counts code points the same way the python twin does."""
    df = spark.createDataFrame(
        [(0, ""), (1, "the the"), (2, "你好, the world!")],
        "doc_id long, text string",
    )
    feats = quality_features(F.col("text"))
    out = (
        df.select("doc_id", *[v.alias(k) for k, v in feats.items()])
        .orderBy("doc_id")
        .toPandas()
    )
    assert out.loc[0, COLS].tolist() == [0.0, 0.0, 0.0, 0.0]
    # " the the " has one non-overlapping " the " match (replace semantics)
    assert out.loc[1, "f_stop"] == 1.0 / 7.0
    t = "你好, the world!"
    assert out.loc[2, "f_len"] == len(t) / 1000.0  # code points, not bytes
    assert out.loc[2, "f_punct"] == 2.0 / len(t)


def test_no_udf_in_plan(spark):
    fdf = _features(_docs(spark, n=50))
    model = {"bias": 0.1, "weights": [0.2, 0.3, 0.1, -0.2],
             "means": [0.0] * 4, "stds": [1.0] * 4}
    plan = fdf.select(logreg_score(model, COLS))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
