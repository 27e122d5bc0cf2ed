"""Dataset profiling vs hand-computed stats (incl. nulls)."""

from __future__ import annotations

from cov_tiles_spark.operators.profile import profile


def test_profile_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None), (3, None, 10.0),
         (4, "a", 0.125), (5, "b", 2.5)],
        "k long, s string, v double",
    )
    rows = {r.column: r for r in profile(df).collect()}
    assert rows["k"].n_rows == 5 and rows["k"].n_null == 0
    assert rows["k"].n_distinct == 5
    assert (rows["k"].min_val, rows["k"].max_val) == ("1", "5")
    assert rows["s"].n_null == 1 and rows["s"].n_distinct == 2
    assert (rows["s"].min_val, rows["s"].max_val) == ("a", "b")
    assert rows["v"].n_null == 1 and rows["v"].n_distinct == 3
    assert (rows["v"].min_val, rows["v"].max_val) == ("0.1250", "10.0000")


def test_profile_column_subset(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    out = profile(df, ["b"]).collect()
    assert len(out) == 1 and out[0].column == "b"
