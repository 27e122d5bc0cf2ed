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


def test_profile_approx_within_rsd(spark):
    """approx=True swaps exact distincts for HLL++; estimates must land
    within a loose multiple of the requested rsd, everything else stays
    exact."""
    df = spark.range(0, 20_000).selectExpr(
        "id", "cast(id % 997 as string) as s", "cast(id % 37 as double) as v"
    )
    rows = {r.column: r for r in profile(df, approx=True, rsd=0.05).collect()}
    assert rows["id"].n_rows == 20_000 and rows["id"].n_null == 0
    for col, exact in (("id", 20_000), ("s", 997), ("v", 37)):
        est = rows[col].n_distinct
        assert abs(est - exact) <= max(3, 0.15 * exact), (col, est, exact)
    # min/max/null are unaffected by the sketch path
    assert (rows["v"].min_val, rows["v"].max_val) == ("0.0000", "36.0000")
