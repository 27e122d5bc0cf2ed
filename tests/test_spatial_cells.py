

def test_cell_stats_rollup_equals_direct(spark):
    """Rollup from aggregates == direct per-level groupBy from raw rows
    (Hilbert hierarchy: parent = cell >> 2k)."""
    import numpy as np
    from pyspark.sql import functions as F

    from cov_tiles_spark.spatial.cells import cell_s2l13, cell_stats_rollup

    rng = np.random.default_rng(13)
    rows = [
        (float(lon), float(lat), float(v))
        for lon, lat, v in zip(
            rng.uniform(-179, 179, 5000),
            rng.uniform(-80, 80, 5000),
            rng.uniform(0, 10, 5000),
        )
    ]
    df = spark.createDataFrame(rows, "lon double, lat double, value double") \
        .withColumn("cell", cell_s2l13("lon", "lat")).persist()
    got = {
        (r.level, r.cell): (r.n_points, round(r.sum_value, 6))
        for r in cell_stats_rollup(df, "cell", [13, 11, 9], "value").collect()
    }
    want = {}
    for bits in (13, 11, 9):
        for r in (
            df.groupBy(F.shiftright("cell", 2 * (13 - bits)).alias("c"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        ):
            want[(bits, r.c)] = (r.n, round(r.s, 6))
    assert got == want
    # coarser levels really shrink (telescoping)
    n13 = sum(1 for k in got if k[0] == 13)
    n9 = sum(1 for k in got if k[0] == 9)
    assert n9 < n13
    df.unpersist()
