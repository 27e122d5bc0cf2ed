"""Heavy hitters (operators/heavyhitters.py): exact vs brute force when
the certificate holds, honest failure when it can't, bounded pass-1
output, and a live decrement path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cov_tiles_spark.operators.heavyhitters import (
    heavy_hitters_topk,
    mg_candidates,
)


def _zipf_tokens(spark, n=30000, n_items=500):
    # item j appears ~ n/(j+1) times: a long-tailed frequency profile
    return (
        spark.range(n)
        .select(
            F.concat(
                F.lit("tok"),
                F.floor(
                    F.pow(F.lit(float(n_items)), (F.col("id") % 1000) / 1000.0)
                ).cast("int").cast("string"),
            ).alias("tok")
        )
        .repartition(8)
    )


def _brute_topk(df, k):
    return [
        (r["tok"], r["cnt"])
        for r in df.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(k)
        .collect()
    ]


def test_exact_when_capacity_generous(spark):
    df = _zipf_tokens(spark)
    got, bound = heavy_hitters_topk(df, "tok", 10, capacity=4096)
    assert bound == 0  # no evictions: unconditional exactness
    assert [(r["item"], r["cnt"]) for r in got.collect()] == _brute_topk(df, 10)


def test_exact_under_live_decrements(spark):
    """Small capacity forces real MG evictions; the certificate still
    clears for the skewed head and the recounted top-k stays exact."""
    df = _zipf_tokens(spark)
    got, bound = heavy_hitters_topk(df, "tok", 5, capacity=64)
    assert bound > 0  # decrement path actually exercised
    assert [(r["item"], r["cnt"]) for r in got.collect()] == _brute_topk(df, 5)


def test_certificate_fails_honestly_on_flat_data(spark):
    # ~uniform counts: nothing clears the bound at a tiny capacity
    flat = spark.range(20000).select(
        (F.col("id") % 2000).cast("string").alias("tok")
    ).repartition(8)
    with pytest.raises(ValueError, match="certificate failed"):
        heavy_hitters_topk(flat, "tok", 10, capacity=16)


def test_pass1_output_is_capacity_bounded(spark):
    df = _zipf_tokens(spark)
    rows = mg_candidates(df, "tok", 32).collect()
    per_part_items = [r for r in rows if r["item"] is not None]
    n_parts = df.rdd.getNumPartitions()
    assert len(per_part_items) <= 32 * n_parts
    sentinels = [r for r in rows if r["item"] is None]
    assert len(sentinels) == n_parts


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "tok string"
    )
    got, bound = heavy_hitters_topk(df, "tok", 2, capacity=8)
    assert [(r["item"], r["cnt"]) for r in got.collect()] == [("a", 2), ("b", 1)]


def test_batch_rows_bound_replayable_across_arrow_batching(spark):
    """With a fixed batch_rows, the decrement total is a pure function
    of (row order, batch_rows): the Arrow transfer batch size must not
    leak into it, and a local sequential replay reproduces it exactly —
    the property the q_heavy_hitters_bound gate twin relies on."""
    from collections import Counter

    n, capacity, chunk = 20000, 16, 4096
    items = [1000 // ((rn % 1000) + 1) for rn in range(1, n + 1)]

    # local sequential replay (independent of the operator's internals)
    counts, expect_bound = {}, 0
    for i in range(0, n, chunk):
        for it, c in Counter(items[i : i + chunk]).items():
            counts[it] = counts.get(it, 0) + c
        overflow = len(counts) - capacity
        if overflow > 0:
            delta = sorted(counts.values())[overflow - 1]
            expect_bound += delta
            counts = {x: c - delta for x, c in counts.items() if c > delta}
    assert expect_bound > 0

    df = (
        spark.range(1, n + 1)
        .select(
            F.col("id").alias("rn"),
            F.expr("1000 div ((id % 1000) + 1)").alias("item"),
        )
        .repartition(1)
        .sortWithinPartitions("rn")
    )
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    bounds = []
    try:
        for arrow_batch in ("10000", "777"):
            spark.conf.set(conf, arrow_batch)
            _, bound = heavy_hitters_topk(
                df, "item", 5, capacity=capacity, batch_rows=chunk
            )
            bounds.append(bound)
    finally:
        spark.conf.set(conf, old)
    assert bounds == [expect_bound, expect_bound]


def test_corpus_scanned_exactly_twice(spark):
    """topk = pass 1 (MG summary) + pass 2 (recount): the input must be
    read exactly twice. Regression for the uncached-summary shape where
    the bound collect and the candidate semi-join each re-evaluated
    pass 1 — three scans, and bound/candidates from two independent
    evaluations (which voids the certificate on nondeterministic
    inputs)."""
    n = 30000
    acc = spark.sparkContext.accumulator(0)

    def tap(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    tapped = _zipf_tokens(spark, n=n).mapInPandas(tap, "tok string")
    got, bound = heavy_hitters_topk(tapped, "tok", 10, capacity=4096)
    assert [(r["item"], r["cnt"]) for r in got.collect()] == _brute_topk(
        _zipf_tokens(spark, n=n), 10
    )
    assert acc.value == 2 * n


def test_non_string_items(spark):
    """Items keep the input column's type (bigint ids here) end to end —
    the output schema derives from df.schema, not a hard-coded string."""
    df = spark.range(1000).select((F.col("id") % 7).alias("v")).repartition(4)
    got, bound = heavy_hitters_topk(df, "v", 3, capacity=64)
    assert got.schema["item"].dataType.simpleString() == "bigint"
    assert bound == 0
    expect = [
        (r["v"], r["cnt"])
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("v").asc())
        .limit(3)
        .collect()
    ]
    assert [(r["item"], r["cnt"]) for r in got.collect()] == expect
