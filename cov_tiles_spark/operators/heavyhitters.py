"""Provably-exact distributed top-k heavy hitters (frequent items) —
the two-pass Misra-Gries shape that replaces a full groupBy shuffle at
100 TB (frequent tokens / n-grams / domains over a training corpus;
corpus-prep tier, no reference counterpart — additive like SURVEY §2.8).

Why not just ``groupBy(col).count().orderBy(...).limit(k)``?  Map-side
partial aggregation already collapses duplicates per task, but the
shuffle still carries EVERY distinct item (billions of n-grams at
100 TB) to compute counts nobody asked for.  The classic fix:

pass 1 (candidates)
    A Misra-Gries summary per input partition, capped at ``capacity``
    counters.  Batch-vectorized: per Arrow batch, pandas
    ``value_counts`` merges into the running dict; when the dict
    overflows, the standard batched MG step subtracts the
    (overflow)-th smallest counter from everyone and evicts the
    non-positive.  The per-partition decrement total ``dec_p`` is the
    partition's error bound: any item's true partition count exceeds
    its (possibly evicted) counter by at most ``dec_p``.  The shuffle
    out of pass 1 is at most ``capacity`` rows per partition — fixed,
    corpus-size-independent.

pass 2 (exact recount + certificate)
    The candidate union is recounted EXACTLY with a broadcast semi
    join (candidates ≤ capacity × partitions — driver-bounded), and
    the global bound ``B = Σ dec_p`` certifies the result: a
    non-candidate's true count is ≤ B, so if the k-th recounted
    candidate count is > B the top-k is provably exact.

``heavy_hitters_topk`` returns ``(topk_df, bound)`` and raises if the
certificate fails (the caller chose too small a capacity for this skew
— the honest failure mode; at gate scale capacity exceeds the distinct
count, B is 0, and exactness is unconditional, matching the repo's
provably-exact gate contract for approximate operators).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(
    df: DataFrame,
    col: str,
    capacity: int,
    batch_rows: int | None = None,
) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries.

    Returns rows ``(item, cnt)`` — at most ``capacity`` per input
    partition — plus one sentinel row ``(NULL, dec_p)`` per partition
    carrying its decrement total (the partition's error bound).

    ``batch_rows=None`` (production) merges per Arrow batch, so the
    decrement total depends on the runtime batching — the bound is
    still valid, just not replayable. A fixed ``batch_rows`` re-chunks
    the partition stream into exact ``batch_rows``-row logical batches,
    making the bound a pure function of (row order, batch_rows) — the
    determinism device the ``q_heavy_hitters_bound`` gate uses to have
    DuckDB/python recompute the certificate from scratch.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if batch_rows is not None and batch_rows < 1:
        raise ValueError(f"batch_rows must be >= 1, got {batch_rows}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        dec_total = 0

        def merge(series: pd.Series) -> None:
            nonlocal counts, dec_total
            vc = series.value_counts()
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            overflow = len(counts) - capacity
            if overflow > 0:
                # batched MG: subtract the overflow-th smallest counter
                # from everyone; at least `overflow` counters hit <= 0
                # and evict, restoring the cap in one vectorized step
                delta = sorted(counts.values())[overflow - 1]
                dec_total += delta
                counts = {i: c - delta for i, c in counts.items() if c > delta}

        if batch_rows is None:
            for b in batches:
                merge(b[col].dropna())
        else:
            pending = []
            n_pending = 0
            for b in batches:
                s = b[col].dropna()
                pending.append(s)
                n_pending += len(s)
                while n_pending >= batch_rows:
                    buf = pd.concat(pending, ignore_index=True)
                    merge(buf.iloc[:batch_rows])
                    rest = buf.iloc[batch_rows:]
                    pending, n_pending = [rest], len(rest)
            if n_pending:
                merge(pd.concat(pending, ignore_index=True))
        out = pd.DataFrame(
            {"item": list(counts.keys()), "cnt": list(counts.values())}
        )
        out = pd.concat(
            [out, pd.DataFrame({"item": [None], "cnt": [dec_total]})],
            ignore_index=True,
        )
        out["item"] = out["item"].astype(object)
        out["cnt"] = out["cnt"].astype("int64")
        yield out

    # output item type mirrors the input column (tokens, bigint ids, ...)
    # — a hard-coded `string` would force casts (or Arrow failures) on
    # non-string items in the downstream recount semi-join
    item_type = df.schema[col].dataType.simpleString()
    return df.select(col).mapInPandas(summarize, f"item {item_type}, cnt long")


def heavy_hitters_topk(
    df: DataFrame,
    col: str,
    k: int,
    capacity: int = 1 << 14,
    batch_rows: int | None = None,
) -> tuple[DataFrame, int]:
    """Provably-exact top-``k`` items of ``df[col]`` (NULLs ignored).

    Returns ``(topk, bound)`` where ``topk`` has columns
    ``(item, cnt)`` ordered by ``cnt`` desc then ``item`` asc (a total
    deterministic order), and ``bound`` is the certified maximum true
    count of any item NOT in the candidate set.  Raises ``ValueError``
    if the certificate fails — the k-th count did not clear the bound,
    so exactness cannot be guaranteed at this capacity.
    """
    # persist so the bound and the candidate set come from ONE evaluation
    # of pass 1 (without it, the bound collect and the recount semi-join
    # each recompute the summary — an extra full corpus scan, and on any
    # nondeterministic/partition-order-varying input the bound could
    # certify a DIFFERENT candidate set than the one recounted, silently
    # voiding the exactness guarantee). The summary is vocabulary-sized
    # (≤ capacity rows + 1 sentinel per partition), so caching is cheap.
    summary = mg_candidates(df, col, capacity, batch_rows=batch_rows).persist()
    try:
        bound = summary.filter(F.col("item").isNull()).agg(
            F.sum("cnt").alias("b")
        ).collect()[0]["b"]
        bound = int(bound or 0)
        cand = (
            summary.filter(F.col("item").isNotNull()).select("item").distinct()
        )
        exact = (
            df.join(
                F.broadcast(cand.withColumnRenamed("item", col)),
                on=col,
                how="leftsemi",
            )
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumnRenamed(col, "item")
        )
        topk = exact.orderBy(F.col("cnt").desc(), F.col("item").asc()).limit(k)
        rows = topk.collect()
    finally:
        summary.unpersist()
    kth = rows[-1]["cnt"] if len(rows) == k else 0
    # fewer than k candidates with a nonzero bound also fails: an
    # evicted item could be a legitimate k-th entry we never recounted
    if bound > 0 and kth <= bound:
        raise ValueError(
            f"heavy-hitter certificate failed: k-th count {kth} "
            f"<= bound {bound}; raise capacity (got {capacity})"
        )
    result = topk.sparkSession.createDataFrame(rows, topk.schema)
    return result, bound
