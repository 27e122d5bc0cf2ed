"""As-of join: each left row matched to the latest right row at or
before its timestamp, within key groups.

Spark has no built-in as-of join; the standard composition is
union-tag-window: tag both sides, union, ONE shuffle on the keys, sort
by (time, side) within partitions, and carry the most recent right
payload forward with ``last(..., ignorenulls=True)`` over an unbounded-
preceding frame. Cost is a single exchange + sort — the same as any
windowed query on the union, with no join explosion and no per-key
driver work; key skew is ordinary window skew.

Right rows must be unique per (keys..., time): pre-aggregate duplicates
or the "latest" is ill-defined (DuckDB's native ASOF JOIN — the oracle
twin — has the same requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """For every left row, append ``value_cols`` from the latest right
    row with ``right.time_col <= left.time_col`` and equal ``by`` keys
    (null when no such row). Equal timestamps match (<=), like DuckDB's
    ``ASOF JOIN ... ON l.t >= r.t``."""
    payload = F.struct(*[F.col(c) for c in value_cols])
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(payload.alias("_p")).schema["_p"].dataType.simpleString()
        ).alias("_p"),
    )
    r_tag = right.select(
        *[F.col(c) for c in by],
        F.col(time_col),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    # right rows (side 0) sort before left rows at the same timestamp, so
    # an equal-time right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_last", F.last("_p", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side", "_p")
    for c in value_cols:
        out = out.withColumn(c, F.col("_last").getField(c))
    return out.drop("_last")
