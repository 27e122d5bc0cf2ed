"""Dataset profiling: per-column statistics in one pass — the
"ANALYZE TABLE" a pipeline runs before touching a new 100 TB corpus
(null rates locate broken ingestion, distinct counts size dictionaries
and joins, min/max bound partition pruning).

One wide aggregation computes every metric for every requested column
(Spark plans multiple count-distincts as a single expand + one
exchange — not one job per column), then the single result row is
unpivoted driver-side into the long (column, metric...) form. Values
are rendered to strings with deterministic formatting (floats rounded)
so the output is engine-comparable."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fmt(col: F.Column, dtype: str) -> F.Column:
    if dtype in ("double", "float"):
        # C-style %.4f on both engines: plain casts disagree on float
        # rendering (Spark "1.0E7" vs DuckDB "10000000.0")
        return F.format_string("%.4f", F.round(col.cast("double"), 4))
    return col.cast("string")


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_val, max_val) per column.

    ``min_val``/``max_val`` are the column's own ordering rendered as
    strings (numerics formatted to 4 dp so cross-engine float printing
    can't differ).

    ``approx=True`` swaps exact ``countDistinct`` for HLL++
    ``approx_count_distinct(rsd)`` — the 100 TB ANALYZE path: exact
    distincts are the one term that forces a per-column expand carrying
    full distinct state through the exchange, while the sketch keeps
    the whole pass a single map-side-combinable aggregation (fixed
    bytes per column per partition). Default stays exact (ANALYZE
    semantics; driver-gate comparable)."""
    dtypes = dict(df.dtypes)
    cols = columns or list(df.columns)
    aggs = []
    for c in cols:
        base = dtypes[c].split("(")[0]
        nd = (
            F.approx_count_distinct(c, rsd)
            if approx
            else F.countDistinct(c)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            nd.alias(f"{c}__distinct"),
            _fmt(F.min(c), base).alias(f"{c}__min"),
            _fmt(F.max(c), base).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            c,
            int(row[f"{c}__n"]),
            int(row[f"{c}__nulls"]),
            int(row[f"{c}__distinct"]),
            row[f"{c}__min"],
            row[f"{c}__max"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_rows long, n_null long, n_distinct long, "
        "min_val string, max_val string",
    )
