"""Training-data pipeline operators: dedup, similarity, text, multimodal."""

from pyspark.sql import functions as F


def single_partition_key(col: str) -> F.Column:
    """Constant-zero window partition key that SURVIVES the optimizer.

    ``Window.partitionBy(F.lit(0))`` does not silence Spark's
    "No Partition Defined for Window" warning: the foldable partition
    expression is eliminated (Spark 4 ``EliminateWindowPartitions``),
    leaving an empty spec at execution. ``pmod(xxhash64(col), 1)`` is 0
    for EVERY row of ANY column type — xxhash64 accepts any input
    (including NULL) and always returns a non-null long, and any long
    pmod 1 is exactly 0 — but it contains an attribute, so no rule folds
    it. (A bare ``pmod(col, 1)`` is NOT safe: a fractional double id
    yields a nonzero key and silently splits the window, and a
    non-numeric string id throws under ANSI.) Use ONLY for windows that
    are single-partition BY DESIGN — i.e. over a global-``limit(k)``'s
    k rows, or an inherently sequential stream — where the warning is
    noise, not a diagnosis. Execution (one hash partition holding all
    rows) and results are identical to the empty spec; only the warning
    goes away.
    """
    return F.pmod(F.xxhash64(F.col(col)), F.lit(1))
