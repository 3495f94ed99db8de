"""Two-level distributed prefix sum (EXT — the scan-sum building
block behind sequence packing and budgeted sampling).

A per-key ordered running sum is the classic Spark scale trap: the
naive ``SUM() OVER (PARTITION BY key ORDER BY ...)`` serializes every
row of a key through ONE window partition. The standard decomposition
(the same one GPU scan kernels and MPI prefix sums use) splits each
key's stream into shards, computes intra-shard running sums in
parallel, prefix-sums the per-shard totals (a 1/SPAN-row reduction),
and adds the shard base back as an offset. The result is exactly the
global window's answer for any shard width — operators built on this
helper keep a global-window ORACLE so the hash gate proves that
identity rather than assuming it.

Caller contract:

- ``shard_col`` must be a NON-DECREASING function of the leading
  ``order_cols`` entry within each partition (e.g. ``id div SPAN``
  over an ``ORDER BY id``, or ``hash div 2^k`` over ``ORDER BY
  hash``): the shard prefix order must agree with the row order.
- The input should be ``localCheckpoint(eager=False)``-materialized
  by the caller when it is derived (both the window branch and the
  shard-total aggregate consume it; without a barrier Spark re-runs
  the upstream scan per branch — no common-subtree elimination
  across join inputs).
- Shard width is the scale dial: the offset side is #rows/SPAN and
  must stay broadcastable, windows hold ≤ SPAN rows. A third level
  extends the same algebra if both ends pinch at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sharded_exclusive_prefix_sum(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    shard_col: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Exclusive (sum of strictly-preceding rows) prefix sum of
    ``value_col`` per ``partition_cols`` in ``order_cols`` order,
    decomposed over ``shard_col``. Exact long arithmetic throughout."""
    wi = (
        W.partitionBy(*partition_cols, shard_col)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ws = (
        W.partitionBy(*partition_cols)
        .orderBy(shard_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    intra = df.withColumn(
        "_intra", F.coalesce(F.sum(value_col).over(wi), F.lit(0)).cast("long")
    )
    base = (
        df.groupBy(*partition_cols, shard_col)
        .agg(F.sum(value_col).alias("_shard_total"))
        .withColumn(
            "_base",
            F.coalesce(F.sum("_shard_total").over(ws), F.lit(0)).cast("long"),
        )
        .select(*partition_cols, shard_col, "_base")
    )
    return (
        intra.join(F.broadcast(base), [*partition_cols, shard_col])
        .withColumn(out_col, (F.col("_base") + F.col("_intra")).cast("long"))
        .drop("_intra", "_base")
    )
