"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget chunks in a stable global order.

The semantics are contiguous chunking: with ``c(i)`` the exclusive prefix
sum of token weights in ``order_col`` order, row *i* lands in chunk
``floor(c(i) / budget)``.  This is the deterministic, SQL-expressible core
of sequence packing (documents that straddle a boundary belong to the chunk
their first token falls in); an exact greedy bin-packer would need a
row-at-a-time recurrence that no window frame expresses.

Scale design — a global ORDER BY prefix sum is the textbook single-task
trap, so this runs the classic two-phase distributed scan instead:

1. ``repartitionByRange(order_col)`` (one range shuffle; boundaries from
   Spark's deterministic reservoir sketch),
2. per-partition window cumsum (parallel across partitions),
3. partition *offsets* from a driver-side prefix over the per-partition
   totals — ``num_partitions`` rows, the only driver materialization —
   broadcast back as a tiny join.

The output is invariant to where the range boundaries fall, so the
data-dependent sampling in step 1 cannot perturb results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contiguous_token_chunks(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``chunk_id``: the token-budget chunk of each row under a global
    ``order_col`` ordering (unique keys required for determinism)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    totals = (
        ranged.groupBy("_pid")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("_tot"))
        .collect()
    )
    offsets, running = [], 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], running))
        running += int(row["_tot"] or 0)
    off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "_cum", F.col("_offset") + F.sum(F.col(weight_col).cast("long")).over(w)
        )
        .withColumn(
            "chunk_id",
            F.floor((F.col("_cum") - F.col(weight_col)) / F.lit(float(budget))),
        )
        .drop("_pid", "_offset", "_cum")
    )
