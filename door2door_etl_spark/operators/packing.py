"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget chunks in a stable global order.

The semantics are contiguous chunking: with ``c(i)`` the exclusive prefix
sum of token weights in ``order_col`` order, row *i* lands in chunk
``c(i) // budget``.  This is the deterministic, SQL-expressible core of
sequence packing (documents that straddle a boundary belong to the chunk
their first token falls in); an exact greedy bin-packer would need the same
row-at-a-time recurrence, which the per-partition scan below also supports.

Scale design — a global ORDER BY prefix sum is the textbook single-task
trap, so this runs the classic two-phase distributed scan instead:

1. ``repartitionByRange(order_col)`` + ``sortWithinPartitions`` (ONE range
   shuffle; boundaries from Spark's deterministic reservoir sketch),
2. partition *offsets* from a driver-side prefix over per-partition weight
   totals — ``num_partitions`` rows, the only driver materialization,
3. a partition-local running cumsum via ``mapInPandas`` (Arrow-batched,
   state carried across batches within the partition) — chosen over
   ``Window.partitionBy(partition_id)`` because Catalyst cannot know the
   range exchange already clusters rows by partition id and would insert a
   second full hash shuffle.

A window frame cannot express "cumsum seeded per partition", so this is a
legitimate mapInPandas drop-down; the frame it scans is the narrow
(key, weight) projection, not the documents.  The result is invariant to
where the range boundaries fall.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def contiguous_token_chunks(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    num_partitions: int | None = None,
    persist_input: bool = True,
) -> DataFrame:
    """Add ``chunk_id``: the token-budget chunk of each row under a global
    ``order_col`` ordering (unique keys required for determinism).

    ``persist_input`` caches the range-partitioned frame: the offsets pass
    (phase 2) and the output pass both consume it, and without a cache each
    re-executes the ENTIRE upstream plan — ruinous when packing sits at the
    end of a filter/dedup pipeline.  The cached frame is just
    (key, weight, …) — narrow by construction — so this is the right
    default even at corpus scale; pass False only when the input is a bare
    scan.  Caller owns the cache lifetime (``spark.catalog.clearCache()``)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    if persist_input:
        from pyspark.storagelevel import StorageLevel

        ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    totals = (
        ranged.groupBy("_pid")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("_tot"))
        .collect()
    )
    offsets, running = {}, 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[int(row["_pid"])] = running
        running += int(row["_tot"] or 0)
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("chunk_id", T.LongType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None  # running inclusive prefix sum, carried across batches
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = b_offsets.value[int(pdf["_pid"].iloc[0])]
            w = pdf[weight_col].to_numpy(dtype="int64")
            cum = w.cumsum() + run
            run = int(cum[-1])
            out = pdf.drop(columns=["_pid"]).copy()
            out["chunk_id"] = (cum - w) // budget
            yield out

    return ranged.mapInPandas(assign, schema=out_schema)


def sliding_token_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Per-document overlapping token windows (context-window chunking).

    One output row per window position: ``(id, chunk_idx, chunk_text,
    n_tokens)``.  Window starts advance by ``stride`` until the end of the
    document, so every token is covered and trailing windows truncate
    (an empty document yields one empty chunk, mirroring the short-doc
    collapse in :func:`text.shingles`).

    Scale shape: map-only — the windows are built with sequence/transform
    inside a single projection and exploded, so there is NO shuffle at any
    data size; chunking 100 TB is embarrassingly parallel.  The token array
    is bound once via the single-element-transform trick (Catalyst does not
    CSE through lambda bodies; re-evaluating the tokenizer per window would
    be O(tokens x windows) per document)."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    from door2door_etl_spark.operators.text import tokens

    def build(toks):
        k = F.size(toks)
        starts = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)), F.lit(stride))
        return F.transform(
            starts,
            lambda st, i: F.struct(
                i.cast("long").alias("chunk_idx"),
                F.concat_ws(" ", F.slice(toks, st + 1, window)).alias("chunk_text"),
                F.least(k - st, F.lit(window)).cast("long").alias("n_tokens"),
            ),
        )

    chunks = F.transform(F.array(tokens(F.col(text_col))), build)[0]
    return docs.select(id_col, F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )
