"""Relational query-layer operators over the warehouse model (SURVEY.md §2.4-2.6).

The reference delegates analyst queries to Postgres (README.md:3,48-51); this
module supplies that standard surface Spark-first.  Each helper is a thin,
deterministic composition of DataFrame ops — Catalyst owns join strategy and
AQE owns runtime re-planning; we only add the hints Catalyst cannot infer
(broadcast of known-small dimensions, deterministic tie-breaks).

Scale notes per operator are in the docstrings; the common themes:
- deterministic results: every row_number window orders by a unique key last,
  so reruns and re-partitions return identical rows (required both by the
  DuckDB-oracle harness and by idempotent downstream MERGEs);
- latest-per-key and top-k-per-group shuffle once on the partition key;
- the interval (range) join broadcasts the small periods side — at 100 TB the
  events side streams through executors without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_col: str, tiebreak_cols: list[str]
) -> DataFrame:
    """Latest row per key: ``row_number() OVER (PARTITION BY key ORDER BY
    order DESC, tiebreaks DESC) = 1`` (SURVEY.md §2.6 'latest location per
    vehicle').

    One shuffle on ``key_cols``; with a bucketed/pre-partitioned source the
    exchange is elided.  Tie-break columns make the pick deterministic.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(order_col), *[F.desc(c) for c in tiebreak_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list[Column],
    k: int,
) -> DataFrame:
    """Top-k rows per group with deterministic ordering.

    ``order_exprs`` must end with a unique-key expression so rank ties cannot
    reorder across engines/partitionings.  Adds column ``rk`` (1-based).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    return df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def interval_join(
    facts: DataFrame,
    periods: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    broadcast_periods: bool = True,
) -> DataFrame:
    """Theta-join facts to enclosing periods: ``start <= ts <= end``
    (SURVEY.md §2.4: locations inside an operating period).

    Physical strategy: broadcast-nested-loop with the (small) periods side
    broadcast — the 100 TB facts side never shuffles.  For two large sides,
    pre-bucket both by a common coarse time grain and equi-join on the bucket
    before the range predicate (not needed for the reference's data shape,
    where periods per org number in the hundreds).
    """
    right = F.broadcast(periods) if broadcast_periods else periods
    cond = (facts[ts_col] >= right[start_col]) & (facts[ts_col] <= right[end_col])
    return facts.join(right, cond)


def dedup_first_wins(
    df: DataFrame, key_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """Order-stable variant of ``dropDuplicates`` (SURVEY.md §2.5 A3): keeps
    the first row per key under an explicit total order, unlike the
    reference's pandas ``keep="first"`` which depends on S3 listing order."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
