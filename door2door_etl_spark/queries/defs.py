"""Query catalog definitions and the Spark-side deterministic-agg helpers."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QueryDef:
    """One catalog entry: a Spark query plus (usually) its DuckDB oracle.

    ``oracle is None`` marks a genuinely non-SQL-expressible operator (the
    driver then records a weaker rows-only check).
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ref: str  # SURVEY.md §2 operator ids this query covers
    tags: tuple[str, ...] = field(default_factory=tuple)


def dsum(expr: Column, scale: int = 2) -> Column:
    """Deterministic money-sum (Spark twin of sql_fragments.dec_sum):
    exact DECIMAL(20,6) accumulation — immune to float accumulation-order
    differences across partitions/engines — rendered as rounded double."""
    return F.round(F.sum(expr.cast("decimal(20,6)")).cast("double"), scale)


def davg(expr: Column, scale: int = 4) -> Column:
    """Deterministic average from the exact decimal sum (twin of dec_avg)."""
    return F.round(
        F.sum(expr.cast("decimal(20,6)")).cast("double") / F.count(F.lit(1)), scale
    )
