"""Schema-driven table profiling: the ANALYZE-style per-column report.

``profile_table`` emits one row per column — null counts, value bounds,
exact-decimal means, string-length bounds, and a portable KMV
distinct-count estimate — with a fixed, type-dispatched metric set so the
report is engine-portable (every metric has an exact DuckDB twin).

Scale design: the typed stats for ALL columns come from per-column
single-row aggregates over one relation (map-side partial aggregation;
the shuffle carries one row per column), and each distinct estimate is a
k-bounded KMV (``TakeOrderedAndProject``, never a full distinct).  The
union of C+1 one-row frames is driver-free — the report is itself a
DataFrame.  At 100 TB, profile from persisted sketch tables instead
(``kmv_sketch_table`` / ``hll_register_table`` roll up without
rescanning); this operator is the direct-pass form.

Reference analog: the reference's monitoring queries
(/root/reference/src/helper/postgres.py:88-155) are hand-written
per-table COUNT/MAX probes; this generalizes them to any relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_KINDS = ("tinyint", "smallint", "int", "bigint")

# Metric applicability by column kind:
#   int family    -> min/max/avg (exact-decimal mean), KMV distinct
#   double/float  -> min/max rounded(6), avg; distinct NULL (float->string
#                    rendering is engine-private, so hashing is unsafe)
#   string        -> length bounds, KMV distinct
#   timestamp     -> min/max as epoch microseconds; distinct NULL


def _null_d():
    return F.lit(None).cast("double")


def _null_i():
    return F.lit(None).cast("int")


def profile_table(
    df: DataFrame, cols: list[str] | None = None, k: int = 64
) -> DataFrame:
    """One profile row per column: ``(column, dtype, n_rows, n_nulls,
    distinct_est, min_num, max_num, avg_num, min_len, max_len)``.

    Metrics outside a column's type dispatch are NULL.  ``distinct_est``
    counts distinct NON-NULL values (both engines filter nulls before
    hashing — null ordering under LIMIT differs across engines).
    ``avg_num`` is the exact-decimal mean over non-null values (NULL for
    an all-null column).
    """
    from door2door_etl_spark.operators.sketches import kmv_distinct_estimate

    dtypes = dict(df.dtypes)
    out: DataFrame | None = None
    for c in cols or df.columns:
        dt = dtypes[c]
        col = F.col(c)
        exprs = [
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).cast("long").alias("n_nulls"),
        ]
        wants_distinct = False
        if dt in _INT_KINDS:
            wants_distinct = True
            exprs += [
                F.min(col).cast("double").alias("min_num"),
                F.max(col).cast("double").alias("max_num"),
                F.round(
                    F.sum(col.cast("decimal(38,6)")).cast("double")
                    / F.count(col),
                    4,
                ).alias("avg_num"),
                _null_i().alias("min_len"),
                _null_i().alias("max_len"),
            ]
        elif dt in ("double", "float"):
            exprs += [
                F.round(F.min(col).cast("double"), 6).alias("min_num"),
                F.round(F.max(col).cast("double"), 6).alias("max_num"),
                F.round(
                    F.sum(col.cast("decimal(38,6)")).cast("double")
                    / F.count(col),
                    4,
                ).alias("avg_num"),
                _null_i().alias("min_len"),
                _null_i().alias("max_len"),
            ]
        elif dt.startswith("timestamp"):
            exprs += [
                F.unix_micros(F.min(col)).cast("double").alias("min_num"),
                F.unix_micros(F.max(col)).cast("double").alias("max_num"),
                _null_d().alias("avg_num"),
                _null_i().alias("min_len"),
                _null_i().alias("max_len"),
            ]
        elif dt == "string":
            wants_distinct = True
            exprs += [
                _null_d().alias("min_num"),
                _null_d().alias("max_num"),
                _null_d().alias("avg_num"),
                F.min(F.length(col)).cast("int").alias("min_len"),
                F.max(F.length(col)).cast("int").alias("max_len"),
            ]
        else:  # arrays/structs/binary: presence stats only
            exprs += [
                _null_d().alias("min_num"),
                _null_d().alias("max_num"),
                _null_d().alias("avg_num"),
                _null_i().alias("min_len"),
                _null_i().alias("max_len"),
            ]
        one = df.agg(*exprs)
        if wants_distinct:
            est = kmv_distinct_estimate(
                df.filter(col.isNotNull()), c, k=k
            ).select("est_distinct")
            one = one.crossJoin(F.broadcast(est))
        else:
            one = one.withColumn("est_distinct", _null_d())
        one = one.select(
            F.lit(c).alias("column"),
            F.lit(dt).alias("dtype"),
            "n_rows",
            "n_nulls",
            F.col("est_distinct").alias("distinct_est"),
            "min_num",
            "max_num",
            "avg_num",
            "min_len",
            "max_len",
        )
        out = one if out is None else out.unionByName(one)
    assert out is not None, "no columns to profile"
    return out
