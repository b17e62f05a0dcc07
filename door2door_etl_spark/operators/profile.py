"""Schema-driven table profiling: the ANALYZE-style per-column report.

``profile_table`` emits one row per column — null counts, value bounds,
exact-decimal means, string-length bounds, and a portable KMV
distinct-count estimate — with a fixed, type-dispatched metric set so the
report is engine-portable (every metric has an exact DuckDB twin).

Scale design — the profile costs TWO scans of the table, independent of
column count:

1. ONE aggregate pass computes every column's typed stats as prefixed
   one-row aggregates (map-side partial aggregation; the shuffle carries
   one row), then an ``explode`` over that single row pivots it to one
   report row per column — no per-column scan, no driver assembly.
2. ONE exploded pass computes ALL KMV distinct estimates: each row emits
   a (column, deviate) pair per eligible column, and a per-column
   windowed top-k (``WindowGroupLimit`` — k-bounded state per column on
   every partial) feeds the ``(k-1)/u_(k)`` estimator.

At 100 TB, profile from persisted sketch tables instead
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
    hashing — null ordering under LIMIT differs across engines) with the
    plain KMV estimator ``(k-1)/u_(k)``.  ``avg_num`` is the
    exact-decimal mean over non-null values (NULL for an all-null
    column).  Report row order follows the input column order.
    """
    from pyspark.sql import Window

    from door2door_etl_spark.operators.sketches import uniform_hash

    dtypes = dict(df.dtypes)
    names = list(cols or df.columns)

    # Pass 1: every column's typed stats in ONE aggregate.
    exprs: list = []
    per_col: dict[str, dict[str, object]] = {}
    for i, c in enumerate(names):
        dt = dtypes[c]
        col = F.col(c)
        p = f"_c{i}_"
        exprs += [
            F.count(F.lit(1)).cast("long").alias(p + "n_rows"),
            (F.count(F.lit(1)) - F.count(col)).cast("long").alias(p + "n_nulls"),
        ]
        avg = F.round(
            F.sum(col.cast("decimal(38,6)")).cast("double") / F.count(col), 4
        )
        if dt in _INT_KINDS:
            exprs += [
                F.min(col).cast("double").alias(p + "min_num"),
                F.max(col).cast("double").alias(p + "max_num"),
                avg.alias(p + "avg_num"),
                _null_i().alias(p + "min_len"),
                _null_i().alias(p + "max_len"),
            ]
            kind = "int"
        elif dt in ("double", "float"):
            exprs += [
                F.round(F.min(col).cast("double"), 6).alias(p + "min_num"),
                F.round(F.max(col).cast("double"), 6).alias(p + "max_num"),
                avg.alias(p + "avg_num"),
                _null_i().alias(p + "min_len"),
                _null_i().alias(p + "max_len"),
            ]
            kind = "float"
        elif dt.startswith("timestamp"):
            exprs += [
                F.unix_micros(F.min(col)).cast("double").alias(p + "min_num"),
                F.unix_micros(F.max(col)).cast("double").alias(p + "max_num"),
                _null_d().alias(p + "avg_num"),
                _null_i().alias(p + "min_len"),
                _null_i().alias(p + "max_len"),
            ]
            kind = "timestamp"
        elif dt == "string":
            exprs += [
                _null_d().alias(p + "min_num"),
                _null_d().alias(p + "max_num"),
                _null_d().alias(p + "avg_num"),
                F.min(F.length(col)).cast("int").alias(p + "min_len"),
                F.max(F.length(col)).cast("int").alias(p + "max_len"),
            ]
            kind = "string"
        else:  # arrays/structs/binary: presence stats only
            exprs += [
                _null_d().alias(p + "min_num"),
                _null_d().alias(p + "max_num"),
                _null_d().alias(p + "avg_num"),
                _null_i().alias(p + "min_len"),
                _null_i().alias(p + "max_len"),
            ]
            kind = "other"
        per_col[c] = {"prefix": p, "dtype": dt, "kind": kind, "order": i}
    one = df.agg(*exprs)
    metrics = ["n_rows", "n_nulls", "min_num", "max_num", "avg_num",
               "min_len", "max_len"]
    report = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(per_col[c]["order"]).alias("_ord"),
                        F.lit(c).alias("column"),
                        F.lit(per_col[c]["dtype"]).alias("dtype"),
                        *[
                            F.col(str(per_col[c]["prefix"]) + m).alias(m)
                            for m in metrics
                        ],
                    )
                    for c in names
                ]
            )
        ).alias("r")
    ).select("r.*")

    # Pass 2: all KMV distinct estimates from one exploded scan.
    eligible = [c for c in names if per_col[c]["kind"] in ("int", "string")]
    if eligible:
        pairs = (
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("column"),
                                uniform_hash(F.col(c), "kmv").alias("u"),
                            )
                            for c in eligible
                        ]
                    )
                ).alias("x")
            )
            .select("x.column", "x.u")
            .filter(F.col("u").isNotNull())
            .dropDuplicates(["column", "u"])
        )
        w = Window.partitionBy("column").orderBy("u")
        # Below-k exact fallback (mirrors kmv_distinct_by_group): a column
        # with fewer than k distinct values keeps its WHOLE distinct set in
        # the sketch, so the count IS the exact answer — the (k-1)/max(u)
        # estimator is near-random noise in that regime (a 2-value enum can
        # report 70).  Only at >= k sketch rows does the estimator apply.
        n_sketch = F.count(F.lit(1))
        ests = (
            pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .groupBy("column")
            .agg(
                F.when(
                    n_sketch >= k,
                    F.round(F.lit(float(k - 1)) / F.max("u"), 4),
                )
                .otherwise(n_sketch.cast("double"))
                .alias("distinct_est")
            )
        )
        report = report.join(F.broadcast(ests), "column", "left")
    else:
        report = report.withColumn("distinct_est", _null_d())
    return report.orderBy("_ord").select(
        "column", "dtype", "n_rows", "n_nulls", "distinct_est",
        "min_num", "max_num", "avg_num", "min_len", "max_len",
    )


def profile_drift(
    old: DataFrame, new: DataFrame, cols: list[str] | None = None, k: int = 64
) -> DataFrame:
    """Per-column drift between two slices of the same relation — the
    data-quality diff a pipeline runs between yesterday's and today's
    partition before promoting a batch: null-fraction shift, mean shift,
    distinct-count ratio, and bound movement, all derived from the two
    :func:`profile_table` reports (bounded one-row-per-column relations,
    so the join here is driver-scale regardless of table size; the cost
    is the two profile passes).

    Deltas are computed on the profiles' already-rounded metrics, so the
    report is bit-reproducible cross-engine wherever the profiles are.
    Output: ``(column, dtype, null_frac_old, null_frac_new, avg_delta,
    distinct_ratio, min_delta, max_delta)``, NULL where the metric is
    outside the column's type dispatch."""
    po = profile_table(old, cols, k)
    pn = profile_table(new, cols, k)
    o, n = po.alias("o"), pn.alias("n")
    frac = lambda side: F.round(  # noqa: E731
        F.col(f"{side}.n_nulls").cast("double") / F.col(f"{side}.n_rows"), 6
    )
    return (
        o.join(n, ["column", "dtype"])
        .select(
            "column",
            "dtype",
            frac("o").alias("null_frac_old"),
            frac("n").alias("null_frac_new"),
            F.round(F.col("n.avg_num") - F.col("o.avg_num"), 4).alias("avg_delta"),
            F.round(
                F.col("n.distinct_est") / F.col("o.distinct_est"), 4
            ).alias("distinct_ratio"),
            F.round(F.col("n.min_num") - F.col("o.min_num"), 4).alias("min_delta"),
            F.round(F.col("n.max_num") - F.col("o.max_num"), 4).alias("max_delta"),
        )
        .orderBy("column")
    )


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    topk: int = 10,
) -> DataFrame:
    """Join/aggregation-key skew diagnostics: the ``topk`` heaviest key
    values with their row counts, share of the table, cumulative share,
    skew factor (count / mean-per-key), and a suggested salt-bucket
    count — the pre-flight a 100 TB join wants BEFORE it shuffles, and
    the measurement behind ``operators.relational.salted_skew_join``'s
    salt parameter.

    Plan shape: ONE per-key count aggregate (map-side combinable), its
    grand totals folded to a single broadcast row, and a
    ``TakeOrderedAndProject`` for the top-k — no window over all keys,
    no second scan of the input.  Cumulative share is a window over the
    k retained rows only (driver-bounded).

    ``suggested_salt`` = ceil(count / mean-per-key): the number of salt
    buckets that splits the heaviest key into roughly mean-sized units —
    1 for unskewed keys, so the column doubles as a "needs salting"
    flag.  Deterministic order: count desc, then key columns asc."""
    from pyspark.sql import Window

    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    totals = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.avg("cnt").alias("avg_cnt"),
    )
    order = [F.col("cnt").desc()] + [F.col(c).asc() for c in key_cols]
    top = per_key.orderBy(*order).limit(topk)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "cnt",
            "n_keys",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            F.round(
                F.sum("cnt").over(w) / F.col("n_rows"), 6
            ).alias("cum_share"),
            F.round(F.col("cnt") / F.col("avg_cnt"), 4).alias("skew_factor"),
            F.ceil(F.col("cnt") / F.col("avg_cnt")).cast("int").alias(
                "suggested_salt"
            ),
        )
    )


def benford_digit_audit(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford's-law first-digit audit of a numeric column over the
    domain ``value >= 1``: one row per leading digit 1-9 with the
    observed count/share, the Benford expectation ``log10(1 + 1/d)``,
    and the chi-square contribution ``n_total * (obs - exp)^2 / exp`` —
    the standard forensic screen for fabricated or truncated monetary
    data, run here as a data-quality report next to the profile/drift
    family.

    The leading digit is taken by TRUNCATION — ``floor`` to the exact
    integer part, rendered as DECIMAL(38,0), first character — never via
    ``floor(log10(v))`` (a log of a value sitting exactly on a power of
    ten may land on either side of the floor depending on the libm) and
    never via a scaled-decimal rounding (rounding promotes boundary
    values across a digit: 9.996 rendered at scale 2 is "10.00", which
    would count as digit 1; its true leading digit is 9).  Plan shape:
    one map-side combinable count per digit; the normalizer is a window
    over the 9-row histogram.

    Domain restriction, stated explicitly: the audit runs over
    ``1 <= value < 10^15`` — NULLs, non-positives, sub-unit values AND
    >= 10^15 magnitudes are all excluded.  Sub-unit values have a first
    *significant* digit, but pulling it portably needs a scale-unbounded
    rendering; above 10^15 a double cannot even represent units exactly
    (and Spark's ``floor`` saturates at the BIGINT boundary ~9.2*10^18,
    where it would silently miscount everything as digit 9 while DuckDB
    raises — a divergence this explicit bound keeps unreachable).  The
    monetary forensics Benford screens target live comfortably inside
    the window.
    """
    from pyspark.sql import Window

    digit = F.substring(
        F.floor(F.col(value_col)).cast("decimal(38,0)").cast("string"), 1, 1
    ).cast("int")
    hist = (
        df.filter(
            F.col(value_col).isNotNull()
            & (F.col(value_col) >= 1)
            & (F.col(value_col) < F.lit(1e15))
        )
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_values"))
    )
    w = Window.partitionBy()
    total = F.sum("n_values").over(w).cast("double")
    obs = F.col("n_values") / total
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return hist.select(
        "digit",
        "n_values",
        F.round(obs, 6).alias("obs_share"),
        F.round(exp, 6).alias("benford_share"),
        F.round(total * (obs - exp) * (obs - exp) / exp, 6).alias("chi2_part"),
    ).orderBy("digit")


def cusum_drift(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    slack: float = 0.0,
) -> DataFrame:
    """Per-key CUSUM changepoint screen (Page 1954): for each key's
    ordered value sequence, the maximum one-sided upward CUSUM excursion
    against the key's own mean,

        S_i = Σ_{j<=i} (v_j - mean - slack),   cusum = max_i (S_i - min_{j<=i} S_j)

    — the standard sequential drift detector (a sustained level shift
    grows the excursion linearly; noise stays near zero).  Output:
    ``(key..., n_points, mean, max_cusum)``.

    Engine-exact by construction: the mean comes from an exact DECIMAL
    sum (order-independent) rounded at 6dp, each deviation term is
    quantized to DECIMAL *before* the running sum — so the cumulative
    sums are exact integers-of-quanta in any engine regardless of how
    its window aggregation associates (DuckDB's segment trees vs Spark's
    incremental frames), never a float race.  Plan shape: ONE shuffle on
    the key partitioning shared by the mean window, the two running
    windows, and the final aggregate.
    """
    from pyspark.sql import Window

    dec = "decimal(28,10)"
    wp = Window.partitionBy(*key_cols)
    wo = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col).cast("double")
    mean = F.round(
        F.sum(v.cast(dec)).over(wp).cast("double")
        / F.count(F.lit(1)).over(wp),
        6,
    )
    # two selects: a window expression cannot nest inside another window's
    # argument, and both windows share the key partitioning anyway
    with_mean = df.filter(F.col(value_col).isNotNull()).select(
        *key_cols, *order_cols, v.alias("_v"), mean.alias("_mean")
    )
    term = F.round(
        F.col("_v") - F.col("_mean") - F.lit(float(slack)), 6
    ).cast(dec)
    s = F.sum(term).over(wo)
    staged = with_mean.select(
        *key_cols, *order_cols, "_mean", s.alias("_s")
    ).select(
        *key_cols,
        "_mean",
        (F.col("_s") - F.min("_s").over(wo)).cast("double").alias("_exc"),
    )
    return staged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.first("_mean").alias("mean"),
        F.round(F.max("_exc"), 6).alias("max_cusum"),
    )


def seasonal_hourly_profile(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Seasonal baseline + anomaly screen: per (group, hour-of-day), the
    observation count and mean value, plus the hour's z-score against
    the group's OWN across-hours distribution — the "is 3am traffic
    weird for this segment" monitoring query, one step past a plain
    hourly rollup.

    Plan shape: ONE map-side-combinable aggregate to (group, hour) grain
    — at most 24·|groups| rows — then the group-level moments come from
    a window over that tiny grain (never a second pass over events).
    Engine-exact: hour means derive from exact DECIMAL sums; the
    across-hours variance uses the same decimal-quantized moments, so
    both engines do the identical double arithmetic.  Output: ``(group...,
    hour, n_values, hour_mean, z_score)``.
    """
    from pyspark.sql import Window

    dec = "decimal(28,10)"
    grain = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, F.hour(F.col(ts_col)).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.round(
                F.sum(F.col(value_col).cast(dec)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("hour_mean"),
        )
    )
    w = Window.partitionBy(*group_cols)
    m = F.col("hour_mean")
    # quantize the DOUBLE products (identical IEEE ops in any engine),
    # never decimal*decimal — Spark's decimal-multiply result type would
    # overflow precision 38 and re-round engine-privately
    mu = F.sum(m.cast(dec)).over(w).cast("double") / F.count(F.lit(1)).over(w)
    ex2 = F.sum((m * m).cast(dec)).over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w)
    std = F.sqrt(ex2 - mu * mu)
    return grain.select(
        *group_cols,
        "hour",
        "n_values",
        "hour_mean",
        F.round(
            F.when(std > 0, (F.col("hour_mean") - mu) / std), 6
        ).alias("z_score"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outlier screen by modified z-score (Iglewicz & Hoaglin
    1993): ``rz = 0.6745 · (v − median) / MAD`` per group, keeping rows
    with ``|rz| > threshold`` (3.5 is the standard cut) — the
    median/MAD pair survives the very outliers that inflate a classical
    sigma, so it flags what z-scores mask in heavy-tailed telemetry.

    Plan shape: two tiny grouped aggregates (median, then MAD — the
    second conditions on the first) broadcast back to the fact; the
    fact is scanned but never shuffled (the ``q_event_value_outliers``
    posture).  Exact medians sort per group inside the aggregate
    buffer; for groups past executor memory, switch to the maintained
    HDR-quantile state (``pipeline/aggview.py hdr_cols``) — this is the
    exact direct-pass form.  Determinism: both engines interpolate the
    continuous median identically on doubles; the filter compares the
    ROUNDED score so boundary rows land the same side everywhere.
    """
    v = F.col(value_col)
    # medians quantize at 6dp BEFORE use: even-count interpolation
    # associates differently across engines (a+(b-a)*0.5 vs (a+b)/2 —
    # a 1-ulp drift that surfaced in the 4th decimal of rz at the sf1
    # tier), and the round absorbs it
    med = df.filter(v.isNotNull()).groupBy(*group_cols).agg(
        F.round(F.median(v), 6).alias("_med")
    )
    j = df.filter(v.isNotNull()).join(F.broadcast(med), group_cols)
    mad = j.groupBy(*group_cols).agg(
        F.round(F.median(F.abs(v - F.col("_med"))), 6).alias("_mad")
    )
    scored = j.join(F.broadcast(mad), group_cols)
    # The flag predicate runs on the RAW double chain — both engines
    # compute the identical IEEE sequence, so the flagged row set is
    # engine-exact.  The REPORTED columns are the exact components
    # (value, med, mad) rather than a rounded ratio: quantizing
    # 0.6745·(v−med)/mad at 4dp is not engine-portable when the raw
    # double sits within half an ulp of a .00005 boundary (observed at
    # sf1: Spark 3.8522 vs DuckDB 3.8523 for the same row) — rz is one
    # exact division away for any consumer.  MAD-0 (flat) groups flag
    # nothing by convention; the CASE also dodges ANSI divide-by-zero.
    rz_raw = F.when(
        F.col("_mad") > 0,
        F.lit(0.6745) * (v - F.col("_med")) / F.col("_mad"),
    )
    return scored.filter(F.abs(rz_raw) > F.lit(float(threshold))).select(
        *[c for c in scored.columns if c not in ("_med", "_mad")],
        F.col("_med").alias("med"),
        F.col("_mad").alias("mad"),
    )


def fd_audit(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Approximate functional-dependency audit: for each candidate
    ``det → dep`` pair, does ``det`` determine ``dep`` — and when it
    doesn't, HOW broken is the dependency?  One report row per pair:

    - ``n_groups`` — distinct determinant values,
    - ``n_violating`` — determinant values mapping to >1 dependent,
    - ``g3_error`` — Kivinen & Mannila's g₃ measure: the minimum
      fraction of rows to delete for the FD to hold exactly
      (``(N − Σ_groups max dependent count) / N``), the standard
      profiling-literature score (TANE/FDep family),
    - ``holds`` — exact-FD verdict.

    Shape per pair: one (det, dep) count aggregate + one det-level
    rollup — two bounded shuffles, map-side partial aggregation, no
    joins; pairs audit independently so the whole candidate list is one
    union of narrow subplans.  NULLs: rows with a NULL determinant or
    dependent are excluded (SQL grouping would conflate NULL≡NULL;
    dependency semantics over NULLs are declared out of scope, the
    profiling-literature default).

    Reference analog: none (the reference's monitor is fixed COUNT/MAX
    probes); schema-discovery capability next to :func:`profile_table`.
    """
    if not pairs:
        raise ValueError("fd_audit needs at least one (det, dep) pair")
    outs = []
    for det, dep in pairs:
        pair_counts = (
            df.filter(F.col(det).isNotNull() & F.col(dep).isNotNull())
            .groupBy(
                F.col(det).cast("string").alias("_det"),
                F.col(dep).cast("string").alias("_dep"),
            )
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        per_det = pair_counts.groupBy("_det").agg(
            F.sum("_n").alias("_rows"),
            F.max("_n").alias("_keep"),
            F.count(F.lit(1)).alias("_ndep"),
        )
        outs.append(
            per_det.agg(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum(F.when(F.col("_ndep") > 1, 1).otherwise(0)).alias(
                    "n_violating"
                ),
                (
                    F.round(
                        (F.sum("_rows") - F.sum("_keep")).cast("double")
                        / F.sum("_rows"),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("g3_error"),
                (F.max("_ndep") <= 1).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def referential_audit(
    tables: dict[str, DataFrame],
    edges: list[tuple[str, str, str, str]],
) -> DataFrame:
    """Referential-integrity audit over declared FK edges
    ``(child_table, child_col, parent_table, parent_col)``: one report
    row per edge with the child row count, rows whose FK is NULL, rows
    whose non-NULL FK has no parent (orphans), and the distinct orphan
    key count — the audit every warehouse load wants after an ingest,
    generalized from per-edge hand probes to a declared schema graph.

    Shape per edge: one left-anti join of the child's distinct non-NULL
    key set against the parent key set (both key-projected — the anti
    join never carries payload columns), then one broadcast-friendly
    semi join back to count orphan ROWS.  Distinct key sets are usually
    orders of magnitude smaller than the child, so the anti join is the
    cheap side at any scale.
    """
    if not edges:
        raise ValueError("referential_audit needs at least one FK edge")
    # one stats aggregate per DISTINCT child table, covering every FK
    # column audited on it — a fact table with several FK edges
    # (lineitem: orders/part/supplier) scans once for its row/null
    # stats, not once per edge
    stats_by_child: dict[str, "DataFrame"] = {}
    for child_t in {e[0] for e in edges}:
        cols = [e[1] for e in edges if e[0] == child_t]
        aggs = [F.count(F.lit(1)).alias("_rows")]
        for c in cols:
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                    f"_nulls_{c}"
                )
            )
        stats_by_child[child_t] = tables[child_t].agg(*aggs)
    outs = []
    for child_t, child_c, parent_t, parent_c in edges:
        child, parent = tables[child_t], tables[parent_t]
        ck = F.col(child_c)
        orphan_keys = (
            child.filter(ck.isNotNull())
            .select(ck.alias("_k"))
            .distinct()
            .join(
                parent.select(F.col(parent_c).alias("_k")).distinct(),
                "_k",
                "left_anti",
            )
        )
        stats = stats_by_child[child_t].select(
            F.col("_rows"), F.col(f"_nulls_{child_c}").alias("_nulls")
        )
        orphan_rows = (
            child.select(ck.alias("_k"))
            .join(orphan_keys, "_k", "left_semi")
            .agg(F.count(F.lit(1)).alias("_orows"))
        )
        okeys = orphan_keys.agg(F.count(F.lit(1)).alias("_okeys"))
        outs.append(
            stats.crossJoin(F.broadcast(orphan_rows))
            .crossJoin(F.broadcast(okeys))
            .select(
                F.lit(f"{child_t}.{child_c}").alias("fk"),
                F.lit(f"{parent_t}.{parent_c}").alias("references"),
                F.col("_rows").alias("child_rows"),
                F.col("_nulls").alias("null_fk_rows"),
                F.col("_orows").alias("orphan_rows"),
                F.col("_okeys").alias("orphan_keys"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
