"""Deterministic sketches and hash-based sampling (north-star extensions).

Training-data pipelines at 100 TB need cardinality estimates, reproducible
sampling, and stratified splits that are *stable across engines and reruns*.
Spark's built-ins (``approx_count_distinct``, ``df.sample``) use
engine-private hashing/RNG, so their outputs can't be oracle-checked and
aren't reproducible across systems.  Everything here is built on one
portable contract instead:

    u(x) = int(substr(sha256(x), 1, 13), 16) / 16^13      ∈ [0, 1)

13 hex digits = 52 bits, so the integer is exact in an IEEE double and the
division by 2^52 is exact — the uniform deviate is bit-identical in Spark,
DuckDB, or any engine with sha256.  All operators below are pure column
expressions (JVM-side, codegen-able, no Python).

Scale: every operator is embarrassingly parallel (per-row hash) except the
KMV estimator, whose shuffle is a global top-k over ~k surviving rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_HEX_DIGITS = 13  # 52 bits: exact in a double
HASH_SPACE = float(16**HASH_HEX_DIGITS)  # 2^52


def uniform_hash(col: Column, salt: str = "") -> Column:
    """The portable uniform deviate u(x) in [0, 1).  ``salt`` derives
    independent hash families (KMV vs sampling vs splits must not reuse
    one family)."""
    h = F.sha2(F.concat(col.cast("string"), F.lit(salt)), 256)
    return (
        F.conv(F.substring(h, 1, HASH_HEX_DIGITS), 16, 10).cast("double")
        / F.lit(HASH_SPACE)
    )


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """K-minimum-values distinct-count sketch: keep the k smallest hash
    deviates of the distinct values; estimate |D| ≈ (k-1) / u_(k).

    Returns one row: ``(est_distinct double, k int, kth_hash double)``.
    Unlike HyperLogLog the estimate is a pure function of the data (no
    engine-private registers), so it hash-matches across engines.  The plan
    is scan → per-partition partial top-k (Spark's TakeOrderedAndProject) →
    driver merge of k values per partition — no full shuffle of the data.
    """
    hashed = df.select(uniform_hash(F.col(col), "kmv").alias("u")).dropDuplicates(["u"])
    topk = hashed.orderBy("u").limit(k)
    # Below-k regime: the sketch holds the ENTIRE distinct set, so the
    # count is exact — the estimator is noise there (same contract as
    # kmv_distinct_by_group and profile_table).
    n_sketch = F.count(F.lit(1))
    return topk.agg(
        F.when(
            n_sketch >= k, F.round((F.lit(float(k - 1)) / F.max("u")), 4)
        )
        .otherwise(n_sketch.cast("double"))
        .alias("est_distinct"),
        F.lit(k).alias("k"),
        F.round(F.max("u"), 12).alias("kth_hash"),
    )


def kmv_distinct_by_group(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count sketch: ``(group, est_distinct)``.

    Groups holding fewer than ``k`` distinct values report the exact count
    (the sketch IS the full distinct set there); larger groups estimate
    ``(k-1) / u_(k)``.  The per-group k-smallest is a rank-filtered window,
    which Spark executes as WindowGroupLimit — each group's sketch state is
    bounded at k rows on every partial, so a group with a billion distinct
    values costs the same memory as one with a hundred.  Deterministic
    across engines: the deviates are the portable 52-bit sha256 hash and
    ties cannot occur (duplicate deviates collapse before ranking)."""
    from pyspark.sql import Window

    hashed = df.select(
        group_col, uniform_hash(F.col(col), "kmv").alias("u")
    ).dropDuplicates([group_col, "u"])
    w = Window.partitionBy(group_col).orderBy("u")
    topk = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    n = F.count(F.lit(1))
    return topk.groupBy(group_col).agg(
        F.when(n >= k, F.round(F.lit(float(k - 1)) / F.max("u"), 4))
        .otherwise(n.cast("double"))
        .alias("est_distinct")
    )


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: str = "sample") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with u(key) < rate.
    Reproducible across engines, reruns, and repartitions — the property
    ``df.sample`` cannot give.  Sampling by a *key* (not row identity) also
    keeps all rows of one key together (coherent-group sampling)."""
    return df.filter(uniform_hash(F.col(key_col), salt) < F.lit(rate))


def stratified_split(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, float]],
    salt: str = "split",
) -> DataFrame:
    """Assign a reproducible train/val/test-style label per key.

    ``splits`` is ``[(name, weight), ...]`` with weights summing to 1; the
    label is chosen by where u(key) lands among the cumulative weights.
    Pure column expression — the assignment is stable no matter how the
    data is partitioned, ingested, or re-ordered (the property every
    training-data pipeline needs to avoid test-set leakage between runs).
    Adds column ``split``.
    """
    u = uniform_hash(F.col(key_col), salt)
    expr = None
    cum = 0.0
    for name, weight in splits[:-1]:
        cum += weight
        expr = (
            F.when(u < F.lit(cum), F.lit(name))
            if expr is None
            else expr.when(u < F.lit(cum), F.lit(name))
        )
    last_name = splits[-1][0]
    expr = F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))
    return df.withColumn("split", expr)


def quota_mix_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    target_shares: dict[str, float],
    salt: str = "quota",
) -> DataFrame:
    """Domain-mixing sampler: deterministically downsample each group so the
    output mix matches ``target_shares`` at the maximum feasible size.

    With n_g the group sizes and p_g the target shares, the largest total T
    every group can fill without upsampling is ``T = min_g(n_g / p_g)``;
    group g then keeps ``p_g·T`` rows via the portable threshold
    ``u(key) < p_g·T / n_g``.  Groups not named in ``target_shares`` are
    dropped (share 0).

    Scale design: group counts are one tiny aggregate broadcast back onto
    the corpus; the corpus itself passes through a single map-side filter —
    no shuffle of the data, and the sample is reproducible across engines,
    reruns, and repartitionings.
    """
    share_map = F.create_map(
        *[F.lit(x) for kv in sorted(target_shares.items()) for x in kv]
    )
    counts = (
        df.filter(F.col(group_col).isin(*target_shares.keys()))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .withColumn("_p", share_map[F.col(group_col)])
        .withColumn("_ratio", F.col("_n") / F.col("_p"))
    )
    t = counts.agg(F.min("_ratio").alias("_t"))
    rates = (
        counts.crossJoin(F.broadcast(t))
        .withColumn(
            "_rate", F.least(F.lit(1.0), F.col("_p") * F.col("_t") / F.col("_n"))
        )
        .select(group_col, "_rate")
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(uniform_hash(F.col(key_col), salt) < F.col("_rate"))
        .drop("_rate")
    )


def kmv_sketch_table(
    df: DataFrame, group_cols: list[str], col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV sketch as a STORABLE column: ``(group_cols…,
    sketch: array<double>)`` holding the group's k smallest distinct
    deviates, sorted ascending.

    This is the mergeable form of :func:`kmv_distinct_by_group`: persist
    sketches at a fine grain (e.g. per event_type × day) and any coarser
    distinct-count rolls up from the sketches alone
    (:func:`kmv_merge_estimate`) — no rescan of the base data.  KMV merge
    is EXACT: every deviate among the union's k smallest is necessarily
    among its own part's k smallest, so merged estimates equal what a
    direct pass over the raw data would produce, deviate for deviate.
    State per group is bounded at k doubles (WindowGroupLimit on every
    partial), independent of group cardinality.
    """
    from pyspark.sql import Window

    hashed = df.select(
        *group_cols, uniform_hash(F.col(col), "kmv").alias("u")
    ).dropDuplicates([*group_cols, "u"])
    w = Window.partitionBy(*group_cols).orderBy("u")
    topk = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("u")).alias("sketch")
    )


def kmv_merge_estimate(
    sketches: DataFrame, rollup_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge fine-grained KMV sketches up to ``rollup_cols`` and estimate
    distinct counts — identical semantics (and identical VALUES, see
    :func:`kmv_sketch_table`) to running :func:`kmv_distinct_by_group`
    directly on the base data at the coarser grain: exact below k,
    ``(k-1)/u_(k)`` above.  The shuffle carries exploded sketch entries —
    at most k doubles per input group — never base-data rows.
    """
    from pyspark.sql import Window

    ex = sketches.select(
        *rollup_cols, F.explode("sketch").alias("u")
    ).dropDuplicates([*rollup_cols, "u"])
    w = Window.partitionBy(*rollup_cols).orderBy("u")
    topk = ex.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    n = F.count(F.lit(1))
    return topk.groupBy(*rollup_cols).agg(
        F.when(n >= k, F.round(F.lit(float(k - 1)) / F.max("u"), 4))
        .otherwise(n.cast("double"))
        .alias("est_distinct")
    )


def _h52(col: Column, salt: str = "") -> Column:
    """The portable 52-bit integer hash behind :func:`uniform_hash` —
    exposed raw for sketches that need integer bit-arithmetic (HLL bucket
    split, CMS column index) rather than a [0,1) deviate."""
    h = F.sha2(F.concat(col.cast("string"), F.lit(salt)), 256)
    return F.conv(F.substring(h, 1, HASH_HEX_DIGITS), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog with PORTABLE integer registers.
#
# Spark's approx_count_distinct is a HyperLogLog++ whose registers are
# engine-private (xxhash64-based, non-reproducible in any other system), so
# its sketches can neither be oracle-checked nor exchanged with other
# engines.  This variant derives everything from the repo-wide portable
# 52-bit sha256 hash: bucket = top p bits, rank = leading-zero count of the
# remaining (52-p) bits + 1.  Registers are small exact integers — a
# register TABLE hash-matches across engines bit for bit, and merging
# sketches (MAX per bucket) is exact, so rolled-up estimates equal
# direct-pass estimates register for register.
#
# Scale: the sketch state per group is <= 2^p rows of two small ints; the
# shuffle carries (group, bucket) partial maxes, never base rows.  Reference
# analog: the watermark/monitoring aggregates over the warehouse
# (/root/reference/src/helper/postgres.py:88-129) are exact COUNTs; this is
# the bounded-state form those monitors need at 100 TB.
# ---------------------------------------------------------------------------

HLL_HASH_BITS = 52


def hll_register_table(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HLL registers: ``(group_cols…, bucket int, register int)``.

    Only non-empty buckets appear (register >= 1); an absent bucket means
    register 0.  ``p`` picks m = 2^p buckets (standard error 1.04/sqrt(m)).
    Pure column expressions — one sha256 per row, one bounded-key shuffle.
    """
    wbits = HLL_HASH_BITS - p
    h = _h52(F.col(col), salt)
    bucket = F.shiftright(h, wbits).cast("int")
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    # bin() renders without leading zeros, so rank-of-first-1-bit is an
    # exact integer expression: wbits - bit_length(w) + 1 (w=0 -> wbits+1).
    rank = F.when(w > 0, F.lit(wbits + 1) - F.length(F.bin(w))).otherwise(
        F.lit(wbits + 1)
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.cast("int").alias("register"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("register").alias("register"))
    )


def hll_merge(sketches: DataFrame, rollup_cols: list[str]) -> DataFrame:
    """Merge fine-grained register tables up to ``rollup_cols`` — MAX per
    bucket, the lossless HLL union.  Output schema matches
    :func:`hll_register_table` at the coarser grain exactly."""
    return sketches.groupBy(*rollup_cols, "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Estimate distinct counts from a register table:
    ``(group_cols…, buckets_used int, est_distinct double)``.

    Flajolet et al.'s raw estimator alpha_m * m^2 / sum_j 2^(-M_j) with the
    small-range linear-counting correction.  The harmonic sum is computed
    as an EXACT integer (sum of 2^(rmax - M_j), empty buckets at 2^rmax),
    so the only float ops are one multiply/divide on identical literals —
    deterministic across engines.
    """
    m = 1 << p
    rmax = HLL_HASH_BITS - p + 1  # deepest possible register
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    # numerator = alpha * m^2 * 2^rmax, spelled with exact integer literals
    numer = F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(1 << rmax))
    n_used = F.count(F.lit(1))
    s_present = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - register)"))
    s_total = s_present + (F.lit(m) - n_used) * F.lit(1 << rmax)
    raw = numer / s_total.cast("double")
    zeros = (F.lit(m) - n_used).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros), 4),
    ).otherwise(F.round(raw, 4))
    return registers.groupBy(*group_cols).agg(
        n_used.cast("int").alias("buckets_used"), est.alias("est_distinct")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode–Muthukrishnan) with portable integer registers.
#
# The frequency twin of the HLL above: register(r, c) = total count of items
# whose r-th hash lands in column c.  Registers are exact integers, merge by
# SUM (lossless), and a point estimate min_r register(r, h_r(x)) upper-bounds
# the true count with error <= N·e/width at confidence 1-e^-depth.  At
# 100 TB the sketch is the only way to answer "how often does this token /
# URL / n-gram appear" without keeping a billion-row exact table hot.
# ---------------------------------------------------------------------------


def cms_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    depth: int = 3,
    width: int = 64,
    salt: str = "cms",
) -> DataFrame:
    """Per-group CMS registers: ``(group_cols…, row int, col int, cnt bigint)``.

    One scan: each item row explodes into ``depth`` (row, col) cells, then
    one bounded-key shuffle (|keys| <= groups x depth x width) with full
    map-side partial aggregation.  Only non-zero cells appear.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                (_h52(F.col(item_col), f"{salt}{r}") % F.lit(width))
                .cast("int")
                .alias("col"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(*group_cols, F.explode(cells).alias("_rc"))
        .select(*group_cols, F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"))
        .groupBy(*group_cols, "row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: DataFrame, rollup_cols: list[str]) -> DataFrame:
    """Merge fine-grained CMS tables up to ``rollup_cols`` — SUM per cell,
    the lossless CMS union."""
    return sketches.groupBy(*rollup_cols, "row", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_point_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 64,
    salt: str = "cms",
) -> DataFrame:
    """Estimate each item's frequency from a (grouping-free) CMS register
    table: ``items`` columns + ``est_cnt bigint`` = min over the depth rows
    of the addressed registers (absent register = 0).

    The sketch is bounded at depth x width cells BY CONSTRUCTION, so it is
    collected once (an O(1)-state driver fetch, like the k-means centroid
    pull) and folded into literal ``map()`` expressions — the probe is then
    pure map-side column arithmetic: zero joins, zero extra scans of either
    side.  The earlier join formulation re-ran the full sketch aggregation
    once per hash row (depth x the corpus scan); literals also follow the
    PQ lesson — built as ONE parsed expression string per row, not
    hundreds of py4j Column objects."""
    cells = {(r["row"], r["col"]): r["cnt"] for r in sketch.collect()}
    ests = []
    for r in range(depth):
        map_sql = "map(" + ",".join(
            f"{c},{cells.get((r, c), 0)}L" for c in range(width)
        ) + ")"
        col_idx = (_h52(F.col(item_col), f"{salt}{r}") % F.lit(width)).cast("int")
        ests.append(
            F.coalesce(F.element_at(F.expr(map_sql), col_idx), F.lit(0).cast("long"))
        )
    return items.withColumn("est_cnt", F.least(*ests).cast("bigint"))


def quantile_thresholds(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: list[float] = (0.5, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles of ``value_col`` — the threshold-selection step
    of quality filtering (pick the p99 of a quality score per language,
    filter against it).

    ``exact=True`` uses ``percentile`` (exact linear interpolation, engine-
    portable — the DuckDB ``quantile_cont`` twin hash-matches), which sorts
    every group's values: fine up to memory-per-group, and the oracle
    path.  ``exact=False`` is the 100 TB path: ``approx_percentile``'s
    mergeable sketch aggregates map-side and shuffles only sketch state —
    bounded error (1/accuracy), unbounded scale.  Output columns are
    ``q_50``, ``q_90``, … (percent-scaled names so both variants share a
    schema)."""
    fn = (
        (lambda q: F.percentile(F.col(value_col), F.lit(q)))
        if exact
        else (lambda q: F.approx_percentile(F.col(value_col), F.lit(q), F.lit(accuracy)))
    )
    aggs = [
        F.round(fn(q).cast("double"), 6).alias(f"q_{int(round(q * 100))}")
        for q in quantiles
    ]
    return df.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# Bloom filter with portable integer bit registers.
#
# The membership twin of the HLL/CMS families above: the filter is stored
# as the SET of set bit positions — <= m small-int rows per group,
# mergeable by union-distinct (lossless, same as ORing bitmaps), and
# engine-portable since the bit positions derive from the repo's 52-bit
# sha256 hash.  Spark's own BloomFilter (df.stat.bloomFilter) is an opaque
# binary blob with engine-private hashing — unusable for cross-engine
# checks or as a TABLE other systems can probe.  At 100 TB the filter
# answers "might this URL / doc-hash / key exist" with a bounded-size
# broadcast instead of a join against the corpus.
# ---------------------------------------------------------------------------


def bloom_bit_table(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    m: int = 256,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Per-group Bloom bit table: ``(group_cols…, bit int)`` — the distinct
    bit positions set by hashing each value ``k`` ways into ``[0, m)``.
    One scan, one bounded-key shuffle (|keys| <= groups x m) with map-side
    partial dedup."""
    bits = F.array(
        *[
            (_h52(F.col(col), f"{salt}{j}") % F.lit(m)).cast("int")
            for j in range(k)
        ]
    )
    return (
        df.select(*group_cols, F.explode(bits).alias("bit"))
        .dropDuplicates([*group_cols, "bit"])
    )


def bloom_merge(blooms: DataFrame, rollup_cols: list[str]) -> DataFrame:
    """Merge fine-grained bit tables up to ``rollup_cols`` — union-distinct
    per bit, the lossless Bloom OR."""
    return blooms.select(*rollup_cols, "bit").dropDuplicates(
        [*rollup_cols, "bit"]
    )


def bloom_probe(
    bloom: DataFrame,
    items: DataFrame,
    col: str,
    m: int = 256,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Probe a (grouping-free) Bloom bit table: ``items`` columns +
    ``maybe_present`` (true = possibly in the set, false = DEFINITELY not
    — the Bloom guarantee of zero false negatives).

    The bit set is bounded at ``m`` rows by construction, so it is
    collected once and folded into a literal array — the probe is pure
    map-side column arithmetic (k ``array_contains`` tests), no join, no
    extra scan of either side.  The literal is ONE parsed expression
    string (the repo's driver-cost discipline — m=256 individual
    ``F.lit`` objects would re-introduce the py4j build cost this family
    documents avoiding)."""
    bits = sorted(int(r["bit"]) for r in bloom.select("bit").collect())
    lit_bits = (
        F.expr("array(" + ",".join(map(str, bits)) + ")")
        if bits
        else F.expr("CAST(array() AS array<int>)")
    )
    present = None
    for j in range(k):
        test = F.array_contains(
            lit_bits, (_h52(F.col(col), f"{salt}{j}") % F.lit(m)).cast("int")
        )
        present = test if present is None else (present & test)
    return items.withColumn("maybe_present", present)


def group_reservoir_sample(
    df: DataFrame, group_cols: list[str], key_col: str, n: int, salt: str = "reservoir"
) -> DataFrame:
    """Deterministic uniform ``n``-sample WITHOUT replacement per group:
    keep each group's ``n`` smallest portable hash deviates — the
    bottom-k formulation of reservoir sampling (same deviate trick as
    Efraimidis–Spirakis with unit weights), reproducible across engines,
    reruns, and repartitionings.  Executes as WindowGroupLimit: every
    partial bounds its per-group state at ``n`` rows, so a group with a
    billion rows costs the same memory as one with ten.  Adds column
    ``sample_rank`` (1-based, by deviate).

    ``key_col`` is the secondary sort, so two DISTINCT keys whose hash
    deviates collide still rank deterministically.  ``key_col`` values
    must be unique within a group (same contract as
    ``contiguous_token_chunks``): duplicate keys are indistinguishable
    to the (deviate, key) ordering, so their relative rank — and hence
    the sampled set at the boundary — would be partition-order luck."""
    from pyspark.sql import Window

    u = uniform_hash(F.col(key_col), salt)
    w = Window.partitionBy(*group_cols).orderBy(u.alias("_u"), F.col(key_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


def temperature_mix_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-flattened domain mixing (the multilingual-LM sampling
    recipe: sample domains proportional to n^alpha instead of n, so
    high-resource domains stop drowning the tail).

    With target shares p_g ∝ n_g^alpha and the max feasible no-upsampling
    total T = min_g(n_g / p_g), the per-group keep rate collapses to the
    closed form  rate_g = (n_min / n_g)^(1 - alpha)  — alpha=1 keeps the
    natural mix (rate 1 everywhere), alpha=0 equalizes every group down
    to the smallest.  Deterministic via the portable hash threshold.

    Scale: group counts are one tiny aggregate broadcast back onto the
    corpus; the corpus passes through a single map-side filter — no data
    shuffle (same shape as :func:`quota_mix_sample`, without needing the
    shares up front).

    A NULL ``group_col`` forms its own domain (null-safe rate join —
    same posture as the merge path's null-partition handling); NULL
    rows are sampled at their group's rate, never silently dropped."""
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    # pow() is not correctly rounded and differs in the last ulp across
    # engines; round the rate BEFORE the threshold compare so the keep
    # decision is bit-stable (same discipline as gopher_quality_flags).
    rates = (
        counts.crossJoin(F.broadcast(nmin))
        .withColumn(
            "_rate",
            F.round(
                F.pow(F.col("_nmin") / F.col("_n"), F.lit(1.0 - alpha)), 9
            ),
        )
        .select(F.col(group_col).alias("_mix_grp"), "_rate")
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(group_col).eqNullSafe(F.col("_mix_grp")),
        )
        .filter(uniform_hash(F.col(key_col), salt) < F.col("_rate"))
        .drop("_mix_grp", "_rate")
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    seed: int = 0,
    salt: str = "negsample",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive training:
    for every anchor row, ``k`` pseudo-random OTHER rows drawn by portable
    hash — reproducible across engines/reruns/partitionings, unlike any
    rand()-based pairing.

    Mechanics: rows get stable 1-based positions from the seeded epoch
    shuffle (two-phase distributed scan — no one-task window), each
    (anchor, j) addresses position ``1 + h52(anchor|j|salt) % N``, and one
    position-keyed join resolves ids.  Anchor==negative collisions are
    dropped (probability k/N), so output has AT MOST k rows per anchor —
    document, don't silently resample.  Scale: the join is uniformly
    keyed by construction; everything else is map-side.

    NULL anchor ids are rejected (same posture as the MERGE key check:
    concat_ws silently drops NULLs, which would silently desynchronize
    the Spark and oracle hash inputs).

    Returns ``(id_col, neg_rank int, negative_id)``.
    """
    from door2door_etl_spark.operators.packing import epoch_shuffle

    if df.filter(F.col(id_col).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"negative_samples: NULL values in {id_col!r}; a NULL anchor "
            "cannot be hashed portably and would silently vanish"
        )
    # Count and anchors come from the raw input — only position RESOLUTION
    # needs the shuffle lineage.  The two-phase scan always persists its
    # narrow (id, key) frame (a correctness requirement of its offsets
    # pass — see contiguous_token_chunks); release via
    # spark.catalog.clearCache().
    n = df.count()
    pos = epoch_shuffle(
        df.select(id_col), seed=seed, id_col=id_col, persist_input=False
    )
    targets = df.select(
        id_col,
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("neg_rank"),
                        (
                            _h52(
                                F.concat_ws(
                                    "|", F.col(id_col).cast("string"), F.lit(str(j))
                                ),
                                salt,
                            )
                            % F.lit(n)
                            + 1
                        ).alias("target_pos"),
                    )
                    for j in range(k)
                ]
            )
        ),
    )
    resolved = targets.join(
        pos.select(
            F.col(id_col).alias("negative_id"),
            F.col("shuffle_pos").alias("target_pos"),
        ),
        "target_pos",
    )
    return (
        resolved.filter(F.col(id_col) != F.col("negative_id"))
        .select(id_col, "neg_rank", "negative_id")
    )


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    budget_tokens: int,
    text_col: str = "text",
    salt: str = "tbudget",
) -> DataFrame:
    """Deterministic per-group TOKEN-BUDGET sampling: walk each group's
    rows in portable-hash order (deviate, then key — reproducible across
    engines, reruns, and partitionings) and keep rows while the group's
    running token total stays within ``budget_tokens`` — the
    budgeted-mixture primitive ("give me ~N tokens per domain") that
    rate-based sampling (:func:`quota_mix_sample` /
    :func:`temperature_mix_sample`) only hits in expectation.

    Adds ``cum_tokens`` (running total INCLUDING the row).  Token counts
    are non-negative, so the running total is monotone and the kept set
    is exactly the maximal prefix under budget; groups under budget keep
    everything.  ``key_col`` must be unique within a group (same
    contract as :func:`group_reservoir_sample`).

    Scale: one window per group — parallel across groups, a group's cost
    is its own sort (the sessionize bound).  At extreme per-group
    cardinality the refinement is a two-phase cut: hash-threshold
    pre-filter at rate ≈ budget/total_tokens with a safety margin (the
    pre-filter keeps exactly the low-deviate rows the prefix examines),
    then this exact window over the ~budget-sized survivor set.
    """
    from pyspark.sql import Window

    from door2door_etl_spark.operators.text import token_count

    u = uniform_hash(F.col(key_col), salt)
    w = (
        Window.partitionBy(group_col)
        .orderBy(u, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_count(F.col(text_col))).over(w)
    return df.withColumn("cum_tokens", cum.cast("bigint")).filter(
        F.col("cum_tokens") <= budget_tokens
    )


# ---------------------------------------------------------------------------
# HDR-style log₂ histogram with PORTABLE integer bins.
#
# The quantile member of the portable-sketch family (HLL / CMS / Bloom /
# KMV above): per-group bin-count tables that are LOSSLESSLY mergeable by
# summing counts (rollup-able across shards/days/sources — the property
# approx_percentile's opaque binary sketch cannot give), with bounded
# RELATIVE error 2^-sub_bits.  Binning is pure integer arithmetic — the
# most-significant-bit position comes from the length of the minimal
# binary rendering (Spark ``F.bin``, DuckDB ``bin``), never floating
# log(), so Spark and any SQL oracle bin bit-identically.
# ---------------------------------------------------------------------------


def hdr_bin_expr(col: Column, sub_bits: int = 4) -> Column:
    """The HDR bucket index of a non-negative integer value, exactly:

    - values < 2^sub_bits sit in their own exact bin (index = value);
    - larger values split each power-of-two range into 2^sub_bits
      sub-buckets: with m = bit-length(v) and level L = m - 1 - sub_bits,
      the index is ``L * 2^sub_bits + (v >> L)`` (the shifted value lands
      in [2^sub_bits, 2^(sub_bits+1)), so consecutive levels tile the
      index space contiguously and the map stays monotone).

    Monotone in v, so histogram order == value order; negative values
    clamp to bin 0 (callers wanting signed support store sign separately).
    The sub-bucket shift uses power-of-two double division (exact for
    values < 2^52 — every count/length/latency this engine bins); a SQL
    twin can use integer ``>>`` directly.
    """
    s = sub_bits
    sub = 1 << s
    v = F.greatest(col.cast("long"), F.lit(0))
    m = F.length(F.bin(v))  # bit-length; integer-exact in any engine
    lvl = (m - 1 - F.lit(s)).cast("long")
    big = lvl * F.lit(sub) + F.floor(
        v / F.pow(F.lit(2.0), lvl.cast("double"))
    ).cast("long")
    return F.when(v < F.lit(sub), v).otherwise(big)


def hdr_bin_lower_expr(bin_col: Column, sub_bits: int = 4) -> Column:
    """Inverse of :func:`hdr_bin_expr`: the smallest value in the bin —
    the deterministic integer representative quantile estimates report
    (true quantile lies in [lower, lower * (1 + 2^-sub_bits)))."""
    s = sub_bits
    sub = 1 << s
    lvl = F.floor(bin_col / F.lit(sub)).cast("long") - F.lit(1)
    subidx = (bin_col % F.lit(sub)) + F.lit(sub)
    big = subidx * F.pow(F.lit(2.0), lvl.cast("double")).cast("long")
    return F.when(bin_col < F.lit(sub), bin_col).otherwise(big)


def hdr_histogram_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sub_bits: int = 4,
) -> DataFrame:
    """Per-group HDR bin table ``(group_cols…, bin long, cnt long)`` —
    one scan, one bounded-key shuffle (|keys| <= groups x ~64*2^sub_bits
    for long values) with map-side partial aggregation.  Merge two
    tables by unioning and summing ``cnt`` per (group, bin) — lossless."""
    return (
        df.groupBy(
            *group_cols, hdr_bin_expr(F.col(value_col), sub_bits).alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    quantiles: list[float] = (0.5, 0.9, 0.99),
    sub_bits: int = 4,
) -> DataFrame:
    """Per-group quantile estimates from an HDR bin table: for each q,
    the LOWER BOUND of the first bin whose cumulative count reaches
    ``ceil(q * n)`` (nearest-rank definition on the binned distribution).
    Output columns ``q_50``-style, plus ``n``; estimates carry the
    sketch's relative-error bound 2^-sub_bits.

    Runs as one partitioned window (cumulative sum ordered by bin — bins
    are monotone in value) + one aggregation; never sorts raw values."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("_cum", F.sum("cnt").over(w)).withColumn(
        "_n", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    aggs = [F.max("_n").alias("n")]
    for q in quantiles:
        rank = F.ceil(F.lit(q) * F.col("_n"))
        hit = F.when(
            F.col("_cum") >= rank, F.col("bin")
        )
        aggs.append(
            hdr_bin_lower_expr(F.min(hit), sub_bits)
            .cast("long")
            .alias(f"q_{int(round(q * 100))}")
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def kmv_set_overlap(
    sketches: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Pairwise SET-OPERATION estimates from stored KMV sketches alone —
    the multiset-synopsis algebra of Beyer et al., SIGMOD 2007: for every
    group pair (a < b), estimate Jaccard similarity, union size, and
    intersection size WITHOUT rescanning base data.

    For sketches K_A, K_B (each the k smallest distinct deviates of its
    set): the combined sketch L = k smallest of K_A ∪ K_B is a valid KMV
    sketch of A ∪ B (every deviate among the union's k smallest is among
    its own side's k smallest), so ``union_est = (k-1)/max(L)`` — exact
    when |L| < k.  ρ = |{u ∈ L : u ∈ K_A ∧ u ∈ K_B}| / |L| is an unbiased
    Jaccard estimator (each L entry is a uniform distinct draw from A∪B,
    and a draw lands in both sketches iff it is in A∩B), and
    ``intersection_est = ρ · union_est``.  This is the set algebra HLL
    registers cannot express (HLL only merges to unions).

    Returns ``(group_a, group_b, jaccard_est, union_est,
    intersection_est)`` for all group pairs, ordered ``group_a <
    group_b``.  Scale: the sketch table has one k-double row per group —
    the pairwise self-join broadcasts it; base data is never touched.
    Deterministic across engines: deviates are the portable 52-bit sha
    hash, and every arithmetic step is a single IEEE double op (no
    accumulation-order sensitivity).
    """
    a = sketches.select(
        F.col(group_col).alias("group_a"), F.col("sketch").alias("_ka")
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"), F.col("sketch").alias("_kb")
    )
    comb = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("_ka"), F.col("_kb")))),
        1, k,
    )
    paired = (
        a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
        .withColumn("_l", comb)
        .withColumn("_nl", F.size("_l"))
        .withColumn(
            "_in_both",
            F.size(
                F.array_intersect(
                    F.col("_l"), F.array_intersect(F.col("_ka"), F.col("_kb"))
                )
            ),
        )
        .withColumn(
            "_union_raw",
            F.when(
                F.col("_nl") >= k,
                F.lit(float(k - 1)) / F.element_at("_l", -1),
            ).otherwise(F.col("_nl").cast("double")),
        )
    )
    rho = F.col("_in_both") / F.col("_nl")
    return paired.select(
        "group_a",
        "group_b",
        F.round(rho, 4).alias("jaccard_est"),
        F.round(F.col("_union_raw"), 4).alias("union_est"),
        F.round(rho * F.col("_union_raw"), 4).alias("intersection_est"),
    )
