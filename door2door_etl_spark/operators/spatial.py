"""Spatial operators: grid-bucketed radius joins + geodesic distance.

The reference's whole domain is vehicle GPS telemetry (``data.location``
lat/lng in every vehicle event — reference ``src/etl/handler.py`` routes
them into ``vehicle_location``), yet it ships no spatial query at all.
This module adds the two primitives a mobility warehouse actually needs:

* :func:`radius_self_join` — all point pairs within a radius, WITHOUT
  the all-pairs cross join: each point lands in one grid cell of side
  ``radius``; one side replicates into its 3x3 cell neighborhood; pairs
  join on cell equality and pass an exact distance filter.  Any
  within-radius pair differs by at most one cell per axis, so the
  neighborhood join finds every pair EXACTLY ONCE (the replica of Q in
  P's cell is unique).  This is the banded-LSH shape in 2-D: work is
  O(points + candidate pairs), never O(n^2) — a billion GPS pings
  bucket and join like any other equi-key.  Skewed cells (a depot where
  every vehicle parks) are ordinary hot keys: AQE skew-split or
  :func:`~door2door_etl_spark.operators.relational.salted_equijoin`
  apply unchanged.
* :func:`haversine_km` — great-circle distance as a pure Catalyst
  column expression (no UDF), for geographic (lat, lng) data.

``radius_self_join`` works in PROJECTED/planar coordinates (meters, km,
or any consistent unit) with exact Euclidean arithmetic — IEEE mul/add
compare bit-identically across engines, which is what lets a DuckDB
twin hash-match the pair set.  For geographic coordinates, project
first (or bucket on a lat/lng grid sized for the worst-case latitude
and use :func:`haversine_km` as the residual filter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(
    lat1: Column, lng1: Column, lat2: Column, lng2: Column
) -> Column:
    """Great-circle distance in kilometers (haversine formula), as a
    single whole-stage-codegen'd expression."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2
    dl = F.radians(lng2 - lng1) / 2
    a = (
        F.sin(dp) * F.sin(dp)
        + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def knn_within_radius(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
    k: int,
) -> DataFrame:
    """Each point's ``k`` nearest neighbors among those within
    ``radius``: the grid-bucketed pair set (symmetrized — every pair
    serves both endpoints) topped per point with a rank<=k window —
    planned as WindowGroupLimit, so the per-point top-k partial-
    aggregates before the shuffle.  The bounded-radius form of k-NN is
    the one that scales: unbounded k-NN degenerates to all-pairs for
    isolated points, while here isolated points simply have no
    neighbors (and don't appear).  Ties at equal distance break by
    neighbor id — deterministic cross-engine.  Output: ``(id, neighbor,
    dist, rank)``."""
    from pyspark.sql import Window

    pairs = radius_self_join(df, id_col, x_col, y_col, radius)
    # Symmetrize IN-ROW (explode of a 2-struct array): the union form
    # evaluated the whole pair join once per orientation.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("_pid"),
                    F.col("id_b").alias("neighbor"),
                    F.col("dist").alias("dist"),
                ),
                F.struct(
                    F.col("id_b").alias("_pid"),
                    F.col("id_a").alias("neighbor"),
                    F.col("dist").alias("dist"),
                ),
            )
        ).alias("_e")
    ).select("_e._pid", "_e.neighbor", "_e.dist")
    w = Window.partitionBy("_pid").orderBy(
        F.col("dist").asc(), F.col("neighbor").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_pid").alias(id_col), "neighbor", "dist", "rank")
    )


def radius_self_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All pairs of points within Euclidean ``radius`` (planar
    coordinates), as ``(id_a, id_b, dist)`` with ``id_a < id_b`` —
    grid-cell bucketing + 3x3 neighborhood equi-join + exact residual
    filter (see module doc for the scale argument).  The distance
    filter compares SQUARED distance against ``radius**2`` — pure
    IEEE multiply/add, engine-exact."""
    from door2door_etl_spark.io.readers import widen_if_narrow

    cell = float(radius)
    # Materialized ONCE (width-normalized, lineage-truncated): the point
    # relation — typically hash-derived coordinates, sha-class per-row
    # work — feeds BOTH join sides (base + the 9-cell probe expansion);
    # without the checkpoint the upstream ran twice, single-core on a
    # narrow scan.  Size is one row per point (id + 4 doubles).
    base = widen_if_narrow(df).select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
        F.floor(F.col(x_col) / cell).alias("_cx"),
        F.floor(F.col(y_col) / cell).alias("_cy"),
    ).localCheckpoint(eager=True)
    probe = (
        base.select(
            F.col("_id").alias("_idb"),
            F.col("_x").alias("_xb"),
            F.col("_y").alias("_yb"),
            F.explode(
                F.array(*[F.col("_cx") + d for d in (-1, 0, 1)])
            ).alias("_cx"),
            F.col("_cy").alias("_cyb"),
        )
        .select(
            "_idb", "_xb", "_yb", "_cx",
            F.explode(
                F.array(*[F.col("_cyb") + d for d in (-1, 0, 1)])
            ).alias("_cy"),
        )
    )
    dx = F.col("_x") - F.col("_xb")
    dy = F.col("_y") - F.col("_yb")
    d2 = dx * dx + dy * dy
    return (
        base.join(probe, ["_cx", "_cy"])
        .filter((F.col("_id") < F.col("_idb")) & (d2 <= F.lit(cell * cell)))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
    )
