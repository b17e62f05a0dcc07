"""Iterative clustering: Lloyd's k-means over an embedding column.

This is the trainer for the IVF coarse quantizer (operators/similarity.py
uses a cell id to block ANN search; these centroids are how a deployment
derives that cell id from raw vectors in-engine).

Spark-first shape, same as MLlib's implementation strategy:
- **Assignment** never joins: the k centroids are driver-side literals
  folded into one codegen-able expression per row (k·dim squared-diff
  terms), so each iteration's assignment is a map-only pass over the
  vectors — no shuffle, no Python.
- **Update** is one groupBy per iteration (k·dim partial sums map-side
  combined), collecting k tiny rows to the driver for the next round's
  literals.

Cross-engine determinism (the DuckDB oracle unrolls the same iterations):
- distances sum squared diffs in ascending-dimension order (left fold —
  both engines);
- means avoid float accumulation-order drift by summing
  ``floor(v_d · 1e6)`` as exact BIGINTs, then one double division — the
  same quantize-then-exact-sum trick the money aggregates use;
- argmin ties break to the lowest centroid id.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000.0


def _dist2(vec_col: str, centroid: list[float], dim: int) -> F.Column:
    """Squared L2 distance to a literal centroid, ascending-dim left fold."""
    terms = [
        F.pow(F.element_at(F.col(vec_col), d + 1).cast("double") - F.lit(centroid[d]), 2)
        for d in range(dim)
    ]
    return reduce(lambda a, b: a + b, terms)


def _assign(df: DataFrame, vec_col: str, centroids: list[list[float]], dim: int) -> DataFrame:
    dists = F.array(*[_dist2(vec_col, c, dim) for c in centroids])
    # array_position returns the FIRST index with the min → ties break to
    # the lowest centroid id (mirrored by row_number ORDER BY dist, cid).
    return df.withColumn("cluster", F.array_position(dists, F.array_min(dists)).cast("int"))


def kmeans_fit_predict(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    dim: int = 64,
    iterations: int = 2,
) -> tuple[DataFrame, list[list[float]]]:
    """Run ``iterations`` Lloyd rounds from a deterministic init (the vectors
    with the ``k`` smallest ids, in id order) and return
    ``(df + cluster column, final centroids)``.  Clusters are 1-based.

    Raises if any cluster empties mid-run (the oracle unrolls the same
    recurrence and has no empty-cluster rule; with a deterministic init on
    real corpora this does not occur — pick a larger sample if it does).
    """
    init_rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]

    for _ in range(iterations):
        assigned = _assign(df, vec_col, centroids, dim)
        sums = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.floor(
                        F.element_at(F.col(vec_col), d + 1).cast("double") * F.lit(SCALE)
                    ).cast("long")
                ).alias(f"s{d}")
                for d in range(dim)
            ],
        )
        rows = {r["cluster"]: r for r in sums.collect()}
        if len(rows) < k:
            raise ValueError(f"empty cluster among 1..{k}: got {sorted(rows)}")
        centroids = [
            [
                (float(rows[cid][f"s{d}"]) / rows[cid]["n"]) / SCALE
                for d in range(dim)
            ]
            for cid in range(1, k + 1)
        ]

    return _assign(df, vec_col, centroids, dim), centroids
