#!/usr/bin/env python3
"""Generate the sf1 scale-stress dataset (VERDICT r5 ask #8) by
replicating the driver's sf0.1 tables 10x with consistent key offsets.

Why replication, not fresh synthesis: the driver's testdata is the
ground truth for value distributions; shifting every key family by a
per-replica offset preserves join selectivity (each replica is a
self-contained copy of the star schema) while growing every table 10x.
Documents get a per-replica word transform for replicas > 0, so each
replica keeps the ORIGINAL corpus's internal duplicate structure but
shares no shingles across replicas — dedup/LSH workloads scale in rows
without quadratic pair blowups that 10x verbatim copies would cause.
Embeddings perturb one dimension per replica so ANN answers stay
distinct.

Output: $SPARK_GRAFT_SF1_DIR (default /root/repo/bench_data/sf1), one
parquet DIRECTORY per table written with 32-way parallelism — unlike
the single-row-group sf0.1 files, sf1 scans fan out across cores,
which is the point of the stress tier.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REPLICAS = 10
BASES = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "doc": 1_000_000,
    "vec": 1_000_000,
    "event": 100_000_000,
    "user": 10_000_000,
}


def main() -> None:
    from pyspark.sql import functions as F

    from door2door_etl_spark.io.readers import load_table
    from door2door_etl_spark.session import build_session

    src = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
    out = os.environ.get(
        "SPARK_GRAFT_SF1_DIR", str(REPO / "bench_data" / "sf1")
    )
    spark = build_session(app_name="gen-sf1")

    def replicate(df, offsets: dict[str, int], parts: int = 32):
        """10 copies, each key column shifted by replica * base."""
        rep = df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        for col, base in offsets.items():
            rep = rep.withColumn(
                col, (F.col(col) + F.col("_r") * F.lit(base)).cast(
                    dict(df.dtypes)[col]
                )
            )
        return rep, parts

    def write(name, df, parts):
        df.drop("_r").repartition(parts).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: {spark.read.parquet(f'{out}/{name}.parquet').count()} rows")

    li, p = replicate(load_table(spark, src, "lineitem"), {
        "l_orderkey": BASES["orderkey"], "l_partkey": BASES["partkey"],
        "l_suppkey": BASES["suppkey"]})
    write("lineitem", li, p)
    od, p = replicate(load_table(spark, src, "orders"), {
        "o_orderkey": BASES["orderkey"], "o_custkey": BASES["custkey"]})
    write("orders", od, p)
    cu, p = replicate(load_table(spark, src, "customer"),
                      {"c_custkey": BASES["custkey"]}, 8)
    write("customer", cu, p)
    pa, p = replicate(load_table(spark, src, "part"),
                      {"p_partkey": BASES["partkey"]}, 8)
    write("part", pa, p)
    su, p = replicate(load_table(spark, src, "supplier"),
                      {"s_suppkey": BASES["suppkey"]}, 4)
    write("supplier", su, p)
    for small in ("nation", "region"):
        write(small, load_table(spark, src, small).withColumn("_r", F.lit(0)), 1)
    ev, p = replicate(load_table(spark, src, "events"), {
        "event_id": BASES["event"], "user_id": BASES["user"]})
    write("events", ev, p)

    docs = load_table(spark, src, "documents").withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
    )
    new_text = F.when(F.col("_r") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(F.lit("r"), F.col("_r").cast("string"), w),
            ),
            " ",
        )
    )
    docs = (
        docs.withColumn("doc_id", F.col("doc_id") + F.col("_r") * F.lit(BASES["doc"]))
        .withColumn("text", new_text)
        .withColumn("n_chars", F.length("text"))
    )
    write("documents", docs, 16)

    emb = load_table(spark, src, "embeddings").withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
    )
    emb = emb.withColumn(
        "vec_id", F.col("vec_id") + F.col("_r") * F.lit(BASES["vec"])
    ).withColumn(
        "embedding",
        F.expr(
            "transform(embedding, (x, i) -> CAST(CASE WHEN i = 0 "
            "THEN x + _r * CAST(0.001 AS FLOAT) ELSE x END AS FLOAT))"
        ),
    )
    write("embeddings", emb, 8)
    spark.stop()


if __name__ == "__main__":
    main()
