#!/usr/bin/env python3
"""Structural scale screen for the dedup family PAST the 10x tier
(VERDICT r10 ask #5; 50x tier per r11 ask #8): candidate/pair COUNTS —
ambient-load-immune, unlike wall-clock — measured at sf0.1 (1x), sf1
(10x, bench_data/sf1) and documents-only 20x + 50x tiers generated here (bench_data/sf2docs,
replica word-transform identical to tools/gen_sf1.py so replicas share
no shingles).

Screened counts and why each is the right structural metric:

- jaccard_rarest_cands  — ns_ngram_jaccard_topk's candidate pairs
  (both-sides rarest-k blocking); bound <= k*(max_df-1) per doc.
- containment_cands     — ns_containment_pairs' candidate pairs
  (ONE-SIDED rarest-k blocking); same per-doc bound.
- lsh_band_pairs        — ns_minhash_lsh_pairs' banded candidate set;
  bound by band-collision volume, O(near-dup structure) not O(n^2).
- winnow_join_rows      — the winnowing pair join's RAW row volume
  (sum over rare fingerprints of n*(n-1)/2, the actual shuffle work;
  bound <= rare_max^2/2 per fingerprint).
- winnow_pairs          — its distinct (id_a, id_b) output.

Linear growth (ratio ~= replica ratio) is a PASS: replicas share no
shingles by construction, so any superlinear term means the blocking
leaks cross-replica or density-quadratic candidates.

Usage: python tools/scale_counts.py [--skip-gen]
Writes one JSON line per (tier, metric) plus a summary table to stdout;
redirect to bench_results/rNN_scale_counts.txt for the artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF2_REPLICAS = 20
SF2_DIR = str(REPO / "bench_data" / "sf2docs")
# 50x tier (VERDICT r11 ask #8): the 100 TB claim's next doubling-plus
# is cheap because the screen is count-based — same replica transform,
# 50 replicas, documents-only.
SF5_REPLICAS = 50
SF5_DIR = str(REPO / "bench_data" / "sf5docs")


def gen_docs_tier(spark, src: str, replicas: int, out_dir: str) -> None:
    """Documents-only replica tier: same per-replica word transform as
    tools/gen_sf1.py (replica r prefixes every word with 'r{r}'), so
    each replica keeps the original corpus's internal duplicate
    structure but shares no shingles across replicas."""
    from pyspark.sql import functions as F

    from door2door_etl_spark.io.readers import load_table

    docs = load_table(spark, src, "documents").withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
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
        docs.withColumn(
            "doc_id", F.col("doc_id") + F.col("_r") * F.lit(1_000_000)
        )
        .withColumn("text", new_text)
        .withColumn("n_chars", F.length("text"))
        .drop("_r")
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def counts_for(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from door2door_etl_spark.io.readers import load_table
    from door2door_etl_spark.operators.dedup import (
        minhash_lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )
    from door2door_etl_spark.operators.text import winnow_fingerprints
    from door2door_etl_spark.queries.northstar_catalog import (
        BANDS,
        JACCARD_MAX_DF,
        JACCARD_RAREST_K,
        NUM_HASHES,
        SHINGLE_N,
    )
    from door2door_etl_spark.queries.training_catalog import (
        WINNOW_K,
        WINNOW_RARE_MAX,
        WINNOW_W,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = {"docs": docs.count()}

    t0 = time.time()
    out["jaccard_rarest_cands"] = ngram_jaccard_pairs(
        docs, shingle_n=SHINGLE_N, max_df=JACCARD_MAX_DF,
        persist_shingles=True, block_rarest_k=JACCARD_RAREST_K,
    ).count()
    spark.catalog.clearCache()
    out["containment_cands"] = ngram_jaccard_pairs(
        docs, shingle_n=SHINGLE_N, max_df=JACCARD_MAX_DF,
        persist_shingles=True, with_containment=True,
        block_rarest_k=JACCARD_RAREST_K, block_one_sided=True,
    ).count()
    spark.catalog.clearCache()
    out["lsh_band_pairs"] = minhash_lsh_candidate_pairs(
        docs, num_hashes=NUM_HASHES, bands=BANDS, shingle_n=SHINGLE_N
    ).count()

    from pyspark.storagelevel import StorageLevel

    fps = winnow_fingerprints(docs, k=WINNOW_K, w=WINNOW_W).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    per_fp = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    out["winnow_join_rows"] = int(
        per_fp.filter(F.col("n") <= WINNOW_RARE_MAX)
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2))
        .collect()[0][0]
        or 0
    )
    rare = per_fp.filter(F.col("n") <= WINNOW_RARE_MAX).select("fp")
    r = fps.join(rare, "fp", "left_semi")
    a, b = r.alias("a"), r.alias("b")
    out["winnow_pairs"] = (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    fps.unpersist()
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main() -> None:
    from door2door_etl_spark.session import build_session

    spark = build_session(app_name="scale-counts")
    src = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
    tiers = [("sf0.1_1x", src), ("sf1_10x", str(REPO / "bench_data" / "sf1"))]
    if "--skip-gen" not in sys.argv:
        gen_docs_tier(spark, src, SF2_REPLICAS, SF2_DIR)
        gen_docs_tier(spark, src, SF5_REPLICAS, SF5_DIR)
    tiers.append(("sf2_20x", SF2_DIR))
    tiers.append(("sf5_50x", SF5_DIR))

    results = {}
    for name, d in tiers:
        results[name] = counts_for(spark, d)
        print(json.dumps({"tier": name, **results[name]}), flush=True)

    base = results["sf0.1_1x"]
    print("\nmetric                 1x        10x       20x       50x    "
          "r(10x)  r(20x/10x)  r(50x/20x)")
    for k in ("jaccard_rarest_cands", "containment_cands", "lsh_band_pairs",
              "winnow_join_rows", "winnow_pairs"):
        v1, v10, v20, v50 = (base[k], results["sf1_10x"][k],
                             results["sf2_20x"][k], results["sf5_50x"][k])
        print(f"{k:22s} {v1:9d} {v10:9d} {v20:9d} {v50:9d} "
              f"{v10 / max(v1, 1):7.2f} {v20 / max(v10, 1):10.2f} "
              f"{v50 / max(v20, 1):10.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
