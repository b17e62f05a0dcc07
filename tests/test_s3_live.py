"""Opt-in LIVE object-store integration (VERDICT r5 ask #6): the manifest
commit cycle — merge, read, update, DV delete, multi-predicate skipping
read, clustered compaction, vacuum — against a REAL S3-compatible
endpoint, exercising S3FsOps (metadata half) and the s3a data plane
(Spark staging writes + manifest-listed reads) TOGETHER.

Skipped by default (`pytest.ini` deselects `-m s3`); run with:

    SPARK_GRAFT_S3_ENDPOINT=http://localhost:9000 \
    SPARK_GRAFT_S3_BUCKET=lake \
    AWS_ACCESS_KEY_ID=... AWS_SECRET_ACCESS_KEY=... \
    pytest tests/test_s3_live.py -m s3

Requirements beyond env vars: boto3 importable, and the Spark session
able to load hadoop-aws (the s3a connector) — each probed at runtime
with a specific skip message, so CI without an object store skips
cleanly instead of failing.
"""

from __future__ import annotations

import os
import uuid

import pytest

pytestmark = pytest.mark.s3

_REQUIRED_ENV = ("SPARK_GRAFT_S3_ENDPOINT", "SPARK_GRAFT_S3_BUCKET",
                 "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY")


@pytest.fixture(scope="module")
def live(spark):
    missing = [v for v in _REQUIRED_ENV if not os.environ.get(v)]
    if missing:
        pytest.skip(f"live S3 env not configured: missing {missing}")
    boto3 = pytest.importorskip("boto3")
    endpoint = os.environ["SPARK_GRAFT_S3_ENDPOINT"]
    bucket = os.environ["SPARK_GRAFT_S3_BUCKET"]
    client = boto3.client("s3", endpoint_url=endpoint)
    try:
        client.head_bucket(Bucket=bucket)
    except Exception as e:  # pragma: no cover - env-specific
        pytest.skip(f"bucket {bucket!r} not reachable at {endpoint}: {e}")

    # s3a data plane: endpoint + path-style for MinIO; creds come from the
    # standard AWS env vars via the default provider chain.
    from door2door_etl_spark.io.objectstore import configure_s3a

    configure_s3a(spark, endpoint=endpoint.replace("http://", "").replace(
        "https://", ""), path_style=True)
    probe = f"s3a://{bucket}/.spark-graft-probe/{uuid.uuid4().hex}"
    try:
        spark.createDataFrame([(1,)], "x int").write.mode("overwrite").parquet(probe)
        assert spark.read.parquet(probe).count() == 1
    except Exception as e:  # pragma: no cover - env-specific
        pytest.skip(f"s3a data plane unavailable (hadoop-aws jars?): {e}")
    return client, bucket


def test_manifest_cycle_on_live_object_store(spark, live):
    from door2door_etl_spark.io.manifest import (
        ManifestTable,
        S3FsOps,
        compact_manifest,
        delete_manifest,
        merge_manifest,
    )

    client, bucket = live
    fs = S3FsOps(client=client)
    root = f"s3://{bucket}/spark-graft-live/{uuid.uuid4().hex}/tbl"

    def mk(rows):
        return spark.createDataFrame(rows, "k int, v string, part string")

    def snap():
        return {
            r["k"]: r["v"]
            for r in ManifestTable(root, fs=fs).read(spark).collect()
        }

    # merge -> read
    merge_manifest(spark, root, mk([(1, "a", "p1"), (2, "b", "p2")]),
                   key="k", fs=fs, stats_col=["part", "k"], vacuum_keep=99)
    assert snap() == {1: "a", 2: "b"}
    # upsert + idempotent replay
    batch = mk([(2, "B", "p2"), (3, "c", "p1")])
    merge_manifest(spark, root, batch, key="k", fs=fs, vacuum_keep=99)
    merge_manifest(spark, root, batch, key="k", fs=fs, vacuum_keep=99)
    assert snap() == {1: "a", 2: "B", 3: "c"}
    # merge-on-read DV delete, masked without touching data files
    table = ManifestTable(root, fs=fs)
    files_before = set(table.manifest(table.current_version())["files"])
    delete_manifest(spark, root, mk([(1, "a", "p1")]).select("k"), key="k",
                    fs=fs, mode="dv", vacuum_keep=99)
    table = ManifestTable(root, fs=fs)
    assert snap() == {2: "B", 3: "c"}
    assert files_before <= set(table.manifest(table.current_version())["files"])
    # multi-predicate skipping read
    got = table.read_where(spark, {"k": (3, 3)})
    assert [(r["k"], r["v"]) for r in got.collect()] == [(3, "c")]
    # clustered compaction materializes the DV and keeps contents
    compact_manifest(spark, root, fs=fs, sort_by=["k"], vacuum_keep=99)
    assert snap() == {2: "B", 3: "c"}
    # vacuum trims history down to the retention floor
    ManifestTable(root, fs=fs).vacuum(keep=2, min_age_hours=0.0)
    assert snap() == {2: "B", 3: "c"}
