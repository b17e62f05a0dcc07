"""SCD type-2 dimension maintenance (pipeline/scd.py).

Parity model: maintaining the dimension wave-by-wave with scd2_merge
must equal the history rebuilt from scratch by
operators.relational.scd2_history over the equivalent change log; plus
idempotent re-application, full-snapshot member removal, point-in-time
reads, and the effective-time monotonicity guard.
"""

from __future__ import annotations

import pytest

from door2door_etl_spark.pipeline.scd import (
    read_asof,
    read_current,
    read_dim,
    scd2_merge,
)

T1, T2, T3 = (
    "2024-01-01 00:00:00",
    "2024-02-01 00:00:00",
    "2024-03-01 00:00:00",
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id string, tier string, region string")


def _hist(spark, root):
    return sorted(
        (
            r["id"], r["tier"], r["region"],
            str(r["valid_from"]),
            None if r["valid_to"] is None else str(r["valid_to"]),
            r["is_current"],
        )
        for r in read_dim(spark, root).collect()
    )


def test_scd2_merge_waves_match_history_rebuild(spark, tmp_path):
    root = str(tmp_path / "dim")
    out = scd2_merge(
        spark, root, _batch(spark, [("a", "gold", "eu"), ("b", "free", "us")]),
        key="id", tracked_cols=["tier", "region"], effective_ts=T1,
    )
    assert out == {"n_new": 2, "n_changed": 0, "n_closed_missing": 0}

    # wave 2: a changes tier, b unchanged, c new
    out = scd2_merge(
        spark, root,
        _batch(spark, [("a", "plat", "eu"), ("b", "free", "us"),
                       ("c", "gold", "ap")]),
        key="id", tracked_cols=["tier", "region"], effective_ts=T2,
    )
    assert out == {"n_new": 1, "n_changed": 1, "n_closed_missing": 0}

    got = _hist(spark, root)
    # parity with the from-scratch history over the equivalent log
    from door2door_etl_spark.operators.relational import scd2_history
    from pyspark.sql import functions as F

    log = spark.createDataFrame(
        [
            ("a", "gold", "eu", T1), ("b", "free", "us", T1),
            ("a", "plat", "eu", T2), ("b", "free", "us", T2),
            ("c", "gold", "ap", T2),
        ],
        "id string, tier string, region string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = sorted(
        (
            r["id"], r["tier"], r["region"],
            str(r["valid_from"]),
            None if r["valid_to"] is None else str(r["valid_to"]),
            r["is_current"],
        )
        for r in scd2_history(log, ["id"], ["tier", "region"], "ts").collect()
    )
    assert got == want

    # idempotent: replaying wave 2 changes nothing
    out = scd2_merge(
        spark, root,
        _batch(spark, [("a", "plat", "eu"), ("b", "free", "us"),
                       ("c", "gold", "ap")]),
        key="id", tracked_cols=["tier", "region"], effective_ts=T2,
    )
    assert out == {"n_new": 0, "n_changed": 0, "n_closed_missing": 0}
    assert _hist(spark, root) == want


def test_scd2_full_snapshot_closes_missing_and_asof_reads(spark, tmp_path):
    root = str(tmp_path / "dim")
    scd2_merge(
        spark, root, _batch(spark, [("a", "gold", "eu"), ("b", "free", "us")]),
        key="id", tracked_cols=["tier", "region"], effective_ts=T1,
    )
    # full snapshot without b: b's membership ends at T2
    out = scd2_merge(
        spark, root, _batch(spark, [("a", "plat", "eu")]),
        key="id", tracked_cols=["tier", "region"], effective_ts=T2,
        full_snapshot=True,
    )
    assert out == {"n_new": 0, "n_changed": 1, "n_closed_missing": 1}

    cur = {r["id"]: r["tier"] for r in read_current(spark, root).collect()}
    assert cur == {"a": "plat"}

    asof1 = {
        r["id"]: r["tier"]
        for r in read_asof(spark, root, "2024-01-15 00:00:00").collect()
    }
    assert asof1 == {"a": "gold", "b": "free"}
    # boundary: as-of exactly T2 sees the post-change world
    asof2 = {
        r["id"]: r["tier"] for r in read_asof(spark, root, T2).collect()
    }
    assert asof2 == {"a": "plat"}

    # a removed member can rejoin later: fresh interval, old one intact
    scd2_merge(
        spark, root, _batch(spark, [("a", "plat", "eu"), ("b", "gold", "us")]),
        key="id", tracked_cols=["tier", "region"], effective_ts=T3,
        full_snapshot=True,
    )
    b_rows = [
        (str(r["valid_from"]), None if r["valid_to"] is None else str(r["valid_to"]))
        for r in read_dim(spark, root).filter("id = 'b'")
        .orderBy("valid_from").collect()
    ]
    assert b_rows == [(T1, T2), (T3, None)]


def test_scd2_effective_ts_must_advance(spark, tmp_path):
    root = str(tmp_path / "dim")
    scd2_merge(
        spark, root, _batch(spark, [("a", "gold", "eu")]),
        key="id", tracked_cols=["tier", "region"], effective_ts=T1,
    )
    with pytest.raises(ValueError, match="strictly after"):
        scd2_merge(
            spark, root, _batch(spark, [("a", "plat", "eu")]),
            key="id", tracked_cols=["tier", "region"], effective_ts=T1,
        )


def test_stream_scd2_maintenance_parity_and_replay(spark, tmp_path):
    """Two micro-batches flow through stream_scd2_maintenance; the
    maintained dimension equals the batch scd2_history over the
    equivalent log (latest-per-key per batch), and a same-checkpoint
    redelivery run is a no-op."""
    import json as _json

    from pyspark.sql import functions as F

    from door2door_etl_spark.operators.relational import scd2_history
    from door2door_etl_spark.streaming.pipeline import stream_scd2_maintenance

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    dim = str(tmp_path / "dim")
    b0 = [
        {"id": "a", "tier": "gold", "ts": "2024-01-01 00:00:00"},
        {"id": "b", "tier": "free", "ts": "2024-01-01 00:05:00"},
        # two a-changes inside one batch: only the latest lands
        {"id": "a", "tier": "silver", "ts": "2024-01-01 00:09:00"},
    ]
    b1 = [
        {"id": "a", "tier": "plat", "ts": "2024-02-01 00:00:00"},
        {"id": "c", "tier": "gold", "ts": "2024-02-01 00:01:00"},
    ]
    stream = (
        spark.readStream.schema("id string, tier string, ts string")
        .json(str(src_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )

    def run():
        q = stream_scd2_maintenance(
            spark, stream, dim, key="id", tracked_cols=["tier"],
            ts_col="ts", checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)

    (src_dir / "b0.json").write_text("\n".join(_json.dumps(r) for r in b0))
    run()
    (src_dir / "b1.json").write_text("\n".join(_json.dumps(r) for r in b1))
    run()

    got = _hist_rows(spark, dim)
    # batch-equivalent log: latest per key per batch, at the batch's max ts
    log = spark.createDataFrame(
        [
            ("a", "silver", "2024-01-01 00:09:00"),
            ("b", "free", "2024-01-01 00:09:00"),
            ("a", "plat", "2024-02-01 00:01:00"),
            ("b", "free", "2024-02-01 00:01:00"),
            ("c", "gold", "2024-02-01 00:01:00"),
        ],
        "id string, tier string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = sorted(
        (
            r["id"], r["tier"], str(r["valid_from"]),
            None if r["valid_to"] is None else str(r["valid_to"]),
            r["is_current"],
        )
        for r in scd2_history(log, ["id"], ["tier"], "ts").collect()
    )
    assert got == want

    # same-checkpoint redelivery: no new input -> complete no-op
    run()
    assert _hist_rows(spark, dim) == want


def _hist_rows(spark, root):
    return sorted(
        (
            r["id"], r["tier"], str(r["valid_from"]),
            None if r["valid_to"] is None else str(r["valid_to"]),
            r["is_current"],
        )
        for r in read_dim(spark, root).collect()
    )


def test_scd2_enrich_point_in_time(spark):
    """scd2_enrich attaches the interval covering each fact timestamp:
    mid-interval facts get that interval's attrs, facts in a
    post-removal gap get NULL, facts before the first interval get
    NULL, unknown keys get NULL; equals a brute-force interval join."""
    from pyspark.sql import functions as F

    from door2door_etl_spark.operators.relational import scd2_enrich

    hist = spark.createDataFrame(
        [
            ("a", "gold", "2024-01-01 00:00:00", "2024-02-01 00:00:00", False),
            ("a", "plat", "2024-02-01 00:00:00", None, True),
            # b was removed at T2 (gap), rejoined at T3
            ("b", "free", "2024-01-01 00:00:00", "2024-02-01 00:00:00", False),
            ("b", "gold", "2024-03-01 00:00:00", None, True),
        ],
        "id string, tier string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "id", "tier",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )
    facts = spark.createDataFrame(
        [
            (1, "a", "2024-01-15 12:00:00"),   # mid first interval
            (2, "a", "2024-02-01 00:00:00"),   # boundary -> new interval
            (3, "a", "2023-12-25 00:00:00"),   # before any interval
            (4, "b", "2024-02-15 00:00:00"),   # removal gap -> NULL
            (5, "b", "2024-06-01 00:00:00"),   # rejoined current
            (6, "z", "2024-06-01 00:00:00"),   # unknown key
        ],
        "fact_id long, id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    got = {
        r["fact_id"]: r["tier"]
        for r in scd2_enrich(facts, hist, "id", "ts", ["tier"]).collect()
    }
    assert got == {
        1: "gold", 2: "plat", 3: None, 4: None, 5: "gold", 6: None
    }

    # brute-force interval-join twin over the same inputs
    brute = (
        facts.alias("f")
        .join(
            hist.alias("h"),
            (F.col("f.id") == F.col("h.id"))
            & (F.col("f.ts") >= F.col("h.valid_from"))
            & (
                F.col("h.valid_to").isNull()
                | (F.col("f.ts") < F.col("h.valid_to"))
            ),
            "left",
        )
        .select("f.fact_id", "h.tier")
    )
    assert got == {r["fact_id"]: r["tier"] for r in brute.collect()}
