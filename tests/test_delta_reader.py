"""Read-only Delta Lake interop: log replay, time travel, checkpoints,
partition values FROM THE LOG, loud refusals, manifest adoption.

All fixtures are REAL Delta logs written by DeltaFixtureWriter (protocol
JSON actions + pyarrow checkpoint parquet) — no delta-spark dependency."""

import json
import os

import pandas as pd
import pytest

from door2door_etl_spark.io.delta_reader import (
    DeltaFixtureWriter,
    DeltaProtocolError,
    DeltaUnsupportedError,
    convert_delta_to_manifest,
    delta_snapshot,
    read_delta,
)
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("s", StringType()),
        StructField("region", StringType()),
    ]
)


def _pdf(lo, hi, region):
    return pd.DataFrame(
        {
            "k": range(lo, hi),
            "s": [f"row-{i}" for i in range(lo, hi)],
            "region": [region] * (hi - lo),
        }
    )


def test_read_delta_round_trip_and_time_travel(spark, tmp_path):
    """Live set = adds minus removes with last-add-wins; every version
    is independently readable (time travel) and the latest read equals
    exactly the surviving rows."""
    root = str(tmp_path / "t")
    w = DeltaFixtureWriter(root, SCHEMA)
    v0, rels0 = w.commit_add(_pdf(0, 5, "a"))
    v1, _ = w.commit_add(_pdf(5, 9, "b"))
    v2 = w.commit_remove(rels0)  # delete the first batch
    assert (v0, v1, v2) == (0, 1, 2)

    def keys(version=None):
        return sorted(
            r.k for r in read_delta(spark, root, version=version).collect()
        )

    assert keys(0) == list(range(0, 5))
    assert keys(1) == list(range(0, 9))
    assert keys(2) == list(range(5, 9))
    assert keys() == list(range(5, 9))  # latest == v2
    got = {
        r.k: (r.s, r.region)
        for r in read_delta(spark, root).collect()
    }
    assert got[7] == ("row-7", "b")
    assert read_delta(spark, root).columns == ["k", "s", "region"]


def test_read_delta_partitioned_values_come_from_the_log(spark, tmp_path):
    """Partition columns are attached as typed literals from the LOG's
    partitionValues — proven by a flat (non-Hive) file layout where the
    path carries no partition information at all."""
    root = str(tmp_path / "t")
    w = DeltaFixtureWriter(root, SCHEMA, partition_cols=["region"])
    w.commit_add(pd.concat([_pdf(0, 3, "east"), _pdf(3, 5, "west")]),
                 hive_layout=False)
    rows = {r.k: r.region for r in read_delta(spark, root).collect()}
    assert rows == {0: "east", 1: "east", 2: "east", 3: "west", 4: "west"}
    # files really are flat: no key=value segment anywhere
    snap = delta_snapshot(root)
    assert all("=" not in f for f in snap.files)
    # typed partition columns: an int-typed partition casts from the log
    ischema = StructType(
        [StructField("k", LongType()), StructField("bucket", IntegerType())]
    )
    root2 = str(tmp_path / "t2")
    w2 = DeltaFixtureWriter(root2, ischema, partition_cols=["bucket"])
    w2.commit_add(
        pd.DataFrame({"k": [1, 2, 3], "bucket": [10, 10, 20]}),
        hive_layout=False,
    )
    out = read_delta(spark, root2)
    assert dict(out.dtypes)["bucket"] == "int"
    assert sorted((r.k, r.bucket) for r in out.collect()) == [
        (1, 10), (2, 10), (3, 20),
    ]


def test_read_delta_partition_values_prune_driver_side(spark, tmp_path):
    """partition_values prunes the live file set on the DRIVER (log
    metadata, before any scan is planned): single value, value list,
    null partition, and unknown-column refusal."""
    import pytest

    root = str(tmp_path / "t")
    w = DeltaFixtureWriter(root, SCHEMA, partition_cols=["region"])
    pdf = pd.concat([_pdf(0, 3, "east"), _pdf(3, 5, "west"),
                     _pdf(5, 6, None)])
    w.commit_add(pdf)

    def keys(**kw):
        return sorted(r.k for r in read_delta(spark, root, **kw).collect())

    assert keys(partition_values={"region": "east"}) == [0, 1, 2]
    assert keys(partition_values={"region": ["east", "west"]}) == list(range(5))
    assert keys(partition_values={"region": None}) == [5]
    assert keys(partition_values={"region": "nope"}) == []
    # pruned plan really is one scan group: a single file in its scan
    df = read_delta(spark, root, partition_values={"region": "west"})
    assert "unionall" not in df._jdf.queryExecution().executedPlan().toString().lower()
    with pytest.raises(ValueError, match="not a partition column"):
        read_delta(spark, root, partition_values={"k": "1"})


def test_read_delta_checkpoint_replaces_cleaned_log(spark, tmp_path):
    """After a checkpoint, earlier JSON commits can be vacuumed: reads at
    or past the checkpoint survive on checkpoint+suffix, and a time
    travel BELOW the surviving window refuses loudly instead of lying."""
    root = str(tmp_path / "t")
    w = DeltaFixtureWriter(root, SCHEMA)
    _, rels0 = w.commit_add(_pdf(0, 4, "a"))
    w.commit_add(_pdf(4, 6, "b"))
    w.commit_remove(rels0[:1])
    cp_v = w.checkpoint()
    assert cp_v == 2
    w.commit_add(_pdf(6, 8, "c"))  # v3 after the checkpoint
    # vacuum the pre-checkpoint JSON commits
    log = os.path.join(root, "_delta_log")
    for v in (0, 1, 2):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    assert sorted(r.k for r in read_delta(spark, root).collect()) == list(
        range(4, 8)
    )
    assert sorted(
        r.k for r in read_delta(spark, root, version=2).collect()
    ) == [4, 5]
    with pytest.raises(DeltaProtocolError, match="log cleaned"):
        read_delta(spark, root, version=1)


def test_read_delta_multipart_checkpoint(spark, tmp_path):
    """Multi-part checkpoints (<v>.checkpoint.<i>.<n>.parquet) are read
    whole; an INCOMPLETE part set is ignored rather than half-applied."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    w = DeltaFixtureWriter(root, SCHEMA)
    w.commit_add(_pdf(0, 4, "a"))
    w.commit_add(_pdf(4, 7, "b"))
    w.checkpoint()
    log = os.path.join(root, "_delta_log")
    single = os.path.join(log, f"{1:020d}.checkpoint.parquet")
    t = pq.read_table(single)
    pq.write_table(t.slice(0, 2), os.path.join(
        log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    pq.write_table(t.slice(2), os.path.join(
        log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    os.unlink(single)
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    os.unlink(os.path.join(log, f"{1:020d}.json"))
    assert sorted(r.k for r in read_delta(spark, root).collect()) == list(
        range(0, 7)
    )
    # drop one part: the incomplete checkpoint must be IGNORED, and with
    # the jsons gone the table is honestly unreconstructable
    os.unlink(os.path.join(
        log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    with pytest.raises(DeltaProtocolError):
        read_delta(spark, root)


def test_read_delta_percent_encoded_paths_and_empty_table(spark, tmp_path):
    """add.path is percent-DECODED per spec before resolution; a table
    whose live set is empty reads as an empty DataFrame with the schema."""
    root = str(tmp_path / "t")
    w = DeltaFixtureWriter(root, SCHEMA, partition_cols=["region"])
    _, rels = w.commit_add(_pdf(0, 2, "e u=rope"))  # space and '=' in value
    assert any("%20" in json.dumps(r) or " " in r for r in rels)
    out = read_delta(spark, root)
    assert sorted(r.region for r in out.collect()) == ["e u=rope"] * 2
    w.commit_remove(rels)
    empty = read_delta(spark, root)
    assert empty.count() == 0
    assert empty.columns == ["k", "s", "region"]


def test_read_delta_loud_refusals(spark, tmp_path):
    """Every unsupported feature refuses with the feature named; broken
    logs refuse structurally — never a silent wrong read."""
    # not a delta table
    with pytest.raises(DeltaProtocolError, match="not a Delta table"):
        read_delta(spark, str(tmp_path / "nope"))
    # deletion vector on a live add
    root = str(tmp_path / "dv")
    w = DeltaFixtureWriter(root, SCHEMA)
    _, rels = w.commit_add(_pdf(0, 3, "a"))
    log = os.path.join(root, "_delta_log")
    dv_add = {
        "add": {
            "path": rels[0],
            "partitionValues": {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
            "deletionVector": {
                "storageType": "u", "pathOrInlineDv": "x",
                "offset": 1, "sizeInBytes": 1, "cardinality": 1,
            },
        }
    }
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(json.dumps(dv_add))
    with pytest.raises(DeltaUnsupportedError, match="deletionVectors"):
        read_delta(spark, root)
    # column mapping
    root = str(tmp_path / "cm")
    w = DeltaFixtureWriter(
        root, SCHEMA, configuration={"delta.columnMapping.mode": "name"}
    )
    w.commit_add(_pdf(0, 2, "a"))
    with pytest.raises(DeltaUnsupportedError, match="column mapping"):
        read_delta(spark, root)
    # unknown reader feature refused; timestampNtz honored
    root = str(tmp_path / "feat")
    w = DeltaFixtureWriter(
        root, SCHEMA, reader_features=["deletionVectors"]
    )
    w.commit_add(_pdf(0, 2, "a"))
    with pytest.raises(DeltaUnsupportedError, match="deletionVectors"):
        read_delta(spark, root)
    root = str(tmp_path / "ntz")
    w = DeltaFixtureWriter(root, SCHEMA, reader_features=["timestampNtz"])
    w.commit_add(_pdf(0, 2, "a"))
    assert read_delta(spark, root).count() == 2
    # non-parquet format
    root = str(tmp_path / "fmt")
    w = DeltaFixtureWriter(root, SCHEMA)
    w.commit_add(_pdf(0, 2, "a"))
    rec = open(os.path.join(root, "_delta_log", f"{0:020d}.json")).read()
    rec = rec.replace('"provider": "parquet"', '"provider": "json"')
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(rec)
    with pytest.raises(DeltaUnsupportedError, match="non-parquet"):
        read_delta(spark, root)
    # version beyond latest
    root = str(tmp_path / "v")
    w = DeltaFixtureWriter(root, SCHEMA)
    w.commit_add(_pdf(0, 2, "a"))
    with pytest.raises(DeltaProtocolError, match="does not exist"):
        read_delta(spark, root, version=9)


def test_convert_delta_to_manifest_adopts_live_set_only(spark, tmp_path):
    """Adoption = LOG REPLAY, not directory walk: a removed file still
    sitting in the directory is NOT adopted (adopting it would resurrect
    deleted rows); the adopted manifest table reads byte-identically to
    read_delta; a second adoption into the same root refuses."""
    from door2door_etl_spark.io.manifest import ManifestTable

    root = str(tmp_path / "t")
    w = DeltaFixtureWriter(root, SCHEMA, partition_cols=["region"])
    _, rels0 = w.commit_add(_pdf(0, 4, "east"))
    w.commit_add(_pdf(4, 7, "west"))
    w.commit_remove(rels0)  # east rows deleted, files remain on disk
    assert all(os.path.exists(os.path.join(root, r)) for r in rels0)

    mroot = str(tmp_path / "m")
    n = convert_delta_to_manifest(spark, root, mroot)
    assert n == 1  # only the west file is live
    got = sorted(
        (r.k, r.s, r.region)
        for r in ManifestTable(mroot).read(spark).collect()
    )
    want = sorted(
        (r.k, r.s, r.region) for r in read_delta(spark, root).collect()
    )
    assert got == want and len(got) == 3
    with pytest.raises(ValueError, match="already has a committed manifest"):
        convert_delta_to_manifest(spark, root, mroot)


def test_convert_delta_to_manifest_refuses_non_hive_layout(spark, tmp_path):
    """A partitioned table whose live files are NOT laid out as
    col=value/ paths cannot adopt (the manifest protocol derives
    partition values from paths; adopting would drop the log's values)."""
    root = str(tmp_path / "t")
    w = DeltaFixtureWriter(root, SCHEMA, partition_cols=["region"])
    w.commit_add(_pdf(0, 3, "east"), hive_layout=False)
    with pytest.raises(DeltaUnsupportedError, match="not laid out"):
        convert_delta_to_manifest(spark, root, str(tmp_path / "m"))


def test_delta_snapshot_date_partition_casts(spark, tmp_path):
    """Spec partition-value serialization: ISO date strings cast to real
    DATE partition columns on read."""
    schema = StructType(
        [StructField("k", LongType()), StructField("d", DateType())]
    )
    root = str(tmp_path / "t")
    w = DeltaFixtureWriter(root, schema, partition_cols=["d"])
    w.commit_add(
        pd.DataFrame(
            {"k": [1, 2], "d": ["2024-03-01", "2024-03-02"]}
        ),
        hive_layout=False,
    )
    out = read_delta(spark, root)
    assert dict(out.dtypes)["d"] == "date"
    assert sorted(str(r.d) for r in out.collect()) == [
        "2024-03-01", "2024-03-02",
    ]
