"""Training-shard export — pipeline/export.py (round 15)."""

import glob

import pytest

from timescaledb_spark.pipeline.export import (
    shard_assign,
    write_training_shards,
)
from timescaledb_spark.sources import load_table

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SHARDS = {"train": 4, "val": 2, "test": 2}


def test_shard_assign_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {
        (r["doc_id"], r["split"], r["shard"])
        for r in shard_assign(docs, SHARDS, WEIGHTS).collect()
    }
    b = {
        (r["doc_id"], r["split"], r["shard"])
        for r in shard_assign(docs, SHARDS, WEIGHTS).collect()
    }
    assert a == b and a
    # shard ids bounded per split
    for _, s, sh in a:
        assert 0 <= sh < SHARDS[s]
    # assignment is a projection: no Exchange in the plan
    plan = (
        shard_assign(docs, SHARDS, WEIGHTS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_shard_assign_int_and_default_split(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id bigint")
    out = shard_assign(df, 8).collect()
    assert {r["split"] for r in out} == {"train"}
    assert {r["shard"] for r in out} <= set(range(8))
    with pytest.raises(ValueError):
        shard_assign(df, {})


def test_write_one_file_per_shard(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, SHARDS, WEIGHTS)
    files = glob.glob(path + "/split=*/shard=*/*.parquet")
    dirs = {tuple(p.split("/")[-3:-1]) for p in files}
    assert len(files) == len(dirs) == len(manifest)
    # manifest counts equal what lands on disk
    back = spark.read.parquet(path)
    got = {
        (r["split"], r["shard"]): r["count"]
        for r in back.groupBy("split", "shard").count().collect()
    }
    assert got == manifest
    assert sum(manifest.values()) == docs.count()


def test_export_scans_source_exactly_once(spark, tmp_path):
    """Round-16 review fix: the manifest must come from the files just
    written, not from re-aggregating the assignment frame — that re-ran
    the whole upstream pipeline for a second corpus scan. An accumulator
    bumped inside a mapInPandas stage counts how many source rows are
    ever produced; a second scan would double it."""
    import pandas as pd

    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    base = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id bigint"
    ).mapInPandas(counting, "doc_id bigint")
    path = str(tmp_path / "once")
    manifest = write_training_shards(base, path, SHARDS, WEIGHTS)
    assert sum(manifest.values()) == 500
    assert acc.value == 500, (
        f"source produced {acc.value} rows for a 500-row corpus — "
        "the export scanned it more than once"
    )


def test_gate_matches_oracle(spark, duck, sf_dir):
    from timescaledb_spark import queries as Q

    qs, oracles = Q.queries(), Q.oracle_sql()
    got = {tuple(r) for r in qs["q_shard_assign"](spark, sf_dir).collect()}
    want = {
        tuple(r) for r in duck.execute(oracles["q_shard_assign"]).fetchall()
    }
    assert got == want and got
