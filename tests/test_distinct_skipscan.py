"""Generic DISTINCT SkipScan analog (Hypertable.distinct_values):
catalog-answered distinct over columnstore chunks, scan fallback only
for uncovered chunks, invalidation on DML."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import timescaledb_spark.compression as comp
from timescaledb_spark.compression import compress_chunks, enable_columnstore
from timescaledb_spark.session import TSSession


@pytest.fixture()
def ht(spark, tmp_path):
    ts = TSSession(spark, str(tmp_path / "cat"))
    ht = ts.create_hypertable("ev", "ts", chunk_interval="7 days")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(range(0, 28 * 24, 7), unit="h"),
            "dev": [f"d{i % 5}" for i in range(96)],
            "v": [float(i) for i in range(96)],
        }
    )
    ht.insert(spark.createDataFrame(pdf))
    enable_columnstore(ht, segmentby=["dev"], orderby=[("ts", "asc")])
    return ht


def test_fully_compressed_is_catalog_only(spark, ht):
    compress_chunks(ht)
    out = ht.distinct_values("dev")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan  # zero I/O: a literal frame
    assert sorted(r["dev"] for r in out.collect()) == [f"d{i}" for i in range(5)]
    st = ht.distinct_values_stats
    assert st["scanned_chunks"] == 0 and st["covered_chunks"] == st["total_chunks"]


def test_tuple_budget_forces_scan_fallback(spark, ht):
    """Round 11 (r10 VERDICT wrong #2): the driver-side union of
    recorded segment values is capped — above ``max_collect_tuples``
    the method falls back to the distributed scan path and records it
    in the stats, mirroring last_point(max_collect_keys=)."""
    compress_chunks(ht)
    out = ht.distinct_values("dev", max_collect_tuples=2)
    st = ht.distinct_values_stats
    assert st["path"] == "scan_fallback"
    assert st["scanned_chunks"] == st["total_chunks"]
    assert st["covered_tuples_pre_dedup"] > 2
    # ... and the answer is still exact
    assert sorted(r["dev"] for r in out.collect()) == [
        f"d{i}" for i in range(5)
    ]
    # default budget: catalog path, stats record the pre-dedup size
    out2 = ht.distinct_values("dev")
    st2 = ht.distinct_values_stats
    assert st2["path"] == "catalog"
    assert st2["covered_tuples_pre_dedup"] <= 1024 * st2["total_chunks"]


def test_dml_invalidates_only_touched_chunks(spark, ht):
    compress_chunks(ht)
    # new value lands in the FIRST chunk only
    ht.insert(
        spark.createDataFrame(
            [("2024-01-02T00:00:00", "d_new", 1.0)], "ts string, dev string, v double"
        ).select(F.col("ts").cast("timestamp"), "dev", "v")
    )
    out = ht.distinct_values("dev")
    got = sorted(r["dev"] for r in out.collect())
    assert got == sorted([f"d{i}" for i in range(5)] + ["d_new"])
    st = ht.distinct_values_stats
    assert st["scanned_chunks"] >= 1
    assert st["covered_chunks"] >= st["total_chunks"] - st["scanned_chunks"]
    assert st["covered_chunks"] > 0  # untouched chunks still catalog-answered


def test_non_segmentby_column_falls_back(spark, ht):
    compress_chunks(ht)
    out = ht.distinct_values("v")
    assert ht.distinct_values_stats["covered_chunks"] == 0
    assert out.count() == 96


def test_null_segment_values(spark, tmp_path):
    ts = TSSession(spark, str(tmp_path / "cat2"))
    ht = ts.create_hypertable("evn", "ts", chunk_interval="7 days")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(10), unit="h"),
            "dev": ["a", None] * 5,
            "v": [1.0] * 10,
        }
    )
    ht.insert(spark.createDataFrame(pdf))
    enable_columnstore(ht, segmentby=["dev"], orderby=[("ts", "asc")])
    compress_chunks(ht)
    got = {r["dev"] for r in ht.distinct_values("dev").collect()}
    assert got == {"a", None}
    assert ht.distinct_values_stats["scanned_chunks"] == 0


def test_over_cap_falls_back_to_scan(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(comp, "SEGMENT_VALUES_CAP", 3)
    ts = TSSession(spark, str(tmp_path / "cat3"))
    ht = ts.create_hypertable("evc", "ts", chunk_interval="7 days")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(10), unit="h"),
            "dev": [f"d{i}" for i in range(10)],  # 10 > cap of 3
            "v": [1.0] * 10,
        }
    )
    ht.insert(spark.createDataFrame(pdf))
    enable_columnstore(ht, segmentby=["dev"], orderby=[("ts", "asc")])
    compress_chunks(ht)
    got = {r["dev"] for r in ht.distinct_values("dev").collect()}
    assert got == {f"d{i}" for i in range(10)}
    assert ht.distinct_values_stats["covered_chunks"] == 0  # honest fallback


def test_unknown_column_raises(spark, ht):
    with pytest.raises(ValueError):
        ht.distinct_values("nope")


def test_sql_route(spark, ht):
    compress_chunks(ht)
    df = ht.ts.sql("SELECT DISTINCT dev FROM ev")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
    assert sorted(r["dev"] for r in df.collect()) == [f"d{i}" for i in range(5)]
    # non-matching shapes take the normal path and stay correct
    n = ht.ts.sql("SELECT DISTINCT dev FROM ev WHERE v > 50").count()
    assert 0 < n <= 5


# ---------------------------------------------------------------------------
# Composite (multi-column) DISTINCT from recorded segment-key tuples
# (round 10; the reference's SkipScan over any ordered index prefix,
# tsl/src/nodes/skip_scan/planner.c:576 — tuples subsume prefixes AND
# subsets by projection).
# ---------------------------------------------------------------------------


@pytest.fixture()
def ht2(spark, tmp_path):
    ts = TSSession(spark, str(tmp_path / "cat2"))
    ht = ts.create_hypertable("ev2", "ts", chunk_interval="7 days")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(range(0, 28 * 24, 7), unit="h"),
            "dev": [f"d{i % 5}" for i in range(96)],
            "site": [f"s{i % 3}" for i in range(96)],
            "v": [float(i) for i in range(96)],
        }
    )
    ht.insert(spark.createDataFrame(pdf))
    enable_columnstore(ht, segmentby=["dev", "site"], orderby=[("ts", "asc")])
    return ht


def _expected_pairs(ht, cols):
    return sorted(tuple(r) for r in ht.df().select(*cols).distinct().collect())


def test_multi_distinct_catalog_only(spark, ht2):
    compress_chunks(ht2)
    out = ht2.distinct_values(["dev", "site"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan  # zero I/O: a literal frame
    assert sorted(tuple(r) for r in out.collect()) == _expected_pairs(
        ht2, ["dev", "site"]
    )
    st = ht2.distinct_values_stats
    assert st["scanned_chunks"] == 0


def test_multi_distinct_subset_and_reorder(spark, ht2):
    compress_chunks(ht2)
    # subset projection: single columns answered from tuples too is NOT
    # required (per-column lists already cover them) — but a reordered
    # pair must project correctly
    out = ht2.distinct_values(["site", "dev"])
    assert out.columns == ["site", "dev"]
    assert sorted(tuple(r) for r in out.collect()) == _expected_pairs(
        ht2, ["site", "dev"]
    )
    assert ht2.distinct_values_stats["scanned_chunks"] == 0


def test_multi_distinct_dml_invalidation(spark, ht2):
    compress_chunks(ht2)
    extra = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": [pd.Timestamp("2024-01-02")],
                "dev": ["d9"],
                "site": ["s9"],
                "v": [1.0],
            }
        )
    )
    ht2.insert(extra)
    out = ht2.distinct_values(["dev", "site"])
    got = sorted(tuple(r) for r in out.collect())
    assert ("d9", "s9") in got
    assert got == _expected_pairs(ht2, ["dev", "site"])
    st = ht2.distinct_values_stats
    assert st["scanned_chunks"] >= 1  # touched chunk re-scanned
    assert st["covered_chunks"] >= 1  # untouched chunks stay catalog


def test_multi_distinct_non_segmentby_falls_back(spark, ht2):
    compress_chunks(ht2)
    out = ht2.distinct_values(["dev", "v"])  # v is not a segmentby col
    assert ht2.distinct_values_stats["covered_chunks"] == 0
    assert sorted(tuple(r) for r in out.collect()) == _expected_pairs(
        ht2, ["dev", "v"]
    )


def test_sql_route_multi_column(spark, ht2):
    compress_chunks(ht2)
    out = ht2.ts.sql("SELECT DISTINCT dev, site FROM ev2")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
    assert sorted(tuple(r) for r in out.collect()) == _expected_pairs(
        ht2, ["dev", "site"]
    )
