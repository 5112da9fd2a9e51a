"""END-TO-END cross-process isolation: a second DRIVER PROCESS (its own
JVM + SparkSession) inserts into the same hypertable while this process
runs continuous-aggregate refreshes — the multiprocessing analog of the
reference's ``cagg_concurrent_refresh.spec``. The ProcessRLock flocks
serialize both the catalog transactions and the per-hypertable DML
staging, so no insert is lost and the final refresh converges to the
batch truth."""

import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0_US = 1704067200000000

WORKER = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from timescaledb_spark.session import TSSession, build_spark

spark = build_spark(app_name="mp_dml_worker")
ts = TSSession(spark, %(root)r)
ht = ts.get_hypertable("m")
open(%(ready)r, "w").close()
while not os.path.exists(%(go)r):
    time.sleep(0.01)
T0 = %(t0)d
for i in range(%(rounds)d):
    df = spark.range(10).select(
        F.timestamp_micros(
            (F.lit(T0) + (F.col("id") + i * 10) * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") + i * 10).alias("k"),
        F.lit(1.0).alias("value"),
    )
    ht.insert(df)
print("done")
spark.stop()
"""


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "wh"))


def test_second_driver_inserts_during_refresh(ts, spark, tmp_path):
    root = ts.catalog_root
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    seed = spark.range(24).select(
        F.timestamp_micros(
            (F.lit(T0_US - 40 * 86_400_000_000) + F.col("id") * 3600 * 1_000_000)
            .cast("long")
        ).alias("ts"),
        F.col("id").alias("k"),
        F.lit(0.5).alias("value"),
    )
    ht.insert(seed)
    cagg = ts.create_cagg(
        "m_daily", "m", bucket_width="1 day",
        aggs={"n": "count(1)", "s": "sum(value)"},
    )
    cagg.refresh()

    ready = str(tmp_path / "ready")
    go = str(tmp_path / "go")
    rounds = 6
    code = WORKER % {
        "repo": REPO, "root": root, "ready": ready, "go": go,
        "t0": T0_US, "rounds": rounds,
    }
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        deadline = time.time() + 120
        while not os.path.exists(ready):
            assert time.time() < deadline, "worker Spark session never came up"
            assert proc.poll() is None, proc.communicate()[1]
            time.sleep(0.05)
        open(go, "w").close()
        # refresh repeatedly WHILE the other process inserts
        while proc.poll() is None:
            cagg.refresh()
        out, err = proc.communicate(timeout=60)
        assert proc.returncode == 0, err
    finally:
        if proc.poll() is None:
            proc.kill()

    # no insert lost across processes
    assert ht.df().count() == 24 + rounds * 10
    # and the invalidation protocol converges: final refresh == batch truth
    cagg.refresh()
    got = {
        r["bucket"]: (r["n"], r["s"])
        for r in cagg.read().collect()
    }
    want = {
        r["bucket"]: (r["n"], r["s"])
        for r in ht.df()
        .groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want
