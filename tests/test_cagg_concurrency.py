"""Concurrent refresh-vs-insert isolation — the threaded analog of the
reference's isolation specs (``tsl/test/isolation/specs/
cagg_concurrent_refresh.spec``, ``cagg_insert.spec``).

The two-txn refresh design (``tsl/src/continuous_aggs/refresh.c:735``)
exists precisely for the window between txn-1 (threshold move) and
txn-2 (invalidation-log drain + materialize): an insert landing inside
that window must either be seen by the materialize pass or leave a
surviving invalidation entry — NEVER neither. Here catalog compound
read-modify-writes serialize on ``catalog.write_lock`` (the analog of
the reference's threshold row lock); these tests prove (a) the exact
find→delete interleaving cannot drop an entry and (b) arbitrary
threaded insert/refresh schedules converge to the full recompute.
"""

import tempfile
import threading
import time

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0 = 1704067200000000  # 2024-01-01
HOUR = 3_600_000_000


def _rows(spark, start_h, n_h, v=1.0):
    return spark.range(n_h).select(
        F.timestamp_micros(
            (F.lit(T0) + (F.col("id") + start_h) * HOUR).cast("long")
        ).alias("ts"),
        F.lit(float(v)).alias("v"),
    )


def _recompute(ht):
    return {
        (r["b"], r["n"], r["s"])
        for r in ht.df()
        .groupBy(F.date_trunc("day", "ts").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }


def _mat_state(cagg):
    return {
        (r["bucket"], r["n"], r["s"])
        for r in cagg.read(realtime=False).collect()
    }


def test_insert_during_refresh_log_drain_not_lost(spark):
    """Deterministically land an insert's invalidation WHILE a refresh is
    inside its txn-2a log drain (between find and delete). Without the
    catalog write_lock the entry is silently deleted and the cagg
    diverges; with it the insert serializes and the final state
    converges."""
    root = tempfile.mkdtemp(prefix="ts_iso1_")
    ts = TSSession(spark, root)
    ht = ts.create_hypertable("c", "ts", chunk_interval="1 day")
    ht.insert(_rows(spark, 0, 48, v=1.0))
    cagg = ts.create_cagg(
        "cc", "c", bucket_width="1 day",
        aggs={"n": "count(1)", "s": "sum(v)"},
    )
    cagg.refresh()  # threshold now at window end; logs drained

    # dirty day 0 so the next refresh has a log entry to drain
    ht.insert(_rows(spark, 1, 2, v=10.0))

    cat = ts.catalog
    log = cat.hypertable_invalidation_log
    orig_find = log.find
    in_drain, proceed = threading.Event(), threading.Event()

    def slow_find(**kw):
        res = orig_find(**kw)
        in_drain.set()       # refresh is between find and delete now
        proceed.wait(30)
        return res

    refresh_err = []

    def run_refresh():
        try:
            cagg.refresh()
        except Exception as e:  # pragma: no cover
            refresh_err.append(e)

    log.find = slow_find
    try:
        t_ref = threading.Thread(target=run_refresh)
        t_ref.start()
        assert in_drain.wait(30)
        # refresh holds the write_lock inside its drain; this insert's
        # invalidation capture must BLOCK, not interleave-and-vanish
        t_ins = threading.Thread(
            target=lambda: ht.insert(_rows(spark, 3, 2, v=100.0))
        )
        t_ins.start()
        time.sleep(1.0)  # let the insert reach the capture lock
        proceed.set()
        t_ref.join(120)
        t_ins.join(120)
    finally:
        log.find = orig_find
        proceed.set()
    assert not refresh_err

    # the concurrent insert either materialized or left a dirty entry;
    # a final refresh must converge to the full recompute
    cagg.refresh()
    assert _mat_state(cagg) == _recompute(ht)


@pytest.mark.parametrize("n_inserters", [2])
def test_threaded_insert_refresh_stress_converges(spark, n_inserters):
    """Arbitrary schedule: concurrent inserter threads race a refresher
    loop; afterwards one final refresh equals the full recompute —
    the invalidation protocol may defer work but never loses any."""
    root = tempfile.mkdtemp(prefix="ts_iso2_")
    ts = TSSession(spark, root)
    ht = ts.create_hypertable("s", "ts", chunk_interval="1 day")
    ht.insert(_rows(spark, 0, 24, v=1.0))
    cagg = ts.create_cagg(
        "ss", "s", bucket_width="1 day",
        aggs={"n": "count(1)", "s": "sum(v)"},
    )
    cagg.refresh()

    errs = []
    stop = threading.Event()

    def inserter(tag):
        try:
            for i in range(4):
                ht.insert(_rows(spark, 24 * tag + i * 6, 6, v=float(tag)))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def refresher():
        try:
            while not stop.is_set():
                cagg.refresh()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=inserter, args=(t + 1,))
        for t in range(n_inserters)
    ]
    t_ref = threading.Thread(target=refresher)
    t_ref.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    stop.set()
    t_ref.join(300)
    assert not errs, errs

    cagg.refresh()
    assert _mat_state(cagg) == _recompute(ht)
