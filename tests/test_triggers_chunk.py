"""Per-chunk and per-op trigger semantics, mirroring the reference's
trigger matrix (``test/sql/triggers.sql``): chunk-scoped row firing
(tuple routing fires the CHUNK's triggers, ``src/nodes/chunk_dispatch/``),
conditional ``WHEN (NEW.x = ..)`` triggers, UPDATE/DELETE row triggers
(a BEFORE DELETE trigger dropping a row SKIPS its deletion), and AFTER
ROW observers.

Row-trigger bodies run in Python worker processes — observers therefore
record through the filesystem, and assertion failures surface as job
failures, not driver-side asserts inside the body.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0 = 1704067200000000  # 2024-01-01
HOUR = 3_600_000_000
DAY = 86_400_000_000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _batch(spark, n=48, dev_mod=3):
    return spark.range(n).select(
        F.timestamp_micros((F.lit(T0) + F.col("id") * HOUR).cast("long")).alias(
            "ts"
        ),
        F.col("id").alias("k"),
        (F.col("id") % dev_mod).cast("string").alias("dev"),
        (F.col("id") * 1.0).alias("value"),
    )


def test_conditional_trigger_when_clause(ts, spark):
    """triggers.sql: CREATE TRIGGER .. WHEN (NEW.device_id = 'dev1') —
    only matching rows pass through the trigger body; the rest are
    untouched."""
    ht = ts.create_hypertable("t_cond", "ts", chunk_interval="1 day")

    def bump(pdf):
        pdf = pdf.copy()
        pdf["value"] = pdf["value"] + 1000.0
        return pdf

    ht.create_trigger(
        "dev1_only", bump, when="before_row", condition="dev = '1'"
    )
    ht.insert(_batch(spark, n=9))
    got = dict(ht.df().select("k", "value").collect())
    for k in range(9):
        expect = k + 1000.0 if k % 3 == 1 else float(k)
        assert got[k] == expect, k


def test_chunk_scoped_trigger_sees_chunk_pure_frames(ts, spark):
    """Per-chunk firing: fn(pdf, chunk_start) is called once per routed
    chunk with a chunk-pure frame; writing chunk_start into the rows
    proves both the grouping and the start value."""
    ht = ts.create_hypertable("t_scope", "ts", chunk_interval="1 day")

    def stamp(pdf, chunk_start):
        # chunk-purity: every ts in the frame routes to chunk_start
        us = pdf["ts"].astype("int64") // 1000 if pdf["ts"].dtype.kind == "M" else pdf["ts"]
        lo = int(us.min())
        hi = int(us.max())
        assert chunk_start <= lo and hi < chunk_start + 86_400_000_000
        pdf = pdf.copy()
        pdf["value"] = float(chunk_start)
        return pdf

    ht.create_trigger("stamp", stamp, when="before_row", chunk_scoped=True)
    ht.insert(_batch(spark, n=72))  # 3 day-chunks
    rows = ht.df().select("ts", "value").collect()
    assert len(rows) == 72
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        assert r["value"] == float(us - (us % DAY))


def test_after_row_observer_fires_per_batch(ts, spark, tmp_path):
    """AFTER INSERT ROW observer: return value ignored, rows unchanged;
    fires once per written batch (recorded via worker-side files)."""
    sink = str(tmp_path / "obs")
    os.makedirs(sink, exist_ok=True)
    ht = ts.create_hypertable("t_after", "ts", chunk_interval="1 day")

    def observe(pdf):
        import uuid

        with open(os.path.join(sink, uuid.uuid4().hex), "w") as f:
            f.write(str(len(pdf)))
        # mutations must be IGNORED
        pdf["value"] = -1.0

    ht.create_trigger("obs", observe, when="after_row")
    ht.insert(_batch(spark, n=24))
    seen = sum(int(open(p).read()) for p in glob.glob(f"{sink}/*"))
    assert seen == 24
    # after_row cannot mutate stored rows
    assert ht.df().filter(F.col("value") < 0).count() == 0


def test_update_row_trigger_sees_new_rows(ts, spark):
    """BEFORE UPDATE ROW: trigger sees post-assignment NEW rows and may
    modify them; untouched rows bypass the Python pass."""
    ht = ts.create_hypertable("t_upd", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=6))

    def audit(pdf):
        pdf = pdf.copy()
        pdf["value"] = pdf["value"] + 0.25  # stacks on the assignment
        return pdf

    ht.create_trigger("audit", audit, when="before_row", ops=("update",))
    n = ht.update_where({"value": "value * 10"}, "k >= 3")
    assert n == 3
    got = dict(ht.df().select("k", "value").collect())
    assert got[2] == 2.0  # untouched
    assert got[4] == 4.0 * 10 + 0.25


def test_insert_trigger_does_not_fire_on_update(ts, spark):
    ht = ts.create_hypertable("t_gate", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=4))

    def poison(pdf):
        raise RuntimeError("insert trigger fired on update path")

    ht.create_trigger("ins_only", poison, when="before_row", ops=("insert",))
    n = ht.update_where({"value": "value + 1"}, "k = 0")  # must not raise
    assert n == 1


def test_delete_row_trigger_skips_rows(ts, spark):
    """BEFORE DELETE ROW returning a subset: dropped rows SKIP deletion
    (RETURN NULL analog); count reflects actual deletions."""
    ht = ts.create_hypertable("t_del", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=10))

    def protect_even(pdf):
        return pdf[pdf["k"] % 2 == 1]  # only odd rows may die

    ht.create_trigger("protect", protect_even, when="before_row", ops=("delete",))
    n = ht.delete_where("k < 6")
    assert n == 3  # k in {1,3,5}; 0,2,4 protected
    left = sorted(r["k"] for r in ht.df().collect())
    assert left == [0, 2, 4, 6, 7, 8, 9]


def test_delete_row_trigger_chunk_scoped(ts, spark):
    """Chunk-scoped DELETE trigger groups doomed rows by their STORED
    chunk; protecting one chunk's rows leaves that chunk intact."""
    ht = ts.create_hypertable("t_delc", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=48))  # 2 day-chunks

    def keep_first_day(pdf, chunk_start):
        if chunk_start == T0:
            return pdf.iloc[0:0]  # nothing from day 0 may be deleted
        return pdf

    ht.create_trigger(
        "keep0", keep_first_day, when="before_row", ops=("delete",),
        chunk_scoped=True,
    )
    n = ht.delete_where("value >= 0")  # tries to delete everything
    assert n == 24
    assert ht.df().count() == 24
    assert ht.df().agg(F.max("ts")).collect()[0][0].day == 1


def test_after_statement_fires_for_update_and_delete(ts, spark):
    ht = ts.create_hypertable("t_stmt", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=6))
    events = []
    ht.create_trigger(
        "log", lambda h, st: events.append(st["op"]),
        when="after", ops=("update", "delete"),
    )
    ht.update_where({"value": "value + 1"}, "k = 1")
    ht.delete_where("k = 2")
    assert events == ["update", "delete"]


def test_trigger_validation(ts):
    ht = ts.create_hypertable("t_val", "ts", chunk_interval="1 day")
    with pytest.raises(ValueError, match="unknown trigger ops"):
        ht.create_trigger("x", lambda p: p, when="before_row", ops=("truncate",))
    with pytest.raises(ValueError, match="row-level"):
        ht.create_trigger("y", lambda p: p, when="before", chunk_scoped=True)
