"""Row-level BEFORE-trigger semantics (reference ``test/sql/triggers.sql``
insert-trigger cases): a BEFORE ROW trigger may modify NEW and may skip a
row by not returning it. Vectorized contract — the trigger body sees
Arrow-batched pandas frames via ``mapInPandas`` but its semantics are
per-row."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0_US = 1704067200000000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _batch(spark, n=48):
    return spark.range(n).select(
        F.timestamp_micros(
            (F.lit(T0_US) + F.col("id") * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("value"),
    )


def test_before_row_modifies_new(ts, spark):
    """triggers.sql: BEFORE INSERT .. SET NEW.value = NEW.value * 2."""
    ht = ts.create_hypertable("t_mod", "ts", chunk_interval="1 day")

    def double_value(pdf):
        pdf = pdf.copy()
        pdf["value"] = pdf["value"] * 2.0
        return pdf

    ht.create_trigger("double", double_value, when="before_row")
    ht.insert(_batch(spark))
    got = dict(ht.df().select("k", "value").collect())
    assert got[10] == 20.0 and got[47] == 94.0


def test_before_row_skips_rows(ts, spark):
    """triggers.sql: BEFORE INSERT .. RETURN NULL skips the tuple; here
    the trigger body drops the row from the batch."""
    ht = ts.create_hypertable("t_skip", "ts", chunk_interval="1 day")
    ht.create_trigger(
        "only_even", lambda pdf: pdf[pdf["k"] % 2 == 0], when="before_row"
    )
    stats = ht.insert(_batch(spark))
    assert stats["rows"] == 24
    assert ht.df().filter(F.col("k") % 2 == 1).count() == 0


def test_triggers_fire_in_name_order(ts, spark):
    """PostgreSQL fires same-event triggers alphabetically
    (src/backend/commands/trigger.c); order is observable when one
    trigger's effect feeds the next."""
    ht = ts.create_hypertable("t_ord", "ts", chunk_interval="1 day")

    def add_ten(pdf):
        pdf = pdf.copy()
        pdf["value"] = pdf["value"] + 10.0
        return pdf

    def double(pdf):
        pdf = pdf.copy()
        pdf["value"] = pdf["value"] * 2.0
        return pdf

    # registration order is double-then-add, but name order must win:
    # a_add_ten runs first, b_double second -> (v + 10) * 2
    ht.create_trigger("b_double", double, when="before_row")
    ht.create_trigger("a_add_ten", add_ten, when="before_row")
    ht.insert(_batch(spark, n=4))
    got = dict(ht.df().select("k", "value").collect())
    assert got[3] == (3.0 + 10.0) * 2.0


def test_row_and_batch_triggers_compose(ts, spark):
    """Batch (BEFORE STATEMENT analog) and row triggers interleave in
    name order; the fused row pass must respect schema stability."""
    ht = ts.create_hypertable("t_mix", "ts", chunk_interval="1 day")
    ht.create_trigger(
        "a_clamp",
        lambda df: df.withColumn("value", F.least("value", F.lit(30.0))),
        when="before",
    )

    def drop_small(pdf):
        return pdf[pdf["value"] >= 5.0]

    ht.create_trigger("b_drop_small", drop_small, when="before_row")
    stats = ht.insert(_batch(spark))
    # clamp first (batch), then row filter: rows 0..4 dropped
    assert stats["rows"] == 43
    mx = ht.df().agg(F.max("value")).collect()[0][0]
    assert mx == 30.0


def test_before_row_fires_on_upsert(ts, spark):
    ht = ts.create_hypertable("t_up", "ts", chunk_interval="1 day")

    def tag(pdf):
        pdf = pdf.copy()
        pdf["value"] = pdf["value"] + 0.5
        return pdf

    ht.create_trigger("tag", tag, when="before_row")
    ht.insert(_batch(spark, n=4))
    ht.upsert(_batch(spark, n=4), keys=["k"])
    got = dict(ht.df().select("k", "value").collect())
    assert got[2] == 2.5  # trigger applied on the upsert path too
    assert ht.df().count() == 4


def test_invalid_when_rejected(ts):
    ht = ts.create_hypertable("t_bad", "ts", chunk_interval="1 day")
    with pytest.raises(ValueError):
        ht.create_trigger("x", lambda pdf: pdf, when="instead_of")


def test_before_trigger_fires_once_with_after_row(ts, spark, tmp_path):
    """Registering an AFTER ROW observer must not re-execute the
    BEFORE-row pass (the after pass reads the pinned post-before frame,
    not a re-run of the upstream DAG): a side-effecting before trigger
    observes each row exactly once."""
    import glob
    import os

    sink = str(tmp_path / "before_fired")
    os.makedirs(sink, exist_ok=True)
    ht = ts.create_hypertable("t_once", "ts", chunk_interval="1 day")

    def before(pdf, _sink=sink):
        import uuid

        with open(os.path.join(_sink, uuid.uuid4().hex), "w") as f:
            f.write(str(len(pdf)))
        return pdf

    ht.create_trigger("count_before", before, when="before_row")
    ht.create_trigger("noop_after", lambda pdf: None, when="after_row")
    ht.insert(_batch(spark, n=24))
    fired = sum(int(open(p).read()) for p in glob.glob(f"{sink}/*"))
    assert fired == 24
