"""Ordered-append analog: time-ordered hypertable reads with no global
sort (src/planner/expand_hypertable.c:1024, should_chunk_append
src/planner/planner.c:1018, golden test/sql/plan_ordered_append.sql).

The plan contract: catalog-ordered per-chunk local sorts unioned in time
order — ZERO Exchange nodes, every Sort node non-global — so "stream me
the range in order" never pays a range-partition shuffle.
"""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.plans.inspect import _plan, scanned_paths, shuffle_count
from timescaledb_spark.session import TSSession
from timescaledb_spark.sources import load_table


@pytest.fixture(scope="module")
def ts(spark, tmp_path_factory, sf_dir):
    s = TSSession(spark, str(tmp_path_factory.mktemp("ts_ordered")))
    ht = s.create_hypertable("events", "ts", chunk_interval="3 days")
    ht.insert(load_table(spark, sf_dir, "events"))
    return s


def _assert_no_global_sort_no_exchange(df):
    assert shuffle_count(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Sort nodes render "Sort [expr ASC ...], <global>, 0" — every one
    # must be local (global=false)
    for line in plan.splitlines():
        if "Sort [" in line:
            assert "], false," in line, f"global sort leaked: {line}"


def test_asc_ordering_full_table(ts):
    ht = ts.get_hypertable("events")
    df = ht.read_ordered()
    _assert_no_global_sort_no_exchange(df)
    rows = df.collect()
    assert len(rows) == ht.df().count()
    tss = [r["ts"] for r in rows]
    assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))


def test_desc_and_bounds(ts):
    ht = ts.get_hypertable("events")
    df = ht.read_ordered(start="2024-01-05", end="2024-01-25", desc=True)
    _assert_no_global_sort_no_exchange(df)
    # pruning: fewer chunk dirs listed than the full scan
    assert scanned_paths(df) < scanned_paths(ht.df())
    rows = df.collect()
    assert len(rows) == ht.read(start="2024-01-05", end="2024-01-25").count()
    tss = [r["ts"] for r in rows]
    assert all(tss[i] >= tss[i + 1] for i in range(len(tss) - 1))


def test_plan_cap_batching_keeps_order(ts):
    ht = ts.get_hypertable("events")
    df = ht.read_ordered(plan_cap=3)  # forces multi-chunk scan groups
    _assert_no_global_sort_no_exchange(df)
    tss = [r["ts"] for r in df.collect()]
    assert len(tss) == ht.df().count()
    assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))


def test_column_projection_reaches_scan(ts):
    from timescaledb_spark.plans.inspect import read_schema_columns

    ht = ts.get_hypertable("events")
    df = ht.read_ordered(columns=["ts", "event_id"])
    assert df.columns == ["ts", "event_id"]
    assert set(read_schema_columns(df)) == {"ts", "event_id"}


def test_overlapping_chunks_fall_back_to_global_sort(spark, sf_dir, tmp_path):
    """attach/merge of a foreign-range dir can break disjointness; the
    ordered read must then fall back to a correct global sort (the
    reference likewise drops ordered append on overlapping constraints)."""
    s = TSSession(spark, str(tmp_path / "ts_ov"))
    ht = s.create_hypertable("events", "ts", chunk_interval="7 days")
    ht.insert(load_table(spark, sf_dir, "events"))
    chunks = ht.chunks()
    assert len(chunks) >= 2
    # widen the first chunk's recorded range past its neighbor's start —
    # catalog overlap with unchanged (still-disjoint) data
    s.catalog.chunk.update(
        {"id": chunks[0]["id"]},
        {"range_end": chunks[1]["range_start"] + 1},
    )
    df = ht.read_ordered()
    tss = [r["ts"] for r in df.collect()]
    assert len(tss) == ht.df().count()
    assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))
    assert shuffle_count(df) >= 1  # the defensive global sort path


def test_added_column_fill_visible_in_ordered_read(spark, sf_dir, tmp_path):
    s = TSSession(spark, str(tmp_path / "ts_fill"))
    ht = s.create_hypertable("events", "ts", chunk_interval="7 days")
    ht.insert(load_table(spark, sf_dir, "events"))
    ht.add_column("grade", "string", default="ok")
    df = ht.read_ordered(plan_cap=2)  # batched groups exercise _apply_fills
    assert df.filter(F.col("grade") != "ok").count() == 0
    assert df.count() == ht.df().count()


def test_sql_order_by_time_routes_to_ordered_scan(ts):
    df = ts.sql("SELECT * FROM events ORDER BY ts")
    _assert_no_global_sort_no_exchange(df)
    tss = [r["ts"] for r in df.collect()]
    assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))


def test_sql_ordered_scan_reapplies_where_verbatim(ts):
    df = ts.sql(
        "SELECT ts, event_id FROM events e "
        "WHERE e.ts >= TIMESTAMP '2024-01-10' AND e.value > 100 "
        "ORDER BY e.ts DESC"
    )
    _assert_no_global_sort_no_exchange(df)
    want = ts.sql(
        "SELECT count(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-10' AND value > 100"
    ).first()["n"]
    rows = df.collect()
    assert len(rows) == want
    tss = [r["ts"] for r in rows]
    assert all(tss[i] >= tss[i + 1] for i in range(len(tss) - 1))


def test_sql_non_matching_shapes_take_normal_path(ts):
    # LIMIT plans as TakeOrderedAndProject (already optimal)
    plan = _plan(ts.sql("SELECT * FROM events ORDER BY ts LIMIT 5"))
    assert "TakeOrderedAndProject" in plan
    # ORDER BY a non-time column needs the real global sort
    df = ts.sql("SELECT * FROM events ORDER BY value")
    assert shuffle_count(df) >= 1
    assert df.count() == ts.get_hypertable("events").df().count()
    # aggregates never match the ordered-scan shape
    n = ts.sql(
        "SELECT event_type, count(*) AS n FROM events "
        "GROUP BY event_type ORDER BY event_type"
    ).count()
    assert n > 0


def test_ordered_scan_space_partitioned(spark, sf_dir, tmp_path):
    """Space-partitioned hypertables nest _space=k dirs inside each
    chunk; the ordered read must still produce one sorted stream with
    no exchange (space subdirs collapse into the per-group sort)."""
    s = TSSession(spark, str(tmp_path / "ts_ord_space"))
    ht = s.create_hypertable("events", "ts", chunk_interval="7 days")
    ht.add_dimension("user_id", num_partitions=4)
    ht.insert(load_table(spark, sf_dir, "events"))
    df = ht.read_ordered()
    _assert_no_global_sort_no_exchange(df)
    rows = df.collect()
    assert len(rows) == ht.df().count()
    tss = [r["ts"] for r in rows]
    assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))
    assert "_space" not in df.columns and "_chunk" not in df.columns


def test_sql_ordered_scan_literal_with_qualifier_lookalike(ts):
    """Review fix (r9): the qualifier strip must not rewrite the inside
    of string literals — 'error' prefixed with the alias name pattern
    must survive verbatim."""
    # event_type values include 'error'; build a predicate whose literal
    # contains "<alias>." text
    want = ts.sql(
        "SELECT count(*) AS n FROM events WHERE event_type = 'error'"
    ).first()["n"]
    assert want > 0
    rows = ts.sql(
        "SELECT * FROM events e WHERE e.event_type = 'error' ORDER BY e.ts"
    ).collect()
    assert len(rows) == want
    # literal containing the alias-dot pattern is preserved, not mangled
    # into a different (non-matching) string
    n2 = ts.sql(
        "SELECT * FROM events e WHERE e.event_type != 'e. g. x' "
        "ORDER BY e.ts"
    ).count()
    assert n2 == ts.get_hypertable("events").df().count()


def test_sql_column_named_like_table_keeps_pruning(ts):
    """Review fix (r9): a select-list comma before a column spelled like
    the table name must not count as a self-join reference (which would
    silently disable chunk pruning)."""
    from timescaledb_spark.plans.inspect import scanned_paths

    df = ts.sql(
        "SELECT ts, events.value FROM events "
        "WHERE events.ts >= TIMESTAMP '2024-01-25'"
    )
    assert scanned_paths(df) < scanned_paths(
        ts.sql("SELECT count(*) FROM events")
    )


def test_explain_ordered_scan_shows_union_no_range_sort(ts):
    """Review fix (r9): EXPLAIN must report the plan ts.sql actually
    executes — the ordered route's union of local sorts, not a
    range-partition global sort."""
    lines = [
        r["plan_line"]
        for r in ts.sql("EXPLAIN SELECT * FROM events ORDER BY ts").collect()
    ]
    assert not any("rangepartitioning" in l for l in lines)
    assert any(l.strip().startswith("Union") for l in lines)


# ---------------------------------------------------------------------------
# Arrow merge-append engine (round 10): the many-chunk path. Forced via
# engine="arrow" at test scale; every property must match the JVM union
# engine bit-for-bit since auto-selection switches silently at >128
# groups.
# ---------------------------------------------------------------------------


def _rows_key(rows):
    return [tuple(r) for r in rows]


def test_arrow_engine_matches_jvm_full_table(ts):
    ht = ts.get_hypertable("events")
    jvm = ht.read_ordered(engine="jvm").collect()
    arrow = ht.read_ordered(engine="arrow").collect()
    assert ht.last_ordered_plan_info["engine"] == "arrow"
    tss = [r["ts"] for r in arrow]
    assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))
    # same multiset of rows; order may differ only within equal
    # timestamps (tie order is unspecified in both engines)
    assert sorted(_rows_key(jvm)) == sorted(_rows_key(arrow))


def test_arrow_engine_zero_exchange(ts):
    ht = ts.get_hypertable("events")
    df = ht.read_ordered(engine="arrow")
    assert shuffle_count(df) == 0


def test_arrow_engine_bounds_and_desc(ts):
    ht = ts.get_hypertable("events")
    df = ht.read_ordered(
        start="2024-01-05", end="2024-01-25", desc=True, engine="arrow"
    )
    rows = df.collect()
    assert len(rows) == ht.read(start="2024-01-05", end="2024-01-25").count()
    tss = [r["ts"] for r in rows]
    assert all(tss[i] >= tss[i + 1] for i in range(len(tss) - 1))


def test_arrow_engine_without_schema_ddl(ts):
    """Round 11 (r10 VERDICT wrong #3): a hypertable with no recorded
    schema_ddl (raw directory adoption / pre-DDL-recording catalogs)
    still gets the O(1)-plan Arrow engine — the schema comes from one
    pyarrow footer read, never a per-chunk Spark inference."""
    ht = ts.get_hypertable("events")
    want = ht.read_ordered(engine="arrow").collect()
    saved = ht.row.get("schema_ddl")
    assert saved is not None
    try:
        ht.ts.catalog.hypertable.update(
            {"id": ht.id}, {"schema_ddl": None}
        )
        ht.row["schema_ddl"] = None
        got = ht.read_ordered(engine="arrow").collect()
        assert ht.last_ordered_plan_info["engine"] == "arrow"
        tss = [r["ts"] for r in got]
        assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))
        assert sorted(_rows_key(got)) == sorted(_rows_key(want))
    finally:
        ht.ts.catalog.hypertable.update(
            {"id": ht.id}, {"schema_ddl": saved}
        )
        ht.row["schema_ddl"] = saved


def test_arrow_engine_column_projection(ts):
    ht = ts.get_hypertable("events")
    df = ht.read_ordered(columns=["event_id", "value"], engine="arrow")
    assert df.columns == ["event_id", "value"]
    assert df.count() == ht.df().count()
    # projection that EXCLUDES the time column still sorts by it
    full = ht.read_ordered(columns=["ts", "event_id"], engine="arrow").collect()
    tss = [r["ts"] for r in full]
    assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))


def test_arrow_engine_added_column_fill(spark, sf_dir, tmp_path):
    s = TSSession(spark, str(tmp_path / "ts_arrow_fill"))
    ht = s.create_hypertable("events", "ts", chunk_interval="7 days")
    ev = load_table(spark, sf_dir, "events")
    ht.insert(ev.filter(F.col("event_id") % 2 == 0))
    ht.add_column("grade", "string", default="ok")
    ht.insert(
        ev.filter(F.col("event_id") % 2 == 1).withColumn(
            "grade", F.lit("new")
        )
    )
    df = ht.read_ordered(engine="arrow")
    got = {r["grade"] for r in df.select("grade").distinct().collect()}
    assert got == {"ok", "new"}
    assert df.count() == ht.df().count()


def test_arrow_engine_space_partitioned(spark, sf_dir, tmp_path):
    s = TSSession(spark, str(tmp_path / "ts_arrow_space"))
    ht = s.create_hypertable("events", "ts", chunk_interval="7 days")
    ht.add_dimension("user_id", num_partitions=4)
    ht.insert(load_table(spark, sf_dir, "events"))
    df = ht.read_ordered(engine="arrow")
    rows = df.collect()
    assert len(rows) == ht.df().count()
    tss = [r["ts"] for r in rows]
    assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))


def test_row_budget_splits_groups(ts):
    """rows_per_group caps a single task's sort: with catalog stats
    populated, a tiny budget must split the fixed-width groups."""
    ht = ts.get_hypertable("events")
    ht.approximate_row_count()  # populate n_rows stats
    ht.read_ordered(plan_cap=2)  # width-2 target → huge groups
    wide = ht.last_ordered_plan_info
    ht.read_ordered(plan_cap=2, rows_per_group=100)
    tight = ht.last_ordered_plan_info
    assert tight["groups"] > wide["groups"]
    assert tight["max_rows_per_group_est"] is not None
    assert (
        tight["max_rows_per_group_est"] <= wide["max_rows_per_group_est"]
    )
    # order still holds through row-split groups
    tss = [
        r["ts"]
        for r in ht.read_ordered(plan_cap=2, rows_per_group=100).collect()
    ]
    assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))


def test_arrow_engine_over_compressed_chunks(spark, sf_dir, tmp_path):
    """compress_chunk rewrites chunk dirs as sorted parquet; the arrow
    merge-append engine must read columnstore chunks identically."""
    from timescaledb_spark.compression import (
        compress_chunks,
        enable_columnstore,
    )

    s = TSSession(spark, str(tmp_path / "ts_arrow_cmp"))
    ht = s.create_hypertable("events", "ts", chunk_interval="7 days")
    ht.insert(load_table(spark, sf_dir, "events"))
    enable_columnstore(
        ht, segmentby=["event_type"], orderby=[("ts", "asc")]
    )
    compress_chunks(ht)
    jvm = ht.read_ordered(engine="jvm").collect()
    arrow = ht.read_ordered(engine="arrow").collect()
    tss = [r["ts"] for r in arrow]
    assert all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))
    assert sorted(_rows_key(jvm)) == sorted(_rows_key(arrow))


def test_arrow_engine_integer_time_dimension(spark, tmp_path):
    """Integer open dimension: internal units are the raw ints; the
    arrow worker's bound filter and sort must agree with the JVM path."""
    s = TSSession(spark, str(tmp_path / "ts_arrow_int"))
    ht = s.create_hypertable("m", "t", chunk_interval=1000)
    df = spark.range(0, 10_000, 3).select(
        F.col("id").alias("t"), (F.col("id") % 7).alias("v")
    )
    ht.insert(df)
    jvm = ht.read_ordered(start=2500, end=7500, engine="jvm").collect()
    arrow = ht.read_ordered(start=2500, end=7500, engine="arrow").collect()
    assert [r["t"] for r in arrow] == sorted(r["t"] for r in arrow)
    assert sorted(_rows_key(jvm)) == sorted(_rows_key(arrow))
    assert all(2500 <= r["t"] < 7500 for r in arrow)


def test_arrow_engine_unknown_column_raises(ts):
    ht = ts.get_hypertable("events")
    with pytest.raises(ValueError, match="unknown column"):
        ht.read_ordered(columns=["nope"], engine="arrow")


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_T0 = 1704067200000000


@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(50, 400),
    interval_h=st.sampled_from([1, 3, 24]),
    desc=st.booleans(),
    lo_h=st.one_of(st.none(), st.integers(0, 48)),
    span_h=st.integers(1, 72),
    cap=st.sampled_from([2, 5, 512]),
    budget=st.sampled_from([10, 1000, None]),
)
def test_arrow_jvm_engines_agree_property(
    spark, tmp_path_factory, n, interval_h, desc, lo_h, span_h, cap, budget
):
    """Property: for random data spreads, chunk widths, bounds, widths
    and row budgets, the arrow merge-append engine and the JVM scan
    union return the same multiset of rows in correct time order."""
    import uuid as _uuid

    s = TSSession(
        spark, str(tmp_path_factory.mktemp(f"ts_prop_{_uuid.uuid4().hex[:6]}"))
    )
    ht = s.create_hypertable(
        "p", "ts", chunk_interval=f"{interval_h} hours"
    )
    df = spark.range(n).select(
        F.timestamp_micros(
            (
                F.lit(_T0)
                + (F.col("id") * 977) % (96 * 3600) * 1_000_000
            ).cast("long")
        ).alias("ts"),
        (F.col("id") % 13).alias("k"),
    )
    ht.insert(df)
    ht.approximate_row_count()
    start = None if lo_h is None else _T0 + lo_h * 3600 * 1_000_000
    end = None if lo_h is None else start + span_h * 3600 * 1_000_000
    kw = dict(
        start=start, end=end, desc=desc, plan_cap=cap, rows_per_group=budget
    )
    jvm = ht.read_ordered(engine="jvm", **kw).collect()
    arrow = ht.read_ordered(engine="arrow", **kw).collect()
    tss = [r["ts"] for r in arrow]
    ordered = (
        all(tss[i] >= tss[i + 1] for i in range(len(tss) - 1))
        if desc
        else all(tss[i] <= tss[i + 1] for i in range(len(tss) - 1))
    )
    assert ordered
    assert sorted(_rows_key(jvm)) == sorted(_rows_key(arrow))
