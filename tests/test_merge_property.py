"""merge_into correctness property: for ANY base table and source batch,
the result equals a simple dict model of MERGE semantics (matched rows
updated/deleted/kept; unmatched source rows inserted or dropped),
regardless of how rows are distributed across chunks.

Keys include the time column (the reference's unique-index rule), so
chunk-local matching is structural and the model is exact.
"""

import tempfile

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0_US = 1704067200000000
HOUR_US = 3_600_000_000

# rows live on hour slots 0..95 over a 1-day-chunk hypertable (4 chunks);
# a row is (slot, value). Keys are (ts,) == slot.
_BASE = st.dictionaries(st.integers(0, 95), st.integers(0, 99), max_size=25)
_SRC = st.dictionaries(st.integers(0, 95), st.integers(100, 199), max_size=25)
_MODE = st.sampled_from(["nothing", "update", "delete", "replace"])
_INSERT_FLAG = st.booleans()


def _df(spark, d):
    rows = [(T0_US + slot * HOUR_US, float(v)) for slot, v in d.items()]
    return spark.createDataFrame(
        rows or [], "us long, v double"
    ).select(F.timestamp_micros("us").alias("ts"), "v")


def _model(base, src, mode, insert_flag):
    out = dict(base)
    for k, v in src.items():
        if k in base:
            if mode == "update":
                out[k] = base[k] + v
            elif mode == "delete":
                del out[k]
            elif mode == "replace":
                out[k] = v
            # nothing: keep base value
        elif insert_flag:
            out[k] = v
    return out


@settings(max_examples=10, deadline=None)
@given(base=_BASE, src=_SRC, mode=_MODE, insert_flag=_INSERT_FLAG)
def test_merge_matches_model(spark, base, src, mode, insert_flag):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_mergeprop_"))
    ht = ts.create_hypertable("p", "ts", chunk_interval="1 day")
    if base:
        ht.insert(_df(spark, base))
    kw = {"insert_not_matched": insert_flag}
    if mode == "update":
        kw["matched_update"] = {"v": "target.v + excluded.v"}
    elif mode == "delete":
        kw["delete_matched"] = True
    elif mode == "replace":
        kw["matched_update"] = {"v": "excluded.v"}
    st_ = ht.merge_into(_df(spark, src), ["ts"], **kw)

    expect = _model(base, src, mode, insert_flag)
    got = {
        (r["us"] - T0_US) // HOUR_US: r["v"]
        for r in ht.df()
        .select(F.unix_micros("ts").alias("us"), "v")
        .collect()
    }
    assert got == {k: float(v) for k, v in expect.items()}

    matched = len(set(base) & set(src))
    assert st_["rows_inserted"] == (
        len(set(src) - set(base)) if insert_flag else 0
    )
    if mode in ("update", "replace"):
        assert st_["rows_updated"] == matched
    if mode == "delete":
        assert st_["rows_deleted"] == matched
