"""Sequence packing + context-window chunking (pipeline/packing.py):
closed-form fixtures where bin assignments are hand-checkable."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.packing import pack_sequences, window_text


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pack_sequential_fill(spark):
    # token counts: 3, 4, 2, 5 with budget 6
    texts = ["a b c", "a b c d", "a b", "a b c d e"]
    got = {
        r["doc_id"]: (r["n_tok"], r["seq_id"], r["offset_in_seq"])
        for r in pack_sequences(_docs(spark, texts), budget_tokens=6).collect()
    }
    # starts: 0, 3, 7, 9 -> seqs 0, 0, 1, 1
    assert got[0] == (3, 0, 0)
    assert got[1] == (4, 0, 3)
    assert got[2] == (2, 1, 1)
    assert got[3] == (5, 1, 3)


def test_pack_doc_longer_than_budget(spark):
    texts = ["a b c d e f g h", "x"]  # 8 tokens then 1
    got = {
        r["doc_id"]: (r["seq_id"], r["offset_in_seq"])
        for r in pack_sequences(_docs(spark, texts), budget_tokens=4).collect()
    }
    assert got[0] == (0, 0)   # long doc starts seq 0 (spills into 1)
    assert got[1] == (2, 0)   # next doc starts at offset 8 -> seq 2


def test_pack_sharded_independent(spark):
    df = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "de", "x y z"), (3, "en", "d e f")],
        "doc_id long, lang string, text string",
    )
    got = {
        (r["lang"], r["doc_id"]): r["seq_id"]
        for r in pack_sequences(df, budget_tokens=4, shard_by=("lang",)).collect()
    }
    # each shard packs from offset 0 independently
    assert got[("en", 1)] == 0 and got[("de", 2)] == 0
    assert got[("en", 3)] == 0  # en offset 3 < 4


def test_window_text_overlap_and_tail(spark):
    df = _docs(spark, ["abcdefghij"])  # 10 chars, width 4, stride 3
    rows = sorted(
        (r["win_idx"], r["win_text"])
        for r in window_text(df, width=4, stride=3).collect()
    )
    assert rows == [(0, "abcd"), (1, "defg"), (2, "ghij")]


def test_window_text_short_doc_single_window(spark):
    df = _docs(spark, ["ab"])
    rows = window_text(df, width=4, stride=3).collect()
    assert len(rows) == 1 and rows[0]["win_text"] == "ab"


def test_window_text_validation(spark):
    with pytest.raises(ValueError):
        window_text(_docs(spark, ["x"]), width=4, stride=5)
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, ["x"]), budget_tokens=0)
