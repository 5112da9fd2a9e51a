"""Trainable LR quality classifier — pipeline/classify.py (round 16).

Three-way agreement: the Spark GD loop, the unrolled DuckDB oracle
chain, and a fully independent pure-Python reference (its own feature
hashing, its own fold) must learn bit-identical weight vectors; the
distilled model must actually track its Gopher teacher."""

import math

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.classify import (
    LR_LEN_SCALE,
    lr_quality,
    lr_quality_sql,
    lr_round,
    lr_scores,
    lr_train,
    lr_train_df,
    lr_train_sql,
)
from timescaledb_spark.sources import load_table

DIM = 64


def ref_features(text, dim=DIM):
    """Independent Python replay of the hashed-trigram design row:
    [bias, saturating length, bucket counts / gram count]."""
    n_grams = max(len(text) - 2, 0)
    counts = [0] * dim
    for i in range(n_grams):
        b = (
            ord(text[i]) * 65536 + ord(text[i + 1]) * 256 + ord(text[i + 2])
        ) % dim
        counts[b] += 1
    n = max(1.0, float(n_grams))
    return [1.0, min(1.0, n / LR_LEN_SCALE)] + [c / n for c in counts]


def ref_train(rows, iters, rate):
    """Pure-Python full-batch GD with the same determinism contract:
    left-to-right dot fold, 1e-6-quantized sigmoid, 1e-9-integer
    gradient sums."""
    d = len(rows[0][1])
    n = len(rows)
    w = [0.0] * d
    for _ in range(iters):
        gs = [0] * d
        for y, xs in rows:
            z = 0.0
            for wj, xj in zip(w, xs):
                z = z + wj * xj
            p = math.floor(1.0e6 / (1.0 + math.exp(-z)) + 0.5) / 1.0e6
            r = p - float(y)
            for j, xj in enumerate(xs):
                gs[j] += int(math.floor(r * xj * 1.0e9 + 0.5))
        w = [w[j] - rate * (gs[j] / (n * 1.0e9)) for j in range(d)]
    return w


def test_lr_train_matches_python_reference(spark, sf_dir):
    """Spark GD under a simple injected label == the independent
    Python implementation, weight for weight (bit-equal after the
    shared 1e-9 rounding)."""
    docs = load_table(spark, sf_dir, "documents")
    label = (F.length("text") > 300).cast("int")
    got = lr_train(docs, iters=4, rate=3.0, label=label)

    rows = [
        (int(len(t) > 300), ref_features(t))
        for (t,) in docs.select("text").collect()
    ]
    want = ref_train(rows, iters=4, rate=3.0)
    assert [lr_round(v) for v in got] == [lr_round(v) for v in want]


def test_lr_train_matches_duckdb_oracle(spark, sf_dir, duck):
    """Full training chain vs the unrolled materialized CTE oracle."""
    docs = load_table(spark, sf_dir, "documents")
    got = (
        lr_train_df(docs, iters=4, min_required_stops=1)
        .toPandas()
        .sort_values("j")["weight"]
        .tolist()
    )
    want = (
        duck.execute(lr_train_sql(iters=4, min_required_stops=1))
        .df()
        .sort_values("j")["weight"]
        .tolist()
    )
    assert got == want


def test_lr_quality_matches_duckdb_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "label_hq", "prob", "pred"]
    got = (
        lr_quality(docs, iters=4, min_required_stops=1)
        .toPandas()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(lr_quality_sql(iters=4, min_required_stops=1))
        .df()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in cols:
        assert (got[c].values == want[c].values).all(), c


def test_lr_distills_teacher(spark, sf_dir):
    """The student must actually learn the teacher signal: accuracy vs
    the Gopher label beats the majority-class baseline at the default
    16 rounds (~0.94 at sf0.01; asserted looser for the tiny
    sf0.001 corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    res = lr_quality(docs, min_required_stops=1).toPandas()
    acc = (res["pred"] == res["label_hq"]).mean()
    base = max(res["label_hq"].mean(), 1 - res["label_hq"].mean())
    assert acc >= 0.75
    assert acc > base or acc == 1.0


def test_lr_scores_projection(spark, sf_dir):
    """Scoring under fixed weights is a pure pass (every doc scored,
    prob in [0, 1], pred consistent with the 0.5 threshold)."""
    docs = load_table(spark, sf_dir, "documents")
    w = [0.5] + [0.0] * 65
    res = lr_scores(docs, w).toPandas()
    assert len(res) == docs.count()
    assert ((res["prob"] >= 0.0) & (res["prob"] <= 1.0)).all()
    assert (
        (res["pred"] == 1) == (res["prob"] >= 0.5)
    ).all()
    # constant features under bias-only weights: one sigmoid everywhere
    assert res["prob"].nunique() == 1
