"""BPE pair counting (pipeline/bpe.py) + int8 embedding quantization
(pipeline/similarity.py) — round 15."""

import duckdb
import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.bpe import (
    EOW,
    bpe_pair_counts,
    bpe_pair_counts_sql,
    word_freq,
)
from timescaledb_spark.pipeline.similarity import (
    dequantize_cosine_topk,
    quantize_embeddings,
)
from timescaledb_spark.sources import load_table


def test_bpe_pair_counts_hand_case(spark):
    # classic BPE example: {"low": 2, "lower": 1}
    df = spark.createDataFrame(
        [(1, "low low lower")], "doc_id bigint, text string"
    )
    wf = {r["word"]: r["freq"] for r in word_freq(df).collect()}
    assert wf == {"low": 2, "lower": 1}
    got = {
        (r["left_sym"], r["right_sym"]): r["pair_count"]
        for r in bpe_pair_counts(df).collect()
    }
    # l-o and o-w appear in every word occurrence (3); w-EOW only in low
    assert got[("l", "o")] == 3
    assert got[("o", "w")] == 3
    assert got[("w", EOW)] == 2
    assert got[("w", "e")] == 1
    assert got[("e", "r")] == 1
    assert got[("r", EOW)] == 1


def test_bpe_matches_duckdb_and_topk_order(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = [tuple(r) for r in bpe_pair_counts(docs, top_k=25).collect()]
    want = duck.execute(bpe_pair_counts_sql(top_k=25)).fetchall()
    assert set(got) == set(want)
    # the returned order IS the deterministic merge order
    assert got == sorted(got, key=lambda t: (-t[2], t[0], t[1]))


def test_quantize_reconstruction_error_bounded(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    joined = q.join(emb, "vec_id").select(
        "vec_id",
        F.aggregate(
            F.zip_with(
                F.transform(
                    "codes",
                    lambda c: F.col("vmin") + c.cast("double") * F.col("scale"),
                ),
                F.transform("embedding", lambda x: x.cast("double")),
                lambda a, b: F.abs(a - b),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
        (F.col("scale") / F.lit(2.0)).alias("half_step"),
    )
    bad = joined.filter(
        F.col("max_err") > F.col("half_step") + F.lit(1e-12)
    ).count()
    assert bad == 0  # error bounded by half a quantization step


def test_quantize_constant_vector(spark):
    df = spark.createDataFrame(
        [(1, [2.0, 2.0, 2.0]), (2, [0.0, 255.0, 127.5])],
        "vec_id bigint, embedding array<float>",
    )
    got = {r["vec_id"]: r.asDict() for r in quantize_embeddings(df).collect()}
    assert got[1]["scale"] == 0.0 and got[1]["codes"] == [0, 0, 0]
    assert got[2]["codes"] == [0, 255, 128]  # half-up rounding


def test_dequantized_topk_recall(spark, sf_dir):
    from timescaledb_spark.pipeline.core import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    qarr = F.array(*[F.lit(float(x)) for x in qv])
    exact = [
        r["vec_id"]
        for r in emb.select(
            "vec_id", cosine(F.col("embedding"), qarr).alias("cs")
        )
        .orderBy(F.desc("cs"), F.asc("vec_id"))
        .limit(10)
        .collect()
    ]
    approx = [
        r["vec_id"] for r in dequantize_cosine_topk(emb, qv, k=10).collect()
    ]
    # int8 codes must preserve the neighborhood: >= 8/10 recall and the
    # identical top hit (the query vector itself)
    assert approx[0] == exact[0] == 0
    assert len(set(exact) & set(approx)) >= 8


def test_gates_match_oracle(spark, duck, sf_dir):
    from timescaledb_spark import queries as Q

    qs, oracles = Q.queries(), Q.oracle_sql()
    for name in ("q_bpe_pairs", "q_quantize_embeddings"):
        df = qs[name](spark, sf_dir)
        cols = sorted(df.columns)
        got = {
            tuple(
                round(v, 10) if isinstance(v, float) else v
                for v in (r[c] for c in cols)
            )
            for r in df.collect()
        }
        res = duck.execute(oracles[name])
        names = [d[0] for d in res.description]
        want = {
            tuple(
                round(d[c], 10) if isinstance(d[c], float) else d[c]
                for c in cols
            )
            for d in (dict(zip(names, row)) for row in res.fetchall())
        }
        assert got == want and got, name
