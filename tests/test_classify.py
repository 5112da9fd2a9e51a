"""NB classifier quality filter (round 14; pipeline/classify.py).
Corpus-level oracle match lives in the q_nb_classify gate."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.classify import (
    nb_classify,
    nb_scores,
    train_nb,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from timescaledb_spark.sources import load_table

    return load_table(spark, sf_dir, "documents")


def test_model_shape_bounded(spark, docs):
    model = train_nb(docs, vocab_cap=300)
    labels = {r["lang"] for r in docs.select("lang").distinct().collect()}
    rows = model.collect()
    assert len(rows) <= 300 * len(labels)
    # dense: every vocab word appears once per label
    per_word = {}
    for r in rows:
        per_word.setdefault(r["word"], set()).add(r["label"])
    assert all(v == labels for v in per_word.values())
    # smoothing floor is below every stored logp for that label
    for r in rows:
        assert r["logp"] >= r["logp0"]


def test_self_train_separates_constructed_labels(spark):
    """On a corpus whose labels really do have distinct word
    distributions, self-trained NB must recover them (the testdata
    documents' lang column is uncorrelated with the synthetic text, so
    the corpus gate checks cross-engine determinism, not accuracy)."""
    vocab_a = ["stock", "market", "price", "trade", "bond"]
    vocab_b = ["gene", "cell", "protein", "enzyme", "dna"]
    rows = []
    for i in range(200):
        words = [
            (vocab_a if i % 2 == 0 else vocab_b)[(i * 7 + j) % 5]
            for j in range(30)
        ]
        # a little shared noise vocabulary
        words += ["the", "of", "and"]
        rows.append((i, " ".join(words), "fin" if i % 2 == 0 else "bio"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_classify(df, vocab_cap=100)
    joined = out.join(df.select("doc_id", "lang"), "doc_id")
    n = joined.count()
    acc = joined.filter(F.col("pred") == F.col("lang")).count() / n
    assert n == 200 and acc == 1.0, f"accuracy {acc}"


def test_one_row_per_doc(spark, docs):
    out = nb_classify(docs, vocab_cap=2000)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_argmax_margin_robust(spark, docs):
    """The 6dp-rounded argmax must not sit on a float knife-edge: the
    winning label's lead over the runner-up, measured UNROUNDED, must
    exceed float-sum noise by orders of magnitude for every doc."""
    from pyspark.sql import Window

    model = train_nb(docs, vocab_cap=5000)
    base = docs.select("doc_id", "text")
    # replicate nb_scores without the final filter, unrounded
    from timescaledb_spark.pipeline.core import tokens

    ex = base.select(
        "doc_id", F.explode(tokens("text")).alias("word")
    )
    ntok = base.select("doc_id", F.size(tokens("text")).alias("_n"))
    m = (
        ex.join(F.broadcast(model), "word")
        .groupBy("doc_id", "label")
        .agg(F.count(F.lit(1)).alias("_m"), F.sum("logp").alias("_s"))
    )
    lab = model.select("label", "prior", "logp0").distinct()
    sc = (
        ntok.crossJoin(F.broadcast(lab))
        .join(m, ["doc_id", "label"], "left")
        .select(
            "doc_id",
            (
                F.col("prior")
                + F.coalesce(F.col("_s"), F.lit(0.0))
                + (F.col("_n") - F.coalesce("_m", F.lit(0))).cast(
                    "double"
                )
                * F.col("logp0")
            ).alias("raw"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("raw").desc())
    top2 = (
        sc.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 2)
        .groupBy("doc_id")
        .agg((F.max("raw") - F.min("raw")).alias("margin"))
    )
    min_margin = top2.agg(F.min("margin")).collect()[0][0]
    assert min_margin > 1e-3, f"min argmax margin {min_margin}"


def test_deterministic(spark, docs):
    a = sorted(tuple(r) for r in nb_classify(docs, vocab_cap=1000).collect())
    b = sorted(tuple(r) for r in nb_classify(docs, vocab_cap=1000).collect())
    assert a == b
