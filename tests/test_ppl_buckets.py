"""CCNet perplexity bucketing — pipeline/quality_lm.py (round 16)."""

from timescaledb_spark.pipeline.quality_lm import (
    ppl_buckets,
    ppl_buckets_sql,
)
from timescaledb_spark.sources import load_table


def test_ppl_buckets_matches_duckdb_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    cols = [
        "doc_id", "lang", "n_grams", "avg_logp", "ppl_tile", "ppl_bucket",
    ]
    got = (
        ppl_buckets(docs)
        .toPandas()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(ppl_buckets_sql())
        .df()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in cols:
        assert (got[c].values == want[c].values).all(), c


def test_ppl_buckets_shape(spark, sf_dir):
    """Per-language terciles are balanced (sizes differ by ≤ 1) and
    ordered: every head doc scores ≥ every tail doc in its language."""
    docs = load_table(spark, sf_dir, "documents")
    res = ppl_buckets(docs).toPandas()
    assert set(res["ppl_bucket"]) <= {"head", "middle", "tail"}
    for lang, grp in res.groupby("lang"):
        sizes = grp["ppl_tile"].value_counts()
        assert sizes.max() - sizes.min() <= 1
        head = grp.loc[grp["ppl_bucket"] == "head", "avg_logp"]
        tail = grp.loc[grp["ppl_bucket"] == "tail", "avg_logp"]
        if len(head) and len(tail):
            assert head.min() >= tail.max()


def test_ppl_cutoffs_matches_duckdb_oracle(spark, sf_dir, duck):
    from timescaledb_spark.pipeline.quality_lm import (
        ppl_bucket_cutoffs,
        ppl_bucket_cutoffs_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "avg_logp", "ppl_bucket"]
    got = (
        ppl_bucket_cutoffs(docs)
        .toPandas()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duck.execute(ppl_bucket_cutoffs_sql())
        .df()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in cols:
        assert (got[c].values == want[c].values).all(), c


def test_ppl_cutoffs_value_semantics(spark, sf_dir):
    """Cutoff labels are a pure function of the score: equal scores →
    equal buckets, and the three buckets are value-ordered."""
    from timescaledb_spark.pipeline.quality_lm import ppl_bucket_cutoffs

    docs = load_table(spark, sf_dir, "documents")
    res = ppl_bucket_cutoffs(docs).toPandas()
    assert set(res["ppl_bucket"]) <= {"head", "middle", "tail"}
    per_score = res.groupby(["lang", "avg_logp"])["ppl_bucket"].nunique()
    assert (per_score == 1).all()
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, grp in res.groupby("lang"):
        g = grp.sort_values("avg_logp", ascending=False)
        ranks = g["ppl_bucket"].map(order)
        assert ranks.is_monotonic_increasing
