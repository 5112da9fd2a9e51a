"""Corpus data card — pipeline/textproc.py corpus_card (round 16)."""

from timescaledb_spark.pipeline.textproc import (
    corpus_card,
    corpus_card_sql,
)
from timescaledb_spark.sources import load_table


def test_corpus_card_matches_duckdb_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    got = corpus_card(docs, min_required_stops=1).toPandas()
    want = duck.execute(corpus_card_sql(min_required_stops=1)).df()
    cols = sorted(got.columns)
    got = got[cols].sort_values(["lang", "source"]).reset_index(drop=True)
    want = want[cols].sort_values(["lang", "source"]).reset_index(drop=True)
    for c in cols:
        assert (got[c].values == want[c].values).all(), c


def test_corpus_card_totals(spark, sf_dir):
    """Slice sums reconcile with the corpus; fractions in range."""
    docs = load_table(spark, sf_dir, "documents")
    card = corpus_card(docs).toPandas()
    assert card["n_docs"].sum() == docs.count()
    assert (card["n_distinct"] <= card["n_docs"]).all()
    for c in ("dup_frac", "avg_quality", "gopher_pass_frac"):
        assert ((card[c] >= 0.0) & (card[c] <= 1.0)).all(), c


def test_corpus_card_counts_duplicates(spark):
    """An injected exact duplicate shows up in dup_frac."""
    docs = spark.createDataFrame(
        [
            (1, "same text here", "en", "s1"),
            (2, "same text here", "en", "s1"),
            (3, "different text", "en", "s1"),
            (4, "more text", "en", "s2"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    card = {
        (r["lang"], r["source"]): r
        for r in corpus_card(docs).collect()
    }
    assert card[("en", "s1")]["n_docs"] == 3
    assert card[("en", "s1")]["n_distinct"] == 2
    assert abs(card[("en", "s1")]["dup_frac"] - 1 / 3) < 1e-12
    assert card[("en", "s2")]["dup_frac"] == 0.0
