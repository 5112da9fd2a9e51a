"""pack_token_ids (pipeline/packing.py): exact concat-and-chunk of
encoded id streams — boundary-spanning docs, docs larger than the
budget, empty docs, shard isolation, vs a pure-Python model."""

from pyspark.sql import functions as F

from timescaledb_spark.pipeline.packing import pack_token_ids


def _model(docs, budget):
    stream, bounds = [], []
    for _id, ids in sorted(docs):
        if ids:
            bounds.append((_id, len(stream), len(stream) + len(ids)))
            stream.extend(ids)
    out = {}
    for s in range((len(stream) + budget - 1) // budget):
        ids = stream[s * budget : (s + 1) * budget]
        n_docs = sum(
            1 for _, a, b in bounds if a < (s + 1) * budget and b > s * budget
        )
        out[s] = (n_docs, len(ids), ids)
    return out


def _check(spark, docs, budget):
    df = spark.createDataFrame(
        docs, "doc_id bigint, piece_ids array<int>"
    )
    got = {
        r["seq_id"]: (r["n_docs"], r["n_tok"], r["ids"])
        for r in pack_token_ids(df, budget=budget).collect()
    }
    assert got == _model(docs, budget)


def test_exact_chunk_boundaries(spark):
    _check(
        spark,
        [(1, [1, 2, 3]), (2, [4, 5]), (3, [6, 7, 8, 9])],
        budget=4,
    )


def test_doc_larger_than_budget_spans_many(spark):
    _check(spark, [(1, list(range(23))), (2, [100, 101])], budget=5)


def test_empty_docs_dropped(spark):
    _check(spark, [(1, []), (2, [1]), (3, [])], budget=4)


def test_budget_aligned_stream(spark):
    _check(spark, [(1, [1, 2]), (2, [3, 4]), (3, [5, 6, 7, 8])], budget=4)


def test_sharded_packing_is_per_shard(spark):
    df = spark.createDataFrame(
        [("en", 1, [1, 2, 3]), ("en", 2, [4, 5]), ("de", 1, [9, 9, 9, 9, 9])],
        "lang string, doc_id bigint, piece_ids array<int>",
    )
    rows = pack_token_ids(df, budget=4, shard_by=["lang"]).collect()
    by = {(r["lang"], r["seq_id"]): r["ids"] for r in rows}
    assert by[("en", 0)] == [1, 2, 3, 4]
    assert by[("en", 1)] == [5]
    assert by[("de", 0)] == [9, 9, 9, 9]
    assert by[("de", 1)] == [9]


def test_total_conservation(spark, sf_dir):
    """Every input token appears exactly once across sequences, in
    stream order, on the real corpus encode."""
    from timescaledb_spark.pipeline.unigram import unigram_encode
    from timescaledb_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    enc = unigram_encode(docs, top_multi=32).localCheckpoint(eager=False)
    packed = pack_token_ids(enc, budget=64)
    tot_in = enc.agg(F.sum("n_subtok")).collect()[0][0]
    agg = packed.agg(
        F.sum("n_tok").alias("t"),
        F.sum(F.when(F.col("n_tok") < 64, 1).otherwise(0)).alias("short"),
    ).collect()[0]
    assert agg["t"] == tot_in
    assert agg["short"] <= 1  # only the final partial sequence is short
