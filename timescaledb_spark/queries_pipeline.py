"""Pipeline-operator queries for the driver correctness gate.

Each Spark implementation is paired with a DuckDB oracle that replicates
the *full algorithm* (same md5-derived hashes, same banding, same float
fold order) — not just the final answer — so the value-hash comparison
verifies candidate generation and scoring end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .pipeline import dedup, multimodal, similarity, textproc
from .queries import query
from .sources import load_table


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

@query(
    "q_text_stats",
    f"""
    SELECT doc_id,
           {textproc.token_count_sql('text')} AS n_tok,
           {textproc.bpe_token_count_sql('text')} AS n_bpe,
           {textproc.punct_count_sql('text')} AS n_punct,
           {textproc.stop_hits_sql('text')} AS n_stop,
           {textproc.mean_token_len_sql('text')} AS mean_tok_len,
           {textproc.quality_score_sql('text')} AS quality
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) and quality scoring —
    single-scan per-row projections, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textproc.token_count("text").alias("n_tok"),
        textproc.bpe_token_count("text").alias("n_bpe"),
        textproc.punct_count("text").alias("n_punct"),
        textproc.stop_hits("text").alias("n_stop"),
        textproc.mean_token_len("text").alias("mean_tok_len"),
        textproc.quality_score("text").alias("quality"),
    )


@query(
    "q_text_langid",
    f"""
    SELECT doc_id,
           {textproc.lang_id_sql('text')} AS lang_guess,
           {textproc.stop_hits_sql('text', 'en')} AS en_hits,
           {textproc.stop_hits_sql('text', 'es')} AS es_hits
    FROM documents
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID heuristic (deterministic argmax)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textproc.lang_id("text").alias("lang_guess"),
        textproc.stop_hits("text", "en").alias("en_hits"),
        textproc.stop_hits("text", "es").alias("es_hits"),
    )


@query(
    "q_text_fingerprint",
    f"""
    SELECT doc_id, {textproc.doc_fingerprint_sql('text')} AS fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling-hash document fingerprint (min md5 over
    strided char 16-grams)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textproc.doc_fingerprint("text").alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

@query("q_dedup_exact", dedup.exact_dedup_sql())
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-shuffle on md5(text), min-id keeper."""
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


@query("q_dedup_minhash_lsh", dedup.minhash_lsh_pairs_sql())
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4x4 bands) near-dup pairs, exact-Jaccard
    verified at >= 0.8. The oracle replicates signatures and banding, so
    the candidate set must match bit-exactly."""
    return dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


@query("q_dedup_ngram_jaccard", dedup.ngram_jaccard_pairs_sql())
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs >= 0.8 (verification baseline for
    the LSH path)."""
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@query("q_dedup_simhash", dedup.simhash64_sql())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit term-frequency SimHash fingerprint per document — pure
    projection, zero shuffle."""
    return dedup.simhash64(load_table(spark, sf_dir, "documents"))


@query("q_dedup_embedding", dedup.embedding_dup_pairs_sql())
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute-force verification tier)."""
    return dedup.embedding_dup_pairs(load_table(spark, sf_dir, "embeddings"))


@query("q_dedup_embedding_lsh", dedup.embedding_dup_pairs_lsh_sql())
def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: 60-bit hyperplane-LSH banded
    candidates (15×4) + exact-cosine verify — no crossJoin in the plan;
    the oracle replicates the literal plane matrix bit-exactly."""
    return dedup.embedding_dup_pairs_lsh(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

@query("q_ann_bruteforce", similarity.knn_bruteforce_sql())
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the first 5 vectors (broadcast queries,
    single corpus scan)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_bruteforce(emb, emb.filter(F.col("vec_id") < 5))


@query("q_ann_ivf", similarity.knn_ivf_sql())
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: nprobe=2 of 10 deterministic centroids — the scale path;
    oracle replicates the algorithm (not the brute answer)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_ivf(emb, emb.filter(F.col("vec_id") < 5))


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

@query("q_media_decode", multimodal.decode_media_sql())
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload decode via Arrow-batched mapInPandas (deterministic
    fake decoder; real decoders slot into the same stage)."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.decode_media(multimodal.with_payload(docs))


@query("q_media_frames", multimodal.sample_frames_sql())
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over "video" payloads: per-256-byte frame rows with
    md5 slice signatures, exploded inside the Pandas batch."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(multimodal.with_payload(docs))


# ---------------------------------------------------------------------------
# training-sequence assembly (packing + context windows)
# ---------------------------------------------------------------------------

from .pipeline import packing  # noqa: E402


@query(
    "q_pack_sequences",
    packing.pack_sequences_sql(budget_tokens=256, shard_by=("lang",)),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-fill sequence packing (concat-and-chunk) sharded by
    language: each document is assigned the training sequence its
    starting token offset falls in — pure window algebra, no UDFs;
    sharding keeps the cumulative sum parallel at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return packing.pack_sequences(
        docs, budget_tokens=256, shard_by=("lang",)
    )


@query(
    "q_window_text",
    packing.window_text_sql(width=120, stride=80),
)
def q_window_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context windows (120 chars, stride 80): JVM-side
    sequence + substring explode, one row per window; tails shorter
    than the overlap still appear exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    return packing.window_text(docs, width=120, stride=80)


@query(
    "q_decontaminate",
    dedup.decontaminate_sql(
        bench_sql="SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0",
        ngram_k=5,
        min_hits=2,
    ),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: training docs sharing >= 2 distinct
    5-grams with any 'benchmark' doc (every 97th doc stands in for the
    held-out set). Benchmark n-gram hashes broadcast; the corpus-side
    explode is the only heavy stage."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    return dedup.decontaminate(docs, bench, ngram_k=5, min_hits=2)


@query("q_ann_pq")  # approximate index: no SQL oracle; rows-only gate +
                    # recall-vs-bruteforce assertion in tests/test_pq.py
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (32x vector compression + ADC scan):
    train codebooks on a bounded sample, encode the corpus to m small
    codes, answer top-k from LUT sums over the codes — the corpus pass
    never reads the raw vectors. Approximate by construction, so the
    gate checks execution, and tests/test_pq.py checks recall against
    the exact baseline."""
    from .pipeline.similarity import knn_pq, pq_encode, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=16, n_codes=32, sample=512, iters=8)
    codes = pq_encode(emb, books)
    queries_df = emb.filter(F.col("vec_id") < 5)
    return knn_pq(codes, queries_df, books, k=5)


@query("q_lttb")  # visually-lossy downsample: output is algorithm-defined,
                  # not SQL-expressible; rows-only gate + exactness tests
                  # in tests/test_downsample.py
def q_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """largest_triangle_three_buckets downsample (toolkit lttb): each
    user's series reduced to 24 representative points via per-group
    applyInPandas; first/last kept, interior points maximize triangle
    area."""
    from .pipeline.downsample import lttb

    ev = load_table(spark, sf_dir, "events")
    return lttb(ev, "ts", "value", n_out=24, by=["user_id"])
