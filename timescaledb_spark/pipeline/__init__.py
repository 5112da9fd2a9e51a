"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal columns (BASELINE north-star items beyond the
TimescaleDB reference surface)."""

from .core import cosine, h60, minhash_signature, tokens, word_shingles
from .downsample import lttb
from .dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from .multimodal import decode_media, resize_media, sample_frames, with_payload
from .sampling import hash_sample, split_assign, stratified_cap
from .similarity import hyperplane_bucket, knn_bruteforce, knn_ivf
from .textproc import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    text_features,
    token_count,
)

__all__ = [
    "bpe_token_count",
    "cosine",
    "decode_media",
    "doc_fingerprint",
    "embedding_dup_pairs",
    "exact_dedup",
    "h60",
    "hyperplane_bucket",
    "knn_bruteforce",
    "knn_ivf",
    "lang_id",
    "lttb",
    "minhash_lsh_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "quality_score",
    "sample_frames",
    "simhash64",
    "simhash_pairs",
    "text_features",
    "token_count",
    "tokens",
    "with_payload",
    "word_shingles",
]
