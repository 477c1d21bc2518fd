from .text import (
    doc_fingerprint,
    language_id,
    quality_features,
    quality_score,
    token_count,
)
from .dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from .vector import brute_force_cosine_topk, lsh_bucketed_topk

__all__ = [
    "doc_fingerprint",
    "language_id",
    "quality_features",
    "quality_score",
    "token_count",
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "word_shingles",
    "brute_force_cosine_topk",
    "lsh_bucketed_topk",
]
