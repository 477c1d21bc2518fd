from .text import (
    doc_fingerprint,
    language_id,
    pii_counts,
    quality_features,
    quality_score,
    redact_pii,
    token_count,
    with_rolling_fingerprint,
)
from .dedup import (
    contaminated_ids,
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    near_dup_jaccard,
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
    "pii_counts",
    "redact_pii",
    "with_rolling_fingerprint",
    "contaminated_ids",
    "exact_dedup",
    "near_dup_jaccard",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "word_shingles",
    "brute_force_cosine_topk",
    "lsh_bucketed_topk",
]
