from .dedup import (
    dedup_exact,
    dedup_keep_first,
    embedding_cosine_neardup,
    minhash_lsh_neardup,
    ngram_jaccard_pairs,
    shingle,
    simhash,
    simhash_neardup,
)
from .knn import knn_join, knn_join_blocked
from .text_analysis import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

__all__ = [
    "dedup_exact", "dedup_keep_first", "embedding_cosine_neardup",
    "minhash_lsh_neardup", "ngram_jaccard_pairs", "shingle",
    "simhash", "simhash_neardup",
    "knn_join", "knn_join_blocked",
    "fingerprint", "lang_id", "quality_score", "token_count",
]
