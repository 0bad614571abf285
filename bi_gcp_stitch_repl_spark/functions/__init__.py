from .dedup import exact_dedup, jaccard_pairs, minhash_lsh_pairs, simhash_fingerprints
from .similarity import brute_force_topk, lsh_bucket_topk
from .text import fingerprint, shingles, token_stats

__all__ = [
    "exact_dedup",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "brute_force_topk",
    "lsh_bucket_topk",
    "fingerprint",
    "shingles",
    "token_stats",
]
