"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north star): dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scores, token counts, fingerprints), and
multimodal binary-column plumbing. All operators are DataFrame ->
DataFrame, built from native expressions (JVM-side, codegen'd);
hashing is md5-based so results are engine-portable and
oracle-checkable. The multimodal decode path is Arrow-batched
``mapInPandas`` with the actual codec stubbed (no media libs in the
runtime image).
"""

from .dedup import (
    DedupIndex,
    apply_clusters,
    block_dedup,
    segment_dedup_keep_first,
    containment_pairs,
    duplicate_clusters,
    duplicate_spans,
    exact_dedup,
    exact_duplicate_groups,
    incremental_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
    word_shingles,
)
from .curation import (
    dup_rate_by_source,
    encoding_quality,
    keep_best_per_cluster,
    normalize_scores,
    quantile_filter,
    snapshot_diff,
)
from .embed import embed_texts
from .linkage import edit_verified_pairs
from .sketches import (
    kmv_distinct,
    kmv_estimate,
    kmv_jaccard,
    kmv_merge,
    kmv_sketch,
)
from .tokenizer import bpe_encode, bpe_train, word_frequencies
from .packing import pack_sequences
from .sampling import (
    hash_sample,
    shard_assignment,
    shard_manifest,
    hash_split,
    hash_stratified_sample,
    mixture_rates,
    select_by_budget,
    weighted_sample,
    select_by_budget_threshold,
)
from .similarity import (
    AnnIndex,
    brute_force_topk,
    centroid_outliers,
    ivf_assign,
    kmeans_fit,
    ivfpq_topk,
    ivfpq_topk_refined,
    semantic_dedup,
    pq_codes,
    pq_encode,
    pq_train,
    ivf_assign_probes,
    ivf_topk,
    lsh_buckets,
    lsh_topk,
)
from .text import (
    bigram_lm_scores,
    bigram_pairs,
    bpe_pair_counts,
    fingerprints,
    language_id,
    length_quantiles,
    ngram_novelty,
    quality_scores,
    repetition_rates,
    tfidf_keywords,
    token_counts,
    vocabulary_df,
)

__all__ = [
    "DedupIndex",
    "word_shingles",
    "exact_duplicate_groups",
    "exact_dedup",
    "incremental_dedup",
    "block_dedup",
    "segment_dedup_keep_first",
    "duplicate_spans",
    "kmeans_fit",
    "pq_codes",
    "pq_encode",
    "pq_train",
    "ivfpq_topk",
    "ivfpq_topk_refined",
    "semantic_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "containment_pairs",
    "simhash",
    "simhash_near_duplicates",
    "duplicate_clusters",
    "apply_clusters",
    "embed_texts",
    "bpe_train",
    "bpe_encode",
    "word_frequencies",
    "dup_rate_by_source",
    "keep_best_per_cluster",
    "edit_verified_pairs",
    "kmv_distinct",
    "kmv_estimate",
    "kmv_jaccard",
    "kmv_merge",
    "kmv_sketch",
    "normalize_scores",
    "quantile_filter",
    "encoding_quality",
    "snapshot_diff",
    "repetition_rates",
    "ngram_novelty",
    "length_quantiles",
    "pack_sequences",
    "hash_sample",
    "hash_stratified_sample",
    "hash_split",
    "select_by_budget",
    "weighted_sample",
    "select_by_budget_threshold",
    "shard_assignment",
    "shard_manifest",
    "mixture_rates",
    "brute_force_topk",
    "centroid_outliers",
    "ivf_assign",
    "ivf_assign_probes",
    "ivf_topk",
    "lsh_buckets",
    "lsh_topk",
    "token_counts",
    "quality_scores",
    "language_id",
    "fingerprints",
    "vocabulary_df",
    "tfidf_keywords",
    "bigram_lm_scores",
    "bigram_pairs",
    "bpe_pair_counts",
]
