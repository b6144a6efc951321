from .aggregates import avg_by_key, distinct_union, explode_count, union_all_column
from .argmin import argmin_by
from .bpe import bpe_encode_token_counts, bpe_pair_merge_rounds
from .dedup import (
    connected_components,
    exact_dedup,
    minhash_build_index,
    minhash_neardup_pairs,
    minhash_neardup_pairs_incremental,
    minhash_probe_index,
    containment_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signature,
)
from .graph import pagerank
from .lm import (
    bigram_lm_scores,
    dsir_importance_weights,
    dup_ngram_char_fracs,
    hashed_ngram_classifier,
)
from .generators import date_series, permutation_triplets
from .range_join import asof_join, point_in_interval_join
from .multimodal import extract_byte_features, sample_frames, with_binary_payload
from .similarity import (
    assign_to_centroids,
    brute_force_topk,
    cosine_pairs_within_cells,
    embedding_cosine_pairs,
    ivf_topk,
    kmeans_fit,
    mutual_knn_graph,
    pq_adc_topk,
    unit_normalize,
)
from .timeseries import ewma_per_key, holt_per_key, resample_ffill
from .sketches import kmv_distinct_per_key, kmv_set_overlap_per_key_pair
from .skew import salted_join
from .text import (
    bpe_token_counts,
    fingerprints,
    langid_scores,
    quality_scores,
    rolling_hash,
    token_counts,
)
from .topk import (
    global_sort,
    global_top_k,
    rank_table,
    rank_table_distributed,
    top_k_per_group,
)

__all__ = [
    "avg_by_key",
    "bpe_encode_token_counts",
    "bpe_pair_merge_rounds",
    "bigram_lm_scores",
    "dsir_importance_weights",
    "dup_ngram_char_fracs",
    "hashed_ngram_classifier",
    "pagerank",
    "minhash_build_index",
    "minhash_neardup_pairs_incremental",
    "minhash_probe_index",
    "pq_adc_topk",
    "ewma_per_key",
    "holt_per_key",
    "resample_ffill",
    "distinct_union",
    "explode_count",
    "union_all_column",
    "argmin_by",
    "connected_components",
    "exact_dedup",
    "minhash_neardup_pairs",
    "containment_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "simhash_signature",
    "date_series",
    "permutation_triplets",
    "extract_byte_features",
    "sample_frames",
    "with_binary_payload",
    "asof_join",
    "point_in_interval_join",
    "assign_to_centroids",
    "brute_force_topk",
    "cosine_pairs_within_cells",
    "embedding_cosine_pairs",
    "ivf_topk",
    "kmeans_fit",
    "mutual_knn_graph",
    "unit_normalize",
    "kmv_distinct_per_key",
    "kmv_set_overlap_per_key_pair",
    "salted_join",
    "bpe_token_counts",
    "fingerprints",
    "langid_scores",
    "quality_scores",
    "rolling_hash",
    "token_counts",
    "global_sort",
    "global_top_k",
    "rank_table",
    "rank_table_distributed",
    "top_k_per_group",
]
