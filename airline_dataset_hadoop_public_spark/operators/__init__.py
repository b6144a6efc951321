from .aggregates import avg_by_key, distinct_union, explode_count, union_all_column
from .argmin import argmin_by
from .generators import date_series, permutation_triplets
from .topk import global_sort, global_top_k, rank_table, top_k_per_group

__all__ = [
    "avg_by_key",
    "distinct_union",
    "explode_count",
    "union_all_column",
    "argmin_by",
    "date_series",
    "permutation_triplets",
    "global_sort",
    "global_top_k",
    "rank_table",
    "top_k_per_group",
]
