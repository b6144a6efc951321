"""Order-statistic cardinality sketches.

KMV (K-Minimum-Values) distinct counting — the mergeable sketch behind
"how many distinct users per key" at 100 TB when exact COUNT(DISTINCT)
is too expensive to keep around: hash every value to (0, 1], keep only
the k smallest hashes per key, estimate distinct = (k-1)/U_(k) where
U_(k) is the k-th smallest normalized hash (Bar-Yossef et al.,
RANDOM 2002; the unbiased estimator form is Beyer et al., SIGMOD 2007).

Why this shape for a Spark engine (the reference has no sketch surface;
its closest analog is the A-family exact distinct machinery, reference
README.md:143-231):

- The per-key state is k hashes — constant, mergeable (union then
  re-take the k smallest), and streamable. `approx_count_distinct`
  (HLL) is the built-in alternative; KMV is implemented here because it
  is DETERMINISTIC given the hash, so the correctness gate can verify
  the estimator itself value-for-value against a SQL oracle, and
  because the same min-k-by-hash order statistic doubles as the
  engine's deterministic sampling primitive (events_hash_sample_per_user).
- Expressed as distinct → hash → per-key top-k (rank window), i.e. two
  shuffles on the key with map-side partial distinct. At scale the
  rank-window-over-key is the standard grouped top-k physical shape
  (in-partition sort after one exchange); no state ever exceeds k rows
  per key at the consumer.

The md5-derived 60-bit hash matches the repo's portable-hash
convention (same expression DuckDB-side), so estimates are
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = 2.0**60  # 16^15: md5's first 15 hex digits


def kmv_distinct_per_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 32,
    ndigits: int = 4,
) -> DataFrame:
    """(key, n_exact, kmv_estimate, rel_err) per key.

    `kmv_estimate` is (k-1)/U_(k) over the k smallest md5-derived
    hashes of the key's distinct values; keys with fewer than k
    distinct values report the exact count (the sketch is exact below
    its capacity — every hash is retained). `n_exact` and `rel_err`
    are included so the query is its own error report; at production
    scale one would keep only the sketch state.
    """
    if k < 2:
        raise ValueError("k must be >= 2 for the (k-1)/U_(k) estimator")
    # NULL is not a value: COUNT(DISTINCT) semantics, and Spark's
    # default NULLS-FIRST ascending sort would otherwise hand rank 1
    # to the null hash and shift the k-th order statistic off by one
    # (DuckDB sorts NULLS LAST, so the engines would also disagree)
    d = (
        df.select(key_col, F.col(value_col).cast("string").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .distinct()
    )
    h = d.withColumn(
        "__hv", F.conv(F.substring(F.md5("__v"), 1, 15), 16, 10).cast("long")
    )
    by_key = Window.partitionBy(key_col)
    ranked = h.select(
        key_col,
        "__hv",
        F.row_number().over(by_key.orderBy("__hv", "__v")).alias("__rn"),
        F.count(F.lit(1)).over(by_key).alias("n_exact"),
    )
    kth = ranked.filter(
        F.col("__rn") == F.least(F.lit(k), F.col("n_exact"))
    )
    est = F.when(
        F.col("n_exact") < k, F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("__hv").cast("double") / F.lit(_HASH_SPACE))
    )
    return kth.select(
        key_col,
        "n_exact",
        F.round(est, ndigits).alias("kmv_estimate"),
        F.round(
            F.abs(est - F.col("n_exact")) / F.col("n_exact"), ndigits
        ).alias("rel_err"),
    )
