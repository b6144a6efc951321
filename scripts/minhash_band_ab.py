"""MinHash LSH bands/rows A/B on the sf1 near-threshold corpus
(r5 verdict item 3).

The r5 scale curve showed the banded-LSH worst case: the sf1 fixture
parks every clone pair at word-shingle Jaccard ≈ 0.87 against a 0.9
threshold, so with the shipped 32 bands × 4 rows nearly every
sub-threshold pair becomes a candidate that verifies to nothing
(24.7× time, 62× shuffle for 10× data). This script measures the
standard countermeasure — fewer bands × more rows steepens the LSH
S-curve so near-miss pairs stop becoming candidates — and records the
recall price at the threshold.

For each (bands, rows) with bands·rows = 128, threshold 0.9:
  - candidates: distinct unverified pair count (the shuffle driver)
  - verified:   pairs with exact Jaccard ≥ 0.9 (output; recall proxy —
                verification is exact, so missing output = missed
                candidate, and the union over configs is the achievable
                reference set)
  - wall_s:     end-to-end verified-pipeline wall time, min of 2
  - p@J:        analytic candidate probability 1-(1-J^r)^b at J = 0.90
                (just-qualifying pair: recall) and J = 0.87 (the
                fixture's near-miss mass: wasted candidates)

Usage: python scripts/minhash_band_ab.py [sf_dir]
Writes a markdown table to stdout; BASELINE.md records the round's run.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

THRESHOLD = 0.9
NUM_HASHES = 128
MAX_BUCKET = 20_000
CONFIGS = [(32, 4), (16, 8), (8, 16)]  # (bands, rows)


def p_candidate(j: float, bands: int, rows: int) -> float:
    return 1.0 - (1.0 - j**rows) ** bands


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scratch", "sf1"
    )
    from airline_dataset_hadoop_public_spark.session import get_spark
    from airline_dataset_hadoop_public_spark.sources.catalog import load_table
    from airline_dataset_hadoop_public_spark.operators import dedup as D

    spark = get_spark("minhash-band-ab", cpus=32, driver_memory="48g")
    docs = load_table(spark, sf_dir, "documents")

    # shared, config-independent prep: shingles -> collapsed groups ->
    # hashed rep sets (identical across configs, so differences below
    # are purely the banding)
    sh = D._shingled(docs, "doc_id", "text", 1).filter(F.size("__sh") > 0)
    grp = D._collapse_identical(sh, "doc_id", fingerprint=True).cache()
    reps = D._hashed_reps(grp, "doc_id")
    n_reps = reps.count()  # also materializes the caches

    results = []
    for bands, rows in CONFIGS:
        assert bands * rows == NUM_HASHES
        banded = D._banded(reps, "doc_id", NUM_HASHES, bands).cache()
        banded.count()
        cands = D._lsh_candidates(
            banded, banded, "doc_id", THRESHOLD, MAX_BUCKET, symmetric=True
        ).count()
        wall = float("inf")
        verified = None
        for _ in range(2):
            spark.sparkContext.setJobGroup(f"b{bands}r{rows}", "ab")
            t0 = time.time()
            edges = D._rep_neardup_edges(
                reps, "doc_id", THRESHOLD, NUM_HASHES, bands, MAX_BUCKET,
                banded_probe=banded,
            )
            verified = edges.count()
            wall = min(wall, round(time.time() - t0, 2))
        banded.unpersist()
        results.append(
            {
                "bands": bands,
                "rows": rows,
                "candidates": cands,
                "verified": verified,
                "wall_s": wall,
                "p90": round(p_candidate(0.90, bands, rows), 4),
                "p87": round(p_candidate(0.87, bands, rows), 4),
            }
        )
        print(f"done {bands}x{rows}: {results[-1]}", file=sys.stderr)

    ref = max(r["verified"] for r in results)
    print(f"\nsf_dir={sf_dir}  reps={n_reps}  threshold={THRESHOLD}  "
          f"num_hashes={NUM_HASHES}  max_bucket={MAX_BUCKET}")
    print("| bands×rows | candidates | verified pairs | recall vs best "
          "| wall s | P(cand) J=.90 | P(cand) J=.87 |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        rec = r["verified"] / ref if ref else 1.0
        print(
            f"| {r['bands']}×{r['rows']} | {r['candidates']:,} "
            f"| {r['verified']:,} | {rec:.4f} | {r['wall_s']} "
            f"| {r['p90']} | {r['p87']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
