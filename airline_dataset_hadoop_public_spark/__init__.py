"""PySpark-native analytics engine with the query/data-processing
capabilities of hkiang01/Airline-Dataset-Hadoop-Public.

The reference (surveyed in /root/repo/SURVEY.md from its public README —
the only public artifact) is a Hadoop-MapReduce batch pipeline over the
BTS airline on-time dataset with Cassandra serving tables. This package
re-expresses every capability Spark-first:

- ``sources``   — parquet/CSV canonicalization, fixture catalog, the
                  partitioned-parquet serving layer replacing Cassandra.
- ``operators`` — the operator inventory of SURVEY.md §2 (explode-count,
                  avg-by-key, global/grouped top-k, argmin-join,
                  generators) plus the LLM-data-pipeline extensions
                  (dedup, similarity search, text analysis, multimodal).
- ``functions`` — scalar expression helpers (date repair, interval
                  arithmetic, cosine, tokenization).
- ``plans``     — the seven reference queries (G1Q1..G3Q2) over an
                  airline `ontime` frame, and the driver-contract
                  fixture queries with their DuckDB oracle SQL.
- ``streaming`` — Structured Streaming surface: tumbling/sliding/
                  session event-time windows with watermarks, plus
                  custom cross-batch state via applyInPandasWithState.
- ``analytics`` — the G3Q1 offline tail (rank-distribution fitting).
- ``testing``   — deterministic synthetic BTS-shaped data generator.

Everything is DataFrame-declarative so Catalyst handles column pruning,
predicate pushdown, partial aggregation, and AQE picks physical join
strategies — see SURVEY.md §4 for the manual-technique → Catalyst map.
"""

__version__ = "0.1.0"
