"""Streaming wave 2: the Spark 4 ``transformWithStateInPandas``
arbitrary-state API (typed ValueState handles, RocksDB-backed),
complementing the ``applyInPandasWithState`` coverage in
fixtures_streaming (SURVEY.md §2.10).

Registered in its own module so the round-2 driver verification window
(prefix of the registry) is untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register

_TWS_ORACLE = """
SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
FROM events GROUP BY user_id
"""


def _tws_available() -> bool:
    """transformWithStateInPandas speaks a protobuf protocol to its
    Python state server; this sandbox ships no `google.protobuf`, so
    the query registers only where it can actually run (the
    applyInPandasWithState coverage in fixtures_streaming carries the
    same semantics everywhere)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def streaming_tws_running_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import running_extremes_tws
    from .fixtures_streaming import _events_stream_dir
    from ..streaming.windows import run_file_stream_batch

    src, schema = _events_stream_dir(spark, sf_dir)

    def finalize(df: DataFrame) -> DataFrame:
        # update-mode sink → last emission per key (monotone in count)
        return (
            df.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "max_value")).alias("__last"))
            .select("user_id", "__last.n_events", "__last.max_value")
        )

    # running_extremes_tws switches the session to the RocksDB state
    # store (the only provider the new state API supports); restore the
    # caller's provider once the query has drained so later streaming
    # fixtures keep their configured backend
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    try:
        return run_file_stream_batch(
            spark,
            src,
            schema,
            lambda s: running_extremes_tws(spark, s, "user_id", "value"),
            output_mode="update",
            finalize=finalize,
        )
    finally:
        if before is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, before)


if _tws_available():  # pragma: no cover - environment-dependent
    register("streaming_tws_running_extremes", _TWS_ORACLE)(
        streaming_tws_running_extremes
    )
