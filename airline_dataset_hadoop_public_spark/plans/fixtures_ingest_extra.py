"""Second-wave ingest coverage: JSON-lines source and malformed-row
handling (SURVEY.md §2.1 S2, §2.2 P4).

Same oracle discipline as ``fixtures_ingest``: the query materializes
driver fixture data under a tmp dir in the alternate format, runs the
real read path, and aggregates; the round-trip is lossless (or drops
exactly the injected garbage), so the oracle is plain SQL over the
original view and never touches the tmp files.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import load_table
from .registry import register


def _tmp(sf_dir: str, leaf: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(tempfile.gettempdir(), "adhps_ingest_extra", tag, leaf)


# ---------------------------------------------------------------------------
# JSON-lines round-trip: events → .jsonl tree → schema'd read →
# aggregate. Timestamps serialize ISO-8601 with microseconds and parse
# back exactly; doubles round-trip via shortest-representation.
# ---------------------------------------------------------------------------

_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_JSONL_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(SUM(value), 4) AS sum_value,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("ingest_jsonl_roundtrip", _JSONL_ORACLE)
def ingest_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _tmp(sf_dir, "events_jsonl")
    shutil.rmtree(root, ignore_errors=True)
    events = load_table(spark, sf_dir, "events").select(
        *[f.name for f in _EVENTS_SCHEMA.fields]
    )
    # default JSON timestampFormat truncates to milliseconds — write
    # and read with explicit microsecond precision so ts round-trips
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.write.mode("overwrite").option("timestampFormat", ts_fmt).json(root)
    raw = (
        spark.read.schema(_EVENTS_SCHEMA)
        .option("recursiveFileLookup", True)
        .option("timestampFormat", ts_fmt)
        .json(root)
    )
    return (
        raw.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "first_ts"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Malformed-row drop (P4): the reference's PrepareData silently skips
# rows that fail to parse (/root/reference/README.md:113-131). Here the
# CSV tree is rebuilt by hand with garbage lines interleaved — wrong
# arity, unparseable types — and read in DROPMALFORMED mode; exactly
# the valid orders survive, which is what the oracle computes.
# ---------------------------------------------------------------------------

# Lines the CSV parser MUST reject — all TYPE failures, and all in
# columns the downstream aggregate READS. Two Spark CSV semantics pin
# this choice: (1) under-length rows are null-padded and over-length
# rows truncated without being flagged malformed, so only per-field
# conversion failures trigger DROPMALFORMED; (2) CSV column pruning
# (spark.sql.csv.parser.columnPruning.enabled, default on) skips
# parsing unread columns entirely, so a type failure in a pruned
# column is never seen — malformedness is evaluated against the
# query's required schema, not the declared one.
_BAD_LINES = [
    "this is not a csv row",  # whole line lands in o_orderkey (read)
    "7,7,F,notadouble,2020-01-01 00:00:00,1-URGENT",  # o_totalprice (read)
    "abc,1,F,1.0,2020-01-01 00:00:00,1-URGENT",  # o_orderkey (read)
    "###,###,###,###,###,###",  # o_orderkey (read)
]

_MALFORMED_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
       ROUND(SUM(o_totalprice), 4) AS sum_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

_ORDERS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


@register("ingest_csv_malformed_drop", _MALFORMED_ORACLE)
def ingest_csv_malformed_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _tmp(sf_dir, "orders_dirty_csv")
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    valid = orders.select(
        F.concat_ws(
            ",",
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            F.col("o_totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
            F.col("o_orderpriority"),
        ).alias("value")
    )
    garbage = spark.createDataFrame(
        [(s,) for s in _BAD_LINES], T.StructType([T.StructField("value", T.StringType())])
    )
    valid.unionByName(garbage).write.mode("overwrite").text(root)
    raw = (
        spark.read.schema(_ORDERS_CSV_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(root)
    )
    return (
        raw.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# ORC round-trip: the third columnar source format (after parquet and
# text-based CSV/JSONL). ORC preserves microsecond timestamps and
# doubles exactly, so the round-trip is lossless and the oracle is
# plain SQL over the original view. Partitioned by event day to also
# exercise ORC partition discovery + pruning-capable layout.
# ---------------------------------------------------------------------------

_ORC_ORACLE = """
SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       ROUND(SUM(value), 4) AS sum_value,
       STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM events
GROUP BY 1
ORDER BY 1
"""


@register("ingest_orc_roundtrip", _ORC_ORACLE)
def ingest_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _tmp(sf_dir, "events_orc")
    shutil.rmtree(root, ignore_errors=True)
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    events.write.mode("overwrite").partitionBy("day").orc(root)
    # explicit schema: partition-column inference may read day= back as
    # DATE (we want the oracle's string form), and an EMPTY source
    # writes no files at all — inference would raise where a declared
    # schema yields an empty scan
    raw = spark.read.schema(events.schema).orc(root).withColumn(
        "day", F.col("day").cast("string")
    )
    return (
        raw.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "last_ts"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Schema evolution: a v1 batch written WITHOUT a column and a v2 batch
# written with it, read back as one table via mergeSchema — the
# standard lakehouse column-add migration. v1 rows surface NULL for
# the new column and are bucketed as 'legacy'; the oracle reproduces
# the same classification from the original table, so the merge read
# is proven lossless. (At scale mergeSchema=true costs a footer read
# per file at planning time — acceptable for migrations, which is
# exactly what this models.)
# ---------------------------------------------------------------------------

_EVOLVE_CUTOFF = "1998-01-01"

_EVOLVE_ORACLE = f"""
SELECT CASE WHEN o_orderdate < TIMESTAMP '{_EVOLVE_CUTOFF}'
            THEN 'legacy' ELSE o_orderpriority END AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
GROUP BY 1
ORDER BY 1
"""


@register("ingest_schema_evolution", _EVOLVE_ORACLE)
def ingest_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _tmp(sf_dir, "orders_evolving")
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_EVOLVE_CUTOFF).cast("timestamp")
    v1 = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # v2 is "everything not in v1": a NULL-dated order fails both
    # comparisons, and the oracle's CASE sends it to the ELSE
    # (priority-carrying) branch — route it to the v2 batch
    v2 = orders.filter(
        (F.col("o_orderdate") >= cutoff) | F.col("o_orderdate").isNull()
    ).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.parquet(os.path.join(root, "batch=1"))
    v2.write.parquet(os.path.join(root, "batch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    return (
        merged.groupBy(
            F.coalesce("o_orderpriority", F.lit("legacy")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Custom Python Data Source (Spark 4 DataSource API): the programmable
# ingest extension point. The synthetic generator is md5-seeded by row
# index, so the oracle REGENERATES the exact rows from range(n) with
# the same md5 arithmetic — source parity proven with zero data files.
# (sf-independent by design: the source is the thing under test.)
# ---------------------------------------------------------------------------

_PYDS_N = 20_000

_PYDS_MD5 = "CAST(('0x' || substring(md5(CAST({x} AS VARCHAR)), 1, 15)) AS BIGINT)"

_PYDS_ORACLE = f"""
WITH g AS (
  SELECT i,
         {_PYDS_MD5.format(x="i")} % 1000 AS user_id,
         {_PYDS_MD5.format(x="i + 1")} % 5 AS t_idx,
         ({_PYDS_MD5.format(x="i + 2")} % 100000) / 100.0 AS value
  FROM (SELECT UNNEST(range(0, {_PYDS_N})) AS i)
)
SELECT CASE t_idx WHEN 0 THEN 'click' WHEN 1 THEN 'view'
                  WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup'
                  ELSE 'share' END AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(SUM(value), 2) AS sum_value
FROM g GROUP BY 1 ORDER BY 1
"""


@register("ingest_python_datasource", _PYDS_ORACLE)
def ingest_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.pysource import register_synthetic_source

    register_synthetic_source(spark)
    raw = (
        spark.read.format("synthetic_events")
        .option("n", str(_PYDS_N))
        .option("partitions", "8")
        .load()
    )
    return (
        raw.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# XML round-trip (Spark 4 native XML source): documents → XML tree
# (rowTag doc) → explicit-schema read → per-(lang, source) profile
# with an md5-derived content checksum over (doc_id, text) — the
# checksum proves the TEXT survived XML escaping byte-for-byte (the
# interesting failure mode for an XML exchange format; entity escaping
# of &<>'" and surrounding-whitespace trimming are where naive
# pipelines corrupt corpora). The oracle computes the same profile
# straight from the parquet table, so any write/read drift breaks the
# value hash. ignoreSurroundingSpaces is disabled on read: text is
# data here, not markup.
# ---------------------------------------------------------------------------

_XML_ORACLE = """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(('0x' || substring(
              md5(CAST(doc_id AS VARCHAR) || ':' || COALESCE(text, '')),
              1, 8))
            AS BIGINT)) AS BIGINT) AS text_checksum
FROM documents
GROUP BY 1, 2
"""


@register("ingest_xml_roundtrip", _XML_ORACLE)
def ingest_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _tmp(sf_dir, "documents_xml")
    shutil.rmtree(root, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    (
        docs.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "corpus")
        .option("rowTag", "doc")
        .save(root)
    )
    raw = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .schema(
            "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint"
        )
        .load(root)
    )
    # the XML source reads an empty element back as NULL — fold both
    # NULL and '' to '' on the checksum input (the oracle's || chain
    # must do the same, otherwise an empty-text row would null out the
    # Spark-side term while the oracle contributes a real md5)
    checksum = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.coalesce("text", F.lit("")),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return raw.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(checksum).cast("long").alias("text_checksum"),
    )
