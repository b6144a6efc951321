"""Driver-checkable coverage for the CSV ingest path (SURVEY.md §2.1
S1–S4).

Round 1 left ``sources/ingest.py`` pytest-only; this fixture gives the
S1–S4 surface a CORRECTNESS row. The query materializes the driver's
``orders`` table as a *nested tree of headered CSV files* under a tmp
dir (the analog of the reference's unzipped monthly CSV layout,
/root/reference/README.md:94-100), then runs the real ingest pipeline:

  S1  recursive schema'd CSV scan (``recursiveFileLookup``)
  S3  file-level predicate (``pathGlobFilter="*.csv"``) + partition
      pruning on the canonical parquet (``Year = …`` prunes dirs)
  S2  projected scan (Catalyst prunes columns into the parquet read)
  S4  canonical sink (year-partitioned parquet, the reference's
      per-job ``.txt`` sink re-expressed, README.md:113-131)

and finally aggregates. Because the round-trip is lossless, the oracle
is plain SQL over the original ``orders`` view — DuckDB never needs to
see the tmp files, so the check is order-independent.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import load_table
from ..sources.ingest import canonicalize, read_canonical, read_ontime_csv
from .registry import register

# CSV-facing schema for the orders round-trip. o_orderdate is typed
# TIMESTAMP (matches the parquet source); the ingest year lives in the
# directory names, not the files, exactly like the reference's
# per-month CSV layout.
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

_INGEST_ORACLE = """
SELECT o_orderpriority,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 4) AS sum_price
FROM orders
WHERE year(o_orderdate) BETWEEN 1993 AND 1995
GROUP BY o_orderpriority, yr
ORDER BY o_orderpriority, yr
"""


def _tmp_root(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(tempfile.gettempdir(), "adhps_ingest", tag)


@register("ingest_csv_roundtrip", _INGEST_ORACLE)
def ingest_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _tmp_root(sf_dir)
    csv_dir = os.path.join(root, "csv_tree")
    canon_dir = os.path.join(root, "canonical")
    shutil.rmtree(root, ignore_errors=True)

    orders = load_table(spark, sf_dir, "orders").select(
        *[f.name for f in _ORDERS_CSV_SCHEMA.fields]
    )
    # Materialize as a nested CSV tree: partitionBy(ingest_year) drops
    # the dir-encoded column from the files — the recursive reader must
    # recover year from the data, as with the reference's monthly files.
    (
        orders.withColumn("ingest_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .option("header", True)
        .partitionBy("ingest_year")
        .csv(csv_dir)
    )

    raw = read_ontime_csv(
        spark, csv_dir, schema=_ORDERS_CSV_SCHEMA, path_glob="*.csv"
    )
    canonicalize(raw, canon_dir, date_col="o_orderdate")

    canon = read_canonical(
        spark,
        canon_dir,
        schema=T.StructType(
            list(_ORDERS_CSV_SCHEMA.fields)
            + [T.StructField("Year", T.IntegerType())]
        ),
    )
    return (
        # Year filter = partition pruning over the canonical layout (S3);
        # the 4-column projection prunes the scan (S2).
        canon.filter(F.col("Year").between(1993, 1995))
        .groupBy(
            "o_orderpriority", F.col("Year").cast("int").alias("yr")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .orderBy("o_orderpriority", "yr")
    )
