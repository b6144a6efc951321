"""The seven reference queries (SURVEY.md §2.11) in their native
airline shape, composed from the operator library.

These run over an `ontime` DataFrame with the reference's eight input
columns (/root/reference/README.md:510); the driver-facing fixture
analogs of the same operator compositions live in fixtures_parity.py.
Each function cites the reference job it reproduces. Per-query cleaning
(P4 — drop rows with missing/malformed fields *for that query's
columns*, README.md:111-112) is applied inside each query, mirroring
the reference's per-job PrepareData projections.

Pinned semantic decisions (SURVEY.md §2.11/§2.4):
- Tie-breaks: every ranking adds an ascending key-column tie-break.
- Noon rule (README.md:436,546): leg 1 scheduled departure strictly
  before 12:00, leg 2 strictly after 12:00 (noon itself in neither).
- Date repair (README.md:513): DepTime hour > 23 rolls into the next
  day (27:30 on the 5th → 03:30 on the 6th).
- Scheduled departure (README.md:514): actual DepTime − DepDelay min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import avg_by_key, distinct_union, explode_count
from ..operators.argmin import argmin_by
from ..operators.generators import date_series, permutation_triplets
from ..operators.topk import global_sort, global_top_k, rank_table, top_k_per_group

_NOON_SEC = 12 * 3600


def g1q1_airport_popularity(ontime: DataFrame, k: int = 10) -> DataFrame:
    """Top-k airports by arrivals + departures
    (ArrivalsAndDeparturesPerAirport + Top10..., README.md:143-161)."""
    clean = ontime.na.drop(subset=["Origin", "Dest"])
    counts = explode_count(clean, ["Origin", "Dest"], key="airport", cnt="flights")
    return global_top_k(counts, [F.desc("flights"), F.asc("airport")], k)


def g1q2_carrier_on_time(ontime: DataFrame, k: int = 10) -> DataFrame:
    """Top-k carriers by mean arrival delay, ascending = most on-time
    (AvgDelayPerAirline + Top10AirlinesByDelay, README.md:167-185)."""
    clean = ontime.na.drop(subset=["UniqueCarrier", "ArrDelay"])
    avg = avg_by_key(clean, ["UniqueCarrier"], "ArrDelay", "avg_arr_delay")
    return global_top_k(avg, [F.asc("avg_arr_delay"), F.asc("UniqueCarrier")], k)


def g2q1_carriers_per_airport(ontime: DataFrame, k: int = 10) -> DataFrame:
    """Per origin airport, the k carriers with lowest mean DepDelay
    (AvgDepDelayPerAirportCarrier + Top10CarriersByDepDelayPerAirport,
    README.md:197-239)."""
    clean = ontime.na.drop(subset=["Origin", "UniqueCarrier", "DepDelay"])
    avg = avg_by_key(clean, ["Origin", "UniqueCarrier"], "DepDelay", "avg_dep_delay")
    return top_k_per_group(
        avg, ["Origin"], [F.asc("avg_dep_delay"), F.asc("UniqueCarrier")], k
    )


def g2q2_dests_per_airport(ontime: DataFrame, k: int = 10) -> DataFrame:
    """Per origin airport, the k destinations with lowest mean DepDelay
    (AvgDepDelayPerAirportDest + Top10DestByDepDelayPerAirport,
    README.md:286-326)."""
    clean = ontime.na.drop(subset=["Origin", "Dest", "DepDelay"])
    avg = avg_by_key(clean, ["Origin", "Dest"], "DepDelay", "avg_dep_delay")
    return top_k_per_group(avg, ["Origin"], [F.asc("avg_dep_delay"), F.asc("Dest")], k)


def g2q3_carriers_per_route(ontime: DataFrame, k: int = 10) -> DataFrame:
    """Per (origin, dest) route, the k carriers with lowest mean
    ArrDelay (AvgArrDelayPerAirportPairCarrier + Top10CarriersBy-
    ArrDelayPerAirportPair, README.md:333-367)."""
    clean = ontime.na.drop(subset=["Origin", "Dest", "UniqueCarrier", "ArrDelay"])
    avg = avg_by_key(
        clean, ["Origin", "Dest", "UniqueCarrier"], "ArrDelay", "avg_arr_delay"
    )
    return top_k_per_group(
        avg,
        ["Origin", "Dest"],
        [F.asc("avg_arr_delay"), F.asc("UniqueCarrier")],
        k,
    )


def g3q1_popularity_ranked(ontime: DataFrame) -> DataFrame:
    """All airport popularity counts, globally sorted descending with
    a dense 1-based rank — the input to the zipf/poisson fit
    (ArrivalsAndDeparturesPerAirportSortedByFrequency + zipf.py,
    README.md:375-430). Feed `.toPandas()` of this into
    analytics.fit_rank_distribution for the offline tail."""
    clean = ontime.na.drop(subset=["Origin", "Dest"])
    counts = explode_count(clean, ["Origin", "Dest"], key="airport", cnt="flights")
    ranked = rank_table(counts, [F.desc("flights"), F.asc("airport")], rank="rank")
    return global_sort(ranked, [F.asc("rank")])


def airports(ontime: DataFrame) -> DataFrame:
    """Distinct airport list (Airports job, README.md:447-454)."""
    o = ontime.select(F.col("Origin").alias("airport"))
    d = ontime.select(F.col("Dest").alias("airport"))
    return distinct_union(o.unionByName(d).na.drop(), ["airport"], "airport")


def requests(
    spark: SparkSession,
    airports_df: DataFrame,
    start: str = "2008-01-01",
    end: str = "2008-12-31",
    limit: int | None = None,
) -> DataFrame:
    """(origin, stop, dest, request_date) — airport permutation
    triplets × the 2008 date series (OriginStopDest + Requests,
    README.md:458-503). `limit` is the reference's dev-time cap (T5,
    README.md:500) — at full scale |airports|³×366 is huge; generate
    lazily and cap explicitly."""
    triplets = permutation_triplets(airports_df, "airport")
    dates = date_series(spark, start, end, out="request_date")
    req = triplets.crossJoin(F.broadcast(dates))
    return req.limit(limit) if limit is not None else req


def leg_candidates(ontime: DataFrame, year: int = 2008) -> DataFrame:
    """Flight legs eligible for Tom's trip (LegCandidates,
    README.md:505-534): project the 8 columns, keep `year` flights
    (P2), drop rows with missing fields (P4), repair DepTime hour > 23
    by rolling into the next day (P5, README.md:513), and derive the
    scheduled departure = actual − DepDelay minutes (P6,
    README.md:514). `sched_sec` (seconds after midnight) carries the
    noon predicate; `sched_dep_fmt` is the reference's output format
    (P7, 'HH:mm dd/MM/yyyy', README.md:507)."""
    clean = (
        ontime.filter(F.year("FlightDate") == year)
        .na.drop(
            subset=[
                "Origin",
                "Dest",
                "FlightDate",
                "UniqueCarrier",
                "FlightNum",
                "DepTime",
                "DepDelay",
                "ArrDelay",
            ]
        )
        .filter(F.col("DepTime").rlike("^[0-9]{4}$"))
    )
    hh = F.substring("DepTime", 1, 2).cast("int")
    mm = F.substring("DepTime", 3, 2).cast("int")
    rolled = hh > 23
    dep_date = F.when(rolled, F.date_add("FlightDate", 1)).otherwise(
        F.col("FlightDate")
    )
    dep_ts = F.to_timestamp(
        F.concat(
            F.date_format(dep_date, "yyyy-MM-dd"),
            F.lit(" "),
            F.format_string("%02d:%02d", F.when(rolled, hh - 24).otherwise(hh), mm),
        )
    )
    return (
        clean.withColumn("dep_ts", dep_ts)
        .withColumn(
            "sched_dep", F.expr("dep_ts - make_dt_interval(0, 0, DepDelay, 0)")
        )
        .select(
            "Origin",
            "Dest",
            "FlightDate",
            "UniqueCarrier",
            "FlightNum",
            "ArrDelay",
            "sched_dep",
            (
                F.hour("sched_dep") * 3600
                + F.minute("sched_dep") * 60
                + F.second("sched_dep")
            ).alias("sched_sec"),
            F.date_format("sched_dep", "HH:mm dd/MM/yyyy").alias("sched_dep_fmt"),
        )
    )


def toms_leg(requests_df: DataFrame, legs: DataFrame, leg_no: int) -> DataFrame:
    """One leg of Tom's trip (TomsLegs1/2, README.md:537-570).

    leg 1: origin→stop on request_date, scheduled dep before 12:00;
    leg 2: stop→dest on request_date + 2 days, scheduled dep after
    12:00 (P8 date-shifted join key, README.md:542-543). Per request,
    keep the candidate with least ArrDelay (A7, tie-broken on
    (UniqueCarrier, FlightNum) for determinism — README exposes no
    tie rule, SURVEY.md §2.4)."""
    # Both sides can share lineage (requests are generated from the
    # same ontime frame), and Spark's case-insensitive resolution
    # would conflate `origin`/`Origin` — alias-qualify everything.
    req = requests_df.alias("req")
    if leg_no == 1:
        leg = legs.filter(F.col("sched_sec") < _NOON_SEC).alias("leg")
        join_cond = (
            (F.col("leg.Origin") == F.col("req.origin"))
            & (F.col("leg.Dest") == F.col("req.stop"))
            & (F.col("leg.FlightDate") == F.col("req.request_date"))
        )
    elif leg_no == 2:
        leg = legs.filter(F.col("sched_sec") > _NOON_SEC).alias("leg")
        join_cond = (
            (F.col("leg.Origin") == F.col("req.stop"))
            & (F.col("leg.Dest") == F.col("req.dest"))
            & (F.col("leg.FlightDate") == F.date_add(F.col("req.request_date"), 2))
        )
    else:
        raise ValueError("leg_no must be 1 or 2")
    joined = req.join(leg, join_cond).select(
        F.col("req.origin").alias("origin"),
        F.col("req.stop").alias("stop"),
        F.col("req.dest").alias("dest"),
        F.col("req.request_date").alias("request_date"),
        F.col("leg.Origin").alias("leg_origin"),
        F.col("leg.Dest").alias("leg_dest"),
        F.col("leg.FlightDate").alias("leg_date"),
        F.col("leg.UniqueCarrier").alias("carrier"),
        F.col("leg.FlightNum").alias("flight_num"),
        F.col("leg.ArrDelay").alias("arr_delay"),
        F.col("leg.sched_sec").alias("sched_sec"),
        F.col("leg.sched_dep_fmt").alias("sched_dep_fmt"),
    )
    return argmin_by(
        joined,
        group=["origin", "stop", "dest", "request_date"],
        order=["arr_delay", "carrier", "flight_num"],
        payload=["leg_origin", "leg_dest", "leg_date", "sched_sec", "sched_dep_fmt"],
    )
