"""Reference-pipeline-shaped queries over the driver tables.

The weather/hotels domain itself is covered by golden-value pytest fixtures
(tests/test_weather_pipeline.py); these queries exercise the same operator
chain — rekey, two-level aggregation, changelog latest-per-key, enrichment
join, tumbling windows, geohash keying — on the driver's tables so each one
gets a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geohash import geohash_expr
from ..operators.weather import latest_per_key
from ..schemas import load_table
from .registry import query


def duckdb_geohash_sql(lat_expr: str, lng_expr: str, precision: int = 4) -> tuple[str, str]:
    """Generate DuckDB SQL computing the same geohash as ``geohash_expr``.

    Returns ``(packed_expr, chars_expr)``: the bit-interleave expression
    (expects ``__latq``/``__lngq`` helper columns from
    :func:`duckdb_geohash_prelude`) and the base32 character expression
    (expects ``__packed``). Mirrors the quantize-and-interleave formulation
    term by term so the oracle exercises our geohash at full fidelity
    (bit-identical IEEE arithmetic in both engines).
    """
    total_bits = 5 * precision
    n_lng = (total_bits + 1) // 2
    terms = []
    for i in range(n_lng):
        terms.append(f"(((__lngq >> {n_lng - 1 - i}) & 1) << {total_bits - 1 - 2 * i})")
    for i in range(total_bits // 2):
        terms.append(f"(((__latq >> {total_bits // 2 - 1 - i}) & 1) << {total_bits - 2 - 2 * i})")
    packed = " | ".join(terms)
    chars = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((__packed >> {5 * (precision - 1 - c)}) & 31) AS INT) + 1, 1)"
        for c in range(precision)
    )
    return packed, chars


def duckdb_geohash_prelude(lat_expr: str, lng_expr: str, precision: int = 4) -> str:
    """Quantization helper columns for the oracle, including the exact
    edge-compare correction step that makes ``geohash_expr`` bit-exact with
    the bisection reference at cell boundaries (functions/geohash.py).
    Expression text repeats sub-terms; DuckDB CSEs them."""
    total_bits = 5 * precision
    n_lng = (total_bits + 1) // 2
    n_lat = total_bits // 2

    def axis(x: str, off: float, lo: float, span: float, nbits: int) -> str:
        xb = f"least(greatest({x}, {lo!r}), {lo + span!r})"
        q0 = f"CAST(floor(({xb} + {off!r}) / {span!r} * {float(1 << nbits)!r}) AS BIGINT)"
        cell = span / float(1 << nbits)  # exponent shift: exact
        # CAST AS DOUBLE: DuckDB parses decimal literals as DECIMAL, and a
        # DOUBLE-vs-DECIMAL(36,15) compare does NOT match double semantics
        # (observed: lat < edge false where both all-double and all-decimal
        # comparisons are true) — keep the whole correction in DOUBLE.
        edge = f"(CAST({lo!r} AS DOUBLE) + {q0} * CAST({cell!r} AS DOUBLE))"
        edge_next = f"(CAST({lo!r} AS DOUBLE) + ({q0} + 1) * CAST({cell!r} AS DOUBLE))"
        adj = (
            f"(CASE WHEN {xb} < {edge} THEN {q0} - 1 "
            f"WHEN {xb} >= {edge_next} THEN {q0} + 1 ELSE {q0} END)"
        )
        return f"least(greatest({adj}, 0), {(1 << nbits) - 1})"

    return (
        f"{axis(lat_expr, 90.0, -90.0, 180.0, n_lat)} AS __latq, "
        f"{axis(lng_expr, 180.0, -180.0, 360.0, n_lng)} AS __lngq"
    )


def _geohash_cells_oracle() -> str:
    packed, chars = duckdb_geohash_sql("__lat", "__lng", 4)
    return f"""
    WITH coords AS (
      SELECT value,
             (value % 180.0) - 90.0        AS __lat,
             ((value * 7.0) % 360.0) - 180.0 AS __lng
      FROM events
    ), quant AS (
      SELECT value, {duckdb_geohash_prelude('__lat', '__lng', 4)}
      FROM coords
    ), packed AS (
      SELECT value, ({packed}) AS __packed FROM quant
    )
    SELECT ({chars}) AS geohash,
           count(*) AS n_obs,
           round((avg(value)) + 1e-07, 4) AS avg_value
    FROM packed
    GROUP BY 1
    """


@query("geohash_cells", oracle=_geohash_cells_oracle())
def geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+A1-A3 with the real geohash function: derive deterministic
    coordinates from event values, geohash-rekey at precision 4, aggregate
    per cell. The oracle recomputes the geohash bit math in DuckDB SQL, so
    the custom function itself is hash-checked at sf0.01 — not just the five
    golden vectors."""
    from ..schemas import fan_out_scan

    # opt-r16 (guide §2.5): precision-4 geohash bit math fuses into the
    # single-split events scan and ran serially in one task; fan the one
    # needed column out first (no-op on multi-split tables).
    e = fan_out_scan(load_table(spark, sf_dir, "events").select("value"))
    lat = (F.col("value") % F.lit(180.0)) - F.lit(90.0)
    lng = ((F.col("value") * F.lit(7.0)) % F.lit(360.0)) - F.lit(180.0)
    return (
        e.select(geohash_expr(lat, lng, 4).alias("geohash"), "value")
        .groupBy("geohash")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round((F.avg("value")) + 1e-07, 4).alias("avg_value"),
        )
    )


@query(
    "pipeline_enrich_daily_rollup",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             avg(value) AS daily_avg
      FROM events
      GROUP BY 1, 2
    ), rollup_by_user AS (
      SELECT user_id,
             count(*)                   AS n_days,
             round((avg(daily_avg)) + 1e-07, 4)   AS avg_daily_value,
             CAST(min(day) AS VARCHAR)  AS first_day,
             CAST(max(day) AS VARCHAR)  AS last_day
      FROM daily
      GROUP BY user_id
    )
    SELECT c_custkey, c_name, n_days, avg_daily_value, first_day, last_day
    FROM customer JOIN rollup_by_user ON c_custkey = user_id
    """,
)
def pipeline_enrich_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical topology shape (WeatherHotelsApp.java:46-66) on driver
    tables: per-(key, day) average -> per-key rollup -> enrichment join onto
    a dimension. Same two-level aggregation + broadcast-join plan as the
    weather pipeline; flat rollup columns instead of collect_list so the
    oracle hash is representation-independent."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    daily = (
        e.groupBy("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.avg("value").alias("daily_avg"))
    )
    rollup = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round((F.avg("daily_avg")) + 1e-07, 4).alias("avg_daily_value"),
        F.min("day").cast("string").alias("first_day"),
        F.max("day").cast("string").alias("last_day"),
    )
    return c.join(
        rollup, c.c_custkey == rollup.user_id, "inner"
    ).select("c_custkey", "c_name", "n_days", "avg_daily_value", "first_day", "last_day")


@query(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, round((value) + 1e-05, 2) AS value
    FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 changelog view (KStream.toTable, MyStream.java:166-168) on the
    events stream: last write per user via one max_by aggregation — no
    window sort shuffle. Tiebreak on event_id for determinism."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.round(F.col("value") + 1e-05, 2).alias("value"), "ts"
    )
    out = latest_per_key(e, "user_id", F.struct(F.col("ts"), F.col("event_id")))
    return out.select("user_id", "event_id", "event_type", "value")


@query(
    "events_hourly_tumbling",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
           event_type,
           count(*) AS n_events,
           round((sum(value)) + 1e-05, 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch twin of the streaming
    window() operator — SURVEY §2.6 'windows: none in reference', engine
    provides them). Uses window() so the same code runs on a stream."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round((F.sum("value")) + 1e-05, 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "session_suite",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN date_diff('second',
                                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                 ts) <= 1800 THEN 0 ELSE 1 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM flagged
    )
    SELECT 'counts' AS leg, user_id, CAST(session_no AS INT) AS session_no,
           CAST(NULL AS VARCHAR) AS session_start, count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    UNION ALL
    SELECT 'window', user_id, CAST(NULL AS INT),
           CAST(min(ts) AS VARCHAR), count(*)
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def session_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two sessionization formulations in one driver slot (merged r4: was
    sessionized_event_counts + session_window_stats; both legs keep their
    full row sets):

    'counts' — gaps-and-islands (lag/cumsum) sessionization, the batch
    twin of session_window, keyed by (user, session_no).

    'window' — Spark's NATIVE session_window() operator (30-min inactivity
    gap), keyed by (user, session_start). The oracle derives both legs from
    the same lag/cumsum sessions, so the native operator is hash-checked
    against portable SQL; segmentation is identical because event
    timestamps are microsecond-unique per user (ties can't straddle a
    session boundary)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = load_table(spark, sf_dir, "events")
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) <= 1800, 0
        ).otherwise(1),
    )
    numbered = flagged.withColumn("session_no", F.sum("new_session").over(cum).cast("int"))
    counts_leg = numbered.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events")
    ).select(
        F.lit("counts").alias("leg"),
        "user_id",
        "session_no",
        F.lit(None).cast("string").alias("session_start"),
        "n_events",
    )
    window_leg = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.lit("window").alias("leg"),
            "user_id",
            F.lit(None).cast("int").alias("session_no"),
            F.col("w.start").cast("string").alias("session_start"),
            "n_events",
        )
    )
    return counts_leg.unionByName(window_leg)


@query(
    "asof_purchase_to_click",
    oracle="""
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    r AS (SELECT user_id, ts, max(event_id) AS event_id
          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
    SELECT l.event_id, r.event_id AS click_event_id
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior (or
    simultaneous) click. Union-window formulation (operators/asof.py): tag
    and union both sides, one shuffle+sort on (user_id, ts), last_value of
    the right side's columns over the ordered window — all JVM-side, no
    per-group pandas. The right side is deduped to one row per (user, ts)
    so backward-match ties are impossible and the result is
    engine-independent.

    opt-r16: the interrupted build round folded this slot into
    ``temporal_join_suite``'s 'asof' leg; the optimization round reverts
    that fold — the no-regression contract pins the r15 driver window
    (names AND results), so this entry stays registered and
    ``theta_sketch_suite`` registers past the window instead."""
    from ..operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join(purchases, clicks, on="ts", by="user_id")
    return out.select("event_id", F.col("r_event_id").alias("click_event_id"))


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native session_window leg of :func:`session_suite`, standalone —
    kept (unregistered) for bench comparability with the frozen r1
    workload; the driver slot now hash-checks it inside ``session_suite``."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("string").alias("session_start"),
            "n_events",
        )
    )


def _weather_topology_oracle() -> str:
    """Oracle for the full reference topology, geohash recomputed in SQL at
    precision 2 (total 10 bits -> 5 per axis)."""
    packed_w, chars_w = duckdb_geohash_sql("__lat", "__lng", 2)
    return f"""
    WITH wcoords AS (
      SELECT value,
             CAST(date_trunc('day', ts) AS DATE) AS wthr_date,
             (value % 180.0) - 90.0 AS __lat,
             ((value * 7.0) % 360.0) - 180.0 AS __lng
      FROM events
    ), wquant AS (
      SELECT value, wthr_date, {duckdb_geohash_prelude('__lat', '__lng', 2)} FROM wcoords
    ), wpacked AS (
      SELECT value, wthr_date, ({packed_w}) AS __packed FROM wquant
    ), weather_keyed AS (
      SELECT ({chars_w}) AS geohash, wthr_date, value FROM wpacked
    ), daily AS (
      SELECT geohash, wthr_date, avg(value) AS tmp FROM weather_keyed GROUP BY 1, 2
    ), rollup_by_cell AS (
      SELECT geohash,
             count(*) AS n_days,
             round((avg(tmp)) + 1e-07, 4) AS avg_tmp,
             CAST(min(wthr_date) AS VARCHAR) AS first_day,
             CAST(max(wthr_date) AS VARCHAR) AS last_day
      FROM daily GROUP BY geohash
    ), hcoords AS (
      SELECT c_custkey, c_name,
             (c_acctbal % 180.0) - 90.0 AS __lat,
             ((c_acctbal * 7.0) % 360.0) - 180.0 AS __lng
      FROM customer
    ), hquant AS (
      SELECT c_custkey, c_name, {duckdb_geohash_prelude('__lat', '__lng', 2)} FROM hcoords
    ), hpacked AS (
      SELECT c_custkey, c_name, ({packed_w}) AS __packed FROM hquant
    ), hotels AS (
      SELECT c_custkey, c_name, ({chars_w}) AS hash FROM hpacked
    )
    SELECT c_custkey, c_name, hash, n_days, avg_tmp, first_day, last_day
    FROM hotels JOIN rollup_by_cell ON hash = geohash
    """


@query("weather_topology_full", oracle=_weather_topology_oracle())
def weather_topology_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship: the reference's complete canonical topology
    (WeatherHotelsApp.java:46-66) end-to-end on driver tables — geohash
    rekey (P1/F1) -> per-(cell, date) average (A1-A3) -> per-cell rollup
    (A4-A5, flat aggregates instead of collect_list so the oracle hash is
    representation-independent) -> inner enrichment join onto a
    geohash-keyed dimension (P2 + J1). Derived coordinates: events.value
    maps to (lat, lng) for observations, customer.c_acctbal for hotel
    locations — same formula family, precision-2 cells so the two
    populations overlap. The oracle recomputes the geohash bit math in SQL,
    making every stage of the topology hash-checked."""
    from ..schemas import fan_out_scan, no_pushdown

    # opt-r16 (guide §2.5): the geohash bit-math chain fuses into each
    # side's scan stage, and both driver tables are single-split parquet —
    # the whole observation chain (geohash + partial aggregates) ran 1.38s
    # of CPU in ONE task on a 32-core session, with the hotel chain adding
    # another 0.24s serial. Fan the projected columns out first; the
    # exchanges move 16-byte rows, and real multi-split tables skip them.
    # no_pushdown on both geohash keys: the inner join infers
    # isnotnull(key) and would otherwise sink it below the exchange with
    # the whole geohash expression substituted in — running the chain
    # serially AND twice per row (guide §4.4).
    e = fan_out_scan(load_table(spark, sf_dir, "events").select("value", "ts"))
    c = fan_out_scan(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    )

    lat_e = (F.col("value") % F.lit(180.0)) - F.lit(90.0)
    lng_e = ((F.col("value") * F.lit(7.0)) % F.lit(360.0)) - F.lit(180.0)
    keyed = e.select(
        no_pushdown(geohash_expr(lat_e, lng_e, 2)).alias("geohash"),
        F.date_trunc("day", "ts").cast("date").alias("wthr_date"),
        F.col("value"),
    )
    daily = keyed.groupBy("geohash", "wthr_date").agg(F.avg("value").alias("tmp"))
    rollup = daily.groupBy("geohash").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg("tmp") + 1e-07, 4).alias("avg_tmp"),
        F.min("wthr_date").cast("string").alias("first_day"),
        F.max("wthr_date").cast("string").alias("last_day"),
    )

    lat_c = (F.col("c_acctbal") % F.lit(180.0)) - F.lit(90.0)
    lng_c = ((F.col("c_acctbal") * F.lit(7.0)) % F.lit(360.0)) - F.lit(180.0)
    hotels = c.select(
        "c_custkey", "c_name", no_pushdown(geohash_expr(lat_c, lng_c, 2)).alias("hash")
    )
    return hotels.join(
        F.broadcast(rollup.withColumnRenamed("geohash", "hash")), on="hash", how="inner"
    ).select("c_custkey", "c_name", "hash", "n_days", "avg_tmp", "first_day", "last_day")
