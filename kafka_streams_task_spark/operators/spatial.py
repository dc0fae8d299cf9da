"""Spatial radius joins via grid-cell blocking.

Find all pairs of points within ``radius_km`` great-circle distance —
the geo-blocking join every location-enriched corpus needs (store /
user proximity, POI conflation, location dedup). The reference repo's
only spatial surface is geohash bucketing of weather points
(`functions/geohash.py`, SURVEY §2.5 F1); this extends that wing to
pairwise proximity, the step geohash cells alone cannot answer.

Algorithm (standard grid blocking, the relational form of a geohash
neighbor join):

1. every point gets an integer home cell ``(floor((lat+90)/cell),
   floor((lon+180)/cell))`` — longitude cells wrap at the antimeridian
   via pmod, so cross-±180° pairs are found;
2. the probe side explodes to its (2·n_lat+1)×(2·n_lon+1) neighbor
   ring — ring radii are Python-time constants derived from
   ``radius_km``, ``cell_deg`` and the declared ``max_abs_lat`` bound
   (longitude degrees shrink by cos(lat), so the ring must widen for
   the worst latitude the data may contain);
3. an equi-join on the cell key produces candidates (each true pair
   exactly once — the build side uses only its single home cell);
4. the exact haversine predicate verifies candidates.

Scale design (the 100 TB story): the only shuffle is the cell-key
equi-join — candidates are bounded by per-cell occupancy, never |A|×|B|
(the plan audit proves no CartesianProduct / BNLJ); the constant ring
expansion is a cheap JVM explode; haversine is whole-stage-codegen
trig. Dense-city cell skew is the known hazard — AQE skew-join
splitting handles moderate skew (pinned by
tests/test_spatial.py::test_megacity_cell_skew_aqe_split_engages: a
500x-occupancy cell under a forced shuffle join gets an
``AQEShuffleRead skewed`` split with exact results), and ``cell_deg``
is the tuning knob (smaller cells = more keys, less skew, bigger
ring).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import fan_out_scan

__all__ = ["haversine_km", "radius_join", "radius_self_join"]

#: IUGG mean Earth radius, km
_EARTH_R = 6371.0088
#: ring-sizing latitude constant: ring bounds must never use a constant
#: LARGER than the metric the haversine verifier measures with (spherical
#: km/deg = pi*R/180 = 111.1949...), or the ring can round one cell short
#: and silently drop in-radius pairs (review catch). 110.574 (WGS84
#: meridian mean) is SMALLER, i.e. conservative: it only ever widens the
#: ring. The longitude bound uses the exact asin inversion on _EARTH_R
#: directly (r11).
_KM_PER_DEG_LAT = 110.574


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine, double precision).

    Squares are written as explicit products (never ``pow``) and the
    operand order is fixed so an oracle stating the same expression
    reproduces the arithmetic to the ULP.
    """
    s1 = F.sin(F.radians(lat2 - lat1) / 2)
    s2 = F.sin(F.radians(lon2 - lon1) / 2)
    h = s1 * s1 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * s2 * s2
    return F.lit(2.0 * _EARTH_R) * F.asin(F.sqrt(h))


def _ring(radius_km: float, cell_deg: float, max_abs_lat: float):
    n_lat = math.ceil((radius_km / _KM_PER_DEG_LAT) / cell_deg)
    # exact longitude bound (r11 advisor catch): from the haversine
    # identity, an in-radius pair at |lat| <= max_abs_lat satisfies
    # |dlon| <= 2*asin(sin(r/2R)/cos(max_abs_lat)) — LARGER than the
    # linear radius/(km_per_deg_lon) estimate (asin curvature; it
    # saturates at 180 deg through the pole). The old linear bound
    # silently dropped in-radius pairs at high lat + large radius
    # (800 km at lat 75 lost a 799.99 km pair). x >= 1 means the
    # circle crosses the pole: cover every lon cell.
    x = math.sin(radius_km / (2.0 * _EARTH_R)) / math.cos(
        math.radians(max_abs_lat)
    )
    if x >= 1.0:
        n_lon = math.ceil(360.0 / cell_deg)  # trips the cover-all branch
    else:
        max_dlon_deg = math.degrees(2.0 * math.asin(x))
        # 1e-12 relative nudge: only ever widens, guards the exact-
        # multiple-of-cell_deg boundary against ULP noise in the chain
        n_lon = math.ceil((max_dlon_deg * (1.0 + 1e-12)) / cell_deg)
    return n_lat, n_lon


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 0.5,
    max_abs_lat: float = 75.0,
    validate: bool = True,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``.

    Output: every ``left`` column suffixed ``suffixes[0]``, every
    ``right`` column suffixed ``suffixes[1]``, plus ``dist_km``.
    Rows with NULL coordinates never pair (no cell). ``max_abs_lat``
    declares the latitude bound the ring math may assume; with
    ``validate=True`` (one bounded pre-aggregation per side) the
    declaration is enforced, not trusted.
    """
    if radius_km <= 0 or cell_deg <= 0:
        raise ValueError("radius_km and cell_deg must be positive")
    if not 0 < max_abs_lat <= 85.0:
        raise ValueError(
            "max_abs_lat must be in (0, 85] — beyond 85° the lon ring "
            "degenerates; use a dedicated polar strategy"
        )
    if validate:
        for side, df in (("left", left), ("right", right)):
            worst = df.agg(
                F.max(F.abs(F.col(lat_col))).alias("m")
            ).collect()[0]["m"]
            if worst is not None and worst > max_abs_lat:
                raise ValueError(
                    f"{side} side has |lat| = {worst} > "
                    f"max_abs_lat = {max_abs_lat}"
                )
    n_lat, n_lon = _ring(radius_km, cell_deg, max_abs_lat)
    n_lon_cells = round(360.0 / cell_deg)
    if abs(n_lon_cells * cell_deg - 360.0) > 1e-9 * 360.0:
        # a non-divisor cell_deg leaves a NARROWER last cell at the
        # antimeridian, and the constant-width ring under-covers across
        # the wrap (review catch) — refuse rather than silently miss
        raise ValueError(
            f"cell_deg={cell_deg} must divide 360 evenly (e.g. 0.5, "
            "0.25, 2.0) so longitude cells are uniform across the "
            "antimeridian wrap"
        )
    # a huge radius / tiny circle at high latitude can make the lon
    # ring wider than the globe; cover each cell EXACTLY once then
    # (pmod would otherwise hit cells twice -> duplicate pairs)
    if 2 * n_lon + 1 >= n_lon_cells:
        lon_offsets = list(range(0, n_lon_cells))
    else:
        lon_offsets = list(range(-n_lon, n_lon + 1))

    def cells(df: DataFrame, suffix: str) -> DataFrame:
        # opt-r16 (guide §4.4): cell keys are wrapped in no_pushdown and
        # the null guard moved ABOVE the projection, testing the computed
        # cells instead of the raw coordinates (null lat/lon => null
        # cell — same rows dropped). The old pre-filter, plus the
        # isnotnull(_jlat/_jlon) the inner join infers, sank below this
        # projection — and below any fan-out exchange — with the
        # caller's whole coordinate-derivation chain substituted in,
        # re-running it serially in the scan task (measured: two 0.7-0.8s
        # single-task stages on the md5-derived bench fixture).
        from ..schemas import no_pushdown

        renamed = df.select(
            *[F.col(c).alias(c + suffix) for c in df.columns]
        )
        lat = F.col(lat_col + suffix)
        lon = F.col(lon_col + suffix)
        return renamed.select(
            "*",
            no_pushdown(F.floor((lat + F.lit(90.0)) / F.lit(cell_deg)).cast("long"))
            .alias("_latc"),
            no_pushdown(F.floor((lon + F.lit(180.0)) / F.lit(cell_deg)).cast("long"))
            .alias("_lonc"),
        ).filter(F.col("_latc").isNotNull() & F.col("_lonc").isNotNull())

    sa, sb = suffixes
    # opt-r16: the probe side carries the ring explode AND (after the
    # build side broadcasts) the join + haversine verify fused into its
    # scan stage — a single-split source serializes all of it in one
    # task (measured 1.6 s of CPU in one task on a 32-core session).
    # Fan the already-projected points out first; no-op on real
    # multi-split tables.
    probe = (
        cells(fan_out_scan(left), sa)
        .select(
            "*",
            F.explode(
                F.array(*[F.lit(i) for i in range(-n_lat, n_lat + 1)])
            ).alias("_dlat"),
        )
        .select(
            "*",
            F.explode(
                F.array(*[F.lit(i) for i in lon_offsets])
            ).alias("_dlon"),
        )
        .select(
            *[c + sa for c in left.columns],
            (F.col("_latc") + F.col("_dlat")).alias("_jlat"),
            F.pmod(F.col("_lonc") + F.col("_dlon"), F.lit(n_lon_cells))
            .cast("long")
            .alias("_jlon"),
        )
    )
    build = cells(fan_out_scan(right), sb).select(
        *[c + sb for c in right.columns],
        F.col("_latc").alias("_jlat"),
        F.pmod(F.col("_lonc"), F.lit(n_lon_cells)).cast("long").alias(
            "_jlon"
        ),
    )
    dist = haversine_km(
        F.col(lat_col + sa),
        F.col(lon_col + sa),
        F.col(lat_col + sb),
        F.col(lon_col + sb),
    )
    return (
        probe.join(build, ["_jlat", "_jlon"], "inner")
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= F.lit(float(radius_km)))
        .drop("_jlat", "_jlon")
    )


def radius_self_join(
    pts: DataFrame,
    radius_km: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    **kwargs,
) -> DataFrame:
    """Distinct unordered pairs of ``pts`` within ``radius_km``
    (``id_a < id_b`` — self-pairs and mirror duplicates removed).
    """
    out = radius_join(
        pts, pts, radius_km, lat_col=lat_col, lon_col=lon_col, **kwargs
    )
    sa, sb = kwargs.get("suffixes", ("_a", "_b"))
    return out.filter(F.col(id_col + sa) < F.col(id_col + sb))
