"""Geo queries and aggregations over synced geo_point fields.

Monstache deployments routinely sync documents carrying geo fields
(the engine's BSON→JSON pass forwards any nested {lat, lon} shape
untouched — monstachemap/encoding.go:113-138 — and real ES mappings
type them `geo_point`); the consumers then run `geo_bounding_box` /
`geo_distance` queries and `geo_distance` ring aggregations.  This
module serves those shapes natively:

* :func:`bbox_predicate` — exact arithmetic (four comparisons, fully
  pushdown-eligible when lat/lon are scan columns).
* :func:`haversine_m` — great-circle distance in METERS, rounded to
  whole meters.  The rounding is the documented cross-engine
  contract: sin/cos/asin come from each engine's libm and can differ
  in the last bit; comparing ROUNDED meters makes every downstream
  predicate/bucket decision identical across engines except for
  points within ~1e-9 relative of an exact 0.5 m boundary —
  vanishingly rare and the same class of contract ES itself accepts
  with its distance calculations.  Earth radius: 6,371,000 m (the
  mean-radius constant, as Lucene's SloppyMath/haversin family).
* :func:`geo_distance_buckets` — the ES `geo_distance` aggregation:
  ring buckets ``[from, to)`` in km from an origin, each doc in the
  single ring containing it, rings with no docs omitted (ES keyed
  rings report zero; use a left join against a literal ring frame if
  the zero rows matter).

Scale notes (100 TB): bbox is four scan-pushable comparisons; the
distance column is one codegen projection (no UDF, no shuffle); ring
assignment is a CASE over the projected distance followed by one hash
aggregation.  Nothing geo-specific ever joins or collects.

Dateline-crossing bounding boxes (left lon > right lon) are split
into the two half-boxes — same result, still exact arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EARTH_RADIUS_M = 6_371_000.0


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in whole meters (rounded contract — see
    module docstring)."""
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.sin(dphi / F.lit(2.0)) * F.sin(dphi / F.lit(2.0))
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlmb / F.lit(2.0))
        * F.sin(dlmb / F.lit(2.0))
    )
    d = F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))
    return F.round(d, 0)


def haversine_m_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The DuckDB rendering of :func:`haversine_m` — same formula,
    same constant, same rounding, so oracle hashes can only match if
    both engines agree on every rounded meter."""
    dphi = f"radians(({lat2}) - ({lat1}))"
    dlmb = f"radians(({lon2}) - ({lon1}))"
    a = (
        f"sin({dphi}/2)*sin({dphi}/2) + cos(radians({lat1}))*cos(radians({lat2}))"
        f"*sin({dlmb}/2)*sin({dlmb}/2)"
    )
    return f"round(2 * {EARTH_RADIUS_M} * asin(sqrt({a})), 0)"


def _ll(point) -> tuple[float, float]:
    if isinstance(point, dict):
        return float(point["lat"]), float(point["lon"])
    lat, lon = point
    return float(lat), float(lon)


def parse_distance_m(dist) -> float:
    """ES distance-unit strings ('200km', '500m', '10mi') → meters."""
    if isinstance(dist, (int, float)):
        return float(dist)
    s = str(dist).strip().lower()
    for suf, mult in (("km", 1000.0), ("mi", 1609.344), ("m", 1.0)):
        if s.endswith(suf):
            return float(s[: -len(suf)]) * mult
    return float(s)


def bbox_predicate(lat: Column, lon: Column, top_left, bottom_right) -> Column:
    """ES ``geo_bounding_box``: exact comparisons, dateline-aware."""
    t_lat, l_lon = _ll(top_left)
    b_lat, r_lon = _ll(bottom_right)
    lat_ok = (lat <= F.lit(t_lat)) & (lat >= F.lit(b_lat))
    if l_lon <= r_lon:
        lon_ok = (lon >= F.lit(l_lon)) & (lon <= F.lit(r_lon))
    else:
        # box crosses the antimeridian: two half-boxes
        lon_ok = (lon >= F.lit(l_lon)) | (lon <= F.lit(r_lon))
    return lat_ok & lon_ok


def distance_predicate(lat: Column, lon: Column, origin, distance) -> Column:
    """ES ``geo_distance`` query: rounded haversine ≤ the limit."""
    o_lat, o_lon = _ll(origin)
    return haversine_m(lat, lon, F.lit(o_lat), F.lit(o_lon)) <= F.lit(
        parse_distance_m(distance)
    )


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_bits(precision: int) -> tuple[int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    return lon_bits, lat_bits


def geohash_cell(lat: Column, lon: Column, precision: int = 5) -> Column:
    """Geohash cell string at ``precision`` chars — EXACT arithmetic:
    quantize lon/lat to ``ceil(5p/2)``/``floor(5p/2)`` bits with one
    IEEE multiply + floor (deterministic on every engine), interleave
    the bits MSB-first starting with longitude, and base32-encode 5
    bits per character.  No transcendentals, so geohash bucket
    membership is hash-exact cross-engine with no rounding contract
    (:func:`geotile_cell` is the Mercator scheme, which carries
    one)."""
    lon_bits, lat_bits = _geohash_bits(precision)
    lon_idx = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))),
        F.lit((1 << lon_bits) - 1),
    ).cast("long")
    lat_idx = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))),
        F.lit((1 << lat_bits) - 1),
    ).cast("long")
    chars = []
    for j in range(precision):
        code: Column = F.lit(0)
        for i in range(5):
            k = 5 * j + i  # global bit index from the MSB
            if k % 2 == 0:
                pos = lon_bits - 1 - k // 2
                bit = F.shiftright(lon_idx, pos).bitwiseAND(F.lit(1))
            else:
                pos = lat_bits - 1 - (k - 1) // 2
                bit = F.shiftright(lat_idx, pos).bitwiseAND(F.lit(1))
            code = code + bit * F.lit(1 << (4 - i))
        chars.append(F.lit(_GEOHASH32).substr(code + F.lit(1), F.lit(1)))
    return F.concat(*chars)


def geohash_sql(lat: str, lon: str, precision: int = 5) -> str:
    """DuckDB rendering of :func:`geohash_cell` — same quantization,
    same interleave, same alphabet, exact hash parity."""
    lon_bits, lat_bits = _geohash_bits(precision)
    lon_idx = (
        f"least(CAST(floor((({lon}) + 180.0) / 360.0 * {float(1 << lon_bits)}) AS BIGINT), "
        f"{(1 << lon_bits) - 1})"
    )
    lat_idx = (
        f"least(CAST(floor((({lat}) + 90.0) / 180.0 * {float(1 << lat_bits)}) AS BIGINT), "
        f"{(1 << lat_bits) - 1})"
    )
    parts = []
    for j in range(precision):
        terms = []
        for i in range(5):
            k = 5 * j + i
            if k % 2 == 0:
                pos = lon_bits - 1 - k // 2
                terms.append(f"(({lon_idx} >> {pos}) & 1) * {1 << (4 - i)}")
            else:
                pos = lat_bits - 1 - (k - 1) // 2
                terms.append(f"(({lat_idx} >> {pos}) & 1) * {1 << (4 - i)}")
        code = " + ".join(terms)
        parts.append(f"substr('{_GEOHASH32}', CAST({code} AS INTEGER) + 1, 1)")
    return " || ".join(parts)


def geohash_grid(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int = 5,
    size: int | None = None,
) -> DataFrame:
    """ES ``geohash_grid`` aggregation: doc counts per geohash cell at
    ``precision``, count-desc (ties on the cell key) truncated to
    ``size`` — the map-clustering agg every geo dashboard issues.
    One codegen cell projection + one hash agg +
    TakeOrderedAndProject; null coordinates drop as in ES."""
    out = (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .select(
            geohash_cell(F.col(lat_col), F.col(lon_col), precision).alias("geohash")
        )
        .groupBy("geohash")
        .agg(F.count("*").cast("long").alias("doc_count"))
    )
    if size is not None:
        out = out.orderBy(
            F.col("doc_count").desc(), F.col("geohash").asc()
        ).limit(size)
    return out


# Web-Mercator latitude limit (ES/OSM tile scheme): tan/ln diverge at
# the poles, so geotile clamps latitude here — poles land in the
# top/bottom tile row, exactly as ES's GeoTileUtils does
MERCATOR_LAT_MAX = 85.05112877980659


def geotile_cell(lat: Column, lon: Column, zoom: int = 7) -> Column:
    """ES ``geotile_grid`` cell key ``"z/x/y"`` — Web-Mercator tiles,
    the scheme Kibana maps default to (zoom/x/y, y growing southward).

    Reference formula (Lucene GeoTileUtils / the OSM slippy-map
    contract): ``x = ⌊(lon+180)/360·2^z⌋`` and
    ``y = ⌊(0.5 − ln((1+sin φ)/(1−sin φ))/4π)·2^z⌋`` with latitude
    clamped to ±85.0511287798° and both indices clamped to
    ``[0, 2^z−1]``.

    The x axis is EXACT arithmetic (one multiply + floor, the geohash
    contract).  The y axis needs ``sin``/``ln`` — transcendentals
    whose last bits differ across libms — so membership carries the
    same ROUNDED contract as :func:`haversine_m`: the projected y
    fraction rounds to 12 decimals before the floor.  Multiplying by
    ``2^z`` is IEEE-exact, so the rounding grain is the documented
    cross-engine boundary: points within ~1e-12 of a tile edge may
    differ from an unrounded engine, the same contract class ES
    accepts for its distance buckets.  :func:`geotile_sql` renders the
    identical expression tree for DuckDB.
    """
    n = float(1 << zoom)
    max_idx = (1 << zoom) - 1
    x = F.least(
        F.greatest(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("long"),
            F.lit(0),
        ),
        F.lit(max_idx),
    )
    lat_c = F.greatest(F.least(lat, F.lit(MERCATOR_LAT_MAX)), F.lit(-MERCATOR_LAT_MAX))
    sinp = F.sin(F.radians(lat_c))
    yfrac = F.lit(0.5) - F.log(
        (F.lit(1.0) + sinp) / (F.lit(1.0) - sinp)
    ) / F.lit(4.0 * math.pi)
    y = F.least(
        F.greatest(
            F.floor(F.round(yfrac, 12) * F.lit(n)).cast("long"), F.lit(0)
        ),
        F.lit(max_idx),
    )
    return F.concat_ws(
        "/", F.lit(str(zoom)), x.cast("string"), y.cast("string")
    )


def geotile_sql(lat: str, lon: str, zoom: int = 7) -> str:
    """DuckDB rendering of :func:`geotile_cell` — same clamp, same
    formula, same 12-decimal rounded-Mercator contract, exact hash
    parity on every cell key."""
    n = float(1 << zoom)
    max_idx = (1 << zoom) - 1
    x = (
        f"least(greatest(CAST(floor((({lon}) + 180.0) / 360.0 * {n}) AS BIGINT), 0), "
        f"{max_idx})"
    )
    lat_c = f"greatest(least({lat}, {MERCATOR_LAT_MAX}), {-MERCATOR_LAT_MAX})"
    sinp = f"sin(radians({lat_c}))"
    yfrac = f"(0.5 - ln((1.0 + {sinp}) / (1.0 - {sinp})) / {4.0 * math.pi!r})"
    y = (
        f"least(greatest(CAST(floor(round({yfrac}, 12) * {n}) AS BIGINT), 0), "
        f"{max_idx})"
    )
    return f"('{zoom}' || '/' || CAST({x} AS VARCHAR) || '/' || CAST({y} AS VARCHAR))"


def geotile_grid(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    zoom: int = 7,
    size: int | None = None,
) -> DataFrame:
    """ES ``geotile_grid`` aggregation: doc counts per Web-Mercator
    tile at ``zoom``, count-desc (ties on the tile key) truncated to
    ``size`` — what Kibana maps actually issue (geohash_grid is the
    legacy scheme).  Same plan as :func:`geohash_grid`: one codegen
    cell projection + one hash agg + TakeOrderedAndProject; null
    coordinates drop as in ES."""
    out = (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .select(
            geotile_cell(F.col(lat_col), F.col(lon_col), zoom).alias("geotile")
        )
        .groupBy("geotile")
        .agg(F.count("*").cast("long").alias("doc_count"))
    )
    if size is not None:
        out = out.orderBy(
            F.col("doc_count").desc(), F.col("geotile").asc()
        ).limit(size)
    return out


# sqrt(3)/3 as a literal double so both engines multiply by the
# identical IEEE constant (a live sqrt(3.0) call is engine-libm)
_SQRT3_3 = 0.5773502691896258


def geohex_cell(lat: Column, lon: Column, precision: int = 4) -> Column:
    """ES ``geohex_grid`` cell key ``"p/q/r"`` — hexagonal grid
    bucketing under a DOCUMENTED CONTRACT (DIVERGENCES S26): ES bins
    into Uber H3 cells (icosahedral gnomonic faces, aperture-7
    subdivision, pentagon seams) whose cell ids have no closed-form
    arithmetic rendering an independent engine can reproduce; this
    engine bins into POINTY-TOP AXIAL HEXAGONS on the unit Web-Mercator
    square — the same "hexagons tile the map with ~uniform projected
    area and 6 equidistant neighbors" property the agg exists for —
    with cell edge ``2^-precision`` (edge halves per precision step;
    H3 steps by aperture 7).  Axial coordinates by the standard cube
    rounding (round q/r/s, re-derive the component with the largest
    rounding error from the other two so q+r+s = 0 holds).

    Determinism contract: x is exact arithmetic; the Mercator y
    fraction carries the same 12-decimal rounded contract as
    :func:`geotile_cell`; every later step is IEEE multiply/divide/
    round on the identical expression tree both engines evaluate
    (``sqrt(3)/3`` enters as a literal), so cell membership is
    hash-exact cross-engine.  :func:`geohex_sql` renders the mirror.
    """
    if not (0 <= precision <= 12):
        raise ValueError("precision must be in [0, 12]")
    e = 2.0 ** float(-precision)
    x = (lon + F.lit(180.0)) / F.lit(360.0)
    lat_c = F.greatest(
        F.least(lat, F.lit(MERCATOR_LAT_MAX)), F.lit(-MERCATOR_LAT_MAX)
    )
    sinp = F.sin(F.radians(lat_c))
    yfrac = F.lit(0.5) - F.log(
        (F.lit(1.0) + sinp) / (F.lit(1.0) - sinp)
    ) / F.lit(4.0 * math.pi)
    y = F.round(yfrac, 12)
    q = (x * F.lit(_SQRT3_3) - y / F.lit(3.0)) / F.lit(e)
    r = (y * F.lit(2.0) / F.lit(3.0)) / F.lit(e)
    s = -q - r
    rq, rr, rs = F.round(q, 0), F.round(r, 0), F.round(s, 0)
    dq, dr, ds = F.abs(rq - q), F.abs(rr - r), F.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q_f = F.when(fix_q, -rr - rs).otherwise(rq).cast("long")
    r_f = F.when(fix_r, -rq - rs).otherwise(rr).cast("long")
    return F.concat_ws(
        "/", F.lit(str(precision)), q_f.cast("string"), r_f.cast("string")
    )


def geohex_sql(lat: str, lon: str, precision: int = 4) -> str:
    """DuckDB rendering of :func:`geohex_cell` — same clamp, same
    literal constants, same 12-decimal rounded-Mercator contract and
    cube rounding, exact hash parity on every cell key."""
    e = repr(2.0 ** float(-precision))
    x = f"((({lon}) + 180.0) / 360.0)"
    lat_c = f"greatest(least({lat}, {MERCATOR_LAT_MAX}), {-MERCATOR_LAT_MAX})"
    sinp = f"sin(radians({lat_c}))"
    y = (
        f"round(0.5 - ln((1.0 + {sinp}) / (1.0 - {sinp})) / "
        f"{4.0 * math.pi!r}, 12)"
    )
    q = f"(({x} * {_SQRT3_3!r} - {y} / 3.0) / {e})"
    r = f"(({y} * 2.0 / 3.0) / {e})"
    s = f"(-{q} - {r})"
    rq, rr, rs = f"round({q}, 0)", f"round({r}, 0)", f"round({s}, 0)"
    dq = f"abs({rq} - {q})"
    dr = f"abs({rr} - {r})"
    ds = f"abs({rs} - {s})"
    fix_q = f"({dq} > {dr} AND {dq} > {ds})"
    fix_r = f"(NOT {fix_q} AND {dr} > {ds})"
    q_f = f"CAST(CASE WHEN {fix_q} THEN -{rr} - {rs} ELSE {rq} END AS BIGINT)"
    r_f = f"CAST(CASE WHEN {fix_r} THEN -{rq} - {rs} ELSE {rr} END AS BIGINT)"
    return (
        f"('{precision}' || '/' || CAST({q_f} AS VARCHAR) || '/' || "
        f"CAST({r_f} AS VARCHAR))"
    )


def geohex_grid(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int = 4,
    size: int | None = None,
) -> DataFrame:
    """ES ``geohex_grid`` aggregation under the S26 axial-hex contract
    (:func:`geohex_cell`): doc counts per hex cell, count-desc (ties
    on the cell key) truncated to ``size``.  Same plan as
    :func:`geotile_grid`: one codegen cell projection + one hash agg +
    TakeOrderedAndProject; null coordinates drop as in ES."""
    out = (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .select(
            geohex_cell(F.col(lat_col), F.col(lon_col), precision).alias(
                "geohex"
            )
        )
        .groupBy("geohex")
        .agg(F.count("*").cast("long").alias("doc_count"))
    )
    if size is not None:
        out = out.orderBy(
            F.col("doc_count").desc(), F.col("geohex").asc()
        ).limit(size)
    return out


def cartesian_bounds(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ES ``cartesian_bounds`` aggregation — the xy twin of
    :func:`geo_bounds`: the pure min/max bounding box of planar
    points (no wrap, no rounding contract).  One hash agg."""
    g = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    gb = g.groupBy(*group_cols) if group_cols else g.groupBy()
    return gb.agg(
        F.count("*").cast("long").alias("doc_count"),
        F.min(x_col).alias("min_x"),
        F.max(x_col).alias("max_x"),
        F.min(y_col).alias("min_y"),
        F.max(y_col).alias("max_y"),
    )


def cartesian_centroid(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """ES ``cartesian_centroid`` — the xy twin of :func:`geo_centroid`:
    per group the arithmetic mean point, accumulated in exact decimal
    so the centroid is partitioning-independent, rounded at
    ``decimals``.  One hash agg."""
    g = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    gb = g.groupBy(*group_cols) if group_cols else g.groupBy()
    n = F.count("*").cast("double")
    return gb.agg(
        F.count("*").cast("long").alias("doc_count"),
        F.round(
            F.sum(F.col(x_col).cast("decimal(38,6)")).cast("double") / n,
            decimals,
        ).alias("centroid_x"),
        F.round(
            F.sum(F.col(y_col).cast("decimal(38,6)")).cast("double") / n,
            decimals,
        ).alias("centroid_y"),
    )


def polygon_predicate(lat: Column, lon: Column, points) -> Column:
    """ES ``geo_polygon`` query: point-in-polygon by the crossing
    (even-odd) rule — for each edge whose latitude span straddles the
    point, test whether the edge's longitude at the point's latitude
    lies east of the point; an odd crossing count means inside.

    EXACT-arithmetic contract: every term is IEEE multiply/divide/
    compare on the same expression tree in both engines (the crossing
    test is written multiplication-free of transcendentals), so
    membership is hash-exact with no rounding contract — boundary
    points resolve identically everywhere because both engines
    evaluate the identical float expression.  ``points`` is the
    vertex list (closed implicitly); edges are compile-time literals,
    so the whole predicate is one codegen expression bounded by the
    vertex count.
    """
    pts = [_ll(p) for p in points]
    crossings = F.lit(0)
    n = len(pts)
    for i in range(n):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never straddles strictly
        straddles = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        x_at = (
            F.lit(x2 - x1) * (lat - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
        )
        crossings = crossings + F.when(
            straddles & (lon < x_at), F.lit(1)
        ).otherwise(F.lit(0))
    return crossings % F.lit(2) == F.lit(1)


def polygon_sql(lat: str, lon: str, points) -> str:
    """DuckDB rendering of :func:`polygon_predicate` — identical
    expression tree, term for term."""
    pts = [_ll(p) for p in points]
    terms = []
    n = len(pts)
    for i in range(n):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % n]
        if y1 == y2:
            continue
        terms.append(
            f"(CAST(({y1!r} > ({lat})) AS INT) <> CAST(({y2!r} > ({lat})) AS INT)"
            f" AND ({lon}) < {x2 - x1!r} * (({lat}) - {y1!r}) / {y2 - y1!r} + {x1!r})"
        )
    if not terms:
        return "FALSE"
    # XOR chain == odd crossing count
    return "(" + " + ".join(f"CAST({t} AS INT)" for t in terms) + ") % 2 = 1"


def geo_centroid(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    bucket_col: str | None = None,
) -> DataFrame:
    """ES ``geo_centroid`` aggregation: the arithmetic mean point of
    the bucket's coordinates — EXACT decimal sums over lat/lon so
    both means are engine-identical, rounded to 6 decimals (~11 cm)
    for presentation.  (ES computes the same arithmetic centroid; for
    small regions this matches the spherical centroid to far below
    the rounding grain.)  One hash agg; null coordinates drop."""
    base = df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
    aggs = [
        F.count("*").cast("long").alias("doc_count"),
        F.round(
            F.sum(F.col(lat_col).cast("decimal(38,6)")).cast("double")
            / F.count(lat_col).cast("double"),
            6,
        ).alias("centroid_lat"),
        F.round(
            F.sum(F.col(lon_col).cast("decimal(38,6)")).cast("double")
            / F.count(lon_col).cast("double"),
            6,
        ).alias("centroid_lon"),
    ]
    if bucket_col is not None:
        return base.filter(F.col(bucket_col).isNotNull()).groupBy(
            bucket_col
        ).agg(*aggs)
    return base.agg(*aggs)


def geo_bounds(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    bucket_col: str | None = None,
) -> DataFrame:
    """ES ``geo_bounds`` aggregation: the smallest bounding box
    enclosing the bucket's points — ``top_left = (max lat, min lon)``,
    ``bottom_right = (min lat, max lon)``.  EXACT min/max comparisons
    (no arithmetic at all, so no rounding contract), one hash agg;
    null coordinates drop.  ``wrap_longitude`` (the ES
    antimeridian-crossing mode) is not modeled — boxes never wrap,
    the documented default-adjacent behavior for non-crossing data."""
    base = df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
    aggs = [
        F.count("*").cast("long").alias("doc_count"),
        F.max(lat_col).alias("top_left_lat"),
        F.min(lon_col).alias("top_left_lon"),
        F.min(lat_col).alias("bottom_right_lat"),
        F.max(lon_col).alias("bottom_right_lon"),
    ]
    if bucket_col is not None:
        return base.filter(F.col(bucket_col).isNotNull()).groupBy(
            bucket_col
        ).agg(*aggs)
    return base.agg(*aggs)


def geo_distance_buckets(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    origin,
    edges_km: list[float],
    metrics: dict | None = None,
) -> DataFrame:
    """ES ``geo_distance`` aggregation: ring buckets ``[from, to)``
    from ``origin`` with edges in km (``edges_km=[100, 300]`` gives
    rings ``*-100.0``, ``100.0-300.0``, ``300.0-*`` keyed exactly as
    ES keys them).  ``metrics`` is the usual metric-agg body compiled
    by :mod:`.aggs` (e.g. ``{"avg_bal": {"avg": {"field": ...}}}``).

    One distance projection + CASE ring key + one hash agg; rows with
    null coordinates drop (ES ignores docs missing the geo field).
    """
    from monstache_spark.operators.aggs import _metric_exprs, _one

    o_lat, o_lon = _ll(origin)
    dist = haversine_m(
        F.col(lat_col), F.col(lon_col), F.lit(o_lat), F.lit(o_lon)
    )
    edges_m = [e * 1000.0 for e in edges_km]
    key: Column = F.lit(f"{edges_km[-1]:.1f}-*")
    for lo, hi in zip([None, *edges_m[:-1]], edges_m):
        label = (
            f"*-{hi / 1000.0:.1f}"
            if lo is None
            else f"{lo / 1000.0:.1f}-{hi / 1000.0:.1f}"
        )
        cond = dist < F.lit(hi) if lo is None else (
            (dist >= F.lit(lo)) & (dist < F.lit(hi))
        )
        key = F.when(cond, F.lit(label)).otherwise(key)
    aggs = [F.count("*").cast("long").alias("doc_count")]
    for name, body in (metrics or {}).items():
        kind, spec = _one(body)
        aggs.extend(_metric_exprs(name, kind, spec))
    return (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .withColumn("ring", key)
        .groupBy("ring")
        .agg(*aggs)
    )


def geo_line(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    sort_col: str,
    bucket_col: str | None = None,
    max_points: int = 10000,
    digits: int = 6,
) -> DataFrame:
    """ES ``geo_line`` aggregation: per bucket, the track connecting
    the bucket's points in ``sort_col`` order, truncated to the FIRST
    ``max_points`` (ES's ``size`` cap, default and maximum 10000) and
    rendered as a WKT ``LINESTRING(lon lat, …)`` with coordinates
    rounded to ``digits`` decimals (string output keeps the hash
    engine-portable; consumers needing arrays split the WKT).

    Scale shape: the cap applies BEFORE collection — a per-bucket
    ``row_number`` window with the rank filter compiles to
    WindowGroupLimit (top-k per key pushed below the window), so the
    later ``collect_list`` buffers at most ``max_points`` structs per
    bucket, never the raw bucket (the same bound ES enforces; an
    uncapped per-bucket collect would be the one unbounded buffer in
    the engine).  Returns ``(bucket?, doc_count, line)`` where
    doc_count counts the points ON the line.
    """
    b = bucket_col if bucket_col is not None else None
    base = df.filter(
        F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
        & F.col(sort_col).isNotNull()
    )
    part = Window.partitionBy(b) if b else Window.partitionBy()
    w = part.orderBy(F.col(sort_col).asc())
    ranked = base.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_points
    )
    pt = F.struct(
        F.col("_rn").alias("r"),
        F.concat(
            F.format_number(F.round(F.col(lon_col), digits), digits),
            F.lit(" "),
            F.format_number(F.round(F.col(lat_col), digits), digits),
        ).alias("s"),
    )
    gb = ranked.groupBy(b) if b else ranked.groupBy()
    out = gb.agg(
        F.count("*").cast("long").alias("doc_count"),
        F.concat(
            F.lit("LINESTRING("),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(pt)), lambda e: e["s"]
                ),
                ", ",
            ),
            F.lit(")"),
        ).alias("line"),
    )
    return out
