"""Geo read path (operators/geo.py): bbox exactness, rounded-haversine
cross-engine agreement, ring aggregation semantics."""

import duckdb
from pyspark.sql import functions as F

from monstache_spark.operators.geo import (
    geo_distance_buckets,
    haversine_m_sql,
    parse_distance_m,
)
from monstache_spark.operators.search import bool_query_filter


def _pts(spark):
    rows = [
        (1, 0.0, 0.0),
        (2, 0.5, 0.5),      # ~78.6 km from origin
        (3, 2.0, 2.0),      # ~314 km
        (4, 10.0, 10.0),    # ~1565 km
        (5, 52.52, 13.405),   # Berlin
        (6, 48.8566, 2.3522), # Paris (~878 km from Berlin)
        (7, None, None),
    ]
    return spark.createDataFrame(rows, "id long, lat double, lon double").withColumn(
        "loc", F.struct("lat", "lon")
    )


def test_parse_distance_units():
    assert parse_distance_m("200km") == 200000.0
    assert parse_distance_m("500m") == 500.0
    assert parse_distance_m(1234) == 1234.0
    assert abs(parse_distance_m("1mi") - 1609.344) < 1e-9


def test_geo_bbox_filter_and_dateline(spark):
    df = _pts(spark)
    got = {r["id"] for r in bool_query_filter(
        df, {"geo_bounding_box": {"loc": {
            "top_left": {"lat": 3.0, "lon": -1.0},
            "bottom_right": {"lat": -1.0, "lon": 3.0}}}}
    ).collect()}
    assert got == {1, 2, 3}
    # antimeridian-crossing box: left lon 170 > right lon -170
    df2 = spark.createDataFrame(
        [(1, 0.0, 175.0), (2, 0.0, -175.0), (3, 0.0, 0.0)],
        "id long, lat double, lon double",
    ).withColumn("loc", F.struct("lat", "lon"))
    got = {r["id"] for r in bool_query_filter(
        df2, {"geo_bounding_box": {"loc": {
            "top_left": {"lat": 1.0, "lon": 170.0},
            "bottom_right": {"lat": -1.0, "lon": -170.0}}}}
    ).collect()}
    assert got == {1, 2}


def test_geo_distance_query_matches_duckdb_rounding(spark):
    df = _pts(spark)
    got = {r["id"] for r in bool_query_filter(
        df, {"geo_distance": {"distance": "100km",
                              "loc": {"lat": 0.0, "lon": 0.0}}}
    ).collect()}
    assert got == {1, 2}
    # cross-engine: rounded meters agree row by row
    spark_d = {
        r["id"]: r["d"]
        for r in df.filter(F.col("lat").isNotNull()).select(
            "id",
            __import__("monstache_spark.operators.geo", fromlist=["haversine_m"])
            .haversine_m(F.col("lat"), F.col("lon"), F.lit(52.52), F.lit(13.405))
            .alias("d"),
        ).collect()
    }
    con = duckdb.connect()
    expr = haversine_m_sql("lat", "lon", "52.52", "13.405")
    duck_d = {
        i: d
        for i, d in con.execute(
            "SELECT id, " + expr + " FROM (VALUES (1, 0.0, 0.0), (2, 0.5, 0.5),"
            " (3, 2.0, 2.0), (4, 10.0, 10.0), (5, 52.52, 13.405),"
            " (6, 48.8566, 2.3522)) AS t(id, lat, lon)"
        ).fetchall()
    }
    assert spark_d == duck_d
    assert abs(duck_d[6] - 878000) < 10000  # Berlin-Paris sanity


def test_geo_distance_buckets_rings(spark):
    df = _pts(spark)
    out = {r["ring"]: (r["doc_count"], r["n"]) for r in geo_distance_buckets(
        df, "lat", "lon", {"lat": 0.0, "lon": 0.0}, [100.0, 500.0],
        metrics={"n": {"value_count": {"field": "id"}}},
    ).collect()}
    # null coords drop; rings are [from, to)
    assert out == {"*-100.0": (2, 2), "100.0-500.0": (1, 1), "500.0-*": (3, 3)}


def test_geohash_matches_reference_values(spark):
    # reference geohashes computed with the standard algorithm
    # (e.g. geohash.org): Berlin 52.52,13.405 -> u33dc; SF 37.7749,
    # -122.4194 -> 9q8yy; null island 0,0 -> s0000
    from monstache_spark.operators.geo import geohash_cell

    df = spark.createDataFrame(
        [(1, 52.52, 13.405), (2, 37.7749, -122.4194), (3, 0.0, 0.0),
         (4, -33.8688, 151.2093)],  # Sydney -> r3gx2
        "id long, lat double, lon double",
    )
    got = {r["id"]: r["gh"] for r in df.select(
        "id", geohash_cell(F.col("lat"), F.col("lon"), 5).alias("gh")
    ).collect()}
    assert got == {1: "u33dc", 2: "9q8yy", 3: "s0000", 4: "r3gx2"}


def test_geohash_sql_parity(spark):
    import random

    import duckdb

    from monstache_spark.operators.geo import geohash_cell, geohash_sql

    random.seed(5)
    pts = [(i, random.uniform(-90, 90), random.uniform(-180, 180)) for i in range(200)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    spark_gh = {r["id"]: r["gh"] for r in df.select(
        "id", geohash_cell(F.col("lat"), F.col("lon"), 6).alias("gh")
    ).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"({i}, {la!r}, {lo!r})" for i, la, lo in pts)
    duck_gh = dict(con.execute(
        f"SELECT id, {geohash_sql('lat', 'lon', 6)} FROM (VALUES {vals}) AS t(id, lat, lon)"
    ).fetchall())
    assert spark_gh == duck_gh


def test_geohash_grid_counts_and_size(spark):
    from monstache_spark.operators.geo import geohash_grid

    df = spark.createDataFrame(
        [(1, 52.52, 13.405), (2, 52.5201, 13.4051), (3, 0.0, 0.0), (4, None, None)],
        "id long, lat double, lon double",
    )
    got = {r["geohash"]: r["doc_count"] for r in geohash_grid(
        df, "lat", "lon", precision=5
    ).collect()}
    assert got == {"u33dc": 2, "s0000": 1}
    top = geohash_grid(df, "lat", "lon", precision=5, size=1).collect()
    assert len(top) == 1 and top[0]["geohash"] == "u33dc"


def test_geo_polygon_crossing_rule(spark):
    # triangle (0,0) (10,0) (0,10)
    tri = [{"lat": 0.0, "lon": 0.0}, {"lat": 10.0, "lon": 0.0},
           {"lat": 0.0, "lon": 10.0}]
    df = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 6.0, 6.0), (3, 5.0, 1.0), (4, -1.0, 5.0),
         (5, 11.0, 1.0)],
        "id long, lat double, lon double",
    ).withColumn("loc", F.struct("lat", "lon"))
    got = {r["id"] for r in bool_query_filter(
        df, {"geo_polygon": {"loc": {"points": tri}}}
    ).collect()}
    assert got == {1, 3}    # (6,6) is outside the hypotenuse
    # concave polygon: an L-shape excludes its notch
    ell = [{"lat": 0.0, "lon": 0.0}, {"lat": 10.0, "lon": 0.0},
           {"lat": 10.0, "lon": 4.0}, {"lat": 4.0, "lon": 4.0},
           {"lat": 4.0, "lon": 10.0}, {"lat": 0.0, "lon": 10.0}]
    df2 = spark.createDataFrame(
        [(1, 2.0, 8.0), (2, 8.0, 8.0), (3, 8.0, 2.0)],
        "id long, lat double, lon double",
    ).withColumn("loc", F.struct("lat", "lon"))
    got = {r["id"] for r in bool_query_filter(
        df2, {"geo_polygon": {"loc": {"points": ell}}}
    ).collect()}
    assert got == {1, 3}    # (8,8) sits in the notch


def test_geo_polygon_sql_parity(spark):
    import random

    import duckdb

    from monstache_spark.operators.geo import polygon_predicate, polygon_sql

    poly = [{"lat": -3.0, "lon": -2.0}, {"lat": 7.5, "lon": -1.0},
            {"lat": 9.0, "lon": 6.0}, {"lat": 1.0, "lon": 8.0},
            {"lat": -5.0, "lon": 3.0}]
    random.seed(13)
    pts = [(i, random.uniform(-10, 12), random.uniform(-6, 11)) for i in range(300)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    spark_in = {r["id"] for r in df.filter(
        polygon_predicate(F.col("lat"), F.col("lon"), poly)
    ).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"({i}, {la!r}, {lo!r})" for i, la, lo in pts)
    duck_in = {r[0] for r in con.execute(
        f"SELECT id FROM (VALUES {vals}) AS t(id, lat, lon) WHERE "
        + polygon_sql("lat", "lon", poly)
    ).fetchall()}
    assert spark_in == duck_in and len(spark_in) > 10


def test_geo_centroid_exact(spark):
    from monstache_spark.operators.geo import geo_centroid

    df = spark.createDataFrame(
        [("a", 10.0, 20.0), ("a", 20.0, 40.0), ("b", -5.0, 0.0),
         ("a", None, None)],
        "k string, lat double, lon double",
    )
    out = {r["k"]: (r["doc_count"], r["centroid_lat"], r["centroid_lon"])
           for r in geo_centroid(df, "lat", "lon", bucket_col="k").collect()}
    assert out == {"a": (2, 15.0, 30.0), "b": (1, -5.0, 0.0)}


def test_geotile_matches_slippy_reference_values(spark):
    # reference z/x/y tiles from the OSM slippy-map scheme (the
    # formula ES GeoTileUtils implements): Berlin z10 -> 10/550/335,
    # SF z12 -> 12/655/1583; poles clamp into the edge rows
    from monstache_spark.operators.geo import geotile_cell

    df = spark.createDataFrame(
        [(1, 52.52, 13.405), (2, 37.7749, -122.4194), (3, 89.9, 10.0),
         (4, -89.9, 10.0), (5, 0.0, 0.0)],
        "id long, lat double, lon double",
    )
    g10 = {r["id"]: r["t"] for r in df.select(
        "id", geotile_cell(F.col("lat"), F.col("lon"), 10).alias("t")
    ).collect()}
    assert g10[1] == "10/550/335"
    g12 = {r["id"]: r["t"] for r in df.select(
        "id", geotile_cell(F.col("lat"), F.col("lon"), 12).alias("t")
    ).collect()}
    assert g12[2] == "12/655/1583"
    g4 = {r["id"]: r["t"] for r in df.select(
        "id", geotile_cell(F.col("lat"), F.col("lon"), 4).alias("t")
    ).collect()}
    assert g4[3] == "4/8/0" and g4[4] == "4/8/15"
    g1 = {r["id"]: r["t"] for r in df.select(
        "id", geotile_cell(F.col("lat"), F.col("lon"), 1).alias("t")
    ).collect()}
    assert g1[5] == "1/1/1"


def test_geotile_sql_parity(spark):
    import random

    import duckdb

    from monstache_spark.operators.geo import geotile_cell, geotile_sql

    random.seed(7)
    pts = [(i, random.uniform(-90, 90), random.uniform(-180, 180))
           for i in range(300)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    spark_t = {r["id"]: r["t"] for r in df.select(
        "id", geotile_cell(F.col("lat"), F.col("lon"), 9).alias("t")
    ).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"({i}, {la!r}, {lo!r})" for i, la, lo in pts)
    duck_t = {r[0]: r[1] for r in con.execute(
        f"SELECT id, {geotile_sql('lat', 'lon', 9)} "
        f"FROM (VALUES {vals}) AS t(id, lat, lon)"
    ).fetchall()}
    assert spark_t == duck_t


def test_geotile_grid_counts_and_truncation(spark):
    from monstache_spark.operators.geo import geotile_grid

    df = spark.createDataFrame(
        [(1, 52.52, 13.405), (2, 52.53, 13.41), (3, 37.77, -122.42),
         (4, None, 1.0)],
        "id long, lat double, lon double",
    )
    out = {r["geotile"]: r["doc_count"]
           for r in geotile_grid(df, "lat", "lon", zoom=10).collect()}
    # both Berlin points share a z10 tile; null coords drop
    assert out == {"10/550/335": 2, "10/163/395": 1}
    top1 = geotile_grid(df, "lat", "lon", zoom=10, size=1).collect()
    assert [(r["geotile"], r["doc_count"]) for r in top1] == [("10/550/335", 2)]


def test_geo_line_order_and_cap(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from monstache_spark.operators.geo import geo_line

    df = spark.createDataFrame(
        [("a", 3, 1.5, 2.5), ("a", 1, 0.0, 0.5), ("a", 2, 1.0, -1.25),
         ("b", 1, 5.0, 6.0), ("a", 4, 9.0, 9.0)],
        "g string, ts long, lat double, lon double")
    out = {r["g"]: r for r in geo_line(
        df, "lat", "lon", "ts", bucket_col="g", max_points=3, digits=2).collect()}
    # sorted by ts, capped at the FIRST 3 points, lon lat order (WKT)
    assert out["a"]["line"] == "LINESTRING(0.50 0.00, -1.25 1.00, 2.50 1.50)"
    assert out["a"]["doc_count"] == 3
    assert out["b"]["line"] == "LINESTRING(6.00 5.00)"


def test_geo_grid_query_leaf(spark):
    from monstache_spark.operators.geo import geohash_cell, geotile_cell

    df = spark.createDataFrame(
        [(1, 52.52, 13.40), (2, 52.50, 13.41), (3, 37.77, -122.42)],
        "id long, lat double, lon double",
    ).withColumn("loc", F.struct("lat", "lon"))
    tile = df.filter(F.col("id") == 1).select(
        geotile_cell(F.col("lat"), F.col("lon"), 10).alias("t")
    ).collect()[0]["t"]
    got = {r["id"] for r in bool_query_filter(
        df, {"geo_grid": {"loc": {"geotile": tile}}}).collect()}
    # Berlin pair shares tile 10/550/335; SF does not
    assert got == {1, 2} and tile == "10/550/335"
    gh = df.filter(F.col("id") == 3).select(
        geohash_cell(F.col("lat"), F.col("lon"), 4).alias("g")
    ).collect()[0]["g"]
    got = {r["id"] for r in bool_query_filter(
        df, {"geo_grid": {"loc": {"geohash": gh}}}).collect()}
    assert got == {3}


def test_shape_query_cartesian(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 5.0, 5.0), (3, -1.0, 0.5)],
        "id long, x double, y double",
    ).withColumn("pt", F.struct("x", "y"))
    env = {"shape": {"pt": {"shape": {
        "type": "envelope", "coordinates": [[0.0, 2.0], [2.0, 0.0]]}}}}
    got = {r["id"] for r in bool_query_filter(df, env).collect()}
    assert got == {1}
    got = {r["id"] for r in bool_query_filter(
        df, {"shape": {"pt": {"shape": {
            "type": "envelope", "coordinates": [[0.0, 2.0], [2.0, 0.0]]},
            "relation": "disjoint"}}}).collect()}
    assert got == {2, 3}
    tri = {"shape": {"pt": {"shape": {
        "type": "polygon",
        "coordinates": [[[0.0, 0.0], [4.0, 0.0], [0.0, 4.0], [0.0, 0.0]]]}}}}
    got = {r["id"] for r in bool_query_filter(df, tri).collect()}
    assert got == {1}


def test_geohex_cell_matches_python_cube_round(spark):
    import math as _m

    from monstache_spark.operators.geo import (
        MERCATOR_LAT_MAX,
        geohex_cell,
        geohex_grid,
    )

    pts = [(1, 52.52, 13.40), (2, -33.87, 151.21), (3, 37.77, -122.42),
           (4, 84.0, 179.9), (5, -84.0, -179.9), (6, 0.0, 0.0)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {r["id"]: r["h"] for r in df.select(
        "id", geohex_cell(F.col("lat"), F.col("lon"), 5).alias("h")
    ).collect()}

    def ref(lat, lon, p):
        e = 2.0 ** -p
        x = (lon + 180.0) / 360.0
        lat_c = max(min(lat, MERCATOR_LAT_MAX), -MERCATOR_LAT_MAX)
        sinp = _m.sin(_m.radians(lat_c))
        y = round(0.5 - _m.log((1.0 + sinp) / (1.0 - sinp)) / (4.0 * _m.pi), 12)
        q = (x * 0.5773502691896258 - y / 3.0) / e
        r = (y * 2.0 / 3.0) / e
        s = -q - r
        # python round is half-even vs engines' half-away; no test point
        # sits on a .5 boundary so the branch never diverges here
        rq, rr, rs = round(q), round(r), round(s)
        dq, dr, ds = abs(rq - q), abs(rr - r), abs(rs - s)
        if dq > dr and dq > ds:
            rq = -rr - rs
        elif dr > ds:
            rr = -rq - rs
        return f"5/{int(rq)}/{int(rr)}"

    for i, lat, lon in pts:
        assert got[i] == ref(lat, lon, 5), (i, got[i], ref(lat, lon, 5))

    out = geohex_grid(df, "lat", "lon", precision=0)
    assert sum(r["doc_count"] for r in out.collect()) == 6
    import pytest as _pt

    with _pt.raises(ValueError, match="precision"):
        geohex_cell(F.col("lat"), F.col("lon"), 13)


def test_geo_grid_geohex_key(spark):
    from monstache_spark.operators.geo import geohex_cell

    df = spark.createDataFrame(
        [(1, 52.52, 13.40), (2, 52.50, 13.41), (3, -33.87, 151.21)],
        "id long, lat double, lon double",
    ).withColumn("loc", F.struct("lat", "lon"))
    key = df.filter(F.col("id") == 1).select(
        geohex_cell(F.col("lat"), F.col("lon"), 3).alias("h")
    ).collect()[0]["h"]
    got = {r["id"] for r in bool_query_filter(
        df, {"geo_grid": {"loc": {"geohex": key}}}).collect()}
    assert 1 in got and 3 not in got


def test_cartesian_bounds_and_centroid(spark):
    from monstache_spark.operators.geo import cartesian_bounds, cartesian_centroid

    df = spark.createDataFrame(
        [("a", 0.0, 0.0), ("a", 4.0, 2.0), ("b", -1.0, -1.0), ("b", None, 5.0)],
        "g string, x double, y double",
    )
    b = {r["g"]: r for r in cartesian_bounds(df, "x", "y", ["g"]).collect()}
    assert (b["a"]["min_x"], b["a"]["max_x"], b["a"]["min_y"], b["a"]["max_y"]) == (0.0, 4.0, 0.0, 2.0)
    assert b["b"]["doc_count"] == 1  # null-x row drops
    c = {r["g"]: r for r in cartesian_centroid(df, "x", "y", ["g"]).collect()}
    assert (c["a"]["centroid_x"], c["a"]["centroid_y"]) == (2.0, 1.0)
