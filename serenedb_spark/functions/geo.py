"""Geo predicates: cell-prefiltered distance/containment checks.

Reference: S2-cell prefilter + exact geometry check inside the index scan
(`ST_Intersects, ST_Contains, ST_Distance_Between, ST_Distance_Centroid`
— server/connector/functions/search.h:119-125, geo_filter_builder.cpp,
libs/geo/; geopoint analyzer = S2 cell terms).

Spark-first: S2 is replaced by a flat lat/lon GRID CELL scheme (cell id =
floor(lat/size), floor(lon/size)) — the same two-phase shape: a cheap
cell-membership prefilter that prunes the scan (pushes down to parquet /
partition pruning when data is partitioned by cell), then the exact
haversine / polygon check on survivors. The differential oracle runs the
exact check WITHOUT the prefilter, proving the prefilter lossless.

All arithmetic is double + trig builtins available in both engines, so
every operator here is oracle-checkable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (spherical earth, R=6371km)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def duckdb_haversine_m(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2.0 * {EARTH_RADIUS_M} * asin(sqrt("
        f"sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2)))"
    )


def cell_id(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Grid cell key 'row:col' — plays the S2 cell term."""
    return F.concat_ws(
        ":",
        F.floor(lat / F.lit(cell_deg)).cast("long"),
        F.floor(lon / F.lit(cell_deg)).cast("long"),
    )


def covering_cells(lat: float, lon: float, radius_m: float, cell_deg: float) -> list[str]:
    """Driver-side covering of a radius query: all cells intersecting the
    bounding box (the S2 covering; small list, broadcast into the filter).

    Antimeridian/pole sound (S2 gets this for free; a flat grid must do it
    by hand): longitudes wrap modulo 360 — a query at lon 179.9 covers
    cells at lon −180 — latitudes clamp to ±90, and a cap that crosses a
    pole spans EVERY longitude at the polar rows. Requires cell_deg to
    divide 360 (checked) so the wrap lands on exact cell boundaries."""
    ncols = 360.0 / cell_deg
    if abs(ncols - round(ncols)) > 1e-9:
        raise ValueError(f"cell_deg {cell_deg} must divide 360 exactly")
    ncols = int(round(ncols))
    half = ncols // 2  # column index of lon 0; cols span [-half, half)

    dlat = math.degrees(radius_m / EARTH_RADIUS_M)
    lat_lo, lat_hi = lat - dlat, lat + dlat
    crosses_pole = lat_hi > 90.0 or lat_lo < -90.0
    lat_lo, lat_hi = max(lat_lo, -90.0), min(lat_hi, 90.0)
    r0 = int(math.floor(lat_lo / cell_deg))
    r1 = int(math.floor(lat_hi / cell_deg))

    if crosses_pole:
        cols = list(range(-half, half))
    else:
        # cos at the bounding latitude nearest the pole — the widest span
        wide = max(abs(lat_lo), abs(lat_hi))
        dlon = math.degrees(
            radius_m / (EARTH_RADIUS_M * max(math.cos(math.radians(wide)), 1e-9))
        )
        if dlon >= 180.0:
            cols = list(range(-half, half))
        else:
            c0 = int(math.floor((lon - dlon) / cell_deg))
            c1 = int(math.floor((lon + dlon) / cell_deg))
            cols = sorted({(c + half) % ncols - half for c in range(c0, c1 + 1)})
    return [f"{r}:{c}" for r in range(r0, r1 + 1) for c in cols]


def radius_search(
    points: DataFrame,
    lat: float,
    lon: float,
    radius_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "point_id",
    cell_deg: float = 1.0,
    round_to: int = 1,
) -> DataFrame:
    """ST_Distance_Between(p, q) < r as prefilter + exact check: the cell
    IN-list prunes partitions/files, haversine confirms. Returns
    (id, dist_m)."""
    cells = covering_cells(lat, lon, radius_m, cell_deg)
    dist = haversine_m(
        F.col(lat_col), F.col(lon_col), F.lit(lat), F.lit(lon)
    )
    return (
        points.where(cell_id(F.col(lat_col), F.col(lon_col), cell_deg).isin(cells))
        .select(F.col(id_col), F.round(dist, round_to).alias("dist_m"))
        .where(F.col("dist_m") < radius_m)
    )


def bbox_contains(
    points: DataFrame,
    lat_min: float, lat_max: float, lon_min: float, lon_max: float,
    lat_col: str = "lat", lon_col: str = "lon", id_col: str = "point_id",
) -> DataFrame:
    """ST_Contains(box, p) — rectangle containment (exact, pushdown-able:
    four range predicates reach the parquet scan)."""
    return points.where(
        (F.col(lat_col) >= lat_min) & (F.col(lat_col) <= lat_max)
        & (F.col(lon_col) >= lon_min) & (F.col(lon_col) <= lon_max)
    ).select(id_col, lat_col, lon_col)


def circle_intersects(
    points: DataFrame,
    lat: float,
    lon: float,
    query_radius_m: float,
    radius_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "point_id",
    max_radius_m: float = 300_000.0,
    cell_deg: float = 1.0,
    round_to: int = 1,
) -> DataFrame:
    """ST_Intersects between per-row circles and a query circle: two
    circles intersect iff centre distance ≤ r_row + r_query.  Prefilter =
    covering cells of the query circle GROWN by the maximum row radius
    (the reference's S2 covering of the dilated region); exact haversine
    check on survivors.  Returns (id, dist_m, radius_m)."""
    cells = covering_cells(lat, lon, query_radius_m + max_radius_m, cell_deg)
    dist = F.round(
        haversine_m(F.col(lat_col), F.col(lon_col), F.lit(lat), F.lit(lon)),
        round_to,
    )
    return (
        points.where(cell_id(F.col(lat_col), F.col(lon_col), cell_deg).isin(cells))
        .select(F.col(id_col), dist.alias("dist_m"),
                F.col(radius_col).alias("radius_m"))
        .where(F.col("dist_m") <= F.col("radius_m") + F.lit(query_radius_m))
    )


def polygon_centroid(vertices: list[tuple[float, float]]) -> tuple[float, float]:
    """Vertex centroid of a polygon (ST_Distance_Centroid's target point;
    the reference uses the S2 shape centroid — vertex mean documented as
    the flat-grid analogue).  Driver-side: the polygon is a query literal."""
    n = float(len(vertices))
    lat = 0.0
    lon = 0.0
    for vlat, vlon in vertices:
        lat = lat + vlat
        lon = lon + vlon
    return lat / n, lon / n


def distance_centroid(
    points: DataFrame,
    vertices: list[tuple[float, float]],
    k: int = 20,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "point_id",
    round_to: int = 1,
) -> DataFrame:
    """ST_Distance_Centroid(geom, p): distance from each point to the
    polygon's centroid, nearest-k (TakeOrderedAndProject — no shuffle of
    the corpus)."""
    clat, clon = polygon_centroid(vertices)
    dist = haversine_m(F.col(lat_col), F.col(lon_col), F.lit(clat), F.lit(clon))
    return (
        points.select(F.col(id_col), F.round(dist, round_to).alias("dist_m"))
        .orderBy("dist_m", id_col)
        .limit(k)
    )


def synth_points(df: DataFrame, key_col: str, id_alias: str = "point_id") -> DataFrame:
    """Deterministic pseudo-coordinates from an integer key (testdata has no
    geo columns): lat ∈ [-60, 60), lon ∈ [-180, 180) via modular hashing —
    same arithmetic is stated in the DuckDB oracle."""
    k = F.col(key_col).cast("long")
    lat = ((k * 37 % 1200) - 600) / F.lit(10.0)
    lon = ((k * 73 % 3600) - 1800) / F.lit(10.0)
    return df.select(
        k.alias(id_alias), lat.alias("lat"), lon.alias("lon")
    )


def duckdb_synth_points(table: str, key_col: str, id_alias: str = "point_id") -> str:
    return (
        f"SELECT CAST({key_col} AS BIGINT) AS {id_alias},"
        f" (({key_col} * 37 % 1200) - 600) / 10.0 AS lat,"
        f" (({key_col} * 73 % 3600) - 1800) / 10.0 AS lon FROM {table}"
    )


def _shortest_double(col: Column) -> Column:
    """Double → shortest-form text: '30.0' renders as '30' (the WKT writer
    contract the reference fixed in geometry_wkt.test — integer coords
    must round-trip without corruption)."""
    s = col.cast("double").cast("string")
    return F.regexp_replace(s, r"\.0$", "")


def wkt_point(x: Column, y: Column) -> Column:
    """ST_AsText(point): 'POINT (x y)' with shortest-form doubles."""
    return F.concat(F.lit("POINT ("), _shortest_double(x), F.lit(" "),
                    _shortest_double(y), F.lit(")"))


def wkt_point_x(col: Column) -> Column:
    """First coordinate of a WKT POINT string (NULL when not a POINT)."""
    v = F.regexp_extract(col, r"(?i)^\s*POINT\s*\(\s*(-?[0-9.]+)\s", 1)
    return F.when(v == "", F.lit(None)).otherwise(v).cast("double")


def wkt_point_y(col: Column) -> Column:
    v = F.regexp_extract(
        col, r"(?i)^\s*POINT\s*\(\s*-?[0-9.]+\s+(-?[0-9.]+)\s*\)", 1)
    return F.when(v == "", F.lit(None)).otherwise(v).cast("double")


def duckdb_wkt_point(x: str, y: str) -> str:
    sd = "regexp_replace(CAST(CAST({v} AS DOUBLE) AS VARCHAR), '\\.0$', '')"
    return ("concat('POINT (', " + sd.format(v=x) + ", ' ', "
            + sd.format(v=y) + ", ')')")


def duckdb_wkt_point_x(e: str) -> str:
    return (f"TRY_CAST(nullif(regexp_extract({e},"
            f" '^\\s*POINT\\s*\\(\\s*(-?[0-9.]+)\\s', 1), '') AS DOUBLE)")


def duckdb_wkt_point_y(e: str) -> str:
    return (f"TRY_CAST(nullif(regexp_extract({e},"
            f" '^\\s*POINT\\s*\\(\\s*-?[0-9.]+\\s+(-?[0-9.]+)\\s*\\)', 1),"
            f" '') AS DOUBLE)")


def indexed_radius_search(
    idx,
    geo_field: str,
    lat: float,
    lon: float,
    radius_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "point_id",
    level: float = 1.0,
    round_to: int = 1,
) -> DataFrame:
    """ST_Distance_Between through the INVERTED INDEX (the reference's
    geopoint scheme, geo_filter_builder.cpp: S2 covering → cell-term
    disjunction → posting lists → exact check). `idx` is built with the
    `geopoint` analyzer on a "lat,lon" column; the covering becomes an
    AnyOf over cell terms at one analyzer level, the postings give doc
    ids, the docstore late-materializes lat/lon for the exact haversine.
    Composes with any other ts query (the win over the scan-side
    prefilter in radius_search)."""
    from serenedb_spark.analysis.analyzers import geopoint_cover_terms
    from serenedb_spark.plans import tsquery as q
    from serenedb_spark.plans.planner import compile_query

    terms = geopoint_cover_terms(lat, lon, radius_m, level)
    ids = compile_query(idx, geo_field, q.AnyOf(terms)).doc_ids
    pts = idx.docstore.join(ids, "doc_id", "left_semi")
    dist = haversine_m(F.col(lat_col), F.col(lon_col), F.lit(lat), F.lit(lon))
    return (
        pts.select(F.col(id_col), F.round(dist, round_to).alias("dist_m"))
        .where(F.col("dist_m") < radius_m)
    )
