"""Polygon/linestring geometry (functions/geometry.py): the coverings
must be LOSSLESS (every point of the geometry lies in a covered cell) and
the generated Spark/DuckDB predicates must agree with the pure-Python
reference implementations on fuzzed inputs."""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from serenedb_spark.functions import geometry as GM

PENT = [(5.03, 14.11), (17.21, 17.33), (14.47, 29.19),
        (4.97, 31.61), (-1.53, 22.07)]
LINE = [(-60.13, -20.07), (-45.31, 5.17), (-30.27, -10.23), (-15.11, 12.29)]


def test_query_pentagon_is_convex():
    # the SAT intersect predicate requires convexity — pin it
    n = len(PENT)
    signs = set()
    for i in range(n):
        (x1, y1), (x2, y2) = PENT[i], PENT[(i + 1) % n]
        x3, y3 = PENT[(i + 2) % n]
        signs.add((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1) > 0)
    assert len(signs) == 1


def test_polygon_covering_lossless():
    rng = random.Random(42)
    cells = set(GM.polygon_covering_cells(PENT, 1.0))
    # rejection-sample interior points; every one must land in a cell
    xs = [x for x, _ in PENT]
    ys = [y for _, y in PENT]
    hits = 0
    while hits < 500:
        px = rng.uniform(min(xs), max(xs))
        py = rng.uniform(min(ys), max(ys))
        if GM._pip(px, py, PENT):
            hits += 1
            key = f"{math.floor(py)}:{math.floor(px)}"
            assert key in cells, (px, py, key)
    # boundary vertices too
    for x, y in PENT:
        assert f"{math.floor(y)}:{math.floor(x)}" in cells


def test_linestring_covering_lossless():
    cells = set(GM.linestring_covering_cells(LINE, 1.0))
    for (ax, ay), (bx, by) in zip(LINE, LINE[1:]):
        for i in range(201):
            t = i / 200.0
            px, py = ax + t * (bx - ax), ay + t * (by - ay)
            assert f"{math.floor(py)}:{math.floor(px)}" in cells, (px, py)


def _brute_rect_poly(cx, cy, h, verts):
    # reference: rect-vs-convex-polygon via corner/vertex containment +
    # edge crossings (independent formulation from the SAT under test)
    corners = [(cx - h, cy - h), (cx + h, cy - h),
               (cx + h, cy + h), (cx - h, cy + h)]
    if any(GM._pip(x, y, verts) for x, y in corners):
        return True
    if any(cx - h <= x <= cx + h and cy - h <= y <= cy + h
           for x, y in verts):
        return True
    n = len(verts)
    for i in range(n):
        a, b = verts[i], verts[(i + 1) % n]
        for j in range(4):
            if GM._seg_x_seg(a, b, corners[j], corners[(j + 1) % 4]):
                return True
    return False


def test_sat_matches_brute_force():
    rng = random.Random(7)
    con = duckdb.connect()
    sat_sql = GM.duckdb_convex_polygon_intersects_rect(PENT, "cx", "cy", "h")
    for _ in range(300):
        cx = rng.uniform(-10, 25)
        cy = rng.uniform(5, 40)
        h = rng.uniform(0.05, 3.0)
        want = _brute_rect_poly(cx, cy, h, PENT)
        got = con.execute(
            f"SELECT {sat_sql} FROM (SELECT ? AS cx, ? AS cy, ? AS h)",
            [cx, cy, h]).fetchone()[0]
        assert got == want, (cx, cy, h)


def test_spark_predicates_match_duckdb(spark):
    rng = random.Random(13)
    rows = [(i, rng.uniform(-70, 30), rng.uniform(-30, 40),
             rng.uniform(0.05, 3.0)) for i in range(400)]
    df = spark.createDataFrame(rows, "i long, cx double, cy double, h double")
    con = duckdb.connect()

    sp_poly = {r.i for r in df.where(GM.convex_polygon_intersects_rect_col(
        PENT, F.col("cx"), F.col("cy"), F.col("h"))).collect()}
    sp_line = {r.i for r in df.where(GM.linestring_intersects_rect_col(
        LINE, F.col("cx"), F.col("cy"), F.col("h"))).collect()}
    sp_pip = {r.i for r in df.where(GM.point_in_polygon_col(
        F.col("cx"), F.col("cy"), PENT)).collect()}

    con.execute("CREATE TABLE t(i BIGINT, cx DOUBLE, cy DOUBLE, h DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    dk_poly = {r[0] for r in con.execute(
        "SELECT i FROM t WHERE "
        + GM.duckdb_convex_polygon_intersects_rect(PENT, "cx", "cy", "h")
    ).fetchall()}
    dk_line = {r[0] for r in con.execute(
        "SELECT i FROM t WHERE "
        + GM.duckdb_linestring_intersects_rect(LINE, "cx", "cy", "h")
    ).fetchall()}
    dk_pip = {r[0] for r in con.execute(
        "SELECT i FROM t WHERE "
        + GM.duckdb_point_in_polygon("cx", "cy", PENT)).fetchall()}

    assert sp_poly == dk_poly and sp_poly
    assert sp_line == dk_line and sp_line
    assert sp_pip == dk_pip and sp_pip


def test_pip_known_points():
    inside = [(8.0, 20.0), (10.0, 25.0), (5.0, 16.0)]
    outside = [(20.0, 20.0), (0.0, 10.0), (8.0, 35.0), (-5.0, 22.0)]
    for x, y in inside:
        assert GM._pip(x, y, PENT), (x, y)
    for x, y in outside:
        assert not GM._pip(x, y, PENT), (x, y)


STAR = [
    (65.03, -25.11), (47.61, -19.93), (41.27, -2.87), (34.81, -19.73),
    (17.19, -24.89), (30.77, -36.91), (28.03, -55.13), (42.11, -43.17),
    (57.91, -54.79), (53.87, -36.99),
]
DONUT = [
    [(-35.13, 40.07), (-47.29, 61.83), (-72.91, 61.97), (-85.07, 39.89),
     (-72.69, 18.11), (-47.51, 18.23)],
    [(-50.21, 30.17), (-50.03, 49.91), (-69.87, 50.13), (-70.11, 29.83)],
]


def test_star_is_concave():
    # the rings path exists FOR concave queries — pin that STAR is one
    n = len(STAR)
    signs = set()
    for i in range(n):
        (x1, y1), (x2, y2) = STAR[i], STAR[(i + 1) % n]
        x3, y3 = STAR[(i + 2) % n]
        signs.add((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1) > 0)
    assert len(signs) == 2


def test_rings_semantics_known_cases():
    # hole excluded, solid ring included, outside excluded
    assert GM._py_point_in_rings(-40.0, 40.0, DONUT)       # solid part
    assert not GM._py_point_in_rings(-60.0, 40.0, DONUT)   # inside hole
    assert not GM._py_point_in_rings(-100.0, 40.0, DONUT)  # outside
    # star: center is inside; a pocket between two arms is outside even
    # though it lies inside the convex hull
    assert GM._py_point_in_rings(41.0, -30.0, [STAR])
    assert not GM._py_point_in_rings(60.0, -45.0, [STAR])  # pocket


def test_rings_covering_lossless_and_hole_pruned():
    cells = set(GM.rings_covering_cells(DONUT, 2.0))
    rng = random.Random(7)
    for _ in range(4000):
        x = rng.uniform(-90, -30)
        y = rng.uniform(15, 65)
        if GM._py_point_in_rings(x, y, DONUT):
            key = (f"{int(math.floor(y / 2.0))}:{int(math.floor(x / 2.0))}")
            assert key in cells, (x, y)
    # a cell strictly inside the hole must NOT be covered
    assert f"{int(math.floor(40.0 / 2.0))}:{int(math.floor(-60.0 / 2.0))}" \
        not in cells


def test_rings_intersect_matches_brute_force_and_duckdb(spark):
    rng = random.Random(31)
    rows = [(i, rng.uniform(0, 80), rng.uniform(-70, 10),
             rng.uniform(0.05, 4.0)) for i in range(400)]

    def brute(cx, cy, h, rings):
        # dense sampling of the square boundary + interior grid
        for fx in range(11):
            for fy in range(11):
                x = cx - h + 2 * h * fx / 10
                y = cy - h + 2 * h * fy / 10
                if GM._py_point_in_rings(x, y, rings):
                    return True
        # polygon vertex inside square
        return any(
            cx - h <= vx <= cx + h and cy - h <= vy <= cy + h
            for ring in rings for vx, vy in ring)

    df = spark.createDataFrame(rows, "i long, cx double, cy double, h double")
    sp = {r.i for r in df.where(GM.rings_intersects_rect_col(
        [STAR], F.col("cx"), F.col("cy"), F.col("h"))).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, cx DOUBLE, cy DOUBLE, h DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    dk = {r[0] for r in con.execute(
        "SELECT i FROM t WHERE "
        + GM.duckdb_rings_intersects_rect([STAR], "cx", "cy", "h")
    ).fetchall()}
    assert sp == dk and sp
    # the exact predicate must dominate the (approximate) sampling brute
    # force: everything brute finds, the predicate finds
    for i, cx, cy, h in rows:
        if brute(cx, cy, h, [STAR]):
            assert i in sp, (i, cx, cy, h)


def test_wkt_polygon_roundtrip(spark):
    """synth WKT → parse_wkt_polygon_col gives back the exact doubles
    (shortest-repr formatting round-trips bit-exactly)."""
    from serenedb_spark.functions import geometry as GM

    df = spark.createDataFrame([(7,), (8,), (9,)], "k long")
    polys = GM.synth_polygons_wkt(df, "k")
    rows = polys.select(
        "geom_id", "cx", "cy", "r", "wkt",
        GM.parse_wkt_polygon_col(F.col("wkt")).alias("verts")).collect()
    for row in rows:
        shape = row.geom_id % 3
        coefs = GM._POLY_SHAPES[shape]
        assert len(row.verts) == len(coefs)
        for (c, s), v in zip(coefs, row.verts):
            assert v.x == row.cx + row.r * c
            assert v.y == row.cy + row.r * s
        assert row.wkt.startswith("POLYGON ((") and row.wkt.endswith("))")
        # closed ring: first == last coordinate pair in the text
        inner = row.wkt[len("POLYGON (("):-2].split(", ")
        assert inner[0] == inner[-1]


def test_rings_vs_polygon_known_cases(spark):
    """Hand-checkable containment/crossing/disjoint cases, including a
    corpus polygon strictly inside the query's HOLE (must NOT match)."""
    from serenedb_spark.functions import geometry as GM

    donut = [
        [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0)],   # outer
        [(8.0, 8.0), (12.0, 8.0), (12.0, 12.0), (8.0, 12.0)],   # hole
    ]
    cases = [
        # (verts, expect) — triangle inside region
        ([(2.0, 2.0), (5.0, 2.0), (3.0, 5.0)], True),
        # inside the hole → excluded by parity
        ([(9.0, 9.0), (11.0, 9.0), (10.0, 11.0)], False),
        # crossing the outer boundary
        ([(-2.0, 10.0), (2.0, 10.0), (0.0, 13.0)], True),
        # fully outside
        ([(30.0, 30.0), (33.0, 30.0), (31.0, 33.0)], False),
        # polygon CONTAINING the whole region (query vertices inside it)
        ([(-5.0, -5.0), (25.0, -5.0), (25.0, 25.0), (-5.0, 25.0)], True),
        # straddling the hole boundary (in hole AND in region)
        ([(7.0, 9.0), (9.5, 9.0), (8.0, 11.0)], True),
    ]
    wkts = [("POLYGON ((" + ", ".join(f"{x} {y}" for x, y in vs + [vs[0]])
             + "))",) for vs, _ in cases]
    df = spark.createDataFrame(wkts, "wkt string")
    got = df.select(GM.rings_intersects_polygon_col(
        donut, GM.parse_wkt_polygon_col(F.col("wkt"))).alias("hit")).collect()
    assert [r.hit for r in got] == [e for _, e in cases]
