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
