"""Polygon / linestring geometry predicates with grid-cell prefilters.

Reference: the `geojson` analyzer indexes arbitrary GeoJSON geometries as
S2 cell terms (server/pg/commands/create_tsdictionary.cpp:652) and
`ST_Intersects` / `ST_Contains` run as covering-cell prefilter + exact
geometry check (server/connector/geo_filter_builder.cpp:523, libs/geo/).

Spark-first: S2 is replaced by the repo's flat lat/lon grid (functions/
geo.py) extended from point caps to POLYGON and SEGMENT coverings, and the
exact checks are generated as plain arithmetic over the (literal) query
geometry — so every predicate is stated identically in the pyspark Column
DSL and in DuckDB SQL, making each operator oracle-checkable end to end:

  * point-in-polygon: ray casting, unrolled per edge. The division-free
    form is generated with the inequality DIRECTION resolved at build
    time from each edge's literal dy sign — no runtime division, no
    div-by-zero edge cases, bit-identical math in both engines.
  * convex-polygon vs axis-aligned rectangle: separating-axis test. The
    polygon's own projection intervals are precomputed literals; the
    rectangle's interval on each axis is |nx|+|ny| scaled by its half
    width — one linear comparison pair per axis, k+2 axes total.
  * segment (linestring edge) vs rectangle: bbox overlap + the four
    rectangle corners not strictly on one side of the segment's line
    (the same SAT, specialized to a degenerate polygon).

Geometry is planar in degree space (lat = y, lon = x) — the same
convention the reference's geometry_wkt tests use for small shapes; the
spherical-cap machinery for distance predicates stays in functions/geo.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Vertices = list[tuple[float, float]]   # [(x=lon, y=lat), ...], open ring


# ---------------------------------------------------------------------------
# driver-side coverings (query compile time; small lists, broadcast)
# ---------------------------------------------------------------------------

def _pip(px: float, py: float, verts: Vertices) -> bool:
    inside = False
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xc = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
            if px < xc:
                inside = not inside
    return inside


def _seg_x_seg(a, b, c, d) -> bool:
    def cross(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

    d1, d2 = cross(c, d, a), cross(c, d, b)
    d3, d4 = cross(a, b, c), cross(a, b, d)
    return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))


def _cell_box_intersects_polygon(
    cx0: float, cy0: float, cx1: float, cy1: float, verts: Vertices
) -> bool:
    corners = [(cx0, cy0), (cx1, cy0), (cx1, cy1), (cx0, cy1)]
    if any(cx0 <= x <= cx1 and cy0 <= y <= cy1 for x, y in verts):
        return True
    if any(_pip(x, y, verts) for x, y in corners):
        return True
    n = len(verts)
    for i in range(n):
        a, b = verts[i], verts[(i + 1) % n]
        for j in range(4):
            if _seg_x_seg(a, b, corners[j], corners[(j + 1) % 4]):
                return True
    return False


def polygon_covering_cells(verts: Vertices, cell_deg: float) -> list[str]:
    """All grid cells whose closed square intersects the (simple) polygon
    — the S2 interior+boundary covering analogue. Lossless by
    construction: every point of the polygon lies in some cell whose
    square it touches (tests/test_geometry.py proves it by sampling)."""
    xs = [x for x, _ in verts]
    ys = [y for _, y in verts]
    c0, c1 = (int(math.floor(min(xs) / cell_deg)),
              int(math.floor(max(xs) / cell_deg)))
    r0, r1 = (int(math.floor(min(ys) / cell_deg)),
              int(math.floor(max(ys) / cell_deg)))
    out = []
    for r in range(r0, r1 + 1):
        for c in range(c0, c1 + 1):
            if _cell_box_intersects_polygon(
                c * cell_deg, r * cell_deg,
                (c + 1) * cell_deg, (r + 1) * cell_deg, verts,
            ):
                out.append(f"{r}:{c}")
    return out


def linestring_covering_cells(verts: Vertices, cell_deg: float) -> list[str]:
    """Cells touched by any segment of the polyline (per-segment bbox
    refined by segment-vs-cell SAT)."""
    seen: list[str] = []
    for i in range(len(verts) - 1):
        (ax, ay), (bx, by) = verts[i], verts[i + 1]
        c0, c1 = (int(math.floor(min(ax, bx) / cell_deg)),
                  int(math.floor(max(ax, bx) / cell_deg)))
        r0, r1 = (int(math.floor(min(ay, by) / cell_deg)),
                  int(math.floor(max(ay, by) / cell_deg)))
        for r in range(r0, r1 + 1):
            for c in range(c0, c1 + 1):
                x0, y0 = c * cell_deg, r * cell_deg
                x1, y1 = x0 + cell_deg, y0 + cell_deg
                corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
                side = [
                    (bx - ax) * (y - ay) - (by - ay) * (x - ax)
                    for x, y in corners
                ]
                if all(s > 0 for s in side) or all(s < 0 for s in side):
                    continue
                key = f"{r}:{c}"
                if key not in seen:
                    seen.append(key)
    return sorted(seen, key=lambda k: tuple(map(int, k.split(":"))))


# ---------------------------------------------------------------------------
# exact predicates, generated for a LITERAL query geometry
# ---------------------------------------------------------------------------

def _edges(verts: Vertices):
    n = len(verts)
    return [(verts[i], verts[(i + 1) % n]) for i in range(n)]


def point_in_polygon_col(x: Column, y: Column, verts: Vertices) -> Column:
    """Ray-cast containment as a Column expression (arbitrary simple
    polygon; unrolled per edge, division-free)."""
    crossings = None
    for (x1, y1), (x2, y2) in _edges(verts):
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        # px < x1 + (x2-x1)(py-y1)/(y2-y1), direction resolved statically
        lhs = (x - F.lit(x1)) * F.lit(y2 - y1)
        rhs = F.lit(x2 - x1) * (y - F.lit(y1))
        hit = straddles & (lhs < rhs if y2 > y1 else lhs > rhs)
        c = F.when(hit, 1).otherwise(0)
        crossings = c if crossings is None else crossings + c
    return crossings % 2 == 1


def duckdb_point_in_polygon(x: str, y: str, verts: Vertices) -> str:
    terms = []
    for (x1, y1), (x2, y2) in _edges(verts):
        op = "<" if y2 > y1 else ">"
        terms.append(
            f"CASE WHEN (({y1} > {y}) <> ({y2} > {y}))"
            f" AND (({x} - {x1}) * {y2 - y1}"
            f" {op} {x2 - x1} * ({y} - {y1})) THEN 1 ELSE 0 END"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"


def _sat_axes(verts: Vertices):
    """(nx, ny, pmin, pmax) per polygon edge normal, plus the polygon's
    literal bbox for the two rectangle axes."""
    axes = []
    for (x1, y1), (x2, y2) in _edges(verts):
        nx, ny = -(y2 - y1), x2 - x1
        projs = [nx * vx + ny * vy for vx, vy in verts]
        axes.append((nx, ny, min(projs), max(projs)))
    return axes


def convex_polygon_intersects_rect_col(
    verts: Vertices, cx: Column, cy: Column, half: Column
) -> Column:
    """SAT: convex query polygon vs axis-aligned square (center cx,cy,
    half width). Exact closed intersection."""
    xs = [x for x, _ in verts]
    ys = [y for _, y in verts]
    cond = (
        (cx + half >= F.lit(min(xs))) & (cx - half <= F.lit(max(xs)))
        & (cy + half >= F.lit(min(ys))) & (cy - half <= F.lit(max(ys)))
    )
    for nx, ny, pmin, pmax in _sat_axes(verts):
        center = F.lit(nx) * cx + F.lit(ny) * cy
        radius = F.lit(abs(nx) + abs(ny)) * half
        cond = cond & (center + radius >= F.lit(pmin)) \
            & (center - radius <= F.lit(pmax))
    return cond


def duckdb_convex_polygon_intersects_rect(
    verts: Vertices, cx: str, cy: str, half: str
) -> str:
    xs = [x for x, _ in verts]
    ys = [y for _, y in verts]
    conds = [
        f"{cx} + {half} >= {min(xs)}", f"{cx} - {half} <= {max(xs)}",
        f"{cy} + {half} >= {min(ys)}", f"{cy} - {half} <= {max(ys)}",
    ]
    for nx, ny, pmin, pmax in _sat_axes(verts):
        center = f"({nx} * {cx} + {ny} * {cy})"
        radius = f"({abs(nx) + abs(ny)} * {half})"
        conds.append(f"{center} + {radius} >= {pmin}")
        conds.append(f"{center} - {radius} <= {pmax}")
    return "(" + " AND ".join(conds) + ")"


def linestring_intersects_rect_col(
    verts: Vertices, cx: Column, cy: Column, half: Column
) -> Column:
    """Any polyline segment intersects the square: per-segment bbox
    overlap AND the four corners not strictly on one side of the line."""
    out = None
    for (ax, ay), (bx, by) in zip(verts, verts[1:]):
        bbox = (
            (cx + half >= F.lit(min(ax, bx)))
            & (cx - half <= F.lit(max(ax, bx)))
            & (cy + half >= F.lit(min(ay, by)))
            & (cy - half <= F.lit(max(ay, by)))
        )
        # side of line at the 4 corners: f(x,y) = dx*(y-ay) - dy*(x-ax)
        dx, dy = bx - ax, by - ay
        sides = []
        for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
            xc, yc = cx + half * F.lit(sx), cy + half * F.lit(sy)
            sides.append(F.lit(dx) * (yc - F.lit(ay))
                         - F.lit(dy) * (xc - F.lit(ax)))
        all_pos = sides[0] > 0
        all_neg = sides[0] < 0
        for s in sides[1:]:
            all_pos = all_pos & (s > 0)
            all_neg = all_neg & (s < 0)
        seg = bbox & ~all_pos & ~all_neg
        out = seg if out is None else out | seg
    return out


def duckdb_linestring_intersects_rect(
    verts: Vertices, cx: str, cy: str, half: str
) -> str:
    segs = []
    for (ax, ay), (bx, by) in zip(verts, verts[1:]):
        conds = [
            f"{cx} + {half} >= {min(ax, bx)}",
            f"{cx} - {half} <= {max(ax, bx)}",
            f"{cy} + {half} >= {min(ay, by)}",
            f"{cy} - {half} <= {max(ay, by)}",
        ]
        dx, dy = bx - ax, by - ay
        sides = [
            f"({dx} * (({cy} + {half} * {sy}) - {ay})"
            f" - {dy} * (({cx} + {half} * {sx}) - {ax}))"
            for sx, sy in ((-1, -1), (1, -1), (1, 1), (-1, 1))
        ]
        all_pos = " AND ".join(f"{s} > 0" for s in sides)
        all_neg = " AND ".join(f"{s} < 0" for s in sides)
        segs.append(
            "(" + " AND ".join(conds)
            + f" AND NOT ({all_pos}) AND NOT ({all_neg}))"
        )
    return "(" + " OR ".join(segs) + ")"


# ---------------------------------------------------------------------------
# scan-side operators (cell prefilter + exact check)
# ---------------------------------------------------------------------------

def polygon_contains_points(
    points: DataFrame,
    verts: Vertices,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "point_id",
    cell_deg: float = 1.0,
) -> DataFrame:
    """ST_Contains(query_polygon, point): covering-cell IN-list prefilter
    (prunes the scan exactly like the radius path) + exact ray cast."""
    from serenedb_spark.functions.geo import cell_id

    cells = polygon_covering_cells(verts, cell_deg)
    return (
        points
        .where(cell_id(F.col(lat_col), F.col(lon_col), cell_deg).isin(cells))
        .where(point_in_polygon_col(F.col(lon_col), F.col(lat_col), verts))
        .select(id_col, lat_col, lon_col)
    )


def synth_squares(df: DataFrame, key_col: str,
                  id_alias: str = "geom_id") -> DataFrame:
    """Deterministic axis-aligned squares from an integer key (testdata
    has no geometry columns): center in lon [-170,170) / lat [-80,80),
    half width in (0.1 .. 1.7] degrees — the polygon corpus for
    ST_Intersects. Same arithmetic is stated in the DuckDB oracle."""
    k = F.col(key_col).cast("long")
    cx = ((k * 41 % 3400) - 1700) / F.lit(10.0)
    cy = ((k * 59 % 1600) - 800) / F.lit(10.0)
    half = ((k * 17 % 16) + 1) / F.lit(10.0) + F.lit(0.07)
    return df.select(k.alias(id_alias), cx.alias("cx"), cy.alias("cy"),
                     half.alias("half"))


def duckdb_synth_squares(table: str, key_col: str,
                         id_alias: str = "geom_id") -> str:
    return (
        f"SELECT CAST({key_col} AS BIGINT) AS {id_alias},"
        f" (({key_col} * 41 % 3400) - 1700) / 10.0 AS cx,"
        f" (({key_col} * 59 % 1600) - 800) / 10.0 AS cy,"
        f" (({key_col} * 17 % 16) + 1) / 10.0 + 0.07 AS half"
        f" FROM {table}"
    )


def polygon_intersects_squares(
    squares: DataFrame,
    verts: Vertices,
    cell_deg: float = 4.0,
    max_half: float = 1.77,
) -> DataFrame:
    """ST_Intersects(query_polygon, square): the covering of the query
    polygon DILATED by the max square half-width prefilters on the
    squares' center cells (reference: S2 covering of the buffered
    region), SAT confirms exactly."""
    from serenedb_spark.functions.geo import cell_id

    grown = [(x + dx, y + dy) for (x, y) in verts
             for dx in (-max_half, max_half) for dy in (-max_half, max_half)]
    hull = _bbox_ring(grown)
    cells = polygon_covering_cells(hull, cell_deg)
    return (
        squares
        .where(cell_id(F.col("cy"), F.col("cx"), cell_deg).isin(cells))
        .where(convex_polygon_intersects_rect_col(
            verts, F.col("cx"), F.col("cy"), F.col("half")))
        .select("geom_id", "cx", "cy", "half")
    )


def linestring_intersects_squares(
    squares: DataFrame,
    verts: Vertices,
    cell_deg: float = 4.0,
    max_half: float = 1.77,
) -> DataFrame:
    """ST_Intersects(query_linestring, square): per-segment dilated-bbox
    covering prefilter + per-segment SAT."""
    from serenedb_spark.functions.geo import cell_id

    grown = [(x + dx, y + dy) for (x, y) in verts
             for dx in (-max_half, max_half) for dy in (-max_half, max_half)]
    hull = _bbox_ring(grown)
    cells = polygon_covering_cells(hull, cell_deg)
    return (
        squares
        .where(cell_id(F.col("cy"), F.col("cx"), cell_deg).isin(cells))
        .where(linestring_intersects_rect_col(
            verts, F.col("cx"), F.col("cy"), F.col("half")))
        .select("geom_id", "cx", "cy", "half")
    )


def _bbox_ring(pts: Vertices) -> Vertices:
    xs = [x for x, _ in pts]
    ys = [y for _, y in pts]
    return [(min(xs), min(ys)), (max(xs), min(ys)),
            (max(xs), max(ys)), (min(xs), max(ys))]


# ---------------------------------------------------------------------------
# arbitrary polygons: CONCAVE rings and MULTI-RING (holes) support
#
# Reference: the S2 path takes any polygon, with holes, polygon-vs-polygon
# (server/connector/geo_filter_builder.cpp:523, libs/geo/). Re-expressed
# without S2: containment is even-odd ray casting over ALL rings' edges
# (parity across outer+holes is exactly region membership), and
# polygon-vs-square intersection is the exact three-way decomposition
#   any ring vertex inside the square
#   OR any square corner inside the region (even-odd)
#   OR any ring edge properly crossing any square edge
# — each term unrolls to literal-coefficient arithmetic stated identically
# in the Column DSL and DuckDB SQL, so concave/holed queries stay
# oracle-checkable. Convex queries keep the cheaper SAT path above.
# ---------------------------------------------------------------------------

Rings = list  # list[Vertices]: [outer, hole1, hole2, ...], open rings


def _ring_edges(rings: Rings):
    out = []
    for ring in rings:
        out.extend(_edges(ring))
    return out


def point_in_rings_col(x: Column, y: Column, rings: Rings) -> Column:
    """Even-odd containment over a ring set (outer + holes): parity of
    crossings across ALL edges — a point inside a hole counts an even
    total and is excluded. Concavity needs no special casing."""
    crossings = None
    for (x1, y1), (x2, y2) in _ring_edges(rings):
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        lhs = (x - F.lit(x1)) * F.lit(y2 - y1)
        rhs = F.lit(x2 - x1) * (y - F.lit(y1))
        hit = straddles & (lhs < rhs if y2 > y1 else lhs > rhs)
        c = F.when(hit, 1).otherwise(0)
        crossings = c if crossings is None else crossings + c
    return crossings % 2 == 1


def duckdb_point_in_rings(x: str, y: str, rings: Rings) -> str:
    terms = []
    for (x1, y1), (x2, y2) in _ring_edges(rings):
        op = "<" if y2 > y1 else ">"
        terms.append(
            f"CASE WHEN (({y1} > {y}) <> ({y2} > {y}))"
            f" AND (({x} - {x1}) * {y2 - y1}"
            f" {op} {x2 - x1} * ({y} - {y1})) THEN 1 ELSE 0 END"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"


def _py_point_in_rings(px: float, py: float, rings: Rings) -> bool:
    hits = sum(_pip(px, py, [v for v in ring]) for ring in rings)
    return hits % 2 == 1


def rings_covering_cells(rings: Rings, cell_deg: float) -> list[str]:
    """Cells whose closed square intersects the REGION (outer minus
    holes): a cell strictly inside a hole has no vertex in it, no corner
    in the region, and no edge crossing — it drops out of the covering."""
    outer_pts = [v for v in rings[0]]
    xs = [x for x, _ in outer_pts]
    ys = [y for _, y in outer_pts]
    c0, c1 = (int(math.floor(min(xs) / cell_deg)),
              int(math.floor(max(xs) / cell_deg)))
    r0, r1 = (int(math.floor(min(ys) / cell_deg)),
              int(math.floor(max(ys) / cell_deg)))
    out = []
    for r in range(r0, r1 + 1):
        for c in range(c0, c1 + 1):
            x0, y0 = c * cell_deg, r * cell_deg
            x1, y1 = x0 + cell_deg, y0 + cell_deg
            corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
            hit = any(
                x0 <= vx <= x1 and y0 <= vy <= y1
                for ring in rings for vx, vy in ring
            ) or any(_py_point_in_rings(px, py, rings)
                     for px, py in corners)
            if not hit:
                for a, b in _ring_edges(rings):
                    if any(_seg_x_seg(a, b, corners[j],
                                      corners[(j + 1) % 4])
                           for j in range(4)):
                        hit = True
                        break
            if hit:
                out.append(f"{r}:{c}")
    return out


def rings_intersects_rect_col(
    rings: Rings, cx: Column, cy: Column, half: Column
) -> Column:
    """Exact region-vs-square intersection for an arbitrary (concave /
    holed) query polygon."""
    x0, x1 = cx - half, cx + half
    y0, y1 = cy - half, cy + half
    # 1. any ring vertex inside the square
    cond = None
    for ring in rings:
        for vx, vy in ring:
            t = ((F.lit(vx) >= x0) & (F.lit(vx) <= x1)
                 & (F.lit(vy) >= y0) & (F.lit(vy) <= y1))
            cond = t if cond is None else cond | t
    # 2. any square corner inside the region (even-odd)
    for px, py in ((x0, y0), (x1, y0), (x1, y1), (x0, y1)):
        cond = cond | point_in_rings_col(px, py, rings)
    # 3. any ring edge properly crossing any square edge
    sq = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    for (ax, ay), (bx, by) in _ring_edges(rings):
        for j in range(4):
            px_, py_ = sq[j]
            qx_, qy_ = sq[(j + 1) % 4]
            # d1/d2: a,b against the square edge; d3/d4: corners against ab
            d1 = ((qx_ - px_) * (F.lit(ay) - py_)
                  - (qy_ - py_) * (F.lit(ax) - px_))
            d2 = ((qx_ - px_) * (F.lit(by) - py_)
                  - (qy_ - py_) * (F.lit(bx) - px_))
            d3 = (F.lit(bx - ax) * (py_ - F.lit(ay))
                  - F.lit(by - ay) * (px_ - F.lit(ax)))
            d4 = (F.lit(bx - ax) * (qy_ - F.lit(ay))
                  - F.lit(by - ay) * (qx_ - F.lit(ax)))
            cond = cond | (((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)))
    return cond


def duckdb_rings_intersects_rect(
    rings: Rings, cx: str, cy: str, half: str
) -> str:
    x0, x1 = f"({cx} - {half})", f"({cx} + {half})"
    y0, y1 = f"({cy} - {half})", f"({cy} + {half})"
    terms = []
    for ring in rings:
        for vx, vy in ring:
            terms.append(f"({vx} >= {x0} AND {vx} <= {x1}"
                         f" AND {vy} >= {y0} AND {vy} <= {y1})")
    for px, py in ((x0, y0), (x1, y0), (x1, y1), (x0, y1)):
        terms.append(duckdb_point_in_rings(px, py, rings))
    sq = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    for (ax, ay), (bx, by) in _ring_edges(rings):
        for j in range(4):
            px_, py_ = sq[j]
            qx_, qy_ = sq[(j + 1) % 4]
            d1 = (f"(({qx_} - {px_}) * ({ay} - {py_})"
                  f" - ({qy_} - {py_}) * ({ax} - {px_}))")
            d2 = (f"(({qx_} - {px_}) * ({by} - {py_})"
                  f" - ({qy_} - {py_}) * ({bx} - {px_}))")
            d3 = (f"({bx - ax} * ({py_} - {ay})"
                  f" - {by - ay} * ({px_} - {ax}))")
            d4 = (f"({bx - ax} * ({qy_} - {ay})"
                  f" - {by - ay} * ({qx_} - {ax}))")
            terms.append(f"((({d1} > 0) <> ({d2} > 0))"
                         f" AND (({d3} > 0) <> ({d4} > 0)))")
    return "(" + " OR ".join(terms) + ")"


def rings_contain_points(
    points: DataFrame,
    rings: Rings,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "point_id",
    cell_deg: float = 1.0,
) -> DataFrame:
    """ST_Contains(multi-ring polygon, point): region covering prefilter
    (cells inside holes already dropped) + even-odd ray cast."""
    from serenedb_spark.functions.geo import cell_id

    cells = rings_covering_cells(rings, cell_deg)
    return (
        points
        .where(cell_id(F.col(lat_col), F.col(lon_col), cell_deg).isin(cells))
        .where(point_in_rings_col(F.col(lon_col), F.col(lat_col), rings))
        .select(id_col, lat_col, lon_col)
    )


def rings_intersect_squares(
    squares: DataFrame,
    rings: Rings,
    cell_deg: float = 4.0,
    max_half: float = 1.77,
) -> DataFrame:
    """ST_Intersects(concave/holed polygon, square corpus): dilated
    outer-bbox covering prefilter + the exact three-way check."""
    from serenedb_spark.functions.geo import cell_id

    grown = [(x + dx, y + dy) for (x, y) in rings[0]
             for dx in (-max_half, max_half) for dy in (-max_half, max_half)]
    hull = _bbox_ring(grown)
    cells = polygon_covering_cells(hull, cell_deg)
    return (
        squares
        .where(cell_id(F.col("cy"), F.col("cx"), cell_deg).isin(cells))
        .where(rings_intersects_rect_col(
            rings, F.col("cx"), F.col("cy"), F.col("half")))
        .select("geom_id", "cx", "cy", "half")
    )


# ---------------------------------------------------------------------------
# arbitrary CORPUS-side geometry: varied polygons as WKT + exact
# polygon-vs-polygon intersection
#
# Reference: the S2 path indexes arbitrary GeoJSON/WKB corpus geometry and
# answers polygon-vs-polygon (server/connector/geo_filter_builder.cpp:523,
# libs/geo/). Re-expressed without S2: the corpus carries WKT POLYGON text
# (round-tripped through Spark's shortest-repr double formatting, so
# parse-back is bit-exact), parsed JVM-side into an array<struct<x,y>>
# ring; the query is an arbitrary (concave / holed) ring set; the exact
# region-vs-polygon decomposition is
#     any corpus vertex inside the query region (even-odd)
#  OR any query-ring vertex inside the corpus polygon (ray cast over the
#     RUNTIME edge list — F.aggregate parity)
#  OR any query edge properly crossing any corpus edge (literal x runtime
#     orientation tests)
# with every float op stated identically in the Column DSL and DuckDB SQL.
# ---------------------------------------------------------------------------

#: unit-circle vertex coefficients per shape id (0 triangle, 1 hexagon,
#: 2 concave dart) — module-level so the Spark builder and the DuckDB
#: oracle embed the SAME double literals
_POLY_SHAPES: dict[int, list[tuple[float, float]]] = {
    0: [(math.cos(math.radians(a)), math.sin(math.radians(a)))
        for a in (90, 210, 330)],
    1: [(math.cos(math.radians(a)), math.sin(math.radians(a)))
        for a in (0, 60, 120, 180, 240, 300)],
    2: [(1.0, 0.0), (0.0, 1.0), (-1.0, 0.0), (0.0, 0.3)],
}


def synth_polygons_wkt(df: DataFrame, key_col: str,
                       id_alias: str = "geom_id") -> DataFrame:
    """Deterministic VARIED corpus polygons from an integer key, as WKT:
    shape = key % 3 (triangle / hexagon / concave dart), center like
    synth_squares, circumradius r in (0.17 .. 1.77]. The WKT closing
    vertex repeats the first, per spec."""
    k = F.col(key_col).cast("long")
    cx = ((k * 41 % 3400) - 1700) / F.lit(10.0)
    cy = ((k * 59 % 1600) - 800) / F.lit(10.0)
    r = ((k * 17 % 16) + 1) / F.lit(10.0) + F.lit(0.07)
    shape = (k % 3).cast("int")

    def ring(coefs):
        parts = [
            F.concat((cx + r * F.lit(c)).cast("string"), F.lit(" "),
                     (cy + r * F.lit(s)).cast("string"))
            for c, s in coefs
        ]
        return F.concat_ws(", ", *parts, parts[0])

    wkt = F.concat(
        F.lit("POLYGON (("),
        F.when(shape == 0, ring(_POLY_SHAPES[0]))
         .when(shape == 1, ring(_POLY_SHAPES[1]))
         .otherwise(ring(_POLY_SHAPES[2])),
        F.lit("))"),
    )
    return df.select(k.alias(id_alias), cx.alias("cx"), cy.alias("cy"),
                     r.alias("r"), wkt.alias("wkt"))


def parse_wkt_polygon_col(wkt: Column) -> Column:
    """WKT 'POLYGON ((x y, x y, ...))' → array<struct<x,y>> OPEN ring
    (the spec's closing vertex is dropped). Pure column expressions —
    corpus parsing never leaves the JVM."""
    inner = F.regexp_extract(wkt, r"POLYGON\s*\(\(\s*(.+?)\s*\)\)", 1)
    pts = F.split(inner, ",")
    pts = F.slice(pts, 1, F.size(pts) - 1)
    return F.transform(
        pts,
        lambda p: F.struct(
            F.element_at(F.split(F.trim(p), " +"), 1)
             .cast("double").alias("x"),
            F.element_at(F.split(F.trim(p), " +"), 2)
             .cast("double").alias("y"),
        ),
    )


def rings_intersects_polygon_col(rings: Rings, verts_in: Column) -> Column:
    """Exact region-vs-polygon over a RUNTIME vertex array (query rings
    are literals, corpus ring is data).

    The whole predicate evaluates inside ONE higher-order function whose
    lambda variable is the vertex array: the predicate references the
    array ~100 times, and lambda variables are leaf expressions — passing
    the parse/source expression directly would inline its tree at every
    reference (Catalyst collapses projections back into filters, so a
    withColumn barrier does not help) and analysis alone takes minutes."""
    return F.exists(F.array(verts_in),
                    lambda vs: _rings_x_polygon_pred(rings, vs))


def _rings_x_polygon_pred(rings: Rings, verts: Column) -> Column:
    n = F.size(verts)
    idx = F.sequence(F.lit(1), n)

    def edge(i):
        a = F.element_at(verts, i)
        b = F.element_at(verts, (i % n) + F.lit(1))
        return a, b

    # 1. any corpus vertex inside the query region
    cond = F.exists(
        verts, lambda v: point_in_rings_col(v["x"], v["y"], rings))
    # 2. any query-ring vertex inside the corpus polygon (runtime ray
    #    cast; the division form is stated identically in the oracle —
    #    the straddle test guarantees y2 != y1 wherever the quotient
    #    matters)
    for qx, qy in [v for ring in rings for v in ring]:
        def hit(i, _qx=qx, _qy=qy):
            a, b = edge(i)
            x1, y1, x2, y2 = a["x"], a["y"], b["x"], b["y"]
            straddles = (y1 > F.lit(_qy)) != (y2 > F.lit(_qy))
            t = ((x2 - x1) * (F.lit(_qy) - y1)) / (y2 - y1) + x1
            return F.when(straddles & (F.lit(_qx) < t), 1).otherwise(0)

        crossings = F.aggregate(idx, F.lit(0), lambda acc, i: acc + hit(i))
        cond = cond | (crossings % 2 == 1)
    # 3. any query edge properly crossing any corpus edge
    # (closure factory, not default args: PySpark's HOF wrapper reads the
    # callable's FULL parameter list as lambda arity)
    def make_crosses(a, b):
        (ax_, ay_), (bx_, by_) = a, b

        def crosses(i):
            p, q2 = edge(i)
            px, py, qx_, qy_ = p["x"], p["y"], q2["x"], q2["y"]
            d1 = (qx_ - px) * (F.lit(ay_) - py) - (qy_ - py) * (F.lit(ax_) - px)
            d2 = (qx_ - px) * (F.lit(by_) - py) - (qy_ - py) * (F.lit(bx_) - px)
            d3 = F.lit(bx_ - ax_) * (py - F.lit(ay_)) \
                - F.lit(by_ - ay_) * (px - F.lit(ax_))
            d4 = F.lit(bx_ - ax_) * (qy_ - F.lit(ay_)) \
                - F.lit(by_ - ay_) * (qx_ - F.lit(ax_))
            return ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))

        return crosses

    for a_b in _ring_edges(rings):
        cond = cond | F.exists(idx, make_crosses(*a_b))
    return cond


def rings_intersect_polygons(
    polys: DataFrame,
    rings: Rings,
    cell_deg: float = 4.0,
    max_r: float = 1.77,
) -> DataFrame:
    """ST_Intersects(concave/holed query polygon, WKT polygon corpus):
    dilated covering prefilter on the corpus polygons' CENTER cells
    (lossless: a corpus polygon lies inside disk(center, max_r), so any
    intersector's center falls in the query bbox grown by max_r), then
    WKT parse + the exact region-vs-polygon decomposition."""
    from serenedb_spark.functions.geo import cell_id

    grown = [(x + dx, y + dy) for (x, y) in rings[0]
             for dx in (-max_r, max_r) for dy in (-max_r, max_r)]
    hull = _bbox_ring(grown)
    cells = polygon_covering_cells(hull, cell_deg)
    return (
        polys
        .where(cell_id(F.col("cy"), F.col("cx"), cell_deg).isin(cells))
        .where(rings_intersects_polygon_col(
            rings, parse_wkt_polygon_col(F.col("wkt"))))
        .select("geom_id", "cx", "cy", "r")
    )


def duckdb_synth_polygons(table: str, key_col: str,
                          id_alias: str = "geom_id") -> str:
    """Oracle twin of synth_polygons_wkt: vertex list per row via the
    same closed-form arithmetic (no WKT round-trip needed — the Spark
    side's parse-back is bit-exact by shortest-repr formatting)."""

    def ring(coefs):
        pts = ", ".join(
            f"{{'x': cx + r * {c!r}, 'y': cy + r * {s!r}}}"
            for c, s in coefs)
        return f"[{pts}]"

    return f"""
SELECT {id_alias}, cx, cy, r,
  CASE WHEN shape = 0 THEN {ring(_POLY_SHAPES[0])}
       WHEN shape = 1 THEN {ring(_POLY_SHAPES[1])}
       ELSE {ring(_POLY_SHAPES[2])} END AS verts
FROM (
  SELECT CAST({key_col} AS BIGINT) AS {id_alias},
    (({key_col} * 41 % 3400) - 1700) / 10.0 AS cx,
    (({key_col} * 59 % 1600) - 800) / 10.0 AS cy,
    (({key_col} * 17 % 16) + 1) / 10.0 + 0.07 AS r,
    CAST({key_col} % 3 AS INT) AS shape
  FROM {table})"""


def duckdb_rings_intersects_polygon(rings: Rings,
                                    verts: str = "verts") -> str:
    """Oracle twin of rings_intersects_polygon_col over a list-of-struct
    column; identical arithmetic term for term."""
    nxt = f"{verts}[i % len({verts}) + 1]"
    cur = f"{verts}[i]"
    terms = [
        f"len(list_filter({verts},"
        f" v -> {duckdb_point_in_rings('(v.x)', '(v.y)', rings)})) > 0"
    ]
    for qx, qy in [v for ring in rings for v in ring]:
        hit = (
            f"CASE WHEN (({cur}.y > {qy}) <> ({nxt}.y > {qy}))"
            f" AND ({qx} < (({nxt}.x - {cur}.x) * ({qy} - {cur}.y))"
            f" / ({nxt}.y - {cur}.y) + {cur}.x) THEN 1 ELSE 0 END"
        )
        terms.append(
            f"(list_sum(list_transform(range(1, len({verts}) + 1),"
            f" i -> {hit})) % 2 = 1)")
    for (ax, ay), (bx, by) in _ring_edges(rings):
        d1 = (f"(({nxt}.x - {cur}.x) * ({ay} - {cur}.y)"
              f" - ({nxt}.y - {cur}.y) * ({ax} - {cur}.x))")
        d2 = (f"(({nxt}.x - {cur}.x) * ({by} - {cur}.y)"
              f" - ({nxt}.y - {cur}.y) * ({bx} - {cur}.x))")
        d3 = (f"({bx - ax} * ({cur}.y - {ay})"
              f" - {by - ay} * ({cur}.x - {ax}))")
        d4 = (f"({bx - ax} * ({nxt}.y - {ay})"
              f" - {by - ay} * ({nxt}.x - {ax}))")
        terms.append(
            f"len(list_filter(range(1, len({verts}) + 1),"
            f" i -> (({d1} > 0) <> ({d2} > 0))"
            f" AND (({d3} > 0) <> ({d4} > 0)))) > 0")
    return "(" + " OR ".join(terms) + ")"
