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
