"""Grid-cell covering soundness at the awkward places a flat grid breaks:
the antimeridian (lon wrap mod 360) and the poles (cap spans all lons).
Reference gets these from S2 (libs/geo/, geo_filter_builder.cpp); our grid
must handle them by hand (VERDICT r4 #6)."""

from __future__ import annotations

import math

import pytest

from serenedb_spark.functions.geo import EARTH_RADIUS_M, covering_cells


def _cols(cells):
    return {int(c.split(":")[1]) for c in cells}


def _rows(cells):
    return {int(c.split(":")[0]) for c in cells}


def test_antimeridian_wraps():
    cells = covering_cells(55.0, 179.9, 400_000.0, 1.0)
    cols = _cols(cells)
    assert 179 in cols, "east side of the seam"
    assert -180 in cols, "west side of the seam (wrapped)"
    assert all(-180 <= c <= 179 for c in cols), "no out-of-range columns"


def test_wrap_is_exact_cells_not_shifted():
    # a query NOT near the seam is unchanged by the wrap logic
    cells = covering_cells(37.5, 11.5, 400_000.0, 1.0)
    cols = _cols(cells)
    assert min(cols) >= 6 and max(cols) <= 17


def test_polar_cap_spans_all_longitudes():
    cells = covering_cells(89.5, 0.0, 300_000.0, 1.0)
    assert _cols(cells) == set(range(-180, 180))
    assert max(_rows(cells)) <= 90


def test_latitude_clamped_at_pole():
    cells = covering_cells(-89.8, 10.0, 500_000.0, 1.0)
    assert min(_rows(cells)) >= -91  # floor(-90/1) == -90
    assert _cols(cells) == set(range(-180, 180))


def test_cell_deg_must_divide_360():
    with pytest.raises(ValueError):
        covering_cells(0.0, 0.0, 1000.0, 0.7)


def test_covering_contains_ring_points():
    """Every point at exactly the query radius (8 compass bearings) falls
    in a covered cell — the losslessness the differential oracle asserts,
    checked here right at the seam."""
    lat0, lon0, r = 55.0, 179.95, 350_000.0
    cells = set(covering_cells(lat0, lon0, r, 1.0))
    for b in range(8):
        brg = math.radians(b * 45.0)
        ang = r / EARTH_RADIUS_M
        la1 = math.radians(lat0)
        la2 = math.asin(
            math.sin(la1) * math.cos(ang)
            + math.cos(la1) * math.sin(ang) * math.cos(brg)
        )
        lo2 = math.radians(lon0) + math.atan2(
            math.sin(brg) * math.sin(ang) * math.cos(la1),
            math.cos(ang) - math.sin(la1) * math.sin(la2),
        )
        lat2, lon2 = math.degrees(la2), math.degrees(lo2)
        lon2 = (lon2 + 180.0) % 360.0 - 180.0
        cell = f"{math.floor(lat2 / 1.0):.0f}:{math.floor(lon2 / 1.0):.0f}"
        assert cell in cells, (b, lat2, lon2, cell)
