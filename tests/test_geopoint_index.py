"""Geopoint analyzer + indexed radius search: cell terms at every level,
covering-term pruning losslessness vs the exact scan, and composition
with a text predicate in one boolean query (the reason geo lives in the
index at all — reference geo_filter_builder.cpp + geopoint analyzer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from serenedb_spark.analysis.analyzers import (
    geopoint_cover_terms, get_analyzer,
)
from serenedb_spark.functions.geo import (
    haversine_m, indexed_radius_search, synth_points,
)
from serenedb_spark.operators.indexing import build_index
from serenedb_spark.plans import tsquery as q
from serenedb_spark.plans.planner import compile_query
from tests.conftest import SF_DIR


def test_geopoint_tokens():
    an = get_analyzer("geopoint")
    assert an.tokens("37.5,11.5") == ["g4.0:9:2", "g1.0:37:11", "g0.25:150:46"]
    assert an.tokens("-0.1,-0.1") == ["g4.0:-1:-1", "g1.0:-1:-1",
                                      "g0.25:-1:-1"]
    assert an.tokens("not a point") == []


def test_geojson_tokens():
    """GeoJSON [lon, lat] order maps to the SAME cell terms as the
    equivalent 'lat,lon' geopoint string — the two templates are
    interchangeable at query time."""
    gj = get_analyzer("geojson")
    gp = get_analyzer("geopoint")
    assert gj.tokens('{"type": "Point", "coordinates": [11.5, 37.5]}') == \
        gp.tokens("37.5,11.5")
    assert gj.tokens('{"type": "Polygon", "coordinates": []}') == []
    assert gj.tokens("not json at all") == []


def _geo_index(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pts = synth_points(ev.select("event_id").distinct(), "event_id")
    geo_df = pts.select(
        F.col("point_id").alias("doc_id"),
        F.concat_ws(",", "lat", "lon").alias("geo"),
        "lat", "lon",
    )
    return build_index(geo_df, {"geo": "geopoint"}, key="doc_id"), pts


def test_indexed_radius_equals_exact_scan(spark):
    idx, pts = _geo_index(spark)
    lat, lon, r = 37.5, 11.5, 400_000.0
    got = sorted(
        r_.doc_id for r_ in
        indexed_radius_search(idx, "geo", lat, lon, r,
                              id_col="doc_id").collect()
    )
    dist = haversine_m(F.col("lat"), F.col("lon"), F.lit(lat), F.lit(lon))
    want = sorted(
        r_.point_id for r_ in
        pts.select("point_id", F.round(dist, 1).alias("d"))
        .where(F.col("d") < r).collect()
    )
    assert got == want and len(got) > 0


def test_geo_composes_with_term_query(spark):
    """One boolean query mixing a cell-term disjunction and an id-range
    claim — both resolve through the same postings machinery."""
    idx, _ = _geo_index(spark)
    terms = geopoint_cover_terms(37.5, 11.5, 400_000.0, 1.0)
    node = q.AnyOf(terms)
    ids = compile_query(idx, "geo", node).doc_ids
    n_cover = ids.count()
    exact = indexed_radius_search(
        idx, "geo", 37.5, 11.5, 400_000.0, id_col="doc_id"
    ).count()
    assert n_cover >= exact, "covering is a superset of the exact result"


def test_saved_geo_index_prunes_buckets(spark, tmp_path):
    """A persisted geopoint index gets the same term-bucket partition
    pruning as text: a covering-cell disjunction touches only the
    claimed bucket directories."""
    import contextlib
    import io

    from serenedb_spark.operators.indexing import (
        load_index, py_term_bucket, save_index,
    )

    idx, _ = _geo_index(spark)
    d = str(tmp_path / "geoidx")
    save_index(idx, d)
    disk = load_index(spark, d, {"geo": "geopoint"})
    terms = geopoint_cover_terms(37.5, 11.5, 150_000.0, 1.0)
    plan = compile_query(disk, "geo", q.AnyOf(terms)).doc_ids
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan.explain("formatted")
    txt = buf.getvalue()
    assert "PartitionFilters" in txt
    # at least one claimed bucket id appears in the partition filter
    assert any(str(py_term_bucket(t)) in txt for t in terms), txt[:2000]
    # and results through the disk layout equal the in-memory index
    a = {r.doc_id for r in compile_query(idx, "geo",
                                         q.AnyOf(terms)).doc_ids.collect()}
    b = {r.doc_id for r in compile_query(disk, "geo",
                                         q.AnyOf(terms)).doc_ids.collect()}
    assert a == b and len(a) > 0
