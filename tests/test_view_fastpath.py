"""View fast-path: a keyless multi-file parquet directory gets a stable
synthesized PK (file identity + row position via the `_metadata` hidden
struct — scan-time, no shuffle), and an inverted index built over it
matches the same index built over an explicit key (reference
view_fast_path.h:59-110 zero-ETL path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.operators.indexing import build_index
from serenedb_spark.plans import tsquery as q
from serenedb_spark.plans.planner import compile_query
from serenedb_spark.sources.view_fastpath import decode_file_pk, file_pk_view
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def keyless_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vfp") / "docs_keyless")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # drop the PK and spread over several files — the zero-ETL input shape
    docs.select("text", "lang").repartition(4).write.parquet(path)
    return path


def test_pk_is_stable_and_unique(spark, keyless_dir):
    v1 = file_pk_view(spark, keyless_dir)
    v2 = file_pk_view(spark, keyless_dir)
    n = v1.count()
    assert v1.select("doc_id").distinct().count() == n
    # same files → identical key assignment across reads
    a = {r.doc_id for r in v1.select("doc_id").collect()}
    b = {r.doc_id for r in v2.select("doc_id").collect()}
    assert a == b
    fi = v1.select(*decode_file_pk()).distinct()
    assert fi.select("file_index").distinct().count() == 4


def test_index_over_keyless_view_matches_keyed(spark, keyless_dir):
    view = file_pk_view(spark, keyless_dir)
    idx = build_index(view, {"text": "simple"}, key="doc_id")
    got = compile_query(idx, "text", q.Term("spark")).doc_ids
    # the match SET must equal the naive scan of the same view
    naive = view.where(
        F.array_contains(F.split(F.lower("text"), "[^a-z0-9]+"), "spark")
    ).select("doc_id")
    assert got.count() == naive.count() > 0
    assert got.exceptAll(naive).count() == 0
