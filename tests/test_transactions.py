"""Session transaction blocks (reference: implicit multi-statement
blocks mirroring postgres.c, pg_wire_session.cpp:1369-1398;
tests any/pg/txn/): BEGIN/COMMIT/ROLLBACK over the session's mutable
state — DML, constraints, comments, grants — with all-or-nothing
visibility through both the API and registered temp views."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.session import SereneSession

from tests.conftest import SF_DIR


@pytest.fixture()
def ss(spark):
    s = SereneSession(spark)
    s.load_dir(SF_DIR, tables=("nation", "region"))
    return s


def test_rollback_restores_dml(ss, spark):
    n0 = ss.table("nation").count()
    ss.begin()
    ss.insert("nation", spark.createDataFrame(
        [(900, "NEWLAND", 0)], ss._tables["nation"].schema))
    ss.delete("nation", F.col("n_nationkey") < 5)
    assert ss.table("nation").count() == n0 + 1 - 5
    # the registered VIEW sees the in-block state too
    assert ss.sql("SELECT count(*) AS n FROM nation").first().n \
        == n0 + 1 - 5
    ss.rollback()
    assert ss.table("nation").count() == n0
    assert ss.sql("SELECT count(*) AS n FROM nation").first().n == n0
    assert ss.table("nation").where("n_nationkey = 900").count() == 0


def test_commit_persists(ss, spark):
    n0 = ss.table("nation").count()
    ss.begin()
    ss.insert("nation", spark.createDataFrame(
        [(901, "COMMITTED", 1)], ss._tables["nation"].schema))
    ss.commit()
    assert ss.table("nation").count() == n0 + 1
    with pytest.raises(ValueError):
        ss.commit()  # no transaction in progress


def test_rollback_restores_catalog_state(ss):
    ss.begin()
    ss.set_primary_key("nation", "n_nationkey")
    ss.add_check("nation", "key_pos", F.col("n_nationkey") >= 0)
    ss.comment_on("nation", "tpch nations")
    ss.grant("analyst", "nation", "SELECT")
    assert getattr(ss, "_pks", {}).get("nation") == "n_nationkey"
    ss.rollback()
    assert getattr(ss, "_pks", {}).get("nation") is None
    assert "key_pos" not in getattr(ss, "_checks", {}).get("nation", {})
    assert ss.get_comment("nation") is None
    assert not ss.has_table_privilege("analyst", "nation", "SELECT")


def test_transaction_context_manager(ss, spark):
    n0 = ss.table("nation").count()
    with ss.transaction():
        ss.insert("nation", spark.createDataFrame(
            [(902, "CTX", 2)], ss._tables["nation"].schema))
    assert ss.table("nation").count() == n0 + 1

    with pytest.raises(RuntimeError):
        with ss.transaction():
            ss.insert("nation", spark.createDataFrame(
                [(903, "DOOMED", 2)], ss._tables["nation"].schema))
            raise RuntimeError("boom")
    assert ss.table("nation").count() == n0 + 1  # rolled back
    assert ss.table("nation").where("n_nationkey = 903").count() == 0


def test_nested_begin_refused(ss):
    ss.begin()
    with pytest.raises(ValueError):
        ss.begin()
    ss.rollback()
    with pytest.raises(ValueError):
        ss.rollback()


def test_failed_statement_inside_block_keeps_block_consistent(ss, spark):
    """A statement that FAILS its constraints applies nothing (statement
    atomicity), and the surrounding block can still roll back cleanly."""
    ss.set_primary_key("nation", "n_nationkey")
    n0 = ss.table("nation").count()
    ss.begin()
    with pytest.raises(ValueError):
        ss.insert("nation", spark.createDataFrame(
            [(0, "DUPKEY", 0)], ss._tables["nation"].schema))
    assert ss.table("nation").count() == n0
    ss.rollback()
    assert ss.table("nation").count() == n0
    # PK survives: it was set BEFORE the block
    assert getattr(ss, "_pks", {}).get("nation") == "n_nationkey"


def test_set_show_variables_wired(ss, spark):
    """SET/SHOW of the reference's sdb_* variables — the wired ones
    must actually change engine behavior."""
    from serenedb_spark.operators import maintenance as M
    from serenedb_spark.operators import scoring as SC
    from serenedb_spark.plans import planner as PL

    try:
        assert ss.show_variable("sdb_nprobe") == 4
        ss.set_variable("sdb_nprobe", "8")
        assert ss.show_variable("sdb_nprobe") == 8

        ss.set_variable("sdb_faults", "segment_written,manifest_tmp_written")
        assert M.FAULTS == {"segment_written", "manifest_tmp_written"}
        ss.set_variable("sdb_faults", "")
        assert M.FAULTS == set()

        ss.set_variable("sdb_levenshtein_max_terms", 7)
        assert PL.LEVENSHTEIN_MAX_TERMS == 7
        ss.set_variable("sdb_levenshtein_max_terms", 0)
        assert PL.LEVENSHTEIN_MAX_TERMS is None

        ss.set_variable("sdb_disable_top_k_optimization", "on")
        assert SC.DISABLE_TOPK_PRUNING is True
        ss.set_variable("sdb_disable_top_k_optimization", False)
        assert SC.DISABLE_TOPK_PRUNING is False

        with pytest.raises(ValueError):
            ss.set_variable("sdb_nope", 1)
        rows = {r.name: r.value for r in ss.show_variables().collect()}
        assert rows["sdb_nprobe"] == "8"
        assert len(rows) == 10
    finally:
        M.FAULTS.clear()
        PL.LEVENSHTEIN_MAX_TERMS = None
        SC.DISABLE_TOPK_PRUNING = False


def test_disable_topk_pruning_same_results(ss, spark):
    """The toggle must be a pure physical switch: identical top-k either
    way (pruning is exact by design; this pins the toggle path too)."""
    from serenedb_spark import queries as Q
    from serenedb_spark.operators import scoring as SC

    fn = Q.REGISTRY["fts_bm25_topk"].fn
    a = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    try:
        ss.set_variable("sdb_disable_top_k_optimization", True)
        b = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    finally:
        SC.DISABLE_TOPK_PRUNING = False
    assert a == b


def test_strict_ddl_variable(ss, spark):
    """sdb_strict_ddl = on makes duplicate ADD COLUMN an error (PG
    semantics) instead of a silent replace."""
    ss.alter_add_column("nation", "extra", None, default=1)
    ss.alter_add_column("nation", "extra", None, default=2)  # lax: replace
    assert ss.table("nation").select("extra").first().extra == 2
    ss.set_variable("sdb_strict_ddl", True)
    try:
        with pytest.raises(ValueError):
            ss.alter_add_column("nation", "extra", None, default=3)
    finally:
        ss.set_variable("sdb_strict_ddl", False)


def test_scored_terms_limit_variable(ss):
    from serenedb_spark.operators import scoring as SC

    try:
        ss.set_variable("sdb_scored_terms_limit", 8)
        assert SC.SCORED_TERMS_LIMIT == 8
    finally:
        SC.SCORED_TERMS_LIMIT = 64


def test_ann_facade_consults_variables(spark):
    """create_ann_index/ann_search read the session's sdb_* ANN
    variables: nlist from posting size, sampled KMeans training, nprobe
    + rerank defaults — and a full-probe search equals exact knn."""
    from serenedb_spark.operators import similarity as SIM
    from serenedb_spark.session import SereneSession

    ss2 = SereneSession(spark)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ss2._tables["embeddings"] = emb
    emb.createOrReplaceTempView("embeddings")

    ss2.set_variable("sdb_ivf_posting_size", 100)
    ss2.set_variable("sdb_ivf_sample_factor", 8)
    ss2.set_variable("sdb_nprobe", 4)
    n = emb.count()
    idx = ss2.create_ann_index("embeddings")
    assert len(idx.centroids) == -(-n // 100)  # nlist = ceil(n/posting)
    # every row assigned even though training sampled
    assert idx.assigned.count() == n

    q = list(emb.first()["embedding"])
    got = ss2.ann_search(idx, q, k=5,
                         nprobe=len(idx.centroids))  # full probe
    exact = SIM.knn_exact(emb, "embedding", q, k=5, metric="cosine")
    assert [r.vec_id for r in got.collect()] \
        == [r.vec_id for r in exact.collect()]

    ivf_sq = ss2.create_ann_index("embeddings", quant="sq8", nlist=4)
    top = ss2.ann_search(ivf_sq, q, k=5).collect()
    assert len(top) == 5 and top[0].vec_id == emb.first()["vec_id"]


def test_create_or_replace_and_drop_cascade(ss, spark):
    """CREATE OR REPLACE TABLE cascades the old relation's dependents
    (indexes/PK/CHECK/comment/stats); DROP refuses with dependents
    unless CASCADE (reference create_or_replace_cascade + drop_cascade
    tests)."""
    df1 = spark.createDataFrame([(1, "alpha text")], "doc_id long, text string")
    ss.create_table("scratch", df1)
    with pytest.raises(ValueError):
        ss.create_table("scratch", df1)  # exists, no or_replace
    ss.create_index("scratch", {"text": "simple"}, key="doc_id",
                    name="scratch_idx")
    ss.set_primary_key("scratch", "doc_id")
    ss.comment_on("scratch", "temp")

    df2 = spark.createDataFrame([(7, 1.5)], "id long, v double")
    ss.create_table("scratch", df2, or_replace=True)
    assert "scratch_idx" not in ss._indexes          # cascaded
    assert getattr(ss, "_pks", {}).get("scratch") is None
    assert ss.get_comment("scratch") is None
    assert ss.table("scratch").columns == ["id", "v"]
    assert ss.sql("SELECT * FROM scratch").first().id == 7

    ss.create_index("scratch", {"v": "keyword"}, key="id",
                    name="scratch_idx2")
    # PG semantics: indexes are part of their table — a bare DROP takes
    # them along (dml/foreign_key.test drops indexed tables bare)
    ss.drop_table("scratch")
    assert "scratch" not in ss._tables
    assert "scratch_idx2" not in ss._indexes


def test_rollback_restores_column_masks(ss):
    """The txn snapshot must cover the REAL mask store (_col_masks — a
    prior snapshot listed a misspelled attribute and silently skipped
    masks)."""
    ss.begin()
    ss.set_column_mask("nation", "n_name", "NULL")
    assert ss.table("nation").first().n_name is None
    ss.rollback()
    assert ss.table("nation").first().n_name is not None


def test_rollback_undoes_mutation_of_preexisting_keys(ss):
    """Aliasing regression (r8 fix, session.py _txn_copy): when a grant /
    check / mask / not-null entry EXISTS BEFORE the block, the in-block
    mutation happens in place on the nested container
    (grants.setdefault(...).add(...)) — a shallow one-level snapshot
    aliases it and ROLLBACK silently keeps the security-relevant change.
    The deep structural snapshot must fully undo it."""
    # pre-existing state, established OUTSIDE any block
    ss.grant("analyst", "nation", "SELECT")
    ss.add_check("nation", "key_pos", F.col("n_nationkey") >= 0)
    ss.set_column_mask("nation", "n_comment", F.lit("xxx"))
    ss.alter_set_not_null("nation", "n_name")

    ss.begin()
    # mutate the PRE-EXISTING nested containers in place
    ss.grant("analyst", "nation", "INSERT")        # same principal+table
    ss.grant("analyst", "region", "SELECT")        # same principal, new table
    ss.add_check("nation", "key_small", F.col("n_nationkey") < 1000)
    ss.set_column_mask("nation", "n_name", F.lit("yyy"))  # same table
    ss.alter_set_not_null("nation", "n_nationkey")        # same table
    ss.rollback()

    # only the pre-existing entries survive
    assert ss.has_table_privilege("analyst", "nation", "SELECT")
    assert not ss.has_table_privilege("analyst", "nation", "INSERT")
    assert not ss.has_table_privilege("analyst", "region", "SELECT")
    checks = getattr(ss, "_checks", {}).get("nation", {})
    assert "key_pos" in checks and "key_small" not in checks
    masks = getattr(ss, "_col_masks", {}).get("nation", {})
    assert "n_comment" in masks and "n_name" not in masks
    nn = getattr(ss, "_not_null", {}).get("nation", ())
    assert "n_name" in nn and "n_nationkey" not in nn
    # and the pre-existing mask still applies through the table() path
    assert ss.table("nation").select("n_comment").first()[0] == "xxx"


def test_rollback_restores_fks_and_defaults(ss):
    ss.load_dir(SF_DIR, tables=("nation", "region"))
    ss.begin()
    ss.add_foreign_key("nation", "n_regionkey", "region", "r_regionkey")
    ss.alter_set_default("nation", "n_comment", "n/a")
    ss.rollback()
    assert "nation_n_regionkey_fkey" not in getattr(ss, "_fks", {})
    assert "nation" not in getattr(ss, "_col_defaults", {})
