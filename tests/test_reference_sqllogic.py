"""Run the reference's OWN sqllogic .test files verbatim through
``SereneSession.sql()`` (tests/sqllogic_runner.py) — statement-for-
statement parity evidence on the reference's chosen inputs and expected
outputs, including its recorded md5 result hashes (ctas.test matches
byte-exact).

Each file pins the number of compared-and-passed blocks; the runner
stops at the first out-of-surface construct (multi-connection isolation,
composite PKs, PREPARE, AND CHAIN — see STOPPERS), so a regression that
shortens any run fails the pin. Skipped blocks are the reference's own
`skipif serenedb` / PG-only twins.
"""

from __future__ import annotations

import os

import pytest

from serenedb_spark.session import SereneSession
from tests.sqllogic_runner import run_file

REF = "/root/reference/tests/sqllogic"

#: (file, minimum blocks that must pass)
FILES = [
    ("any/pg/txn/basic.test", 17),
    ("any/pg/txn/aborted_block.test", 11),
    ("any/pg/txn/chain.test", 3),
    ("any/pg/simple/basic_dml.test", 12),
    ("any/pg/simple/ctas.test", 23),
    ("any/pg/simple/default_values.test", 55),
    ("any/pg/simple/constraint.test", 33),
    ("any/pg/simple/insert_conflict.test", 35),
    ("any/pg/simple/limit.test", 7),
    ("any/pg/simple/boolean.test", 26),
    ("any/pg/simple/create_table_errors.test", 12),
    ("any/pg/simple/join_errors.test", 2),
    ("any/pg/ddl/alter_table.test", 26),
    ("any/pg/ddl/alter_add_pk_unique.test", 13),
    ("any/pg/ddl/alter_add_check.test", 6),
    ("any/pg/ddl/drop_cascade_table.test", 9),
    ("any/pg/ddl/drop_cascade_tables.test", 6),
    ("any/pg/ddl/drop_cascade_views.test", 6),
    ("any/pg/ddl/drop_cascade_view_relations.test", 4),
    ("any/pg/ddl/drop_cascade_complex_graphs.test", 7),
    ("any/pg/ddl/drop_cascade_edge.test", 2),
    ("any/pg/txn/deferrable.test", 10),
    ("any/pg/simple/table_without_pk.test", 29),
    ("any/pg/simple/nullif.test", 11),
    ("any/pg/simple/window_extra.test", 10),
    ("any/pg/simple/multi_statement.test", 8),
    ("any/pg/simple/sublink_errors.test", 2),
    ("any/pg/simple/copy.test", 34),
    ("sdb/pg/simple/copy_parquet.test", 35),
    ("sdb/pg/simple/truncate.test", 41),
    ("sdb/pg/simple/error_branding.test", 2),
    ("sdb/pg/simple/groupby.test", 1),
    ("sdb/pg/simple/search_table.test", 164),
    # the documented analyzer-configuration surface, byte-exact
    # (ts_lexize outputs incl. Porter2 stemming — analysis/porter2.py)
    ("sdb/pg/site_docs/sql/statements/"
     "create_text_search_dictionary/index.test", 7),
    ("sdb/pg/site_docs/sql/statements/"
     "create_text_search_dictionary/text.test", 12),
    ("sdb/pg/site_docs/sql/statements/"
     "create_text_search_dictionary/stem.test", 4),
    ("sdb/pg/site_docs/sql/statements/"
     "create_text_search_dictionary/stopwords.test", 6),
    ("sdb/pg/site_docs/sql/statements/"
     "create_text_search_dictionary/union.test", 4),
    ("sdb/pg/site_docs/sql/statements/"
     "create_text_search_dictionary/solr-synonyms.test", 5),
    ("sdb/pg/site_docs/sql/statements/"
     "create_text_search_dictionary/wordnet-synonyms.test", 4),
    ("sdb/pg/site_docs/sql/statements/"
     "create_text_search_dictionary/wildcard.test", 7),
    ("sdb/pg/site_docs/sql/statements/"
     "create_text_search_dictionary/segmentation.test", 6),
    ("sdb/pg/site_docs/sql/statements/"
     "create_text_search_dictionary/pipeline/index.test", 8),
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")


@pytest.mark.parametrize("relpath,min_pass",
                         FILES, ids=[f for f, _ in FILES])
def test_reference_file(spark, relpath, min_pass):
    ss = SereneSession(spark)
    passed, total = run_file(ss, f"{REF}/{relpath}")
    assert passed >= min_pass, (
        f"{relpath}: only {passed}/{total} blocks passed "
        f"(pinned ≥ {min_pass})")
