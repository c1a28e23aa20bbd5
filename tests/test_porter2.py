"""Porter2 English snowball (analysis/porter2.py): published example
vectors + three-way consistency (python / pyspark Column / DuckDB SQL)
over fixed vocab and fuzzed words. The reference stems English through
ICU snowball (create_tsdictionary.cpp:255-340); the doc examples here
are its own site_docs expected outputs."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from serenedb_spark.analysis import porter2 as P

#: hand-walked against the published algorithm
#: (snowballstem.org/algorithms/english/stemmer.html)
VECTORS = {
    # the reference's own doc examples (create_text_search_dictionary/
    # text.test example_005, stem.test example_001)
    "running": "run", "quickly": "quick", "runners": "runner",
    "were": "were",
    # step 1a/1b shapes
    "caresses": "caress", "ponies": "poni", "ties": "tie",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "hopping": "hop", "hoping": "hope", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "failing": "fail",
    "filing": "file",
    # 1c + steps 2-4
    "happy": "happi", "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "digitizer": "digit",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "format",
    "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "activate": "activ",
    "effective": "effect", "bowdlerize": "bowdler",
    "generalization": "general", "luxuriously": "luxuri",
    "possibly": "possibl",
    # step 5 / short words
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll", "be": "be", "a": "a",
    # exceptional forms + invariants
    "dying": "die", "lying": "lie", "skis": "ski", "news": "news",
    "inning": "inning", "exceed": "exceed", "bias": "bias",
    # R1 prefix overrides
    "generate": "generat", "arsenic": "arsenic",
    # apostrophes (step 0)
    "owner's": "owner", "'twas": "twas",
}


def test_vectors_python():
    bad = {w: (P.stem_py(w), exp) for w, exp in VECTORS.items()
           if P.stem_py(w) != exp}
    assert not bad, bad


def _fuzz_words(n=400, seed=7):
    rnd = random.Random(seed)
    words = list(VECTORS)
    for _ in range(n):
        words.append("".join(
            rnd.choice("abcdefghijklmnopqrstuvwyz'")
            for _ in range(rnd.randint(1, 14))))
    return sorted(set(w for w in words if w))


def test_duckdb_matches_python():
    words = _fuzz_words()
    con = duckdb.connect()
    got = dict(con.execute(
        f"SELECT w, {P.stem_sql('w')} FROM (SELECT unnest(?) AS w)",
        [words]).fetchall())
    bad = {w: (P.stem_py(w), got[w]) for w in words
           if got[w] != P.stem_py(w)}
    assert not bad, dict(list(bad.items())[:10])


def test_column_matches_python(spark):
    words = _fuzz_words(n=200, seed=11)
    df = spark.createDataFrame([(w,) for w in words], "w string") \
        .withColumn("s", P.stem_expr(F.col("w")))
    got = {r.w: r.s for r in df.collect()}
    bad = {w: (P.stem_py(w), got[w]) for w in words
           if got[w] != P.stem_py(w)}
    assert not bad, dict(list(bad.items())[:10])


def test_text_en_analyzer_tri_path(spark):
    """The registered text_en analyzer (split + stopwords + porter2)
    agrees across its python and DuckDB paths on real sentences."""
    from serenedb_spark.analysis.analyzers import get_analyzer

    an = get_analyzer("text_en")
    sents = [
        "The runners were running quickly",
        "Generalization of relational joins",
        "she's flying;  HOPPING, and hoped!",
    ]
    con = duckdb.connect()
    for s in sents:
        duck = con.execute(
            f"SELECT {an.duckdb('v')} FROM (SELECT ? AS v)", [s]
        ).fetchone()[0]
        assert list(duck) == an.tokens(s), s


def test_dictionary_doc_examples(spark):
    """The reference's own site_docs expected outputs, via the SQL door."""
    from serenedb_spark.session import SereneSession

    ss = SereneSession(spark)
    ss.sql("CREATE TEXT SEARCH DICTIONARY p2_text (template='text', "
           "locale='en_US.UTF-8', case='lower', stemming=true, "
           "accent=true)")
    ss.sql("CREATE TEXT SEARCH DICTIONARY p2_stem "
           "(template='stem', locale='en')")
    got = ss.sql("SELECT ts_lexize('p2_text', "
                 "'The runners were running quickly')").first()[0]
    assert got == ["the", "runner", "were", "run", "quick"]
    assert ss.sql("SELECT ts_lexize('p2_stem', 'running')") \
        .first()[0] == ["run"]
