"""Per-locale snowball stemmers (analysis/snowball.py): the three
generated representations (pyspark Column / pure Python / DuckDB SQL)
must agree exactly — fuzzed over diacritic + Cyrillic alphabets — and
the stems themselves must conflate the standard inflection families."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from serenedb_spark.analysis import snowball as SB

GOLDEN = {
    "de": [
        ("häuser", "haus"), ("häusern", "haus"), ("kinder", "kind"),
        ("kindes", "kind"), ("laufen", "lauf"), ("tische", "tisch"),
        ("übungen", "ubung"), ("großes", "gross"), ("schönheit", "schonheit"),
        ("möglichkeiten", "moglich"),
    ],
    "fr": [
        ("nationales", "nationale"), ("actions", "action"),
        ("logiques", "logique"), ("chanterai", "chant"),
        ("mangées", "mang"), ("continuité", "continu"),
        ("premier", "premi"), ("première", "premi"), ("tables", "table"),
    ],
    "es": [
        ("naciones", "nacion"), ("nación", "nacion"), ("casas", "cas"),
        ("corriendo", "corr"), ("comieron", "com"),
        ("generalidades", "general"), ("rápidamente", "rapid"),
        ("importante", "import"), ("importantes", "import"),
    ],
    "ru": [
        ("книги", "книг"), ("книгами", "книг"), ("книга", "книг"),
        ("возможности", "возможн"), ("возможность", "возможн"),
        ("пользователей", "пользовател"), ("пользователи", "пользовател"),
        ("большая", "больш"), ("большие", "больш"),
    ],
    "it": [
        ("nazione", "nazion"), ("nazioni", "nazion"),
        ("informazione", "inform"), ("informazioni", "inform"),
        ("rapidamente", "rapid"), ("importante", "import"),
        ("importanti", "import"), ("parlando", "parl"),
        ("parlare", "parl"), ("felicità", "felic"),
        ("libri", "libr"), ("libro", "libr"),
    ],
    "pt": [
        ("administração", "administr"), ("administrações", "administr"),
        ("casas", "cas"), ("casa", "cas"), ("rapidamente", "rapid"),
        ("felicidade", "felic"), ("felicidades", "felic"),
        ("importante", "import"), ("falaram", "fal"), ("falando", "fal"),
        ("falar", "fal"), ("livros", "livr"), ("livro", "livr"),
    ],
    "nl": [
        ("huizen", "huiz"), ("boeken", "boek"), ("appels", "appel"),
        ("appel", "appel"), ("mogelijkheid", "mogelijk"),
        ("mogelijkheden", "mogelijk"), ("lopen", "lop"),
        ("gelukkig", "geluk"), ("werken", "werk"),
    ],
    "sv": [
        ("flickorna", "flick"), ("flickor", "flick"), ("flicka", "flick"),
        ("tidningarna", "tidning"), ("tidningar", "tidning"),
        ("möjligheterna", "moj"), ("möjligheten", "moj"),
        ("möjlig", "moj"), ("hundarnas", "hund"), ("hundar", "hund"),
    ],
    "da": [
        ("bilerne", "bil"), ("biler", "bil"), ("bilen", "bil"),
        ("husene", "hus"), ("huset", "hus"),
        ("venlige", "ven"), ("venlig", "ven"),
    ],
    "no": [
        ("bilene", "bil"), ("biler", "bil"), ("bilen", "bil"),
        ("husene", "hus"), ("huset", "hus"),
        ("muligheten", "mul"), ("mulighetene", "mul"),
    ],
    "fi": [
        ("taloissa", "talo"), ("talossa", "talo"), ("talon", "talo"),
        ("talot", "talo"), ("taloja", "talo"), ("talo", "talo"),
        ("kirjassa", "kirja"), ("kirjat", "kirja"), ("kirjan", "kirja"),
        ("kirja", "kirja"),
    ],
    "hu": [
        ("házban", "haz"), ("házakban", "haz"), ("házak", "haz"),
        ("házat", "haz"), ("ház", "haz"),
        ("könyvek", "konyv"), ("könyvet", "konyv"), ("könyvben", "konyv"),
        ("könyv", "konyv"), ("almák", "alma"), ("alma", "alma"),
    ],
    "tr": [
        ("evlerinden", "ev"), ("evleri", "ev"), ("evler", "ev"),
        ("evde", "ev"), ("ev", "ev"),
        ("kitaplardan", "kitap"), ("kitaplar", "kitap"),
        ("kitap", "kitap"), ("arabaları", "araba"), ("araba", "araba"),
    ],
    "ro": [
        ("importante", "import"), ("important", "import"),
        ("importanți", "import"),
        ("lucrurile", "lucru"), ("lucruri", "lucru"), ("lucru", "lucru"),
        ("cărțile", "cart"), ("cărți", "cart"), ("carte", "cart"),
        ("naționale", "national"), ("național", "national"),
    ],
    "el": [
        ("λογοσ", "λογ"), ("λογου", "λογ"), ("λογων", "λογ"),
        ("λογοι", "λογ"),
        ("βιβλια", "βιβλι"), ("βιβλιο", "βιβλι"), ("βιβλιων", "βιβλι"),
        ("προγραμματα", "προγραμμ"), ("προγραμμα", "προγραμμ"),
    ],
    "lt": [
        ("knygos", "knyg"), ("knygoms", "knyg"), ("knyga", "knyg"),
        ("knygą", "knyg"),
        ("namas", "nam"), ("namuose", "nam"), ("namai", "nam"),
        ("namų", "nam"), ("didelis", "didel"), ("dideli", "didel"),
    ],
    "id": [
        ("membaca", "baca"), ("dibaca", "baca"), ("bacaan", "baca"),
        ("baca", "baca"),
        ("menyapu", "sapu"), ("sapu", "sapu"),
        ("makanan", "makan"), ("makan", "makan"),
        ("bukunya", "buku"), ("bukuku", "buku"), ("buku", "buku"),
        ("belajar", "ajar"), ("mengajar", "ajar"), ("ajar", "ajar"),
        ("terbesar", "besar"), ("besar", "besar"), ("sungai", "sungai"),
    ],
    "ga": [
        ("bhean", "bean"), ("bean", "bean"),
        ("bhfuil", "fuil"), ("fuil", "fuil"),
        ("ólann", "ól"), ("ólfaidh", "ól"), ("ól", "ól"),
        ("bádanna", "bád"), ("bád", "bád"),
        ("gcailín", "cailín"), ("cailíní", "cailín"), ("cailín", "cailín"),
    ],
}

_ALPHABETS = {
    "de": "abdefghiklmnorstußäöü",
    "fr": "abdefghilmnorstuvéèêçà",
    "es": "abdefghilmnorstuvíóáé",
    "ru": "абвгдеижклмнопрстуыьэюя",
    "it": "abdefghilmnorstuvàèìò",
    "pt": "abdefghilmnorstuváéíçãõ",
    "nl": "abdefghijklmnorstuv",
    "sv": "abdefghiklmnorstuvyäåö",
    "da": "abdefghiklmnorstuvyæåø",
    "no": "abdefghiklmnorstuvyæåø",
    "fi": "abdefghijklmnoprstuvyäö",
    "hu": "abdefghiklmnorstuvzáéíóöőúüű",
    "tr": "abcdefgiklmnoprstuvyzçğıöşü",
    "ro": "abcdefgilmnoprstuvăâîșț",
    "el": "αβγδεζηθικλμνξοπρστυφχψως",
    "lt": "abdegiklmnoprstuvyząęėįųū",
    "id": "abdefghiklmnoprstuw",
    "ga": "abcdefghilmnoprstuáéíóú",
}


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _three_way(spark, duck, lc: str, words: list[str]):
    loc = SB.LOCALES[lc]
    py = [SB.stem_py(loc, w) for w in words]
    df = spark.createDataFrame([(list(words),)], "ws array<string>")
    sp = list(df.select(SB.stem_expr_list(loc, F.col("ws"))).first()[0])
    dk = list(duck.execute(
        f"SELECT {SB.stem_sql_list(loc, 'ws')} FROM (SELECT ? AS ws)",
        [list(words)]).fetchone()[0])
    return py, sp, dk


@pytest.mark.parametrize("lc", sorted(GOLDEN))
def test_golden_stems_and_consistency(spark, duck, lc):
    words = [w for w, _ in GOLDEN[lc]]
    py, sp, dk = _three_way(spark, duck, lc, words)
    assert py == sp == dk
    assert py == [s for _, s in GOLDEN[lc]]


@pytest.mark.parametrize("lc", sorted(GOLDEN))
def test_conflation_within_family(spark, duck, lc):
    # every (inflected, stem) family member maps to ONE shared stem
    fam = {}
    for w, s in GOLDEN[lc]:
        fam.setdefault(s, []).append(w)
    loc = SB.LOCALES[lc]
    for s, ws in fam.items():
        stems = {SB.stem_py(loc, w) for w in ws}
        assert stems == {s}, (lc, ws, stems)


# few examples × many words per example: the cost is Catalyst planning
# of the (large, constant) stemmer expression, not the rows
@pytest.mark.parametrize("lc", sorted(_ALPHABETS))
@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_fuzz_three_way(spark, duck, lc, data):
    words = data.draw(st.lists(
        st.text(alphabet=_ALPHABETS[lc], min_size=0, max_size=12),
        min_size=1, max_size=25))
    py, sp, dk = _three_way(spark, duck, lc, words)
    assert py == sp == dk, (lc, words)


def test_edge_tokens(spark, duck):
    for lc in sorted(_ALPHABETS):
        py, sp, dk = _three_way(spark, duck, lc, ["", "a", "s", "ss"])
        assert py == sp == dk


def test_locale_analyzer_pipeline(spark):
    from serenedb_spark.analysis.analyzers import get_analyzer

    an = get_analyzer("text_de")
    # stopwords dropped, umlauts folded AFTER stemming, plural conflated
    assert an.tokens("Die schönen Häuser und die großen Tische") == [
        "schon", "haus", "gross", "tisch"]
    assert an.tokens(None) == []
    ru = get_analyzer("text_ru")
    assert ru.tokens("Книги и книгами") == ["книг", "книг"]
