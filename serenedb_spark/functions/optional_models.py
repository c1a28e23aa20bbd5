"""Optional-model seams: the real libraries the reference binds
(fastText for classification / nearest-neighbor expansion, snowball C
stemmers via ICU) behind import gates, so the deterministic stand-ins in
analysis/analyzers.py are demonstrably SWAPPABLE, not merely asserted so.

Reference: create_tsdictionary.cpp:535 (classification loads a fastText
supervised model), :549 (nearest_neighbors), :255-340 (snowball via ICU).

Each factory returns a callable with the SAME signature as its stand-in,
or raises ImportError when the library is absent — callers choose the
stand-in as fallback (`classifier = fasttext_classifier(p) if
model_available('fasttext') else get_analyzer('classification').tokens`).
Tests carry skip-if-absent markers; the bare container runs the stubs.

The import-gated real models are PYTHON-side only (pandas_udf batching at
the call site): a trained model has no DuckDB representation, so wiring
one into the 3-way analyzer registry would break the consistency
invariant — the registry keeps the deterministic stand-ins, and these
seams live at the operator layer instead.
"""

from __future__ import annotations

import importlib.util
from typing import Callable


def model_available(lib: str) -> bool:
    """format_available-style gate for optional model libraries."""
    return importlib.util.find_spec(lib) is not None


def available_models() -> dict[str, bool]:
    return {
        "fasttext": model_available("fasttext"),
        "pystemmer": model_available("Stemmer"),
        "pil": model_available("PIL"),
        "soundfile": model_available("soundfile"),
    }


def _load_fasttext_model(model_path: str):
    """The C++ binding when installed; otherwise the vendored
    pure-Python reader of the SAME published .bin format
    (functions/fasttext_io.py) — the seam runs real model files either
    way instead of skipping."""
    try:
        import fasttext  # noqa: PLC0415 — optional dependency

        return fasttext.load_model(model_path)
    except ImportError:
        from serenedb_spark.functions.fasttext_io import FastTextModel

        return FastTextModel.load(model_path)


def fasttext_classifier(model_path: str,
                        top_k: int = 1) -> Callable[[str], list[str]]:
    """fastText supervised classifier with the classification analyzer's
    (text) -> [labels] signature, over a real .bin model file (reference
    create_tsdictionary.cpp:535). Backed by the fasttext library when
    importable, by the vendored format reader otherwise."""
    model = _load_fasttext_model(model_path)

    def classify(text: str) -> list[str]:
        if text is None:
            return []
        labels, _ = model.predict(text.replace("\n", " "), k=top_k)
        return [lb.removeprefix("__label__") for lb in labels]

    return classify


def fasttext_neighbors(model_path: str,
                       k: int = 2) -> Callable[[str], list[str]]:
    """fastText nearest-neighbor expansion with the nearest_neighbors
    analyzer's (word) -> [neighbors] signature (reference
    create_tsdictionary.cpp:549)."""
    model = _load_fasttext_model(model_path)

    def neighbors(word: str) -> list[str]:
        if word is None:
            return []
        return [w for _score, w in model.get_nearest_neighbors(word, k=k)]

    return neighbors


def pystemmer_stem(locale: str) -> Callable[[str], str]:
    """Real snowball (PyStemmer C binding) with the per-locale rule-table
    stemmer's (word) -> stem signature (analysis/snowball.py stem_py).
    Language codes follow PyStemmer ('german', 'french', ...)."""
    import Stemmer  # noqa: PLC0415 — optional dependency

    names = {"de": "german", "fr": "french", "es": "spanish",
             "ru": "russian", "en": "english"}
    st = Stemmer.Stemmer(names.get(locale, locale))

    def stem(word: str) -> str:
        return st.stemWord(word)

    return stem
