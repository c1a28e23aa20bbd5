"""Optional-model seams (functions/optional_models.py, multimodal codec
registry): the deterministic stand-ins must be swappable for real
libraries through stable signatures. Real-library tests skip when the
library is absent (this container ships none of them); the dispatch
plumbing is tested unconditionally via injected callables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.functions import optional_models as OM
from serenedb_spark.operators import multimodal as MM


def test_availability_report_shape():
    avail = OM.available_models()
    assert set(avail) == {"fasttext", "pystemmer", "pil", "soundfile"}
    assert all(isinstance(v, bool) for v in avail.values())
    codecs = MM.available_codecs()
    assert set(codecs) == {"image", "audio", "video"}
    assert codecs["video"] == "fake"


def test_absent_lib_raises_importerror():
    for lib, call in [
        ("fasttext", lambda: OM.fasttext_classifier("/nope.bin")),
        ("fasttext", lambda: OM.fasttext_neighbors("/nope.bin")),
        ("Stemmer", lambda: OM.pystemmer_stem("de")),
    ]:
        if not OM.model_available(lib):
            with pytest.raises(ImportError):
                call()


def test_decoder_injection_seam(spark):
    """decode_media must route every payload through the injected
    callable — the exact seam a PIL/soundfile swap uses."""
    docs = spark.createDataFrame(
        [(1, b"abc", "image"), (2, b"defg", "audio")],
        "doc_id long, media binary, media_type string")

    def decoder(data: bytes, media_type: str) -> dict:
        return {"width": len(data), "height": 7, "channels": 1,
                "duration_ms": 0}

    out = {r.doc_id: (r.width, r.height, r.n_bytes) for r in
           MM.decode_media(docs, decoder=decoder).collect()}
    assert out == {1: (3, 7, 3), 2: (4, 7, 4)}


def test_auto_codec_resolves_to_stub_without_libs(spark):
    docs = spark.createDataFrame(
        [(1, b"payload-bytes", "image")],
        "doc_id long, media binary, media_type string")
    fake = MM.decode_media(docs, codec="fake").first()
    if MM.available_codecs()["image"] == "fake":
        auto = MM.decode_media(docs, codec="auto").first()
        assert (auto.width, auto.height) == (fake.width, fake.height)
    with pytest.raises(ValueError):
        MM.decode_media(docs, codec="bogus")


@pytest.mark.skipif(not OM.model_available("PIL"),
                    reason="PIL not installed")
def test_real_image_codec(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 5)).save(buf, format="PNG")
    docs = spark.createDataFrame(
        [(1, buf.getvalue(), "image")],
        "doc_id long, media binary, media_type string")
    r = MM.decode_media(docs, codec="auto").first()
    assert (r.width, r.height, r.channels) == (12, 5, 3)


@pytest.mark.skipif(not OM.model_available("soundfile"),
                    reason="soundfile not installed")
def test_real_audio_codec(spark):
    import io

    import numpy as np
    import soundfile as sf

    buf = io.BytesIO()
    sf.write(buf, np.zeros((4410, 2)), 44100, format="WAV")
    docs = spark.createDataFrame(
        [(1, buf.getvalue(), "audio")],
        "doc_id long, media binary, media_type string")
    r = MM.decode_media(docs, codec="auto").first()
    assert (r.channels, r.duration_ms) == (2, 100)


@pytest.mark.skipif(not OM.model_available("Stemmer"),
                    reason="PyStemmer not installed")
def test_real_snowball_agrees_on_core_vocabulary():
    # the rule-table subset should match full snowball on the golden set
    from tests.test_snowball import GOLDEN

    stem = OM.pystemmer_stem("de")
    agreed = sum(1 for w, s in GOLDEN["de"]
                 if stem(w) in (s, w))
    assert agreed >= len(GOLDEN["de"]) // 2


def test_stand_in_signatures_match():
    """The analyzer stand-ins and the real-model factories share call
    shapes: (text)->[labels], (word)->[neighbors], (word)->stem."""
    from serenedb_spark.analysis.analyzers import get_analyzer
    from serenedb_spark.analysis.snowball import LOCALES, stem_py

    labels = get_analyzer("classification").tokens("some text")
    assert isinstance(labels, list) and all(
        isinstance(x, str) for x in labels)
    nn = get_analyzer("nearest_neighbors").tokens("word")
    assert isinstance(nn, list)
    assert isinstance(stem_py(LOCALES["de"], "häuser"), str)
