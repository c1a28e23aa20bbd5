"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

This is a training-data-pipeline extension beyond the reference's own
surface (BASELINE.json north star). The Spark-side plumbing — schema,
partitioning, batch iteration, UDF signatures — is real and tested; the
actual codec step is STUBBED: the container has no image/audio libraries,
so ``decode_media`` derives deterministic pseudo-metadata from the bytes'
md5 (clearly marked; swap `_fake_decode` for PIL/soundfile in production).
Determinism makes even the stub oracle-checkable in DuckDB.

Scale notes: mapInPandas streams Arrow record batches — bytes never
round-trip through Python row objects; feature extraction is
embarrassingly parallel over partitions; metadata-only queries prune the
binary column at the parquet scan (columnar projection)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of decode_media — the typed metadata contract
MEDIA_META_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, "
    "width int, height int, channels int, duration_ms int, checksum string"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"doc_id long, features array<float>"


def _md5_ints(data: bytes, k: int) -> list[int]:
    """k deterministic 32-bit ints from a CHAINED md5 hex string (chaining
    over the hex form, not digest bytes, so plain-SQL oracles can replicate
    the sequence: h1 = md5(payload), h2 = md5(h1), ...)."""
    out, h = [], hashlib.md5(data).hexdigest()
    while len(out) < k:
        for i in range(0, 32, 8):
            out.append(int(h[i:i + 8], 16))
        h = hashlib.md5(h.encode()).hexdigest()
    return out[:k]


def _fake_decode(data: bytes, media_type: str) -> dict:
    """STUB codec (no image/audio libs in this container): deterministic
    pseudo-dimensions from the payload hash. Production: replace with
    PIL.Image.open / soundfile.read — the call site contract is identical.
    """
    a, b, c = _md5_ints(data, 3)
    if media_type == "image":
        return {"width": 64 + a % 1857, "height": 64 + b % 1017,
                "channels": 1 + c % 4, "duration_ms": 0}
    if media_type == "audio":
        return {"width": 0, "height": 0, "channels": 1 + a % 2,
                "duration_ms": 500 + b % 600000}
    if media_type == "video":
        return {"width": 64 + a % 1857, "height": 64 + b % 1017,
                "channels": 3, "duration_ms": 1000 + c % 7200000}
    return {"width": 0, "height": 0, "channels": 0, "duration_ms": 0}


def _pil_decode(data: bytes, media_type: str) -> dict:
    """Real image codec (used when PIL is importable and codec='auto')."""
    import io

    from PIL import Image  # noqa: PLC0415 — optional dependency

    img = Image.open(io.BytesIO(data))
    return {"width": img.width, "height": img.height,
            "channels": len(img.getbands()), "duration_ms": 0}


def _soundfile_decode(data: bytes, media_type: str) -> dict:
    """Real audio codec (used when soundfile is importable and
    codec='auto')."""
    import io

    import soundfile as sf  # noqa: PLC0415 — optional dependency

    info = sf.info(io.BytesIO(data))
    return {"width": 0, "height": 0, "channels": info.channels,
            "duration_ms": int(info.frames / info.samplerate * 1000)}


def available_codecs() -> dict[str, str]:
    """Which decoder each media type resolves to under codec='auto' —
    the `format_available`-style gate: real libs when importable, the
    deterministic stub otherwise (video is always the stub; no ffmpeg
    binding is assumed anywhere)."""
    import importlib.util

    return {
        "image": ("pil" if importlib.util.find_spec("PIL") else "fake"),
        "audio": ("soundfile" if importlib.util.find_spec("soundfile")
                  else "fake"),
        "video": "fake",
    }


def _resolve_decoder(codec: str):
    if codec == "fake":
        return _fake_decode
    if codec != "auto":
        raise ValueError(f"codec must be 'auto'|'fake', got {codec!r}")
    chosen = available_codecs()
    real = {"pil": _pil_decode, "soundfile": _soundfile_decode}

    def decode(data: bytes, media_type: str) -> dict:
        fn = real.get(chosen.get(media_type, "fake"), _fake_decode)
        return fn(data, media_type)

    return decode


def decode_media(media: DataFrame, id_col: str = "doc_id",
                 bytes_col: str = "media", type_col: str = "media_type",
                 codec: str = "fake", decoder=None) -> DataFrame:
    """binary column → typed metadata, one Arrow batch at a time.

    ``codec='fake'`` (default) keeps the deterministic stub — the gate
    queries run over synthetic text-byte payloads that no real codec
    could parse, and determinism is what makes the oracle possible.
    ``codec='auto'`` swaps in PIL / soundfile per media type when
    importable (available_codecs() reports the resolution). ``decoder``
    injects any callable with the same (bytes, media_type) -> dict
    contract — the seam the production swap uses."""
    decode = decoder if decoder is not None else _resolve_decoder(codec)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [
                decode(bs, mt)
                for bs, mt in zip(pdf[bytes_col], pdf[type_col])
            ]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "media_type": pdf[type_col].values,
                "n_bytes": [len(b) for b in pdf[bytes_col]],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "channels": [m["channels"] for m in metas],
                "duration_ms": [m["duration_ms"] for m in metas],
                "checksum": [hashlib.md5(b).hexdigest() for b in pdf[bytes_col]],
            })

    return media.mapInPandas(_batches, MEDIA_META_SCHEMA)


def extract_features(media: DataFrame, id_col: str = "doc_id",
                     bytes_col: str = "media") -> DataFrame:
    """binary column → FEATURE_DIM float vector (the embedding-extraction
    plumbing; stub features are md5-derived in [0, 1))."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                [v % 10_000 / 10_000.0 for v in _md5_ints(b, FEATURE_DIM)]
                for b in pdf[bytes_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "features": feats})

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 60_000,
                 max_frames: int = 8, id_col: str = "doc_id",
                 bytes_col: str = "media", type_col: str = "media_type") -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp
    (decode stubbed — real impl would emit the frame bytes as binary)."""
    meta = decode_media(media, id_col, bytes_col, type_col)
    n = F.least(
        (F.col("duration_ms") / F.lit(every_ms)).cast("int") + 1,
        F.lit(max_frames),
    )
    return (
        meta.where(F.col("media_type") == "video")
        .select(
            "doc_id",
            F.posexplode(
                F.transform(F.sequence(F.lit(0), n - 1), lambda i: i * every_ms)
            ).alias("frame_no", "frame_ts_ms"),
        )
    )


def docs_as_media(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Adapter for the driver testdata: text bytes as the opaque payload,
    media_type assigned deterministically (doc_id mod 3)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
    )
