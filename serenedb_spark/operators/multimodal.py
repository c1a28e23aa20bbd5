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


#: JPEG start-of-frame markers that carry dimensions (baseline,
#: progressive, lossless variants — published JPEG/JFIF layout)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _header_decode(data: bytes, media_type: str) -> dict | None:
    """REAL metadata from the published container headers — pure struct
    parsing, no codec libraries: PNG IHDR, JPEG SOF, GIF logical screen,
    BMP info header, RIFF/WAVE fmt+data chunks. Returns None for
    payloads whose magic is not recognized (callers fall back to the
    deterministic stub) — full pixel/sample DECODE still needs
    PIL/soundfile; headers cover the metadata contract."""
    import struct

    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 26:
        w, h = struct.unpack_from(">II", data, 16)
        color_type = data[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
        return {"width": w, "height": h, "channels": channels,
                "duration_ms": 0}
    if data[:2] == b"\xff\xd8":  # JPEG: walk the marker stream to a SOF
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack_from(">HH", data, i + 5)
                return {"width": w, "height": h,
                        "channels": data[i + 9], "duration_ms": 0}
            seg_len = struct.unpack_from(">H", data, i + 2)[0]
            i += 2 + seg_len
        return None
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack_from("<HH", data, 6)
        return {"width": w, "height": h, "channels": 3, "duration_ms": 0}
    if data[:2] == b"BM" and len(data) >= 30:
        w, h = struct.unpack_from("<ii", data, 18)
        bpp = struct.unpack_from("<H", data, 28)[0]
        return {"width": w, "height": abs(h),
                "channels": max(bpp // 8, 1), "duration_ms": 0}
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        i, channels, byte_rate, data_size = 12, 0, 0, 0
        while i + 8 <= len(data):
            cid = data[i:i + 4]
            size = struct.unpack_from("<I", data, i + 4)[0]
            if cid == b"fmt " and i + 16 <= len(data):
                channels = struct.unpack_from("<H", data, i + 10)[0]
                byte_rate = struct.unpack_from("<I", data, i + 16)[0]
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size % 2)
        if channels:
            dur = (int(data_size * 1000 / byte_rate) if byte_rate else 0)
            return {"width": 0, "height": 0, "channels": channels,
                    "duration_ms": dur}
    return None


def available_codecs() -> dict[str, str]:
    """Which decoder each media type resolves to under codec='auto' —
    the `format_available`-style gate: real libs when importable, the
    header parser for recognized containers otherwise, the deterministic
    stub as last resort (video is always the stub; no ffmpeg binding is
    assumed anywhere)."""
    import importlib.util

    return {
        "image": ("pil" if importlib.util.find_spec("PIL")
                  else "headers"),
        "audio": ("soundfile" if importlib.util.find_spec("soundfile")
                  else "headers"),
        "video": "fake",
    }


def _resolve_decoder(codec: str):
    if codec == "fake":
        return _fake_decode
    if codec == "headers":
        return lambda data, mt: (_header_decode(data, mt)
                                 or _fake_decode(data, mt))
    if codec != "auto":
        raise ValueError(
            f"codec must be 'auto'|'headers'|'fake', got {codec!r}")
    chosen = available_codecs()
    real = {"pil": _pil_decode, "soundfile": _soundfile_decode}

    def decode(data: bytes, media_type: str) -> dict:
        which = chosen.get(media_type, "fake")
        if which == "headers":
            parsed = _header_decode(data, media_type)
            if parsed is not None:
                return parsed
            return _fake_decode(data, media_type)
        fn = real.get(which, _fake_decode)
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
