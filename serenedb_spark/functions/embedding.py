"""ai_embed — server-side embedding calls, batched.

Reference: ``ai_embed(text, model, secret)`` posts batches to any
OpenAI-compatible endpoint with vaulted secrets
(server/connector/functions/embedding/embedding.cpp:193-201,
provider_openai.cpp; demo5/demo.sql:26-31).

Spark-first: an Arrow-batched pandas UDF per provider — one HTTP call per
batch, credentials via Spark conf (``spark.serene.embed.secret``), never
in the plan. This container has no network, so the default provider is a
DETERMINISTIC STUB (md5-chain features, same formula as
operators/multimodal.extract_features); `register_provider` swaps in a
real client without touching call sites.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DIM = 16

#: provider name -> batch fn: list[str] -> list[list[float]]
_PROVIDERS: dict[str, Callable[[list[str]], list[list[float]]]] = {}


def register_provider(name: str, fn: Callable[[list[str]], list[list[float]]]) -> None:
    _PROVIDERS[name] = fn


def _stub_embed(texts: list[str]) -> list[list[float]]:
    """Deterministic fake: DIM floats in [0,1) from a chained md5 — the
    no-network stand-in for an embedding endpoint."""
    out = []
    for t in texts:
        vals, h = [], hashlib.md5((t or "").encode()).hexdigest()
        while len(vals) < DIM:
            vals.extend(int(h[i:i + 8], 16) % 10_000 / 10_000.0
                        for i in range(0, 32, 8))
            h = hashlib.md5(h.encode()).hexdigest()
        out.append(vals[:DIM])
    return out


register_provider("stub", _stub_embed)


def make_openai_provider(
    base_url: str,
    model: str,
    api_key: str | None = None,
    api_key_env: str = "SERENE_EMBED_API_KEY",
    timeout: float = 30.0,
) -> Callable[[list[str]], list[list[float]]]:
    """Batch embedding client for any OpenAI-compatible endpoint
    (reference provider_openai.cpp): POST {base_url}/v1/embeddings with
    {"model", "input": [texts]}, Bearer auth. The secret is read from the
    environment AT CALL TIME on the executor (the vaulted-secret analogue)
    — never captured into the serialized plan."""

    def fn(texts: list[str]) -> list[list[float]]:
        import json
        import os
        import urllib.request

        key = api_key or os.environ.get(api_key_env, "")
        req = urllib.request.Request(
            f"{base_url.rstrip('/')}/v1/embeddings",
            data=json.dumps({"model": model, "input": texts}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {key}"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = json.load(resp)
        data = sorted(payload["data"], key=lambda d: d["index"])
        if len(data) != len(texts):
            raise ValueError(
                f"provider returned {len(data)} embeddings for "
                f"{len(texts)} inputs"
            )
        return [[float(x) for x in d["embedding"]] for d in data]

    return fn


def _resolve_provider(model: str) -> Callable[[list[str]], list[list[float]]]:
    """Registry lookup; `openai:<model>@<base_url>` (or `openai:<model>`
    with SERENE_EMBED_BASE_URL in the env) builds an OpenAI-compatible
    client on the fly."""
    if model in _PROVIDERS:
        return _PROVIDERS[model]
    if model.startswith("openai:"):
        import os

        spec = model[len("openai:"):]
        if "@" in spec:
            mname, base = spec.split("@", 1)
        else:
            mname, base = spec, os.environ.get("SERENE_EMBED_BASE_URL", "")
        if not base:
            raise ValueError(
                "openai: provider needs a base url — "
                "openai:<model>@<base_url> or SERENE_EMBED_BASE_URL"
            )
        fn = make_openai_provider(base, mname)
        _PROVIDERS[model] = fn
        return fn
    raise KeyError(model)


def ai_embed(text: Column, model: str = "stub") -> Column:
    """Column function: text → array<double> embedding via the named
    provider, one provider call per Arrow batch."""
    fn = _resolve_provider(model)

    @pandas_udf("array<double>")
    def _embed(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in batch_iter:
            yield pd.Series(fn(batch.tolist()))

    return _embed(text)


def embed_table(df: DataFrame, text_col: str = "text", model: str = "stub",
                out_col: str = "embedding") -> DataFrame:
    return df.withColumn(out_col, ai_embed(F.col(text_col), model))
