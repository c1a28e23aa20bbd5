"""OpenAI-compatible ai_embed provider against a real local HTTP server
(same pattern as test_es_http): Bearer auth from the environment, batch
POST to /v1/embeddings, index-ordered response, `openai:` model-string
resolution (reference provider_openai.cpp + embedding.cpp:193-201)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from serenedb_spark.functions.embedding import (
    _resolve_provider, make_openai_provider,
)


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802 — http.server API
        srv = self.server
        srv.last_auth = self.headers.get("Authorization")
        srv.last_path = self.path
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        srv.last_model = body["model"]
        # deterministic per-text embedding, returned deliberately out of
        # order to prove the client re-sorts by index
        data = [
            {"index": i, "embedding": [float(len(t)), float(i)]}
            for i, t in enumerate(body["input"])
        ]
        out = json.dumps({"data": list(reversed(data))}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_openai_provider_batch(server, monkeypatch):
    monkeypatch.setenv("SERENE_EMBED_API_KEY", "sk-test-123")
    base = f"http://127.0.0.1:{server.server_port}"
    fn = make_openai_provider(base, "text-embedding-tiny")
    got = fn(["abc", "defgh", ""])
    assert got == [[3.0, 0.0], [5.0, 1.0], [0.0, 2.0]]
    assert server.last_auth == "Bearer sk-test-123"
    assert server.last_path == "/v1/embeddings"
    assert server.last_model == "text-embedding-tiny"


def test_openai_model_string_resolution(server, monkeypatch):
    monkeypatch.setenv("SERENE_EMBED_API_KEY", "sk-test-456")
    base = f"http://127.0.0.1:{server.server_port}"
    fn = _resolve_provider(f"openai:tiny@{base}")
    assert fn(["xy"]) == [[2.0, 0.0]]


def test_openai_base_url_from_env(server, monkeypatch):
    monkeypatch.setenv("SERENE_EMBED_BASE_URL",
                       f"http://127.0.0.1:{server.server_port}")
    fn = _resolve_provider("openai:tiny2")
    assert fn(["q"]) == [[1.0, 0.0]]


def test_openai_requires_base_url(monkeypatch):
    monkeypatch.delenv("SERENE_EMBED_BASE_URL", raising=False)
    with pytest.raises(ValueError, match="base url"):
        _resolve_provider("openai:no-base-anywhere")


def test_unknown_provider_raises():
    with pytest.raises(KeyError):
        _resolve_provider("definitely-not-registered")


def test_embed_table_via_openai(server, spark, monkeypatch):
    """End-to-end through the pandas UDF: the provider runs on executors
    (local mode shares the env), one HTTP batch per Arrow batch."""
    from serenedb_spark.functions.embedding import embed_table

    monkeypatch.setenv("SERENE_EMBED_API_KEY", "sk-worker")
    base = f"http://127.0.0.1:{server.server_port}"
    df = spark.createDataFrame(
        [(1, "aa"), (2, "bbbb")], "id long, text string"
    )
    rows = {r.id: r.embedding
            for r in embed_table(df, model=f"openai:tiny@{base}").collect()}
    assert rows[1][0] == 2.0 and rows[2][0] == 4.0
