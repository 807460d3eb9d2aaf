"""Serving surfaces: WSGI API routes, MCP tool server, embedder dispatch
(reference parity: bear/api/main.py, bear/mcp/main.py, bear/embedding.py)."""

from __future__ import annotations

import io
import json

import pytest
from pyspark.sql import functions as F

from bear_spark.api import BearApi
from bear_spark.embedders import DeterministicEmbedder, get_embedder
from bear_spark.mcp_server import MCPServer
from bear_spark.operators.embedding import embed_text_pandas
from bear_spark.search import SearchEngine

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    """documents + deterministic embeddings + synthetic author_ids +
    an inverted_index column (word -> positions) built from the text."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    docs = embed_text_pandas(docs, text_col="text", dim=8)
    docs = docs.withColumn(
        "author_ids",
        F.array(
            F.format_string("auth_%d", F.col("doc_id") % 7),
            F.format_string("auth_%d", F.col("doc_id") % 11 + 7),
        ),
    )
    inv = (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .groupBy("doc_id", "word")
        .agg(F.collect_list("pos").alias("poss"))
        .groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("word", "poss"))).alias("inverted_index"))
    )
    return docs.join(inv, "doc_id").persist()


@pytest.fixture(scope="module")
def app(corpus):
    return BearApi(
        SearchEngine(corpus, id_col="doc_id", vec_col="embedding"),
        DeterministicEmbedder(dim=8),
        group_array_col="author_ids",
        abstract_index_col="inverted_index",
    )


def call(app, path, query="", method="GET", body=None):
    payload = json.dumps(body).encode() if body is not None else b""
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "CONTENT_LENGTH": str(len(payload)),
        "wsgi.input": io.BytesIO(payload),
    }
    out = {}

    def start_response(status, headers):
        out["status"] = int(status.split()[0])

    chunks = app(environ, start_response)
    return out["status"], json.loads(b"".join(chunks))


def test_root_instructions(app):
    status, body = call(app, "/")
    assert status == 200 and "search_resource" in body["Endpoints"]


def test_search_resource_shapes_and_reconstructs(app, corpus):
    status, rows = call(app, "/search_resource", "query=what+is+deduplication&top_k=3")
    assert status == 200 and len(rows) == 3
    ds = [r["distance"] for r in rows]
    assert ds == sorted(ds, reverse=True)
    texts = {r["doc_id"]: r["text"] for r in corpus.select("doc_id", "text").collect()}
    for r in rows:
        assert "inverted_index" not in r, "raw index must be dropped from the payload"
        assert r["abstract"] == texts[r["doc_id"]], "inverted-index round trip"
        assert "embedding" not in r, "vector column pruned like output_fields"


def test_search_resource_filter_and_404(app):
    status, rows = call(
        app, "/search_resource", "query=hello&top_k=5&filter=lang%3D%27en%27"
    )
    assert status == 200 and all(r["lang"] == "en" for r in rows)
    status, body = call(app, "/search_resource", "query=hello&min_distance=0.999999")
    assert status == 404 and body["detail"] == "No results found."
    status, body = call(app, "/search_resource", "top_k=3")
    assert status == 400, "missing query must 400"


def test_search_author_shape(app):
    status, rows = call(app, "/search_author", "query=expert+search&top_k=4")
    assert status == 200 and 0 < len(rows) <= 4
    assert set(rows[0]) == {"author_id", "scores"}
    totals = [r["scores"]["total_score"] for r in rows]
    assert totals == sorted(totals, reverse=True)
    assert all(r["author_id"].startswith("auth_") for r in rows)


def test_embed_routes_match_engine_vectors(app, corpus):
    status, info = call(app, "/embed/info")
    assert status == 200 and info["provider"] == "deterministic" and info["dimensions"] == 8
    status, body = call(app, "/embed", method="POST", body={"texts": ["hola"], "type": "raw"})
    assert status == 200
    # driver-side embedder and the Spark mapInPandas kernel agree
    row = corpus.limit(1).select("text", "embedding").first()
    assert DeterministicEmbedder(dim=8).embed(row["text"], "raw")[0] == list(row["embedding"])
    status, body = call(app, "/embed", method="POST", body={"texts": []})
    assert status == 400


def test_unknown_route_404(app):
    status, _ = call(app, "/nope")
    assert status == 404


def test_embedder_dispatch():
    e = get_embedder({"provider": "deterministic", "dim": 4, "query_prefix": "q:"})
    [v_pref] = e.embed("x", "query")
    assert v_pref == e.embed("q: x", "raw")[0] and len(v_pref) == 4
    with pytest.raises(ValueError, match="unknown embedding provider"):
        get_embedder({"provider": "milvus"})
    with pytest.raises(NotImplementedError, match="transport"):
        get_embedder({"provider": "http", "model": "m"})


def test_http_embedder_with_injected_transport():
    """The remote-provider path end-to-end against a mock transport:
    prefix application, batch slicing, order preservation, mismatch
    error, and embed_query's degrade-to-empty (reference behavior:
    bear/embedding.py:121-193, 207-213)."""
    from bear_spark.embedders import embed_query

    calls: list[list[str]] = []

    def transport(texts):
        calls.append(list(texts))
        return [[float(len(t)), float(i)] for i, t in enumerate(texts)]

    e = get_embedder(
        {
            "provider": "http",
            "model": "m",
            "dim": 2,
            "doc_prefix": "passage:",
            "query_prefix": "query:",
            "batch_size": 3,
            "transport": transport,
        }
    )
    # prefix semantics: doc/query prefixed before the wire call, raw passthrough
    e.embed(["a", "bb"], "doc")
    assert calls[-1] == ["passage: a", "passage: bb"]
    e.embed("zz", "query")
    assert calls[-1] == ["query: zz"]
    e.embed("zz", "raw")
    assert calls[-1] == ["zz"]
    # batching: 7 texts at batch_size 3 → three wire calls, order kept
    calls.clear()
    vecs = e.embed([f"t{i}" for i in range(7)], "raw")
    assert [len(c) for c in calls] == [3, 3, 1]
    assert len(vecs) == 7 and vecs[0] == [2.0, 0.0]
    assert e.info["provider"] == "http" and e.info["model"] == "m"
    # a transport returning the wrong cardinality is an error, not silence
    bad = get_embedder({"provider": "http", "transport": lambda ts: []})
    with pytest.raises(ValueError, match="vectors"):
        bad.embed(["a"], "raw")

    # embed_query degrades to [] when the provider fails (search must
    # not 500 because the embedding sidecar hiccuped)
    def boom(ts):
        raise RuntimeError("sidecar down")

    assert embed_query("q", get_embedder({"provider": "http", "transport": boom})) == []
    assert embed_query("q", get_embedder({"provider": "deterministic", "dim": 3})) != []


def test_mcp_tool_roundtrip(app):
    def search_experts(query):
        status, rows = call(app, "/search_author", f"query={query}&top_k=3")
        return rows if status == 200 else []

    srv = MCPServer(search_experts)
    init = srv.handle({"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}})
    assert init["result"]["serverInfo"]["name"] == "bear-spark MCP"
    tools = srv.handle({"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
    assert [t["name"] for t in tools["result"]["tools"]] == ["search_experts"]

    # stdio transport: two requests in, two responses out, notification ignored
    rfile = io.StringIO(
        json.dumps({"jsonrpc": "2.0", "id": 3, "method": "tools/call",
                    "params": {"name": "search_experts",
                               "arguments": {"query": "spark experts"}}}) + "\n"
        + json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}) + "\n"
        + json.dumps({"jsonrpc": "2.0", "id": 4, "method": "tools/call",
                      "params": {"name": "search_experts", "arguments": {}}}) + "\n"
    )
    wfile = io.StringIO()
    srv.serve(rfile, wfile)
    responses = [json.loads(line) for line in wfile.getvalue().splitlines()]
    assert len(responses) == 2
    experts = json.loads(responses[0]["result"]["content"][0]["text"])
    assert experts and experts[0]["author_id"].startswith("auth_")
    assert "error" in responses[1], "missing query arg surfaces a JSON-RPC error"


def test_degraded_embedder_404s_not_500s(corpus):
    """A provider failure at query time degrades to an empty result set
    (reference: bear/embedding.py:207-213) — the API answers 404 'No
    results found.', never a 500 from the transport exception."""
    def boom(texts):
        raise ConnectionError("sidecar down")

    degraded = BearApi(
        SearchEngine(corpus, id_col="doc_id", vec_col="embedding"),
        get_embedder({"provider": "http", "transport": boom, "dim": 8}),
        group_array_col="author_ids",
    )
    status, body = call(degraded, "/search_resource", "query=hello&top_k=3")
    assert status == 404 and body["detail"] == "No results found."
    status, body = call(degraded, "/search_author", "query=hello&top_k=3")
    assert status == 404


def test_search_engine_empty_query_vec_is_empty_result(corpus):
    """Library-level contract behind the 404 above: an empty query
    vector returns an EMPTY frame with the normal result schema, not
    top_k rows ranked by null distance."""
    eng = SearchEngine(corpus, id_col="doc_id", vec_col="embedding")
    out = eng.search_resource([], top_k=3)
    assert out.count() == 0
    assert "distance" in out.columns and "embedding" not in out.columns
    # schema parity with the non-degraded path
    normal = eng.search_resource([0.1] * 8, top_k=3)
    assert [f.name for f in out.schema.fields] == [f.name for f in normal.schema.fields]
