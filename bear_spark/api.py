"""HTTP serving surface — the reference's REST API over the engine.

Route-for-route mirror of the reference's FastAPI app (reference:
bear/api/main.py:89-165 search routes, :199-225 embed routes, :36-47
root instructions), as a dependency-free WSGI application: the sandbox
has no FastAPI/uvicorn, and a JSON-over-WSGI callable runs under any
stdlib (``wsgiref.simple_server``) or production (gunicorn/uWSGI)
container unchanged.

Response shaping parity worth calling out: the reference rebuilds each
hit's abstract from its inverted index inside the route handler
(reference: bear/api/main.py:107-110 → bear/model.py:164-171
``_recover_abstract``). Here that inversion is a Catalyst expression
(``recover_text``) applied to the result DataFrame BEFORE collect — the
reconstruction runs distributed next to the data, not per-row in the
web tier.

The heavy lifting stays in ``SearchEngine`` (bear_spark/search.py) —
these handlers parse params, call the engine, and shape JSON, exactly
like the reference's thin routes.
"""

from __future__ import annotations

import json
from typing import Any
from urllib.parse import parse_qs

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bear_spark.embedders import TEXT_QUERY, Embedder, embed_query
from bear_spark.search import SearchEngine

_REASONS = {200: "OK", 400: "Bad Request", 404: "Not Found", 500: "Internal Server Error"}


class ApiError(Exception):
    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


def recover_text(index_col: Column | str, out_name: str = "abstract") -> Column:
    """Invert a ``map<word, array<position>>`` inverted index back into
    position-ordered text — ``_recover_abstract`` (reference:
    bear/model.py:164-171) as one codegen'd expression: explode the map
    entries into (pos, word) structs, array_sort (pos-major), join."""
    col = F.col(index_col) if isinstance(index_col, str) else index_col
    pw = F.flatten(
        F.transform(
            F.map_entries(col),
            lambda e: F.transform(
                e["value"], lambda p: F.struct(p.alias("pos"), e["key"].alias("word"))
            ),
        )
    )
    return F.array_join(
        F.transform(F.array_sort(pw), lambda s: s["word"]), " "
    ).alias(out_name)


def _rows(df: DataFrame) -> list[dict[str, Any]]:
    """Collect a (already-limited) result DataFrame as JSON-safe dicts."""
    return [json.loads(r) for r in df.toJSON().collect()]


class BearApi:
    """WSGI app: GET /, /search_resource, /search_author, /embed/info;
    POST /embed."""

    def __init__(
        self,
        engine: SearchEngine,
        embedder: Embedder,
        group_array_col: str = "author_ids",
        abstract_index_col: str | None = None,
    ):
        self.engine = engine
        self.embedder = embedder
        self.group_array_col = group_array_col
        self.abstract_index_col = abstract_index_col

    # -- handlers ------------------------------------------------------
    def _q_vec(self, params: dict) -> list[float]:
        query = params.get("query")
        if not query:
            raise ApiError(400, "missing required parameter: query")
        # degrade-to-empty on provider failure (reference:
        # bear/embedding.py:207-213): an empty vector flows into
        # SearchEngine, which returns an empty result set, which the
        # handlers surface as 404 — never a 500 because the embedding
        # sidecar hiccuped
        return embed_query(query, self.embedder)

    def _search_resource(self, params: dict) -> list[dict]:
        """reference: bear/api/main.py:89-138."""
        filt = params.get("filter")
        since_year = params.get("since_year")
        if since_year is not None:
            if "publication_year" not in self.engine.corpus.columns:
                raise ApiError(400, "corpus has no publication_year column")
            yr = F.col("publication_year") >= int(since_year)
            filt = yr if filt is None else (F.expr(filt) & yr)
        df = self.engine.search_resource(
            self._q_vec(params),
            top_k=int(params.get("top_k", 3)),
            filter_expr=filt,
            min_distance=(
                float(params["min_distance"]) if params.get("min_distance") else None
            ),
        )
        if self.abstract_index_col and self.abstract_index_col in df.columns:
            # response shaping: rebuild abstracts distributed, drop the
            # raw index from the payload (reference: api/main.py:107-110)
            df = df.withColumn("abstract", recover_text(self.abstract_index_col)).drop(
                self.abstract_index_col
            )
        rows = _rows(df)
        if not rows:
            raise ApiError(404, "No results found.")
        return rows

    def _search_author(self, params: dict) -> list[dict]:
        """reference: bear/api/main.py:141-165."""
        kwargs: dict[str, Any] = {}
        if params.get("formula"):
            kwargs["formula"] = params["formula"]
        df = self.engine.search_author(
            self._q_vec(params),
            group_array_col=self.group_array_col,
            min_distance=(
                float(params["min_distance"]) if params.get("min_distance") else None
            ),
            limit=int(params.get("top_k", 3)),
            **kwargs,
        )
        rows = _rows(df)
        if not rows:
            raise ApiError(404, "No results found.")
        return [
            {"author_id": r["_group"], "scores": {"total_score": r["total_score"]}}
            for r in rows
        ]

    def _embed(self, body: dict) -> dict:
        """reference: bear/api/main.py:199-225."""
        texts = body.get("texts")
        if not isinstance(texts, list) or not texts:
            raise ApiError(400, "body must carry a non-empty 'texts' list")
        return {"embeddings": self.embedder.embed(texts, body.get("type", TEXT_QUERY))}

    # -- WSGI plumbing -------------------------------------------------
    def _route(self, environ: dict) -> Any:
        path = environ.get("PATH_INFO", "/")
        method = environ.get("REQUEST_METHOD", "GET")
        params = {
            k: v[0] for k, v in parse_qs(environ.get("QUERY_STRING", "")).items()
        }
        if path == "/" and method == "GET":
            return {
                "Instruction": (
                    "Try /search_resource?query=your_query_here&top_k=3 "
                    "or /search_author?query=your_query_here&top_k=3"
                ),
                "Endpoints": {
                    "search_resource": "GET /search_resource",
                    "search_author": "GET /search_author",
                    "embed": "POST /embed",
                    "embed_info": "GET /embed/info",
                },
            }
        if path == "/search_resource" and method == "GET":
            return self._search_resource(params)
        if path == "/search_author" and method == "GET":
            return self._search_author(params)
        if path == "/embed/info" and method == "GET":
            return self.embedder.info
        if path == "/embed" and method == "POST":
            try:
                size = int(environ.get("CONTENT_LENGTH") or 0)
                body = json.loads(environ["wsgi.input"].read(size) or b"{}")
            except (ValueError, KeyError) as e:
                raise ApiError(400, f"invalid JSON body: {e}") from e
            return self._embed(body)
        raise ApiError(404, f"no route for {method} {path}")

    def __call__(self, environ: dict, start_response) -> list[bytes]:
        try:
            status, payload = 200, self._route(environ)
        except ApiError as e:
            status, payload = e.status, {"detail": e.detail}
        except Exception as e:  # reference: blanket 500 at api/main.py:136-138
            status, payload = 500, {"detail": f"Search failed: {e}"}
        body = json.dumps(payload).encode("utf-8")
        start_response(
            f"{status} {_REASONS.get(status, 'Error')}",
            [("Content-Type", "application/json"), ("Content-Length", str(len(body)))],
        )
        return [body]


def serve(app: BearApi, host: str = "127.0.0.1", port: int = 8000):
    """Run under the stdlib WSGI container (reference: uvicorn.run at
    bear/api/main.py:228-229)."""
    from wsgiref.simple_server import make_server

    with make_server(host, port, app) as httpd:
        httpd.serve_forever()
