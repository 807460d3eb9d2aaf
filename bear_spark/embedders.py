"""Embedding providers — the reference's ``Embedder`` protocol shape.

The reference dispatches on a provider name to OpenAI- or TEI-backed
embedders, each exposing ``embed(text, text_type)``, ``info`` and
``from_config`` (reference: bear/embedding.py:27-54 protocol,
:121-193 TEI, :196-209 get_embedder dispatch), with doc/query prefixes
applied before the provider call (:55-60).

The engine keeps that exact surface so a provider swap is a config
change, and ships two providers:

- ``deterministic`` — the hermetic default: md5-derived components,
  bit-identical to ``operators.embedding.embed_text_expr`` (so vectors
  produced for a corpus via Spark and for a query via this driver-side
  class live in the same space, and the DuckDB oracle can reproduce
  both).
- ``http`` — the remote-provider slot (OpenAI-compatible
  ``/v1/embeddings`` shape). The sandbox has no HTTP client or network,
  so construction raises with instructions; the class exists to
  demonstrate the dispatch point and keep the config surface honest.
"""

from __future__ import annotations

import hashlib
import logging
from typing import Any, Protocol

#: text types, reference: bear/embedding.py:12-18
TEXT_DOC = "doc"
TEXT_QUERY = "query"
TEXT_RAW = "raw"


def append_prefix(text: str | list[str], prefix: str) -> list[str]:
    """Prefix each text (reference: bear/embedding.py:55-60)."""
    if isinstance(text, str):
        return [f"{prefix} {text}"]
    return [f"{prefix} {t}" for t in text]


class Embedder(Protocol):
    """Protocol mirror of reference bear/embedding.py:27-54."""

    def embed(self, text: str | list[str], text_type: str) -> list[list[float]]: ...

    @property
    def info(self) -> dict[str, Any]: ...


class DeterministicEmbedder:
    """Hermetic md5 embedder; values match ``embed_text_expr``:
    component i of text t is ``int(md5(f"{t}#{i}")[:4], 16) / 65535``,
    rounded to 6 places."""

    def __init__(self, dim: int = 8, doc_prefix: str = "", query_prefix: str = ""):
        self.dim = int(dim)
        self.doc_prefix = doc_prefix
        self.query_prefix = query_prefix

    @classmethod
    def from_config(cls, cfg: dict[str, Any]) -> "DeterministicEmbedder":
        return cls(
            dim=cfg.get("dim", 8),
            doc_prefix=cfg.get("doc_prefix", ""),
            query_prefix=cfg.get("query_prefix", ""),
        )

    @property
    def info(self) -> dict[str, Any]:
        return {
            "provider": "deterministic",
            "model": "md5-slice",
            "dimensions": self.dim,
            "max_tokens": 0,  # no truncation
            "doc_prefix": self.doc_prefix,
            "query_prefix": self.query_prefix,
        }

    def embed(self, text: str | list[str], text_type: str = TEXT_RAW) -> list[list[float]]:
        if text_type == TEXT_DOC and self.doc_prefix:
            texts = append_prefix(text, self.doc_prefix)
        elif text_type == TEXT_QUERY and self.query_prefix:
            texts = append_prefix(text, self.query_prefix)
        else:
            texts = [text] if isinstance(text, str) else list(text)
        return [
            [
                round(int(hashlib.md5(f"{t}#{i}".encode()).hexdigest()[:4], 16) / 65535.0, 6)
                for i in range(self.dim)
            ]
            for t in texts
        ]


#: transport(texts) -> one vector per text, in order. The injection
#: point mirrors ``sources.live``'s injected page fetcher: HTTP client,
#: mock, or replay file all look the same to the embedder.
EmbedTransport = Any  # Callable[[list[str]], list[list[float]]]


class HttpEmbedder:
    """Remote embedding endpoint in the reference's OpenAI/TEI slot
    (reference: bear/embedding.py:121-193 — model + prefixes + batched
    ``embeddings.create`` calls). The wire client is an injected
    ``transport`` callable, so the provider path is fully exercisable
    without a network: in production wrap your HTTP POST to
    ``/v1/embeddings`` (or an OpenAI SDK call) in the callable; in this
    sandbox construction without a transport raises with instructions.

    Prefix semantics match the reference exactly (bear/embedding.py:
    184-190): doc/query prefixes are applied BEFORE the provider call,
    raw passes through. Batching matches ``embed_resources``'s
    batch-of-256 slicing (bear/embedding.py:218-232), moved inside the
    embedder so every caller gets it.
    """

    def __init__(
        self,
        model: str = "",
        dim: int = 0,
        doc_prefix: str = "",
        query_prefix: str = "",
        batch_size: int = 256,
        transport: EmbedTransport | None = None,
        **_ignored: Any,
    ):
        if transport is None:
            raise NotImplementedError(
                "HttpEmbedder needs a transport callable "
                "(texts -> vectors); this environment has no network — "
                "pass transport=<your HTTP client wrapper> or use "
                "provider='deterministic'"
            )
        self.model = model
        self.dim = int(dim)
        self.doc_prefix = doc_prefix
        self.query_prefix = query_prefix
        self.batch_size = max(1, int(batch_size))
        self.transport = transport

    @classmethod
    def from_config(cls, cfg: dict[str, Any]) -> "HttpEmbedder":
        return cls(**cfg)

    @property
    def info(self) -> dict[str, Any]:
        return {
            "provider": "http",
            "model": self.model,
            "dimensions": self.dim,
            "max_tokens": 0,
            "doc_prefix": self.doc_prefix,
            "query_prefix": self.query_prefix,
        }

    def embed(self, text: str | list[str], text_type: str = TEXT_RAW) -> list[list[float]]:
        if text_type == TEXT_DOC and self.doc_prefix:
            texts = append_prefix(text, self.doc_prefix)
        elif text_type == TEXT_QUERY and self.query_prefix:
            texts = append_prefix(text, self.query_prefix)
        else:
            texts = [text] if isinstance(text, str) else list(text)
        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            vecs = self.transport(texts[i : i + self.batch_size])
            out.extend([list(map(float, v)) for v in vecs])
        if len(out) != len(texts):
            raise ValueError(
                f"transport returned {len(out)} vectors for {len(texts)} texts"
            )
        return out


def embed_query(query: str, embedder: Embedder) -> list[float]:
    """Query-embed with degrade-to-empty on provider failure (reference:
    bear/embedding.py:207-213 — search must not 500 because the
    embedding sidecar hiccuped; an empty vector surfaces as an empty
    result set the caller can distinguish)."""
    try:
        return embedder.embed(query, TEXT_QUERY)[0]
    except Exception:
        # log before degrading (reference: bear/embedding.py:211-213) —
        # a permanently misconfigured provider must leave a diagnostic
        # trail, not just a stream of empty result sets
        logging.getLogger(__name__).exception(
            "embed_query failed for provider %s; returning empty vector",
            type(embedder).__name__,
        )
        return []


_PROVIDERS: dict[str, Any] = {
    "deterministic": DeterministicEmbedder,
    "http": HttpEmbedder,
}


def get_embedder(cfg: dict[str, Any] | None = None) -> Embedder:
    """Provider dispatch (reference: bear/embedding.py:196-209)."""
    cfg = dict(cfg or {})
    provider = cfg.pop("provider", "deterministic")
    cls = _PROVIDERS.get(provider)
    if cls is None:
        raise ValueError(f"unknown embedding provider: {provider!r}")
    return cls.from_config(cfg)
