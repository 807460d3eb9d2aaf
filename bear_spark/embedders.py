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


class HttpEmbedder:
    """Remote OpenAI-compatible embedding endpoint (the reference's
    OpenAI/TEI slot). Not constructible in this sandbox (no HTTP
    client / network); swap in a real transport by implementing
    ``_post(path, payload) -> dict`` and this class is complete."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "HttpEmbedder needs a network transport unavailable in this "
            "environment; use provider='deterministic', or subclass and "
            "implement _post() against your embedding server"
        )

    @classmethod
    def from_config(cls, cfg: dict[str, Any]) -> "HttpEmbedder":
        return cls(**cfg)


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
