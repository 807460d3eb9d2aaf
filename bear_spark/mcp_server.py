"""MCP serving surface — the reference's expert-finder tool.

The reference wraps ``SearchEngine.search_author`` in a FastMCP server
exposing one tool, ``search_experts`` (reference: bear/mcp/main.py:33-48
tool + lifespan, :51-52 streamable-http transport). The sandbox has no
MCP SDK, so this is the protocol's JSON-RPC 2.0 core implemented
directly — ``initialize`` / ``tools/list`` / ``tools/call`` with the
standard tool-result content shape — served over line-delimited stdio
(the transport every MCP client supports). The handler itself is
transport-free: ``handle(request) -> response`` dicts, so an HTTP
framing can wrap it the same way ``BearApi`` wraps the search engine.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

PROTOCOL_VERSION = "2024-11-05"

_TOOLS = [
    {
        "name": "search_experts",
        "description": (
            "This tool helps you find domain experts for a specific "
            "field or research topic."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": {"type": "string", "description": "Search query."}
            },
            "required": ["query"],
        },
    }
]


class MCPServer:
    """``search_experts_fn(query) -> list[dict]`` is the engine hook —
    in production ``lambda q: api_shaped(search_author(...))`` (see
    tests for the full wiring)."""

    def __init__(self, search_experts_fn: Callable[[str], list[dict]]):
        self.search_experts = search_experts_fn

    # -- JSON-RPC dispatch --------------------------------------------
    def handle(self, req: dict[str, Any]) -> dict[str, Any] | None:
        """One request in, one response out (None for notifications)."""
        rid = req.get("id")
        method = req.get("method", "")
        if method.startswith("notifications/"):
            return None
        try:
            result = self._dispatch(method, req.get("params") or {})
            return {"jsonrpc": "2.0", "id": rid, "result": result}
        except Exception as e:
            return {
                "jsonrpc": "2.0",
                "id": rid,
                "error": {"code": -32603, "message": str(e)},
            }

    def _dispatch(self, method: str, params: dict) -> dict:
        if method == "initialize":
            return {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "bear-spark MCP", "version": "1.0"},
                "instructions": _TOOLS[0]["description"],
            }
        if method == "tools/list":
            return {"tools": _TOOLS}
        if method == "tools/call":
            if params.get("name") != "search_experts":
                raise ValueError(f"unknown tool: {params.get('name')!r}")
            query = (params.get("arguments") or {}).get("query")
            if not query:
                raise ValueError("search_experts requires a 'query' argument")
            results = self.search_experts(query)
            if not results:  # reference: bear/mcp/main.py:43-45
                results = [{"error": "No authors found."}]
            return {
                "content": [{"type": "text", "text": json.dumps(results)}],
                "isError": False,
            }
        raise ValueError(f"unknown method: {method!r}")

    # -- stdio transport ----------------------------------------------
    def serve(self, rfile, wfile) -> None:
        """Line-delimited JSON-RPC loop (MCP stdio framing)."""
        for line in rfile:
            line = line.strip()
            if not line:
                continue
            resp = self.handle(json.loads(line))
            if resp is not None:
                wfile.write(json.dumps(resp) + "\n")
                wfile.flush()
