"""MCP server: JSON-RPC 2.0 tool surface for AI assistants.

Behavioral port of reference ``mcp_server.py:34-850``: a tool registry
exposed over HTTP POST (JSON-RPC) plus SSE event stream, with optional
API-key auth.  Mounted under ``/mcp`` on the main server.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
from typing import Any, Callable

from .httpd import HttpError, Request, Response, Router

logger = logging.getLogger(__name__)

PROTOCOL_VERSION = "2024-11-05"


class McpToolRegistry:
    def __init__(self, state):
        self.state = state
        self.tools: dict[str, dict] = {}
        self._handlers: dict[str, Callable] = {}
        self._register_builtin()

    def tool(self, name: str, description: str, input_schema: dict | None = None):
        def deco(fn):
            self.tools[name] = {
                "name": name,
                "description": description,
                "inputSchema": input_schema
                or {"type": "object", "properties": {}, "required": []},
            }
            self._handlers[name] = fn
            return fn

        return deco

    async def call(self, name: str, arguments: dict) -> Any:
        fn = self._handlers.get(name)
        if fn is None:
            raise HttpError(404, f"unknown tool {name}")
        result = fn(self.state, arguments or {})
        if asyncio.iscoroutine(result):
            result = await result
        return result

    def _register_builtin(self) -> None:
        reg = self

        @reg.tool("list_devices", "List available SDR devices")
        def list_devices(state, args):
            return [
                {"id": d.id, "driver": d.driver, "label": d.label}
                for d in state.captures.list_devices()
            ]

        @reg.tool("list_captures", "List captures with status and channels")
        def list_captures(state, args):
            return [c.status() for c in state.captures.captures.values()]

        @reg.tool(
            "create_capture",
            "Create a capture (centerHz, sampleRate) and optionally start it",
            {
                "type": "object",
                "properties": {
                    "centerHz": {"type": "number"},
                    "sampleRate": {"type": "integer"},
                    "start": {"type": "boolean"},
                },
                "required": ["centerHz"],
            },
        )
        def create_capture(state, args):
            from wavecap_tpu.capture import CaptureConfig

            cap = state.captures.create_capture(
                config=CaptureConfig(
                    center_hz=float(args["centerHz"]),
                    sample_rate=int(args.get("sampleRate", 2_400_000)),
                )
            )
            if args.get("start"):
                cap.start()
            return cap.status()

        @reg.tool(
            "create_channel",
            "Add a demod channel to a capture (captureId, mode, frequencyHz)",
            {
                "type": "object",
                "properties": {
                    "captureId": {"type": "string"},
                    "mode": {"type": "string"},
                    "frequencyHz": {"type": "number"},
                },
                "required": ["captureId", "frequencyHz"],
            },
        )
        def create_channel(state, args):
            from wavecap_tpu.capture import ChannelSpec

            cap = state.get_capture(args["captureId"])
            ch = cap.create_channel(
                ChannelSpec(
                    id=state.new_channel_id(),
                    mode=args.get("mode", "nbfm"),
                    frequency_hz=float(args["frequencyHz"]),
                )
            )
            return {"id": ch.id, "mode": ch.spec.mode}

        @reg.tool(
            "tune_channel",
            "Retune an existing channel (channelId, frequencyHz)",
            {
                "type": "object",
                "properties": {
                    "channelId": {"type": "string"},
                    "frequencyHz": {"type": "number"},
                },
                "required": ["channelId", "frequencyHz"],
            },
        )
        def tune_channel(state, args):
            cap, ch = state.find_channel(args["channelId"])
            cap.update_channel(ch.id, frequency_hz=float(args["frequencyHz"]))
            return {"id": ch.id, "frequencyHz": ch.spec.frequency_hz}

        @reg.tool("list_trunking_systems", "List P25 trunking systems and status")
        def list_trunking(state, args):
            return state.trunking.status()

        @reg.tool("system_metrics", "Host and capture performance metrics")
        def metrics(state, args):
            from wavecap_tpu.utils.observability import system_metrics

            return system_metrics()


def mount_mcp(router: Router, state, api_key: str | None = None) -> McpToolRegistry:
    registry = McpToolRegistry(state)

    def _check_auth(req: Request) -> None:
        if api_key and req.headers.get("x-api-key") != api_key:
            raise HttpError(401)

    @router.post("/mcp")
    async def mcp_rpc(req: Request) -> Response:
        _check_auth(req)
        msg = req.json()
        rid = msg.get("id")
        method = msg.get("method", "")
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": PROTOCOL_VERSION,
                    "serverInfo": {"name": "wavecap-tpu", "version": "0.1.0"},
                    "capabilities": {"tools": {}},
                }
            elif method == "tools/list":
                result = {"tools": list(registry.tools.values())}
            elif method == "tools/call":
                params = msg.get("params") or {}
                out = await registry.call(
                    params.get("name", ""), params.get("arguments") or {}
                )
                result = {
                    "content": [{"type": "text", "text": json.dumps(out)}],
                    "isError": False,
                }
            elif method in ("notifications/initialized", "ping"):
                result = {}
            else:
                return Response.json(
                    {
                        "jsonrpc": "2.0",
                        "id": rid,
                        "error": {"code": -32601, "message": f"unknown method {method}"},
                    }
                )
        except HttpError as e:
            return Response.json(
                {
                    "jsonrpc": "2.0",
                    "id": rid,
                    "error": {"code": -32000, "message": e.message},
                }
            )
        except Exception as e:
            logger.exception("mcp tool error")
            return Response.json(
                {
                    "jsonrpc": "2.0",
                    "id": rid,
                    "error": {"code": -32000, "message": str(e)},
                }
            )
        return Response.json({"jsonrpc": "2.0", "id": rid, "result": result})

    return registry
