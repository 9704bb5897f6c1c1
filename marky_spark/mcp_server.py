"""MCP stdio server — reference parity: marky-mcp/main.go:14-64.

``python -m marky_spark.mcp_server`` serves the Model Context Protocol over
stdio (JSON-RPC 2.0, one message per line) exposing the reference's single
tool ``convert_to_markdown(input, output?)``: converts a local document to
Markdown via the same kernels as the Spark pipeline, optionally writes the
result to ``output``, and returns the Markdown as a text content block
(marky-mcp/main.go:43-64). Stdlib-only — no MCP SDK dependency.
"""

from __future__ import annotations

import json
import sys

SERVER_INFO = {"name": "Marky", "version": "1.0.0"}  # marky-mcp/main.go:16-20

TOOL = {
    "name": "convert_to_markdown",  # marky-mcp/main.go:23-32
    "description": "Convert a document (CSV, DOCX, EPUB, XLSX, HTML, ipynb, "
                   "PDF, PPTX) to Markdown",
    "inputSchema": {
        "type": "object",
        "properties": {
            "input": {"type": "string",
                      "description": "path of the file to convert"},
            "output": {"type": "string",
                       "description": "optional path to save the Markdown"},
        },
        "required": ["input"],
    },
}


def _tool_result(text: str, is_error: bool = False) -> dict:
    return {"content": [{"type": "text", "text": text}], "isError": is_error}


def handle_tool_call(arguments: dict) -> dict:
    """convert_to_markdown handler (marky-mcp/main.go:43-64)."""
    from .cli import _write_file_0644, convert_file
    from .kernels import ConvertError

    inp = arguments.get("input")
    if not isinstance(inp, str) or not inp:
        # RequireString("input") — marky-mcp/main.go:44
        return _tool_result("input must be a non-empty string", is_error=True)
    import os

    if not os.path.exists(inp):
        return _tool_result(f"input file {inp!r} does not exist",
                            is_error=True)
    try:
        markdown = convert_file(inp)
    except (ConvertError, OSError) as exc:
        return _tool_result(f"conversion failed: {exc}", is_error=True)
    # GetString("output", "console") — marky-mcp/main.go:50: absent OR
    # 'console' means no file write; the markdown text is returned either way
    out = arguments.get("output")
    if isinstance(out, str) and out and out != "console":
        try:
            _write_file_0644(out, markdown)  # os.WriteFile(..., 0o644)
        except OSError as exc:
            return _tool_result(f"failed to write output: {exc}",
                                is_error=True)
    return _tool_result(markdown)


def handle_message(msg: dict) -> dict | None:
    """One JSON-RPC request → response (None for notifications)."""
    rid = msg.get("id")
    method = msg.get("method", "")
    if rid is None:  # notification (e.g. notifications/initialized)
        return None
    if method == "initialize":
        result = {
            "protocolVersion": msg.get("params", {}).get(
                "protocolVersion", "2024-11-05"),
            "capabilities": {"tools": {}},
            "serverInfo": SERVER_INFO,
        }
    elif method == "tools/list":
        result = {"tools": [TOOL]}
    elif method == "tools/call":
        params = msg.get("params", {})
        if params.get("name") != TOOL["name"]:
            return {"jsonrpc": "2.0", "id": rid,
                    "error": {"code": -32602,
                              "message": f"unknown tool {params.get('name')!r}"}}
        result = handle_tool_call(params.get("arguments", {}))
    elif method == "ping":
        result = {}
    else:
        return {"jsonrpc": "2.0", "id": rid,
                "error": {"code": -32601, "message": f"method {method!r} not found"}}
    return {"jsonrpc": "2.0", "id": rid, "result": result}


def serve(stdin=None, stdout=None) -> None:
    """ServeStdio (marky-mcp/main.go:38): newline-delimited JSON-RPC."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
        except ValueError:
            resp = {"jsonrpc": "2.0", "id": None,
                    "error": {"code": -32700, "message": "parse error"}}
        else:
            resp = handle_message(msg)
        if resp is not None:
            stdout.write(json.dumps(resp) + "\n")
            stdout.flush()


if __name__ == "__main__":
    serve()
