"""Jupyter notebook → Markdown kernel (reference parity: internal/converters/ipynb.go).

Semantics (ipynb.go:61-109):

- ``markdown`` cells pass through verbatim (even when empty — the empty part
  still participates in the ``\\n\\n`` join);
- non-blank ``code`` cells become ```` ```python ```` fenced blocks;
- non-blank ``raw`` cells become plain fenced blocks;
- parts joined with ``\\n\\n``;
- title = first ``# `` heading line of any markdown cell (scanned in cell
  order, line trimmed), else ``metadata.title``; prepended as ``# {title}``
  iff the joined document does not already start with ``# ``.
"""

from __future__ import annotations

import json

from .base import ConvertError, Segment, md


def convert_ipynb(text: str) -> list[Segment]:
    try:
        nb = json.loads(text)
    except (json.JSONDecodeError, ValueError) as exc:
        raise ConvertError(f"failed to parse ipynb: {exc}") from exc
    if not isinstance(nb, dict):
        raise ConvertError("failed to parse ipynb: not an object")

    parts: list[str] = []
    title = ""

    for cell in nb.get("cells") or []:
        if not isinstance(cell, dict):
            continue
        source = cell.get("source") or []
        if isinstance(source, str):  # nbformat allows a single string
            content = source
        else:
            content = "".join(source)
        cell_type = cell.get("cell_type")

        if cell_type == "markdown":
            parts.append(content)
            if not title:
                for line in content.split("\n"):
                    trimmed = line.strip()
                    if trimmed.startswith("# "):
                        title = trimmed[2:].strip()
                        break
        elif cell_type == "code":
            if content.strip():
                parts.append(f"```python\n{content}\n```")
        elif cell_type == "raw":
            if content.strip():
                parts.append(f"```\n{content}\n```")

    if not title:
        meta = nb.get("metadata") or {}
        if isinstance(meta, dict):
            title = meta.get("title") or ""

    markdown = "\n\n".join(parts)
    if title and not markdown.strip().startswith("# "):
        markdown = f"# {title}\n\n{markdown}"

    return [md(markdown)]
