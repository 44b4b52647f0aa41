"""Dot-path resolution over nested dict/list data ("reach").

Semantics match the reference's path language (see
/root/reference/datagrowth/utils/data.py:10-76): ``$.a.b.0`` walks dicts
by key and lists by integer index; a miss returns ``default``; if the
stepwise walk fails, the *entire remaining path* is retried as one
literal key (supports keys that contain dots). ``$`` alone returns the
whole value.
"""

from __future__ import annotations

from typing import Any

_MISSING = object()


def reach(path: str | None, data: Any, default: Any = None) -> Any:
    """Resolve a ``$.a.b.0`` style path against nested dicts/lists."""
    if path == "$" or path is None or path == "":
        return data
    if not isinstance(path, str) or not path.startswith("$."):
        raise ValueError(f"reach path should start with $. — got {path!r}")
    body = path[2:]
    value = _walk(body, data)
    if value is _MISSING:
        # Literal-key fallback: the whole remaining path as a single key.
        if isinstance(data, dict) and body in data:
            return data[body]
        return default
    return value


def _walk(body: str, data: Any) -> Any:
    current = data
    parts = body.split(".")
    for i, part in enumerate(parts):
        if isinstance(current, dict):
            if part in current:
                current = current[part]
                continue
            # Literal fallback on the remaining subpath at this level.
            rest = ".".join(parts[i:])
            if rest in current:
                return current[rest]
            return _MISSING
        if isinstance(current, (list, tuple)):
            try:
                current = current[int(part)]
                continue
            except (ValueError, IndexError):
                return _MISSING
        return _MISSING
    return current


def override_dict(parent: dict, child: dict) -> dict:
    """Return parent overridden with child's keys (shallow; new dict)."""
    assert isinstance(parent, dict) and isinstance(child, dict), (
        "override_dict expects two dicts"
    )
    out = dict(parent)
    out.update(child)
    return out
