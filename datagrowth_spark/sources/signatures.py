"""Content-addressed request signatures.

The defining feature of the reference's resource layer is result caching
keyed by a normalized request identity (see
/root/reference/datagrowth/signatures.py:16-103 and
resources/http/generic.py:630-669). This module re-expresses that as
pure functions:

* a signature is ``sha256`` of the canonical JSON of the request's
  identifying parts (sorted keys, compact separators) — deterministic
  across processes/engines, safe as a cache join key;
* URI normalization sorts query parameters and strips the protocol so
  semantically equal URLs collide;
* shell commands normalize by sorting long flags, mirroring
  ``uri_from_cmd`` (shell/generic.py:371-386).

Both driver code and executor workers call these; they depend on
nothing but the stdlib.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any
from urllib.parse import parse_qsl, urlencode, urlparse


def _canonical(data: Any) -> str:
    return json.dumps(data, sort_keys=True, separators=(",", ":"), default=str)


def make_signature(uri: str, data: Any = None) -> str:
    """sha256 over the canonical (uri, data) pair."""
    return hashlib.sha256(_canonical({"uri": uri, "data": data}).encode()).hexdigest()


def normalize_url(url: str) -> str:
    """Protocol-stripped URL with sorted query parameters."""
    parsed = urlparse(url)
    query = urlencode(sorted(parse_qsl(parsed.query, keep_blank_values=True)))
    netloc = parsed.netloc
    path = parsed.path
    out = f"{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def http_signature(method: str, url: str, headers: dict | None = None,
                   data: Any = None) -> str:
    """Signature for an HTTP request (method + normalized url + data).

    Headers are excluded by default, matching the reference's cache key
    (uri + payload hash); pass identifying headers inside ``data`` when
    they affect the response.
    """
    return make_signature(f"{method.upper()} {normalize_url(url)}", data)


def normalize_cmd(cmd: list[str]) -> str:
    """Command with long flags sorted (flag order is not identity)."""
    flags = sorted(p for p in cmd if isinstance(p, str) and p.startswith("--"))
    rest = [p for p in cmd if not (isinstance(p, str) and p.startswith("--"))]
    return " ".join(rest + flags)


def shell_signature(cmd: list[str], stdin: str | None = None) -> str:
    return make_signature(normalize_cmd(cmd), stdin)
