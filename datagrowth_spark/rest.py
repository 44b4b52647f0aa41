"""Thin REST read path over Collections (SURVEY §2.3 REST).

The reference serves a collection's documents as paginated ``content``
dicts through Django REST Framework
(``datagrowth/datatypes/documents/views/collection.py:14-36``) with
RFC-5988 ``Link`` headers carrying next/prev page URLs
(``views/content.py:35-56``, ``ContentPagination``: ``page_size`` query
param, ``max_page_size = 1000``). This module re-expresses that read
path without a web framework:

* :func:`content_after` — keyset pagination, THE DEFAULT WALK: a deep
  page is ``identity > after`` + pushdown-friendly sort-limit instead
  of an O(offset) global skip. Offset pagination degrades linearly
  with page number; keyset stays O(page_size log n) however deep the
  walk goes — the only form that survives a 100 TB corpus.
* :func:`content_page` — page-number pagination (reference parity,
  random access to page N). Spark executes ``ORDER BY identity OFFSET
  … LIMIT …``; the page is collected to the driver because a serving
  endpoint's response IS driver-side by definition (bounded by
  ``MAX_PAGE_SIZE``).
* :class:`ContentServer` — an ad-hoc HTTP query interface on stdlib
  ``http.server``: ``GET /collections/<name>/content`` with ``page``/
  ``page_size`` (or ``after`` for keyset) query params, JSON body,
  reference-style ``Link`` headers, 404 for unknown collections.
  Every response's ``rel="next"`` link is the KEYSET form — a client
  that simply follows ``next`` never pays an offset skip, even if it
  started from a page-numbered request; ``rel="next-offset"`` keeps
  the numbered alternative available.

``has_next`` is detected by fetching ``page_size + 1`` rows — never a
COUNT over the corpus, which would be a full scan per page request.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from typing import Any

from pyspark.sql import functions as F

MAX_PAGE_SIZE = 1000  # reference ContentPagination.max_page_size
DEFAULT_PAGE_SIZE = 100


def _clamp(page_size: int) -> int:
    return max(1, min(int(page_size), MAX_PAGE_SIZE))


def _rows_to_content(rows: list) -> list[dict[str, Any]]:
    out = []
    for row in rows:
        content = {k: json.loads(v) for k, v in (row["content"] or {}).items()
                   if not k.startswith("_")}
        content["_id"] = row["identity"]
        out.append(content)
    return out


def content_page(collection, page: int = 1,
                 page_size: int = DEFAULT_PAGE_SIZE) -> dict[str, Any]:
    """One page of merged document content, ordered by identity.

    Returns ``{"results": [...], "page": n, "page_size": m,
    "has_next": bool, "has_prev": bool}``.
    """
    page = max(1, int(page))
    page_size = _clamp(page_size)
    frame = (collection.content_df()
             .orderBy("identity")
             .offset((page - 1) * page_size)
             .limit(page_size + 1))
    rows = frame.collect()
    page_rows = rows[:page_size]
    has_next = len(rows) > page_size
    return {
        "results": _rows_to_content(page_rows),
        "page": page,
        "page_size": page_size,
        "has_next": has_next,
        "has_prev": page > 1,
        # keyset cursor so followers of "next" can leave offset-land
        "next_after": page_rows[-1]["identity"] if has_next and page_rows else None,
    }


def content_after(collection, after: str | None = None,
                  page_size: int = DEFAULT_PAGE_SIZE) -> dict[str, Any]:
    """Keyset page: documents with ``identity > after`` (lexicographic).

    Returns ``{"results": [...], "page_size": m, "has_next": bool,
    "next_after": str | None}`` — pass ``next_after`` back in to walk
    the corpus without ever paying an offset skip.
    """
    page_size = _clamp(page_size)
    frame = collection.content_df()
    if after is not None:
        frame = frame.where(F.col("identity") > F.lit(after))
    rows = frame.orderBy("identity").limit(page_size + 1).collect()
    page_rows = rows[:page_size]
    has_next = len(rows) > page_size
    return {
        "results": _rows_to_content(page_rows),
        "page_size": page_size,
        "has_next": has_next,
        "next_after": page_rows[-1]["identity"] if has_next and page_rows else None,
    }


class ContentServer:
    """Stdlib HTTP server exposing the read path ad hoc.

    Routes::

        GET /collections                         -> names
        GET /collections/<name>/content          -> offset page (page, page_size)
        GET /collections/<name>/content?after=X  -> keyset page

    ``Link`` headers mirror the reference's paginated response
    (``views/content.py:40-56``): ``<url; rel="next">, <url; rel="prev">``.
    """

    def __init__(self, collections: dict[str, Any], host: str = "127.0.0.1",
                 port: int = 0) -> None:
        import http.server

        server_self = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *args):  # noqa: D102 — quiet by default
                pass

            def do_GET(self):
                status, headers, body = server_self._route(self.path)
                payload = json.dumps(body).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                for key, value in headers.items():
                    self.send_header(key, value)
                self.end_headers()
                self.wfile.write(payload)

        self.collections = collections
        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    # -- request handling -------------------------------------------------
    def _route(self, path: str) -> tuple[int, dict[str, str], Any]:
        from urllib.parse import parse_qs, urlparse

        parsed = urlparse(path)
        parts = [p for p in parsed.path.split("/") if p]
        params = {k: v[-1] for k, v in parse_qs(parsed.query).items()}
        if parts == ["collections"]:
            return 200, {}, sorted(self.collections)
        if len(parts) == 3 and parts[0] == "collections" and parts[2] == "content":
            name = parts[1]
            if name not in self.collections:
                return 404, {}, {"detail": "Not found"}
            collection = self.collections[name]
            page_size = int(params.get("page_size", DEFAULT_PAGE_SIZE))
            if "after" in params or params.get("keyset"):
                result = content_after(collection, after=params.get("after"),
                                       page_size=page_size)
                headers = self._keyset_link(parsed.path, result)
            else:
                page = int(params.get("page", 1))
                result = content_page(collection, page=page, page_size=page_size)
                headers = self._page_links(parsed.path, result)
            return 200, headers, result
        return 404, {}, {"detail": "Not found"}

    def _page_links(self, path: str, result: dict[str, Any]) -> dict[str, str]:
        links = []
        base = f"{self.url}{path}"
        size = result["page_size"]
        if result["has_next"]:
            # keyset first: following rel="next" walks the corpus O(1)
            # per page; the numbered form stays as an alternative. The
            # cursor is an arbitrary identity — percent-encode it.
            after = urllib.parse.quote(str(result["next_after"]), safe="")
            links.append(f'<{base}?after={after}&page_size={size}>; rel="next"')
            links.append(f'<{base}?page={result["page"] + 1}&page_size={size}>; rel="next-offset"')
        if result["has_prev"]:
            links.append(f'<{base}?page={result["page"] - 1}&page_size={size}>; rel="prev"')
        return {"Link": ", ".join(links)} if links else {}

    def _keyset_link(self, path: str, result: dict[str, Any]) -> dict[str, str]:
        if not result["has_next"]:
            return {}
        base = f"{self.url}{path}"
        size = result["page_size"]
        after = urllib.parse.quote(str(result["next_after"]), safe="")
        return {"Link": f'<{base}?after={after}&page_size={size}>; rel="next"'}

    # -- lifecycle --------------------------------------------------------
    def start(self) -> "ContentServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
