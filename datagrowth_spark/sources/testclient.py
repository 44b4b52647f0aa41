"""In-package deterministic test-client transport (SURVEY §2.3 R10).

The reference ships ``TestClientResource`` inside the package (not its
tests — ``datagrowth/resources/http/generic.py:789-836``): a resource
whose transport is a local test client instead of the network, so whole
pipelines run hermetically. This is the Spark engine's equivalent: a
pure-function transport serving the deterministic entity API the
reference's test project generates server-side
(``tests/django_project/entities/views.py``), plus an ``/analyze``
enrichment endpoint whose outputs are pure integer arithmetic — exactly
reproducible in ANSI SQL, which lets end-to-end seeding/growth pipeline
runs be verified against a DuckDB oracle, not just eyeballed.

Endpoints (all deterministic functions of the URL alone):

* ``/entities?page=N`` — pages of ``PAGE_SIZE`` entities out of
  ``TOTAL``: ``{"id": i, "name": "entity <i>", "group": i % 3}``, with
  ``next_page`` while more remain.
* ``/entities/<id>`` — detail record ``{"id", "detail": "detail <i>",
  "score": i / 10}``; 404 beyond ``TOTAL``.
* ``/analyze/<id>`` — enrichment ``{"score": (i * KNUTH) % 1000 / 1000,
  "flag": "hi" | "lo"}`` (Knuth multiplicative hash → exact in any
  engine with 64-bit integers).
"""

from __future__ import annotations

import json
from typing import Any
from urllib.parse import parse_qs, urlparse

PAGE_SIZE = 10
TOTAL = 35
KNUTH = 2654435761


def analyze_score(i: int) -> float:
    return (i * KNUTH) % 1000 / 1000.0


def analyze_flag(i: int) -> str:
    return "hi" if i % 3 == 0 else "lo"


def testclient_transport(method: str, url: str, headers: dict, data: Any) -> tuple[int, dict, str]:
    parsed = urlparse(url if "://" in url else f"http://{url}")
    if parsed.path == "/entities":
        page = int(parse_qs(parsed.query).get("page", ["0"])[0])
        start = page * PAGE_SIZE
        ids = range(start, min(start + PAGE_SIZE, TOTAL))
        body = {
            "results": [{"id": i, "name": f"entity {i}", "group": i % 3} for i in ids],
            "next_page": page + 1 if start + PAGE_SIZE < TOTAL else None,
        }
        return 200, {"content-type": "application/json"}, json.dumps(body)
    if parsed.path.startswith("/entities/"):
        i = int(parsed.path.rsplit("/", 1)[1])
        if i >= TOTAL:
            return 404, {}, ""
        return 200, {"content-type": "application/json"}, json.dumps(
            {"id": i, "detail": f"detail {i}", "score": i / 10}
        )
    if parsed.path.startswith("/analyze/"):
        i = int(parsed.path.rsplit("/", 1)[1])
        return 200, {"content-type": "application/json"}, json.dumps(
            {"score": analyze_score(i), "flag": analyze_flag(i)}
        )
    if parsed.path.startswith("/tier/"):
        # Second-stage enrichment whose INPUT depends on a prior phase's
        # output (the flag) — exercises depends_on growth chains with a
        # SQL-expressible contract: tier = (id + (flag=='hi')) % 4.
        token = parsed.path.rsplit("/", 1)[1]
        id_part, _, flag = token.partition("-")
        i = int(id_part)
        tier = (i + (1 if flag == "hi" else 0)) % 4
        return 200, {"content-type": "application/json"}, json.dumps(
            {"tier": f"T{tier}"}
        )
    return 404, {}, ""
