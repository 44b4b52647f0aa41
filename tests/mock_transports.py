"""Deterministic mock transports shared by test modules.

Executors unpickle these by module reference, so this module must be
importable on workers (tests dir is added to PYTHONPATH in conftest).
"""

import json

PAGE_SIZE = 10
TOTAL = 35


def mock_api_transport(method, url, headers, data):
    """Entity API: /entities?page=N (paginated), /entities/<id> (detail).

    Mirrors the reference's deterministic test-entity endpoints
    (tests/django_project/entities/views.py).
    """
    from urllib.parse import parse_qs, urlparse

    parsed = urlparse(url if "://" in url else f"http://{url}")
    if parsed.path == "/entities":
        query = parse_qs(parsed.query)
        page = int(query.get("page", ["0"])[0])
        deletes = int(query.get("deletes", ["0"])[0])
        start = page * PAGE_SIZE
        ids = list(range(start, min(start + PAGE_SIZE, TOTAL)))
        results = []
        for i in ids:
            if deletes and i % deletes == 0:
                results.append({"id": i, "deleted": True})
            else:
                results.append({"id": i, "name": f"entity {i}", "group": i % 3})
        body = {
            "results": results,
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
    return 404, {}, ""
