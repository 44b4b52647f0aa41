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


def counting_transport(log_dir, fail_urls=()):
    """Transport that records every invocation as a marker file in
    ``log_dir`` (shared filesystem — works across executor processes)
    and raises mid-batch for urls containing any ``fail_urls`` fragment.
    The fault-injection suite uses the markers to prove at-most-once
    semantics per signature across replays."""

    def transport(method, url, headers, data):
        import os as _os
        import uuid as _uuid

        _os.makedirs(log_dir, exist_ok=True)
        with open(_os.path.join(log_dir, _uuid.uuid4().hex), "w") as fh:
            fh.write(url)
        if any(frag in url for frag in fail_urls):
            raise RuntimeError(f"injected transport failure for {url}")
        return 200, {"content-type": "application/json"}, json.dumps({"ok": url})

    return transport


def transport_calls(log_dir):
    """Urls recorded by :func:`counting_transport`, in no order."""
    import os as _os

    if not _os.path.isdir(log_dir):
        return []
    out = []
    for name in _os.listdir(log_dir):
        with open(_os.path.join(log_dir, name)) as fh:
            out.append(fh.read())
    return out


CHAIN_PAGES = 2


def mock_chain_transport(method, url, headers, data):
    """Synthetic many-chain API: ``http://mockchain/<cid>/<page>`` with
    CHAIN_PAGES pages per chain — drives the relational pagination
    scale tests (100k distinct chains)."""
    parts = url.rsplit("/", 2)
    cid, page = int(parts[1]), int(parts[2])
    nxt = page + 1 if page + 1 < CHAIN_PAGES else None
    return 200, {}, json.dumps({"cid": cid, "page": page, "next": nxt})


def chain_next_request(row):
    body = json.loads(row["body"])
    if body.get("next") is None:
        return None
    from datagrowth_spark.sources.http import http_request

    return http_request(f"http://mockchain/{body['cid']}/{body['next']}")
