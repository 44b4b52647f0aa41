"""HTTP/shell request construction and paginated fetching.

Mirrors the reference's resource surface (SURVEY §2.3): templated
requests (``URI_TEMPLATE``/``PARAMETERS``), signature-keyed caching,
source-defined pagination (``next_parameters``) and request coalescing
(``send_mass`` concat batching) — re-expressed as request-row builders +
driver-side page loops around the set-oriented :func:`fetch` operator.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable
from urllib.parse import urlencode

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datagrowth_spark.sources.cache import REQUEST_SCHEMA, ResourceCache, fetch
from datagrowth_spark.sources.signatures import http_signature, shell_signature


def http_request(url: str, method: str = "GET", params: dict | None = None,
                 headers: dict | None = None, data: Any = None) -> dict:
    """Build one request row (dict matching REQUEST_SCHEMA)."""
    if params:
        sep = "&" if "?" in url else "?"
        url = f"{url}{sep}{urlencode(sorted(params.items()))}"
    return {
        "signature": http_signature(method, url, headers, data),
        "method": method.upper(),
        "url": url,
        "headers": json.dumps(headers) if headers else None,
        "data": json.dumps(data) if data is not None else None,
    }


def shell_request(cmd: list[str], stdin: str | None = None) -> dict:
    return {
        "signature": shell_signature(cmd, stdin),
        "method": "shell",
        "url": json.dumps(cmd),
        "headers": None,
        "data": stdin,
    }


def templated_requests(uri_template: str, args_list: Iterable[tuple],
                       method: str = "GET", params: dict | None = None,
                       headers: dict | None = None) -> list[dict]:
    """``URI_TEMPLATE.format(*args)`` for a series of arg tuples (R3)."""
    return [
        http_request(uri_template.format(*args), method=method, params=params, headers=headers)
        for args in args_list
    ]


def coalesced_requests(uri_template: str, values: list[str], concat_size: int,
                       concat_symbol: str = "|", **kwargs) -> list[dict]:
    """send_mass-style request coalescing (R4): pack N key values into one
    request separated by ``concat_symbol`` — fewer round trips against
    batchable APIs."""
    groups = [values[i:i + concat_size] for i in range(0, len(values), concat_size)]
    return templated_requests(uri_template, [(concat_symbol.join(g),) for g in groups], **kwargs)


def requests_to_df(spark: SparkSession, requests: list[dict]) -> DataFrame:
    rows = [tuple(r.get(f.name) for f in REQUEST_SCHEMA.fields) for r in requests]
    return spark.createDataFrame(rows, REQUEST_SCHEMA)


def paginated_fetch(
    spark: SparkSession,
    cache: ResourceCache,
    requests: list[dict],
    next_request: Callable[[dict], dict | None] | None = None,
    continuation_limit: int = 1,
    **fetch_kwargs,
) -> DataFrame:
    """Fetch a batch of requests plus their continuation pages.

    ``next_request(response_row) -> request | None`` implements the
    source's pagination contract (the reference's ``next_parameters``,
    http/generic.py:471-506). Pages are fetched breadth-first: every
    link's page-N requests go out as ONE set-oriented fetch (partition
    parallel), then the loop advances — the driver loop is O(pages),
    never O(links).

    Execution shape: cache-MISS chains are walked entirely inside the
    fetch worker (``fetch(follow=...)`` — pages of one link are serial
    anyway, links fan out across partitions), so the cold path costs ONE
    distributed fetch round regardless of page depth. The driver then
    walks every chain through the returned pages and only issues extra
    rounds for pages it has not seen — on a warm cache those rounds are
    hit-only joins with no transport.

    Returns the responses for every page reached within the limit, as
    ONE semi-join of the final cache state against the full signature
    set (never a union of per-page plans: unions of many small
    same-schema local relations through broadcast joins tickle incorrect
    exchange reuse, and each per-page plan would also pin a stale
    parquet file listing).
    """
    limit = max(continuation_limit, 1)
    collected: dict[str, dict] = {}

    def fetch_round(reqs: list[dict]) -> None:
        follow = (next_request, limit) if next_request is not None else None
        responses = fetch(requests_to_df(spark, reqs), cache, follow=follow, **fetch_kwargs)
        for row in responses.collect():
            collected[row["signature"]] = row.asDict()

    fetch_round(requests)
    result_sigs: set[str] = set()
    # (cursor signature, pages consumed up to and including it) per chain
    pending = [(r["signature"], 1) for r in requests]
    for _round in range(limit + 1):
        if not pending:
            break
        frontier: dict[str, dict] = {}
        resumed: list[tuple[str, int]] = []
        for sig, pages in pending:
            row = collected.get(sig)
            if row is None:  # transport produced no row (defensive)
                continue
            result_sigs.add(sig)
            while next_request is not None and pages < limit:
                nxt = next_request(row)
                if nxt is None:
                    break
                sig, pages = nxt["signature"], pages + 1
                row = collected.get(sig)
                if row is None:
                    frontier[sig] = nxt
                    resumed.append((sig, pages))
                    break
                result_sigs.add(sig)
        if not frontier:
            break
        fetch_round(list(frontier.values()))
        pending = resumed
    sigs = spark.createDataFrame([(s,) for s in result_sigs], "signature string")
    return cache.latest().join(sigs, "signature", "left_semi")
