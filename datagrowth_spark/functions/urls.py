"""URL canonicalization as pure Column expressions.

The reference normalizes URLs into lookup URIs so "logically equal"
requests hit the same cache row — strip the protocol, sort the query
parameters (``datagrowth/resources/http/generic.py:631-642``
``uri_from_url``). This module lifts that normalization from a
per-request Python helper to a corpus-scale relational operator: every
step is a built-in string/array function, so canonicalizing a 100 TB
crawl's URL column is a map-only, whole-stage-codegen projection with
zero Python and zero shuffle.

Canonical form (superset of the reference's rule, standard crawl
practice):

* scheme stripped (reference parity) after being used to drop the
  matching default port (``:80`` http, ``:443`` https)
* host lowercased, leading ``www.`` dropped
* fragment dropped
* query parameters sorted lexicographically (reference parity);
  empty query keeps no ``?``
* empty path normalized to ``/``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_uri", "canonical_host"]

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def _parts(url: Column | str) -> tuple[Column, Column, Column, Column]:
    """(scheme, host_port, path, sorted_query) — all lazily computed.

    Parsing rules (RFC-shaped, chosen so the same rule is expressible
    identically in DuckDB for the oracle): the query starts at the
    FIRST ``?`` (a literal ``?`` inside a query value stays part of the
    query); userinfo (``user:pw@``) is stripped from the authority
    before host/port handling (``@`` cannot appear unencoded elsewhere
    in an authority); the port is recognized only as a trailing
    ``:digits`` run, which also leaves bracketed IPv6 hosts
    (``[::1]:8080``) intact.
    """
    url = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    defragged = F.regexp_replace(F.regexp_replace(url, _SCHEME_RE, ""), "#.*$", "")
    auth_path = F.substring_index(defragged, "?", 1)
    # Everything after the FIRST '?' — NOT substring_index(-1), which
    # would take the last and both diverge from the oracle and collapse
    # distinct URLs whenever a query value contains a literal '?'.
    raw_query = F.when(
        defragged.contains("?"),
        F.substring(defragged, F.length(auth_path) + 2, F.lit(2 ** 30)),
    ).otherwise(F.lit(""))
    authority = F.substring_index(auth_path, "/", 1)
    host_port = F.lower(F.regexp_replace(authority, "^[^@]*@", ""))
    path = F.substring(auth_path, F.length(authority) + 1, F.lit(2 ** 30))
    sorted_query = F.array_join(
        F.array_sort(F.filter(F.split(raw_query, "&"), lambda p: p != F.lit(""))),
        "&",
    )
    return scheme, host_port, path, sorted_query


def _host_and_port(host_port: Column) -> tuple[Column, Column]:
    port = F.regexp_extract(host_port, ":([0-9]+)$", 1)
    host = F.regexp_replace(host_port, ":[0-9]+$", "")
    return host, port


def canonical_host(url: Column | str) -> Column:
    """Lowercased host, userinfo / ``www.`` / port stripped — the
    crawl-pipeline grouping key (per-domain quotas, blocklists,
    politeness buckets)."""
    _, host_port, _, _ = _parts(url)
    host, _ = _host_and_port(host_port)
    return F.when(host.startswith("www."), F.substring(host, 5, 2 ** 30)).otherwise(host)


def canonical_uri(url: Column | str) -> Column:
    """Protocol-stripped, param-sorted lookup URI (the reference's
    ``uri_from_url`` contract, plus default-port/``www.``/fragment/
    userinfo normalization). Two raw URLs that differ only in scheme
    case, host case, ``www.``, a default port, userinfo, parameter
    order, or a fragment map to the same URI."""
    scheme, host_port, path, sorted_query = _parts(url)
    host, port = _host_and_port(host_port)
    is_default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    ) | (port == "")
    norm_host = F.when(host.startswith("www."), F.substring(host, 5, 2 ** 30)).otherwise(host)
    norm_authority = F.when(is_default, norm_host).otherwise(
        F.concat(norm_host, F.lit(":"), port)
    )
    norm_path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        norm_authority,
        norm_path,
        F.when(sorted_query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_query)),
    )
