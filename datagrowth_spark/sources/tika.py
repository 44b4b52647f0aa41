"""Document-text extraction à la Apache Tika (SURVEY §2.3 R8).

The reference runs Tika two ways — as a templated shell command
(``datagrowth/resources/shell/apache/tika.py:35-60``: ``java -jar
tika-app.jar`` over a file path) and as a microservice (``datagrowth/
vendors/apache/tika/resources.py:36-120``: PUT to a tika-server with a
``bin://file://<path>`` payload indirection). Both are just cached
resources; what is Tika-specific is the **signature**: binary payloads
are identified by a content hash (sha256 of the bytes plus the byte
length, ``datagrowth/signatures.py:69-82``), never by the transient
file path, so a re-downloaded or moved file never refetches.

Spark-first shape: requests are built **column-wise** (``sha2`` +
``length`` run JVM-side inside whole-stage codegen — the blob never
crosses into Python to be hashed), then flow through the standard
cached :func:`~datagrowth_spark.sources.cache.fetch` operator, and the
extracted text joins back onto the document frame by signature. At
100 TB the binary column stays in the JVM for signature computation;
only cache *misses* serialize bytes out to the transport worker.

Real transports are included (:func:`tika_server_transport` PUTs bytes
to a running tika-server over stdlib urllib; :func:`tika_shell_transport`
executes the tika-app jar) and fail at call time if the server/jar is
absent; the default remains an explicit stub so nothing silently makes
network calls. Tests inject a deterministic fake.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagrowth_spark.sources.cache import REQUEST_SCHEMA, ResourceCache, fetch

TIKA_SERVER_URL = "http://localhost:9998"


def binary_signature(content: bytes) -> str:
    """Content identity of a binary payload: ``sha256hex:length``.

    Mirrors the reference's byte hashing (sha256 over the bytes, length
    appended — ``signatures.py:69-82``); the driver-side twin of
    :func:`binary_signature_col`.
    """
    return f"{hashlib.sha256(content).hexdigest()}:{len(content)}"


def binary_signature_col(content_col: str | Column) -> Column:
    """JVM-side ``sha256hex:length`` over a binary column (codegen, no
    Python round-trip — identical output to :func:`binary_signature`)."""
    col = F.col(content_col) if isinstance(content_col, str) else content_col
    return F.concat_ws(":", F.lower(F.sha2(col, 256)), F.length(col))


def tika_server_requests(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    server_url: str = TIKA_SERVER_URL,
) -> DataFrame:
    """Request rows for the microservice form: PUT ``bin://file://<path>``
    to ``<server>/tika``, signed by the binary content hash.

    The ``data`` field carries the reference's path indirection as JSON
    ``{"file": "bin://file://<path>"}`` (the transport streams the file;
    the request row stays small), while the signature is the content
    hash — path changes never bust the cache.
    """
    indirection = F.concat(F.lit("bin://file://"), F.col(path_col))
    return df.select(
        binary_signature_col(content_col).alias("signature"),
        F.lit("PUT").alias("method"),
        F.lit(f"{server_url}/tika").alias("url"),
        F.lit(json.dumps({"Accept": "text/plain"})).alias("headers"),
        F.to_json(F.struct(indirection.alias("file"))).alias("data"),
    ).dropDuplicates(["signature"])


def tika_shell_requests(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    tika_jar: str = "tika-app.jar",
) -> DataFrame:
    """Request rows for the shell form: ``java -jar <jar> --text <path>``.

    Unlike generic shell requests (signed by normalized command line),
    these are signed by the binary content hash so the cache key is
    stable across hosts and temp paths.
    """
    cmd = F.to_json(F.array(
        F.lit("java"), F.lit("-jar"), F.lit(tika_jar), F.lit("--text"), F.col(path_col),
    ))
    return df.select(
        binary_signature_col(content_col).alias("signature"),
        F.lit("shell").alias("method"),
        cmd.alias("url"),
        F.lit(None).cast("string").alias("headers"),
        F.lit(None).cast("string").alias("data"),
    ).dropDuplicates(["signature"])


def tika_server_transport(method: str, url: str, headers: dict, data: Any,
                          timeout: float = 30.0) -> tuple[int, dict, str]:
    """Real tika-server transport (stdlib urllib — no extra packages).

    Resolves the ``bin://file://<path>`` indirection in the request data
    (reference ``vendors/apache/tika/resources.py:60-84``) to the file
    bytes and PUTs them to the tika-server endpoint. Fails with a
    connection error at call time when no server is running — the plan
    builds either way; inject a fake transport in tests.
    """
    import urllib.error
    import urllib.request

    payload = json.loads(data) if isinstance(data, str) else (data or {})
    file_ref = payload.get("file", "")
    path = file_ref[len("bin://file://"):] if file_ref.startswith("bin://file://") else file_ref
    with open(path, "rb") as handle:
        body = handle.read()
    request = urllib.request.Request(url, data=body, method=method or "PUT",
                                     headers=headers or {"Accept": "text/plain"})
    try:
        with urllib.request.urlopen(request, timeout=timeout) as response:
            return response.status, dict(response.headers), response.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as exc:
        return exc.code, dict(exc.headers or {}), exc.read().decode("utf-8", "replace")


def tika_shell_transport(method: str, url: str, headers: dict, data: Any,
                         timeout: float = 120.0) -> tuple[int, dict, str]:
    """Real shell transport: runs the ``java -jar tika-app.jar --text``
    command carried in the request (reference
    ``resources/shell/apache/tika.py:35-60``). The command is a JSON
    argv list — executed without a shell, so no quoting surface."""
    import subprocess

    argv = json.loads(url)
    proc = subprocess.run(argv, capture_output=True, timeout=timeout, check=False)
    status = 0 if proc.returncode == 0 else proc.returncode
    return status, {}, proc.stdout.decode("utf-8", "replace")


def detect_tika(server_url: str = TIKA_SERVER_URL,
                probe_timeout: float = 1.0) -> tuple[str, str] | None:
    """Runtime gate for real-Tika execution (r4 verdict item 6).

    Returns ``("shell", jar_path)`` when ``$TIKA_APP_JAR`` points at an
    existing jar and ``java`` is on PATH, ``("server", url)`` when a
    tika-server answers ``GET /version`` at ``server_url`` (env override
    ``$TIKA_SERVER_URL``), else ``None``. The gated e2e test flips from
    skip to a live extraction run wherever either is present; the
    request-building and signature surface stays covered by the stub
    transport everywhere else.
    """
    import os
    import shutil
    import urllib.error
    import urllib.request

    jar = os.environ.get("TIKA_APP_JAR")
    if jar and os.path.isfile(jar) and shutil.which("java"):
        return ("shell", jar)
    url = os.environ.get("TIKA_SERVER_URL", server_url)
    try:
        with urllib.request.urlopen(f"{url}/version", timeout=probe_timeout) as resp:
            if resp.status == 200:
                return ("server", url)
    except (urllib.error.URLError, OSError, ValueError):
        pass
    return None


def stub_tika_transport(method: str, url: str, headers: dict, data: Any) -> tuple[int, dict, str]:
    """Explicit no-Tika-here transport (the safe default): points callers
    at the real transports above or a test fake."""
    raise NotImplementedError(
        "No transport configured: pass transport=tika_server_transport "
        "(running tika-server), transport=tika_shell_transport (tika-app "
        "jar on disk), or a test fake."
    )


def extract_text(
    df: DataFrame,
    cache: ResourceCache,
    content_col: str = "content",
    path_col: str = "path",
    mode: str = "server",
    transport=stub_tika_transport,
    text_col: str = "text",
    server_url: str = TIKA_SERVER_URL,
    tika_jar: str = "tika-app.jar",
    **fetch_kwargs,
) -> DataFrame:
    """Attach Tika-extracted text to a frame of binary documents.

    ``df`` must carry a binary ``content_col`` and a ``path_col`` (e.g.
    from the :mod:`~datagrowth_spark.sources.files` download sink).
    Returns ``df`` plus ``text_col`` (extracted text, null when the
    extraction failed) and ``<text_col>_status``.

    The join back is on the content-hash signature — a narrow string
    key — so the binary column itself never shuffles: Catalyst prunes
    it out of the request/response side entirely.
    """
    if mode == "server":
        built = tika_server_requests(df, content_col=content_col,
                                     path_col=path_col, server_url=server_url)
    else:
        built = tika_shell_requests(df, content_col=content_col,
                                    path_col=path_col, tika_jar=tika_jar)
    reqs = built.select([f.name for f in REQUEST_SCHEMA.fields])
    responses = fetch(reqs, cache, transport=transport, **fetch_kwargs)
    ok = F.col("status").isin(0, 200)
    texts = responses.select(
        "signature",
        F.when(ok, F.col("body")).alias(text_col),
        F.col("status").alias(f"{text_col}_status"),
    )
    keyed = df.withColumn("signature", binary_signature_col(content_col))
    return keyed.join(texts, "signature", "left").drop("signature")
