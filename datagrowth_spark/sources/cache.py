"""The resource cache + fetch operator — the engine's custom "scan".

Shape (SURVEY §2.3 R1-R5, §4 "result caching"): a DataFrame of requests
goes in; a DataFrame of responses comes out; every response is memoized
in a persistent cache table keyed by content-addressed signature, so
replays, retries and overlapping pipelines never refetch.

    requests_df ──┬─ join cache (hits) ───────────────┬─ responses_df
                  └─ left-anti (misses) → mapInPandas ─┘
                         fetch worker: backoff, throttle, cache_only
                         (misses appended to the cache table BEFORE the
                          result is returned — side-effect idempotence,
                          the reference's close-before-yield rule)

Scale design: the cache table is parquet partitioned by signature
prefix; the lookup is a join on a 64-char key (broadcast when the
request side is small); the fetch worker is Arrow-batched with
per-partition rate limiting, so N executors give N-way polite
parallelism against the source.

Nothing in Catalyst memoizes across runs — this operator is the piece
the reference got right and Spark lacks; everything else in the engine
is plain DataFrame algebra.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

REQUEST_SCHEMA = T.StructType([
    T.StructField("signature", T.StringType(), False),
    T.StructField("method", T.StringType(), True),       # GET/POST/... or "shell"
    T.StructField("url", T.StringType(), True),           # url or command line
    T.StructField("headers", T.StringType(), True),       # JSON
    T.StructField("data", T.StringType(), True),          # JSON payload / stdin
])

RESPONSE_SCHEMA = T.StructType(REQUEST_SCHEMA.fields + [
    T.StructField("status", T.IntegerType(), True),
    T.StructField("head", T.StringType(), True),          # JSON response headers
    T.StructField("body", T.StringType(), True),
    T.StructField("fetched_at", T.TimestampType(), True),
    T.StructField("purge_at", T.TimestampType(), True),
    # Signature of the continuation-chain head this row was fetched
    # under (== own signature outside a chain walk). Lets a warm replay
    # recover a whole cached chain with ONE relational lookup instead of
    # one driver round per page.
    T.StructField("chain", T.StringType(), True),
])

# Optional per-row page-budget column on a request frame (continuation
# chains resumed mid-way carry their remaining budget so the worker
# never fetches past the chain's continuation_limit).
BUDGET_COL = "__budget"

# Error statuses mirroring the reference's conventions
# (http/generic.py: 496 SSL, 502 connection, 504 timeout, 600 unicode).
STATUS_TIMEOUT = 504
STATUS_CONNECTION = 502
RETRY_STATUSES = (420, 429, 502, 503, 504)

Transport = Callable[[str, str, dict, Any], tuple[int, dict, str]]
"""(method, url, headers, data) -> (status, response_headers, body)"""

#: Up to this many requests per fetch call, the signature set is
#: collected driver-side (tiny: 64-char strings) so both cache scans
#: become partition-pruned point lookups instead of full-table scans.
#: Above it, the lookup stays a join — no driver structure may scale
#: with the crawl size, and past a few thousand signatures the 256
#: sig_prefix partitions are saturated (no listing-level pruning left)
#: while the literal isin() still bloats Catalyst time.
FETCH_PRUNE_THRESHOLD = 4096

#: A flat (never-compacted) cache with at least this many committed
#: batch dirs still benefits from the pushed ``signature IN`` predicate
#: even without partition pruning: below it, the probe job plus the
#: isin() literals cost more than the tiny scan they save (measured
#: 2.4x on many-small-fetch growth chains); above it, an unpruned hit
#: lookup windows over the entire multi-dir cache every fetch.
FLAT_PRUNE_MIN_DIRS = 32


def success_predicate(status: Column | str = "status") -> Column:
    """Success per the reference's Resource.success (2xx HTTP, 0 shell)."""
    col = F.col(status) if isinstance(status, str) else status
    return ((col >= 200) & (col < 300)) | (col == 0)


def requests_transport(method: str, url: str, headers: dict, data: Any) -> tuple[int, dict, str]:
    """Default HTTP transport (the only side-effecting code path)."""
    import requests as _rq

    try:
        response = _rq.request(method, url, headers=headers or None,
                               json=data if data is not None else None, timeout=30)
        return response.status_code, dict(response.headers), response.text
    except _rq.exceptions.Timeout:
        return STATUS_TIMEOUT, {}, ""
    except _rq.exceptions.ConnectionError:
        return STATUS_CONNECTION, {}, ""


def shell_transport(method: str, url: str, headers: dict, data: Any) -> tuple[int, dict, str]:
    """Shell transport: ``url`` is the command line, ``data`` the stdin.

    Status mirrors the reference's ShellResource: the process return
    code, 0 → 200-equivalent success (stored as 0; success predicate is
    status == 0 for shell rows).
    """
    import subprocess

    cmd = json.loads(url) if url.startswith("[") else url.split()
    try:
        proc = subprocess.run(cmd, input=data, capture_output=True, text=True, timeout=300)
        return proc.returncode, {"stderr": proc.stderr}, proc.stdout
    except subprocess.TimeoutExpired:
        return STATUS_TIMEOUT, {}, ""


def _sig_prefix(sig: str) -> str:
    """Partition value for one signature: 'p' + first 2 hex chars. The
    letter prefix pins parquet partition-value inference to STRING (an
    all-numeric partition set would otherwise infer int and break
    cross-dir schema unification)."""
    return "p" + sig[:2]


class ResourceCache:
    """Persistent response cache over a parquet directory.

    Layout: each append commits as its own ``batch-<uuid>`` subdirectory,
    published by an ATOMIC rename of a hidden staging dir. Concurrent
    appenders (two fetch jobs in one session, or two crawler drivers on a
    shared cache) therefore never share a ``_temporary`` dir — the classic
    same-path parquet-append hazard where one job's commit cleanup deletes
    the other's staged task files. A crashed append leaves only a hidden
    ``.staging-*`` dir (invisible to readers); :meth:`vacuum` sweeps those.

    A month-long crawl accumulates thousands of tiny batch dirs and every
    read re-lists and re-scans all of them; :meth:`compact` periodically
    folds all committed entries into ONE ``compact-<uuid>`` dir
    hash-partitioned by signature prefix (``sig_prefix=pXX``, 256
    buckets), published by the same stage-then-rename protocol, and only
    then deletes the entries it folded. Crash anywhere mid-compact never
    loses data: before the publish only a hidden staging dir exists;
    after it, not-yet-deleted old entries merely duplicate rows that
    :meth:`latest` dedups and the next compact removes. Compaction is
    safe to race APPENDERS (it folds a snapshot of the entry list taken
    up front; batches published later survive untouched); a READER
    holding a pre-compaction DataFrame should re-plan via a fresh
    :meth:`read` after compaction, like any parquet dataset whose files
    were rewritten underneath a cached listing.

    The partitioned layout is what makes signature lookups prune: a
    driver-bounded signature list (:meth:`read`/:meth:`latest` with
    ``prune_signatures``) turns into a partition filter on ``sig_prefix``
    plus a pushed ``signature IN`` — a fetch of 1k requests against a
    billion-row cache scans ~1k/256 of the compacted partitions instead
    of the whole table. ``vacuum`` remains single-writer maintenance —
    do not run it concurrently with appenders or another compactor.
    """

    def __init__(self, spark: SparkSession, path: str,
                 now_fn: Callable[[], "object"] | None = None) -> None:
        self.spark = spark
        self.path = path
        # Injectable clock for deterministic TTL tests (r7 verdict item
        # 1): when set, expiry compares purge_at against this callable's
        # value (a datetime, re-evaluated at every plan build) instead
        # of the cluster wall clock. Production leaves it None.
        self.now_fn = now_fn

    def _now_expr(self):
        """Column used as "now" in TTL-expiry predicates."""
        if self.now_fn is None:
            return F.current_timestamp()
        return F.lit(self.now_fn()).cast("timestamp")

    def is_empty(self) -> bool:
        """True when no parquet has ever been committed — a pure driver
        filesystem check (no job), used to skip the hit-lookup join on
        the cold path. Staging dirs are hidden, so a mid-flight append
        doesn't count until its atomic publish."""
        return not os.path.exists(self.path) or not any(
            not n.startswith((".", "_")) for n in os.listdir(self.path)
        )

    def has_compacted(self) -> bool:
        """True when a ``compact-*`` partitioned layout exists (pure
        listdir, no job). Delegates to :meth:`_entries` so there is ONE
        source of truth for layout classification — a stray
        non-directory ``compact-*`` entry counts as flat everywhere."""
        return bool(self._entries()[0])

    def wants_pruned_lookups(self) -> bool:
        """True when a signature-pruned lookup pays for its driver
        probe: either a compacted layout exists (partition pruning +
        pushed predicate), or the flat cache has accumulated enough
        batch dirs (``FLAT_PRUNE_MIN_DIRS``) that the pushed
        ``signature IN`` beats windowing over the whole multi-dir scan
        even without partition pruning. Small fresh caches — the
        many-small-fetch growth-chain shape — skip the probe entirely."""
        compacted, flat = self._entries()
        return bool(compacted) or len(flat) >= FLAT_PRUNE_MIN_DIRS

    def _entries(self) -> tuple[list[str], list[str]]:
        """Committed entries, split by layout: (partitioned compact dirs,
        flat batch dirs / legacy loose files)."""
        if not os.path.exists(self.path):
            return [], []
        compacted, flat = [], []
        for name in sorted(os.listdir(self.path)):
            if name.startswith((".", "_")):
                continue
            full = os.path.join(self.path, name)
            if name.startswith("compact-") and os.path.isdir(full):
                compacted.append(full)
            else:
                flat.append(full)
        return compacted, flat

    def _scan(self, compacted: list[str], flat: list[str],
              prune_signatures: list[str] | None = None) -> DataFrame:
        """Union of the two layouts' scans. With ``prune_signatures``
        the compacted scan gets a PARTITION filter on ``sig_prefix``
        (listing-level pruning) and both sides get the pushed
        ``signature IN`` predicate."""
        fields = [f.name for f in RESPONSE_SCHEMA.fields]
        sig_filter = None
        if prune_signatures is not None:
            sig_filter = F.col("signature").isin(list(prune_signatures))
        parts = []
        if flat:
            df = self.spark.read.option("recursiveFileLookup", "true") \
                .parquet(*flat)
            # Forward-compat: caches written before the chain column
            # existed read back with chain = own signature.
            if "chain" not in df.columns:
                df = df.withColumn("chain", F.col("signature"))
            if sig_filter is not None:
                df = df.where(sig_filter)
            parts.append(df.select(fields))
        if compacted:
            df = self.spark.read.parquet(*compacted)
            if prune_signatures is not None:
                prefixes = sorted({_sig_prefix(s) for s in prune_signatures})
                df = df.where(F.col("sig_prefix").isin(prefixes) & sig_filter)
            parts.append(df.select(fields))  # drops sig_prefix
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(self, prune_signatures: list[str] | None = None) -> DataFrame:
        """All live (non-expired) cached responses. ``prune_signatures``
        — a driver-bounded signature list — narrows the scan to those
        rows AND prunes compacted partitions by signature prefix; chain
        lookups (matching ``chain`` of rows whose own signature is
        unknown) must scan unpruned."""
        compacted, flat = self._entries()
        if not compacted and not flat:
            return self.spark.createDataFrame([], RESPONSE_SCHEMA)
        df = self._scan(compacted, flat, prune_signatures)
        # TTL purge predicate (reference: purge_at checked on every
        # validate_request, resources/base.py:47-53).
        return df.where(F.col("purge_at").isNull() | (F.col("purge_at") > self._now_expr()))

    def append(self, responses: DataFrame) -> None:
        """Commit one response batch atomically (stage hidden, rename to
        publish) — safe under concurrent appenders, see class docstring."""
        import uuid

        os.makedirs(self.path, exist_ok=True)
        token = uuid.uuid4().hex
        staging = os.path.join(self.path, f".staging-{token}")
        responses.select([f.name for f in RESPONSE_SCHEMA.fields]) \
            .write.mode("overwrite").parquet(staging)
        os.replace(staging, os.path.join(self.path, f"batch-{token}"))

    def latest(self, prune_signatures: list[str] | None = None) -> DataFrame:
        """One row per signature (most recent fetch wins)."""
        from pyspark.sql.window import Window

        df = self.read(prune_signatures)
        w = Window.partitionBy("signature").orderBy(F.desc("fetched_at"))
        return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")

    def compact(self, latest_only: bool = False) -> int:
        """Fold every committed entry into one signature-prefix-
        partitioned ``compact-*`` dir, dropping expired rows (and, with
        ``latest_only``, superseded fetches of re-fetched signatures).
        Returns the number of old entries removed. Safe to race
        appenders; see the class docstring for the crash/read story.
        (The flat-dataset analogue lives in files.compact_parquet; the
        cache needs the partitioned layout for pruned lookups, so it
        compacts itself.)"""
        import shutil
        import uuid

        compacted, flat = self._entries()  # snapshot BEFORE reading
        entries = compacted + flat
        if not entries:
            return 0
        df = self._scan(compacted, flat).where(
            F.col("purge_at").isNull()
            | (F.col("purge_at") > self._now_expr()))
        if latest_only:
            from pyspark.sql.window import Window

            w = Window.partitionBy("signature").orderBy(F.desc("fetched_at"))
            df = (df.withColumn("__rn", F.row_number().over(w))
                  .where(F.col("__rn") == 1).drop("__rn"))
        df = df.withColumn(
            "sig_prefix", F.concat(F.lit("p"), F.substring("signature", 1, 2)))
        token = uuid.uuid4().hex
        staging = os.path.join(self.path, f".staging-compact-{token}")
        # One file per occupied partition: repartition on the partition
        # column so each write task owns whole prefixes.
        df.repartition("sig_prefix").write.mode("overwrite") \
            .partitionBy("sig_prefix").parquet(staging)
        if not any(n.startswith("sig_prefix=") for n in os.listdir(staging)):
            # Everything was expired: nothing to publish, just drop the
            # old entries and the empty staging dir.
            shutil.rmtree(staging, ignore_errors=True)
        else:
            os.replace(staging, os.path.join(self.path, f"compact-{token}"))
        for entry in entries:
            if os.path.isdir(entry):
                shutil.rmtree(entry, ignore_errors=True)
            else:
                try:
                    os.unlink(entry)
                except OSError:
                    pass
        return len(entries)

    def vacuum(self) -> None:
        """Compact (dropping expired rows) and sweep crashed-append/
        crashed-compact staging dirs. Single-writer maintenance: unlike
        bare :meth:`compact` this also deletes hidden staging dirs,
        which could be another writer's in-flight stage — do not run
        concurrently with appenders or compactors. Crash-safe: the
        rewrite publishes via the same stage-then-rename protocol, so
        the old data stays intact until the new copy is committed
        (ADVICE r5 — the old in-place overwrite lost the whole cache on
        a mid-vacuum crash)."""
        import shutil

        if not os.path.exists(self.path):
            return
        self.compact()
        for name in os.listdir(self.path):
            if name.startswith(".staging-"):
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)


def _fetch_worker(
    transport: Transport,
    backoff_delays: list[int],
    interval_duration: float,
    purge_after_seconds: float | None,
    follow: tuple[Callable[[dict], dict | None], int] | None = None,
    now_fn: Callable[[], "object"] | None = None,
):
    """Build the mapInPandas worker for cache misses.

    With ``follow=(next_request, limit)`` each miss is treated as the
    head of a continuation chain and the worker walks the chain in
    place, emitting one response row per page up to ``limit`` pages —
    the reference's ``send_iterator`` shape (http/iterators.py:29-52):
    pages of one link are inherently serial, so looping them inside the
    worker costs nothing in parallelism, while distinct links still fan
    out across partitions.
    """
    import pandas as pd

    follow_fn, follow_limit = follow if follow is not None else (None, 1)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            rows = []
            for rec in batch.to_dict("records"):
                req = {k: rec.get(k) for k in ("signature", "method", "url", "headers", "data")}
                head_sig = req["signature"]
                # A resumed chain carries its remaining page budget so the
                # walk never overshoots the caller's continuation_limit.
                budget = rec.get(BUDGET_COL)
                page_cap = follow_limit if budget is None or pd.isna(budget) \
                    else min(follow_limit, int(budget))
                pages = 0
                while req is not None:
                    headers = json.loads(req["headers"]) if req.get("headers") else {}
                    data = json.loads(req["data"]) if req.get("data") else None
                    status, head, body = transport(req["method"], req["url"], headers, data)
                    # Backoff retry on throttle/transient statuses
                    # (reference schedule: [2,4,8,16]s on 420/429/5xx).
                    for delay in backoff_delays:
                        if status not in RETRY_STATUSES:
                            break
                        time.sleep(delay)
                        status, head, body = transport(req["method"], req["url"], headers, data)
                    now = (pd.Timestamp(now_fn()) if now_fn is not None
                           else pd.Timestamp.utcnow().tz_localize(None))
                    row = {
                        **req,
                        "status": status,
                        "head": json.dumps(head),
                        "body": body,
                        "fetched_at": now,
                        "purge_at": (now + pd.Timedelta(seconds=purge_after_seconds))
                        if purge_after_seconds else None,
                        "chain": head_sig,
                    }
                    rows.append(row)
                    if interval_duration:
                        time.sleep(interval_duration / 1000.0)
                    pages += 1
                    if follow_fn is None or pages >= page_cap:
                        break
                    req = follow_fn(row)
            yield pd.DataFrame(rows, columns=[f.name for f in RESPONSE_SCHEMA.fields])

    return run


def fetch(
    requests_df: DataFrame,
    cache: ResourceCache,
    transport: Transport = requests_transport,
    cache_only: bool = False,
    backoff_delays: list[int] | None = None,
    interval_duration: float = 0,
    purge_after_seconds: float | None = None,
    fetch_partitions: int | None = None,
    follow: tuple[Callable[[dict], dict | None], int] | None = None,
    return_responses: bool = True,
    now_fn: Callable[[], "object"] | None = None,
    unique_signatures: bool = False,
    n_requests: int | None = None,
) -> DataFrame | None:
    """The cached fetch operator: requests in, responses out.

    * cache hits come from the cache table join (no network);
    * misses are fetched partition-parallel and appended to the cache
      BEFORE the combined result is returned (crash-safe idempotence);
    * ``cache_only=True`` raises if any request misses (the reference's
      fixture-replay mode, used for hermetic tests).

    The returned DataFrame is read back from the cache table, so
    downstream stages re-read parquet instead of re-firing transports.

    ``return_responses=False`` returns ``None`` after the cache append:
    callers that read the cache relationally afterwards (the pagination
    drivers) skip the followed-page signature collect entirely, so no
    driver structure scales with the page count.

    ``unique_signatures=True`` promises the caller already deduplicated
    signatures (e.g. a driver-walker frontier keyed by signature) — the
    per-call dedup exchange is skipped (r13, guide §2.4: the pipeline
    family's per-run cost is driver-round/job count, and every removed
    exchange is one fewer AQE materialization job). ``n_requests`` is
    the driver-known request count; on the cold path (empty cache →
    every request is a miss) it replaces the miss-count job.
    """
    spark = requests_df.sparkSession
    req_fields = [f.name for f in REQUEST_SCHEMA.fields]
    # Persist: the request frame is consumed by the hit-join, the miss
    # anti-join, the fetch worker and the final semi-join — without a
    # persist each consumer re-runs the (often Python) request-building
    # lineage. Small frame by construction (requests, not payloads).
    if BUDGET_COL in requests_df.columns:
        if unique_signatures:
            requests_df = requests_df.select(req_fields + [BUDGET_COL]).persist()
        else:
            # Converging chains may reach one signature with different
            # remaining budgets — the generous one wins (never
            # undershoots; the walk still caps at follow's limit).
            requests_df = requests_df.select(req_fields + [BUDGET_COL]).groupBy("signature").agg(
                *[F.first(f).alias(f) for f in req_fields if f != "signature"],
                F.max(BUDGET_COL).alias(BUDGET_COL),
            ).persist()
    elif unique_signatures:
        requests_df = requests_df.select(req_fields).persist()
    else:
        requests_df = requests_df.select(req_fields) \
            .dropDuplicates(["signature"]).persist()
    try:
        # Driver-bounded request batches collect their signature set
        # once so the two cache scans below — hit lookup and final
        # result — prune to the matching sig_prefix partitions instead
        # of scanning the whole cache table. GATED on the lookup paying
        # for itself (compacted layout, or a flat cache grown past
        # FLAT_PRUNE_MIN_DIRS): on a fresh flat cache pruning
        # eliminates nothing, while the probe job plus a
        # thousands-of-literals isin() at Catalyst time cost real
        # seconds per fetch (measured 2.4x on the many-small-fetch
        # growth chain). The LIMIT probe caps driver memory for huge
        # seed frames, which fall back to the join path either way.
        prune_sigs = None
        if cache.wants_pruned_lookups():
            probe = (requests_df.select("signature")
                     .limit(FETCH_PRUNE_THRESHOLD + 1).collect())
            prune_sigs = ([r["signature"] for r in probe]
                          if len(probe) <= FETCH_PRUNE_THRESHOLD else None)
        # Only SUCCESSFUL cached responses count as hits (reference
        # generic.py:133-135: a cached resource is returned only when
        # resource.success; failures are re-sent). Otherwise a transient
        # 5xx cached with purge_after_seconds=None would shadow the
        # signature forever and the document could never be enriched.
        # cache_only replay is the exception: nothing can be re-sent, so
        # serve whatever is cached (hermetic fixture mode).
        cold = cache.is_empty()
        if cold:
            # Cold path: nothing committed yet, every request is a miss —
            # skip the hit-lookup join (and its latest() window) entirely.
            misses = requests_df.persist()
        else:
            hit_src = cache.latest(prune_signatures=prune_sigs)
            if not cache_only:
                hit_src = hit_src.where(success_predicate())
            cached = hit_src.select("signature").withColumn("__hit", F.lit(True))
            # Persisted: consumed by the count below AND the fetch job —
            # without it the cache anti-join (and any Python request lineage
            # above the persist boundary) runs twice per fetch call.
            misses = (
                requests_df.join(cached, "signature", "left")
                .where(F.col("__hit").isNull())
                .drop("__hit")
            ).persist()
        extra_sigs: list = []
        try:
            # Cold path with a driver-known request count: every request
            # IS a miss, so the count job is pure overhead (r13).
            n_misses = (n_requests if cold and n_requests is not None
                        else misses.count())
            if n_misses:
                if cache_only:
                    raise LookupError(
                        f"cache_only fetch: {n_misses} request(s) not in cache at {cache.path}")
                # The transport is latency-bound, so parallelism is set by the
                # MISS COUNT, not by upstream partitioning (which AQE may have
                # coalesced to 1): one partition per ~8 requests up to the
                # cluster width. Callers with rate limits or slow endpoints
                # override via fetch_partitions.
                parts = fetch_partitions or min(
                    spark.sparkContext.defaultParallelism, -(-n_misses // 8)
                )
                misses_parts = misses.repartition(parts)
                fetched = misses_parts.mapInPandas(
                    _fetch_worker(transport,
                                  backoff_delays if backoff_delays is not None else [2, 4, 8, 16],
                                  interval_duration, purge_after_seconds, follow,
                                  now_fn=now_fn if now_fn is not None else cache.now_fn),
                    schema=RESPONSE_SCHEMA,
                )
                if follow is not None and return_responses:
                    # Persist BEFORE append: the followed-page signatures are
                    # collected afterwards (bounded by the batch's page
                    # count; pagination drivers that don't need the
                    # responses frame pass return_responses=False and this
                    # collect never happens), and an unpersisted
                    # mapInPandas lineage would re-fire every transport on
                    # that collect.
                    fetched = fetched.persist()
                    try:
                        cache.append(fetched)
                        extra_sigs = [r["signature"] for r in fetched.select("signature").collect()]
                    finally:
                        fetched.unpersist()
                else:
                    cache.append(fetched)
        finally:
            misses.unpersist()  # append() consumed it eagerly
        if not return_responses:
            return None
        if prune_sigs is not None:
            # Pruned point lookup: the signature set IS the filter, so
            # the result needs no semi-join at all — the cache scan
            # reads only the matching sig_prefix partitions (plus any
            # not-yet-compacted batch dirs).
            return cache.latest(
                prune_signatures=sorted(set(prune_sigs) | set(extra_sigs)))
        sigs = requests_df.select("signature").dropDuplicates(["signature"])
        if extra_sigs:
            spark_local = spark.createDataFrame([(s,) for s in set(extra_sigs)], "signature string")
            sigs = sigs.unionByName(spark_local).dropDuplicates(["signature"])
        # Eager snapshot of the (tiny: signatures only) frame so the
        # request-building lineage and its persisted RDD can be released
        # now instead of leaking until executor storage evicts them.
        sigs = sigs.localCheckpoint(eager=True)
        return cache.latest().join(sigs, "signature", "left_semi")
    finally:
        requests_df.unpersist()
