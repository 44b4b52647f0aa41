"""Dataset versioning + growth strategies + driver task DAG (P9-P11).

A Dataset is a declarative pipeline spec; a DatasetWarehouse materializes
its versions as parquet snapshot directories:

    <root>/<dataset_signature>/v<NNN>/<collection>.parquet
    <root>/<dataset_signature>/meta.json   (versions, states, is_current)

Growth strategies (reference dataset.py:302-332, constants.py:11-15):

* FREEZE — immutable once complete; growing again raises DGGrowthFrozen.
* RESET  — every grow starts a new empty version.
* REVISE — clone the current version's collections, then re-run over it.
* STACK  — new version per grow; all versions stay queryable, no
  ``is_current`` flip.

Concurrency: meta commits are optimistic — every commit CASes on a
``generation`` counter, and writers that lose re-read and merge
(``commit_entry``) or re-claim the next version slot (``grow``). Two
simultaneous ``grow()`` drivers therefore serialize their claims instead
of silently dropping each other's versions — the analogue of the
reference's ``select_for_update`` row locks (resources/growth.py:154-170).
WHERE the CAS happens is pluggable (``plans/committers.py``): the default
:class:`~datagrowth_spark.plans.committers.PosixMetaCommitter` uses an
O_EXCL lockfile + atomic replace on local/NFS filesystems, and
:class:`~datagrowth_spark.plans.committers.ObjectStoreMetaCommitter`
commits with one conditional put (GCS generation preconditions / S3
If-Match) for the S3/GCS warehouses a 100 TB deployment actually uses —
same generation token, same retry protocol, both race-tested.

The task DAG: each collection declares named tasks with ``depends_on``
and ``checks``; the driver scheduler loops (depth-bounded) running every
task whose dependencies succeeded and which hasn't succeeded itself,
until a fixpoint — the set-oriented form of the reference's recursive
Celery dispatchers (tasks/base.py:27-66). Task callables are resolved by
name through the registry so specs stay JSON-serializable.
"""

from __future__ import annotations

import json
import os
import shutil
from enum import Enum
from typing import Any, Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datagrowth_spark.core.registry import Registry, get_registry
from datagrowth_spark.datatypes.collection import Collection
from datagrowth_spark.datatypes.document import task_result_success
from datagrowth_spark.sources.signatures import make_signature


class GrowthStrategy(str, Enum):
    FREEZE = "freeze"
    RESET = "reset"
    REVISE = "revise"
    STACK = "stack"


class GrowthState(str, Enum):
    PENDING = "pending"
    GROWING = "growing"
    COMPLETE = "complete"
    ERROR = "error"


class DGGrowthFrozen(Exception):
    pass


class DGConcurrentWrite(Exception):
    """meta.json changed between read and commit (lost-update guard)."""


class Dataset:
    """Declarative pipeline definition (the reference's Dataset class
    constants, dataset.py:22-54)."""

    NAME: str = "dataset"
    GROWTH_STRATEGY: GrowthStrategy = GrowthStrategy.REVISE
    COLLECTION_IDENTIFIER: str | None = "id"
    COLLECTION_REFEREE: str | None = None
    SEEDING_PHASES: list[dict] = []
    DOCUMENT_TASKS: dict[str, dict] = {}
    COLLECTION_TASKS: dict[str, dict] = {}
    #: Ordered post-processing chain applied to grown documents (P12,
    #: reference dataset.py:50 + processors/base.py:64-95): registry
    #: names of DataFrame -> DataFrame transforms, e.g. enumerate /
    #: filter processors (tests/django_project/processors/processors/
    #: output.py:10-27). Chained with df.transform — stays one lazy
    #: Catalyst plan, no materialization between phases.
    HARVEST_PHASES: list[str] = []
    #: Version-level tasks (reference DATASET_VERSION_TASKS,
    #: tasks/dataset_version.py:13-48): run last, after collection
    #: tasks; callable(collection, entry) -> dict|None merged into the
    #: version entry (e.g. final validation, publishing markers).
    DATASET_VERSION_TASKS: dict[str, dict] = {}

    def __init__(self, config: dict | None = None) -> None:
        self.config = config or {}

    @property
    def signature(self) -> str:
        """Deterministic identity from name + sorted config (the
        reference's get_signature_from_input, dataset.py:116-131)."""
        keys = sorted(k for k in self.config if not k.startswith("$"))
        parts = [f"{k}={self.config[k]}" for k in keys]
        return f"{self.NAME}-" + make_signature("&".join(parts))[:16]

    def weed_document(self, content: dict) -> bool:
        """Per-document delete predicate applied on regrow (default: keep)."""
        return False


class DatasetWarehouse:
    def __init__(self, spark: SparkSession, root: str,
                 registry: Registry | None = None,
                 committer: "MetaCommitter | None" = None) -> None:
        from datagrowth_spark.plans.committers import PosixMetaCommitter

        self.spark = spark
        self.root = root
        self.registry = registry or get_registry()
        self.committer = committer or PosixMetaCommitter(root)
        os.makedirs(root, exist_ok=True)

    # -- metadata ---------------------------------------------------------
    def _meta_path(self, dataset: Dataset) -> str:
        """Default (POSIX) location of the meta document — collection
        parquet always lives under ``root`` regardless of which
        committer holds the metadata."""
        return os.path.join(self.root, dataset.signature, "meta.json")

    def read_meta(self, dataset: Dataset) -> dict:
        return self.committer.read(dataset.signature)

    def write_meta(self, dataset: Dataset, meta: dict,
                   expected_generation: int | None = None) -> None:
        """Commit ``meta`` atomically via the configured committer. With
        ``expected_generation`` this is a compare-and-swap: if another
        writer bumped the generation since the caller's
        :meth:`read_meta`, raise :class:`DGConcurrentWrite` instead of
        silently dropping that writer's versions (the reference
        serializes growers with DB row locks, resources/growth.py:
        154-170; the committers give the same guarantee on a filesystem
        or an object store — see plans/committers.py)."""
        self.committer.commit(dataset.signature, meta, expected_generation)

    def commit_entry(self, dataset: Dataset, entry: dict,
                     flip_current: bool = False, retries: int = 5) -> None:
        """Merge ONE version entry into fresh meta under CAS + retry —
        the write path for everything after the initial version claim,
        so a concurrent grower's claims are never clobbered by our
        stale snapshot (the r4-flagged lost-update)."""
        import time

        for attempt in range(retries):
            if attempt:
                # Linear backoff between CAS retries so contending
                # writers (or a crashed writer's stale-lock window)
                # don't exhaust the budget in milliseconds (ADVICE r5).
                time.sleep(0.05 * attempt)
            meta = self.read_meta(dataset)
            gen = meta.get("generation", 0)
            versions = meta["versions"]
            for i, v in enumerate(versions):
                if v["version"] == entry["version"]:
                    versions[i] = entry
                    break
            else:
                versions.append(entry)
                versions.sort(key=lambda v: v["version"])
            if flip_current:
                for v in versions:
                    v["is_current"] = False
                entry["is_current"] = True
            try:
                self.write_meta(dataset, meta, expected_generation=gen)
                return
            except DGConcurrentWrite:
                continue
        raise DGConcurrentWrite(
            f"could not commit version {entry['version']} of "
            f"{dataset.signature} after {retries} attempts")

    def current_version(self, dataset: Dataset) -> dict | None:
        versions = self.read_meta(dataset)["versions"]
        current = [v for v in versions if v.get("is_current")]
        return current[-1] if current else (versions[-1] if versions else None)

    def _version_dir(self, dataset: Dataset, version: int) -> str:
        return os.path.join(self.root, dataset.signature, f"v{version:03d}")

    # -- collection io ----------------------------------------------------
    # Collection data inside a version dir is SNAPSHOTTED: each save
    # publishes a fresh immutable `<name>-s<K>.parquet` dir (staged
    # hidden, renamed to commit) and loads pin the highest committed K
    # for the life of the returned DataFrame. Version dirs are NOT
    # immutable — a regrow (retry) or REVISE task loop re-saves into the
    # same version — and Spark reads files lazily over the whole query,
    # so the old overwrite-in-place could yank files out from under an
    # in-flight reader holding "the current collection". Snapshots fence
    # that: a reader's pinned path survives at least one concurrent
    # grow (the previous snapshot is kept as a grace generation;
    # earlier ones are garbage-collected on the next save). Legacy flat
    # `<name>.parquet` layouts read as snapshot 0.

    def _snapshots(self, vdir: str, name: str) -> list[tuple[int, str]]:
        """Committed (K, path) snapshots for one collection, ascending."""
        out = []
        flat = os.path.join(vdir, f"{name}.parquet")
        if os.path.exists(flat):
            out.append((0, flat))
        if os.path.isdir(vdir):
            prefix = f"{name}-s"
            for entry in os.listdir(vdir):
                if entry.startswith(prefix) and entry.endswith(".parquet"):
                    try:
                        k = int(entry[len(prefix):-len(".parquet")])
                    except ValueError:
                        continue
                    out.append((k, os.path.join(vdir, entry)))
        return sorted(out)

    def load_collection(self, dataset: Dataset, version: int, name: str = "main") -> Collection:
        snaps = self._snapshots(self._version_dir(dataset, version), name)
        if snaps:
            return Collection.from_file(self.spark, snaps[-1][1], name=name,
                                        identifier=dataset.COLLECTION_IDENTIFIER,
                                        referee=dataset.COLLECTION_REFEREE)
        return Collection(self.spark, name=name,
                          identifier=dataset.COLLECTION_IDENTIFIER,
                          referee=dataset.COLLECTION_REFEREE)

    def save_collection(self, dataset: Dataset, version: int, collection: Collection) -> None:
        vdir = self._version_dir(dataset, version)
        snaps = self._snapshots(vdir, collection.name)
        k = snaps[-1][0] + 1 if snaps else 1
        path = os.path.join(vdir, f"{collection.name}-s{k}.parquet")
        # Stage hidden then rename: the collection df may itself read
        # the previous snapshot (REVISE/regrow lineage), and a crashed
        # write must never leave a half-visible snapshot. The staging
        # name carries a uuid — two retry-grows can legitimately hold
        # the SAME version and compute the same next K, and a shared
        # staging path would let their Spark jobs clobber each other's
        # task files mid-write; distinct dirs reduce the race to the
        # final rename, where exactly one publisher wins.
        import uuid as _uuid

        tmp = os.path.join(
            vdir, f".staging-{_uuid.uuid4().hex}-{collection.name}-s{k}.parquet")
        collection.df.write.mode("overwrite").parquet(tmp)
        try:
            os.replace(tmp, path)
        except OSError as exc:
            # Only a rename onto an EXISTING non-empty target means "the
            # other retry-grow published this K first" (its snapshot is
            # a committed, complete write of the same version — drop
            # ours and read theirs; never half-visible either way).
            # Every other rename failure (EACCES, EXDEV, EIO...) is an
            # infrastructure fault: swallowing it would discard the
            # fresh snapshot AND repoint the collection at a path that
            # does not exist, failing later with a misleading read
            # error. Verify the winner actually exists for the same
            # reason.
            import errno

            if exc.errno not in (errno.ENOTEMPTY, errno.EEXIST) \
                    or not os.path.exists(path):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
        collection._df = self.spark.read.parquet(path)
        # GC everything older than the PREVIOUS snapshot: readers pinned
        # to K-1 survive this save; readers pinned earlier have had a
        # full grow cycle to finish.
        for old_k, old_path in snaps[:-1]:
            if os.path.isdir(old_path):
                shutil.rmtree(old_path, ignore_errors=True)
            else:
                try:
                    os.unlink(old_path)
                except OSError:
                    pass
        # Crashed writers leave `.staging-*` dirs (invisible to reads
        # but never re-used now that names carry a uuid): sweep any
        # stale enough that no legitimate in-flight write can still own
        # them. Staleness = one hour of INACTIVITY — the newest mtime
        # anywhere under the dir, not the top-level dir's. A Spark
        # parquet write keeps landing task files under _temporary/
        # without touching the top-level mtime, so age-since-creation
        # would rmtree a long-running (>1h) write mid-flight; a live
        # write refreshes some file every few seconds, a crashed one
        # never does.
        import time as _time

        cutoff = _time.time() - 3600
        for entry in os.listdir(vdir):
            if not entry.startswith(".staging-"):
                continue
            stale = os.path.join(vdir, entry)
            try:
                newest = os.path.getmtime(stale)
                for root, _dirs, files in os.walk(stale):
                    newest = max(newest, os.path.getmtime(root))
                    for name in files:
                        # A file vanishing mid-walk (task commit renames)
                        # raises OSError → outer except skips the sweep:
                        # the dir is demonstrably active.
                        newest = max(
                            newest, os.path.getmtime(os.path.join(root, name)))
                if newest < cutoff:
                    shutil.rmtree(stale, ignore_errors=True)
            except OSError:
                pass

    # -- grow -------------------------------------------------------------
    def grow(
        self,
        dataset: Dataset,
        seed_collection: Callable[[Collection], Collection] | None = None,
        strategy: GrowthStrategy | None = None,
        retry: bool = False,
    ) -> dict:
        """One growth run; returns the updated version metadata entry.

        ``seed_collection`` receives the working Collection (empty, or a
        clone of current for REVISE) and returns it grown — typically a
        :class:`SeedingProcessor` followed by :class:`GrowthProcessor`
        runs; kept as a callable so the warehouse stays agnostic of the
        pipeline's internals.
        """
        strategy = strategy or dataset.GROWTH_STRATEGY
        # Claim a version slot under CAS: a concurrent grow() reading
        # the same meta loses the race, re-reads, and claims the next
        # slot — no read-modify-write can drop its versions anymore.
        import time

        clone_from = None
        for _attempt in range(5):
            if _attempt:
                time.sleep(0.05 * _attempt)  # CAS backoff (ADVICE r5)
            meta = self.read_meta(dataset)
            gen = meta.get("generation", 0)
            versions = meta["versions"]
            currents = [v for v in versions if v.get("is_current")]
            current = currents[-1] if currents else (
                versions[-1] if versions else None)

            if strategy == GrowthStrategy.FREEZE and current and not retry:
                if current.get("state") == GrowthState.COMPLETE:
                    raise DGGrowthFrozen(
                        f"dataset {dataset.signature} is frozen "
                        f"(version {current['version']} complete)"
                    )

            if retry and current:
                version = current["version"]
                entry = current
            else:
                version = (current["version"] + 1) if current else 1
                entry = {"version": version, "state": GrowthState.GROWING,
                         "is_current": False, "task_results": {}, "errors": {}}
                meta["versions"].append(entry)
                clone_from = (current["version"]
                              if strategy == GrowthStrategy.REVISE and current
                              else None)
            entry["state"] = GrowthState.GROWING
            try:
                self.write_meta(dataset, meta, expected_generation=gen)
                break
            except DGConcurrentWrite:
                continue
        else:
            raise DGConcurrentWrite(
                f"could not claim a version of {dataset.signature}")
        if clone_from is not None:
            self._clone_version(dataset, clone_from, version)

        collection = self.load_collection(dataset, version)
        if strategy == GrowthStrategy.REVISE:
            collection = self._revise_collection(dataset, collection)

        try:
            if seed_collection is not None:
                collection = seed_collection(collection)
            collection = self.run_tasks(dataset, collection)
            collection, collection_task_results = self.run_collection_tasks(dataset, collection)
            collection = self.harvest(dataset, collection)
            self.save_collection(dataset, version, collection)
            entry["task_results"] = self.evaluate(dataset, collection)
            entry["task_results"].update(collection_task_results)
            entry["task_results"].update(
                self.run_version_tasks(dataset, collection, entry))
            entry["state"] = GrowthState.COMPLETE
        except Exception as exc:  # noqa: BLE001 — recorded, then re-raised
            entry["state"] = GrowthState.ERROR
            entry.setdefault("errors", {})["grow"] = f"{type(exc).__name__}: {exc}"
            self.commit_entry(dataset, entry)
            raise

        self.commit_entry(dataset, entry,
                          flip_current=strategy != GrowthStrategy.STACK)
        return entry

    def _revise_collection(self, dataset: Dataset, collection: Collection) -> Collection:
        """Prepare a cloned version for regrow — relationally, documents
        kept intact (reference dataset.py:180-210):

        * weeded documents are anti-joined out (``weed_document`` runs
          Arrow-batched over content dicts, producing only an identity
          mask — the corpus never crosses the driver);
        * failed document tasks are invalidated: their ``task_results``
          entry and ``derivatives`` phase drop so the task DAG re-runs
          them (storage.py:119-128);
        * documents with any missing-or-failed task get
          ``pending_at=now, finished_at=NULL`` (prepare_processing,
          storage.py:130-134); fully-successful documents keep their
          bookkeeping untouched.
        """
        df = collection.df

        # Weed only when the dataset actually overrides the predicate —
        # the default keeps everything and costs nothing.
        if type(dataset).weed_document is not Dataset.weed_document:
            weed_fn = dataset.weed_document
            mask_schema = "identity string, weed boolean"

            def mask(batches):
                import pandas as pd

                from datagrowth_spark.datatypes.document import document_content

                for batch in batches:
                    rows = []
                    for rec in batch.to_dict("records"):
                        rows.append({"identity": rec.get("identity"),
                                     "weed": bool(weed_fn(document_content(rec)))})
                    yield pd.DataFrame(rows, columns=["identity", "weed"])

            weeded = (
                df.select("identity", "properties", "derivatives")
                .mapInPandas(mask, schema=mask_schema)
                .where(F.col("weed") & F.col("identity").isNotNull())
                .select("identity")
            )
            df = df.join(weeded, "identity", "left_anti")

        tasks = list(dataset.DOCUMENT_TASKS)
        if tasks:
            names = F.array(*[F.lit(n) for n in tasks])
            ok = lambda v: F.get_json_object(v, "$.success").cast("boolean") == F.lit(True)  # noqa: E731
            results = F.coalesce(F.col("task_results"),
                                 F.from_json(F.lit("{}"), "map<string,string>"))
            # Invalidate failed results (keep entries that either aren't
            # declared tasks or succeeded).
            new_results = F.map_filter(
                results, lambda k, v: ~F.array_contains(names, k) | ok(v))
            # Drop the derivative phase of every invalidated task.
            invalidated = lambda k: (F.array_contains(names, k)  # noqa: E731
                                     & results[k].isNotNull() & ~ok(results[k]))
            new_derivatives = F.when(
                F.col("derivatives").isNotNull(),
                F.map_filter(F.col("derivatives"), lambda k, v: ~invalidated(k)),
            ).otherwise(F.col("derivatives"))
            # prepare_processing for any document with work left to do.
            needs = F.lit(False)
            for name in tasks:
                success = task_result_success(results, name)
                needs = needs | success.isNull() | (success == F.lit(False))
            df = (
                df.withColumn("pending_at",
                              F.when(needs, F.current_timestamp()).otherwise(F.col("pending_at")))
                .withColumn("finished_at",
                            F.when(needs, F.lit(None).cast("timestamp"))
                            .otherwise(F.col("finished_at")))
                .withColumn("derivatives", new_derivatives)
                .withColumn("task_results", new_results)
            )
        collection._df = df
        return collection

    def _clone_version(self, dataset: Dataset, src: int, dst: int) -> None:
        """Copy each collection's LATEST snapshot into the new version
        (as its snapshot 1) — never older snapshots or crashed staging
        dirs."""
        src_dir = self._version_dir(dataset, src)
        dst_dir = self._version_dir(dataset, dst)
        if not os.path.exists(src_dir):
            return
        names = set()
        for entry in os.listdir(src_dir):
            if entry.startswith(".") or not entry.endswith(".parquet"):
                continue
            stem = entry[:-len(".parquet")]
            base, sep, suffix = stem.rpartition("-s")
            if sep and suffix.isdigit():
                names.add(base)
            else:
                names.add(stem)
        os.makedirs(dst_dir, exist_ok=True)
        for name in names:
            snaps = self._snapshots(src_dir, name)
            if snaps:
                shutil.copytree(
                    snaps[-1][1],
                    os.path.join(dst_dir, f"{name}-s1.parquet"),
                    dirs_exist_ok=True)

    # -- task DAG ---------------------------------------------------------
    def run_tasks(self, dataset: Dataset, collection: Collection,
                  max_depth: int = 10) -> Collection:
        """Driver scheduler: run document tasks until fixpoint.

        A task spec: {"depends_on": [task names], "checks": [callable
        names], "run": "registry_name"}; the callable gets
        (collection_df, pending_mask_column) and returns the new df with
        ``task_results[name]`` written for processed rows. Simpler tasks
        can be plain column transforms registered under the name.
        """
        tasks = dataset.DOCUMENT_TASKS
        if not tasks:
            return collection
        for _depth in range(max_depth):
            progressed = False
            for name, spec in tasks.items():
                df = collection.df
                pending = task_result_success("task_results", name).isNull()
                for dep in spec.get("depends_on", []):
                    pending = pending & (task_result_success("task_results", dep) == F.lit(True))
                n_pending = df.where(pending).count()
                if n_pending == 0:
                    continue
                runner = self.registry.get(spec["run"])
                collection._df = runner(df, pending, name)
                progressed = True
            if not progressed:
                break
        return collection

    def run_collection_tasks(
        self, dataset: Dataset, collection: Collection
    ) -> tuple[Collection, dict]:
        """Collection-level tasks after the document fixpoint (reference
        dispatch order: document → collection → dataset_version tasks,
        tasks/collection.py:47-84).

        Spec: {"run": registry_name, "depends_on": [document task
        names]} — the runner gets and returns the Collection; a task is
        skipped (recorded success=None) when any dependency document
        task has failures, mirroring the reference's dependency checks.
        """
        results: dict[str, dict] = {}
        for name, spec in dataset.COLLECTION_TASKS.items():
            key = f"collection:{name}"
            doc_tallies = self.evaluate(dataset, collection)
            blocked = any(
                doc_tallies.get(dep, {}).get("fail", 0) > 0
                or doc_tallies.get(dep, {}).get("success", 0) == 0
                for dep in spec.get("depends_on", [])
            )
            if blocked:
                results[key] = {"success": None, "skipped": True}
                continue
            try:
                collection = self.registry.get(spec["run"])(collection)
                results[key] = {"success": True}
            except Exception as exc:  # noqa: BLE001 — recorded per task
                results[key] = {"success": False,
                                "error": f"{type(exc).__name__}: {exc}"}
        return collection, results

    def run_version_tasks(self, dataset: Dataset, collection: Collection,
                          entry: dict) -> dict:
        """Version-level tasks, last in the dispatch order (reference
        tasks/dataset_version.py:13-48). Runner may return a dict that
        merges into the version entry."""
        results: dict[str, dict] = {}
        for name, spec in dataset.DATASET_VERSION_TASKS.items():
            key = f"version:{name}"
            try:
                update = self.registry.get(spec["run"])(collection, entry)
                if isinstance(update, dict):
                    entry.update(update)
                results[key] = {"success": True}
            except Exception as exc:  # noqa: BLE001 — recorded per task
                results[key] = {"success": False,
                                "error": f"{type(exc).__name__}: {exc}"}
        return results

    def harvest(self, dataset: Dataset, collection: Collection) -> Collection:
        """Apply the dataset's HARVEST_PHASES transform chain (P12)."""
        df = collection.df
        for name in dataset.HARVEST_PHASES:
            df = df.transform(self.registry.get(name))
        collection._df = df
        return collection

    def diff_versions(self, dataset: Dataset, old: int, new: int,
                      name: str = "main") -> DataFrame:
        """Document-level diff of two stored versions — see
        :func:`version_diff` for the plan."""
        return version_diff(
            self.load_collection(dataset, old, name).df,
            self.load_collection(dataset, new, name).df,
            key="identity",
            fingerprint=F.xxhash64(F.to_json(F.map_entries("properties"))),
        )

    def evaluate(self, dataset: Dataset, collection: Collection) -> dict:
        """Per-task success/fail/skipped tallies (version.py:50-69)."""
        out: dict[str, dict] = {}
        df = collection.df
        for name in dataset.DOCUMENT_TASKS:
            success = task_result_success("task_results", name)
            counts = df.agg(
                F.sum(F.when(success == True, 1).otherwise(0)).alias("success"),  # noqa: E712
                F.sum(F.when(success == False, 1).otherwise(0)).alias("fail"),  # noqa: E712
                F.sum(F.when(success.isNull(), 1).otherwise(0)).alias("skipped"),
            ).collect()[0]
            out[name] = {"success": counts["success"] or 0, "fail": counts["fail"] or 0,
                         "skipped": counts["skipped"] or 0}
        return out


def version_diff(old: DataFrame, new: DataFrame, key: str,
                 fingerprint: Column | str) -> DataFrame:
    """Document-level diff between two dataset versions: ``(key,
    status)`` with status ``added`` / ``removed`` / ``changed`` /
    ``unchanged``.

    The reference keeps whole generations side by side
    (DatasetVersion, version.py:26-40) but offers no diff; at 100 TB a
    diff is how a pipeline decides what to re-process after a revise.
    Plan: fingerprint each side (one narrow projection per version — at
    scale this prunes to the key + fingerprint input columns only),
    then one full outer hash join on the key. No sort, no collect;
    output is one row per key in either version.
    """
    fp = F.col(fingerprint) if isinstance(fingerprint, str) else fingerprint
    o = old.select(F.col(key).alias("key"), fp.alias("__old_fp"))
    n = new.select(F.col(key).alias("key"), fp.alias("__new_fp"))
    joined = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("__old_fp").isNull(), F.lit("added"))
        .when(F.col("__new_fp").isNull(), F.lit("removed"))
        .when(F.col("__old_fp") != F.col("__new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select("key", status.alias("status"))
