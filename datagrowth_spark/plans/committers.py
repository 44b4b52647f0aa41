"""Pluggable commit protocols for DatasetWarehouse metadata.

The warehouse serializes concurrent ``grow()`` drivers with optimistic
concurrency on a ``generation`` counter inside ``meta.json`` (the
filesystem analogue of the reference's ``select_for_update`` row locks,
``/root/reference/datagrowth/resources/growth.py:154-170``). WHERE that
compare-and-swap actually happens is storage-specific, so it lives
behind :class:`MetaCommitter`:

* :class:`PosixMetaCommitter` — local/NFS filesystems. An
  ``O_CREAT|O_EXCL`` lockfile bounds the compare window and an atomic
  ``os.replace`` publishes; a crashed writer's stale lock is broken by
  rename (which succeeds for exactly one waiter).
* :class:`ObjectStoreMetaCommitter` — S3/GCS-style stores, where none
  of O_EXCL / rename / replace exist but a CONDITIONAL PUT does. The
  commit is one ``put_if(key, data, expected_store_generation)``: GCS
  ``x-goog-if-generation-match`` (0 for must-not-exist), S3
  ``If-Match`` on the ETag / ``If-None-Match: *``. No lock, no lease,
  no rename — the store's own precondition check IS the CAS, so two
  drivers racing a 100 TB warehouse commit serialize exactly as the
  POSIX backend's lockfile serializes them.

Both backends raise :class:`~datagrowth_spark.plans.dataset.
DGConcurrentWrite` on a lost race; ``grow()``/``commit_entry`` retry by
re-reading and re-merging, so the protocol above them is identical and
the interleaved-grow race tests run against either.

The storage primitive for the object-store path is
:class:`ConditionalStore` — ``get`` returns ``(bytes, generation)`` and
``put_if`` atomically writes iff the stored generation still matches.
:class:`InMemoryConditionalStore` implements it for tests and as the
executable spec; :class:`FileConditionalStore` implements it against a
real filesystem (hard-link CAS — atomic across processes, not just
threads) so the full race suite runs on two genuinely different
mediums; a production binding maps it 1:1 onto the boto3 /
google-cloud-storage calls named above (not imported here — this repo
has no cloud SDK dependency).
"""

from __future__ import annotations

import json
import os
import threading
import time


class StorePreconditionFailed(Exception):
    """The conditional put's generation precondition did not hold."""


class ConditionalStore:
    """Minimal object-store contract: versioned get + conditional put.

    ``generation`` is the STORE's monotonically-increasing version for
    the key (GCS object generation, S3 ETag standing in for one), not
    the meta document's own counter — the committer checks both.
    """

    def get(self, key: str) -> tuple[bytes, int] | None:
        """Return (data, generation) or None when the key is absent."""
        raise NotImplementedError

    def put_if(self, key: str, data: bytes, expected: int | None) -> int:
        """Write ``data`` iff the key's current generation == ``expected``
        (None = key must not exist). Returns the new generation; raises
        :class:`StorePreconditionFailed` otherwise. MUST be atomic —
        this call is the entire concurrency story."""
        raise NotImplementedError


class InMemoryConditionalStore(ConditionalStore):
    """Reference ConditionalStore: a dict guarded by one lock, so
    ``put_if`` is atomic exactly the way a real store's conditional
    write is. Used by the race tests to validate the protocol without
    a cloud dependency."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._data: dict[str, tuple[bytes, int]] = {}

    def get(self, key: str) -> tuple[bytes, int] | None:
        with self._lock:
            return self._data.get(key)

    def put_if(self, key: str, data: bytes, expected: int | None) -> int:
        with self._lock:
            current = self._data.get(key)
            current_gen = current[1] if current is not None else None
            if current_gen != expected:
                raise StorePreconditionFailed(
                    f"{key}: generation {current_gen} != expected {expected}")
            new_gen = (current_gen or 0) + 1
            self._data[key] = (data, new_gen)
            return new_gen


class FileConditionalStore(ConditionalStore):
    """Filesystem-backed :class:`ConditionalStore` that emulates object
    -store generation semantics with hard links — a third race-suite
    backend (and a real cross-PROCESS one: the in-memory spec's lock
    only serializes threads, while ``os.link`` is atomic across any
    writers sharing the filesystem).

    Layout: each key is a directory holding immutable generation files
    ``g<N>``. ``put_if(expected=N)`` writes a hidden temp file, then
    ``os.link``\\ s it to ``g<N+1>`` — link-into-place either creates
    the name or fails ``EEXIST`` atomically, so exactly one writer per
    generation wins; the loser maps ``EEXIST`` to
    :class:`StorePreconditionFailed` exactly like a conditional PUT's
    412. ``get`` reads the highest generation file (never modified
    after link, so reads are torn-write-free without any locking).

    Old generations are pruned behind a keep-window. Pruning re-opens
    an ABA hazard — a very slow writer could link a BELOW-max
    generation number whose file was pruned — so after linking, the
    writer re-lists and self-reverts, but ONLY when the slot was
    provably pruned out (``max > new_gen + KEEP_GENERATIONS``: a vacant
    below-max slot can only come from pruning, which keeps a full
    window above it). A mere ``max > new_gen`` is a fast follower that
    already chained from this writer's committed generation — reverting
    then would falsely fail a durable, observed write (ADVICE r7). In
    the true pruned-slot case the file is below the keep window, hence
    invisible to readers and to other writers' expected-generation
    reads: the unlink races nothing except a reader's listing, which
    :meth:`get` handles by retrying on FileNotFoundError.
    """

    #: generations retained behind the max; deep enough that a reader's
    #: chosen max is never pruned out from under its open().
    KEEP_GENERATIONS = 8

    def __init__(self, root: str) -> None:
        self.root = root

    def _dir(self, key: str) -> str:
        return os.path.join(self.root, key)

    @staticmethod
    def _gens(d: str) -> list[int]:
        try:
            names = os.listdir(d)
        except FileNotFoundError:
            return []
        return sorted(int(n[1:]) for n in names
                      if n.startswith("g") and n[1:].isdigit())

    def get(self, key: str) -> tuple[bytes, int] | None:
        d = self._dir(key)
        # Retry on FileNotFoundError (ADVICE r7): between listing and
        # open a concurrent writer's pruned-slot revert can unlink the
        # file this reader chose; re-list and pick the new max. Bounded:
        # generations only grow, so a retry always sees progress.
        for _ in range(8):
            gens = self._gens(d)
            if not gens:
                return None
            n = gens[-1]
            try:
                with open(os.path.join(d, f"g{n}"), "rb") as fh:
                    return fh.read(), n
            except FileNotFoundError:
                continue
        raise StorePreconditionFailed(
            f"{key}: max generation kept vanishing across 8 re-lists")

    def put_if(self, key: str, data: bytes, expected: int | None) -> int:
        import uuid as _uuid

        d = self._dir(key)
        os.makedirs(d, exist_ok=True)
        gens = self._gens(d)
        current = gens[-1] if gens else None
        if current != expected:
            raise StorePreconditionFailed(
                f"{key}: generation {current} != expected {expected}")
        new_gen = (current or 0) + 1
        tmp = os.path.join(d, f".tmp-{_uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        target = os.path.join(d, f"g{new_gen}")
        link_time = time.time()
        try:
            os.link(tmp, target)
        except FileExistsError as exc:
            raise StorePreconditionFailed(
                f"{key}: generation {new_gen} already committed") from exc
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        # Post-link staleness check (see class docstring): revert ONLY
        # when the slot was provably pruned out from under us. A vacant
        # below-max slot implies pruning, which requires
        # max >= new_gen + KEEP_GENERATIONS + 1 — merely seeing
        # latest[-1] > new_gen means a fast follower already chained
        # from OUR committed generation (it read g{new_gen} as max),
        # and unlinking it would falsely fail a durable, observed write
        # (caller retry double-applies) and crash readers that chose it
        # (ADVICE r7, high). Never unlink a generation that was max at
        # link time.
        latest = self._gens(d)
        if latest and latest[-1] > new_gen + self.KEEP_GENERATIONS:
            # Residual ABA guard (ADVICE r8): the deep-max condition also
            # fires when MORE than KEEP_GENERATIONS followers commit inside
            # this writer's post-link window — a legitimate max that was
            # observed and chained from, not a pruned slot. Discriminate by
            # the direct successor: a g{new_gen+1} written AT OR AFTER our
            # link can only have chained from our committed generation (its
            # writer read g{new_gen} as max, then wrote its payload), so the
            # write is durable and observed — skip the revert. A SURVIVING
            # successor in the true pruned-slot case belongs to the old
            # chain and strictly predates our link; the same-filesystem
            # mtime (CLOCK_REALTIME, ns granularity) tells them apart.
            succ = os.path.join(d, f"g{new_gen + 1}")
            try:
                chained = os.stat(succ).st_mtime >= link_time
            except OSError:
                chained = False
            if chained:
                return new_gen
            try:
                os.unlink(target)
            except OSError:
                pass
            raise StorePreconditionFailed(
                f"{key}: generation {new_gen} landed on a pruned slot "
                f"(max now {latest[-1]})")
        for g in latest:
            if g < new_gen - self.KEEP_GENERATIONS:
                try:
                    os.unlink(os.path.join(d, f"g{g}"))
                except OSError:
                    pass
        return new_gen


def _empty_meta(signature: str) -> dict:
    return {"signature": signature, "versions": []}


class MetaCommitter:
    """Reads and CAS-commits one dataset's metadata document."""

    def read(self, signature: str) -> dict:
        raise NotImplementedError

    def commit(self, signature: str, meta: dict,
               expected_generation: int | None = None) -> None:
        """Persist ``meta``, bumping ``meta['generation']``. With
        ``expected_generation``, fail with ``DGConcurrentWrite`` if
        another writer committed since the caller's :meth:`read`."""
        raise NotImplementedError


class PosixMetaCommitter(MetaCommitter):
    """meta.json under ``<root>/<signature>/`` with an O_EXCL lockfile
    bounding the compare window and atomic ``os.replace`` publishing.

    Lock bounds: a meta.json write is milliseconds, so a lock older
    than ``LOCK_STALE_S`` is a crashed writer and gets broken. The
    acquire deadline EXCEEDS the stale threshold (ADVICE r5): otherwise
    no waiter arriving just after a crash could outlast the threshold,
    and every commit in the crash window would fail instead of one of
    them breaking the dead lock. Staleness is judged by lockfile mtime
    — clock-skewed NFS writers can have a live lock broken, which costs
    availability only: the generation CAS still rejects the second
    writer, never loses an update.
    """

    LOCK_STALE_S = 10.0
    LOCK_WAIT_S = 15.0

    def __init__(self, root: str) -> None:
        self.root = root

    def meta_path(self, signature: str) -> str:
        return os.path.join(self.root, signature, "meta.json")

    def read(self, signature: str) -> dict:
        path = self.meta_path(signature)
        if not os.path.exists(path):
            return _empty_meta(signature)
        with open(path) as fh:
            return json.load(fh)

    def _acquire_lock(self, path: str) -> str:
        lock = path + ".lock"
        deadline = time.monotonic() + self.LOCK_WAIT_S
        while True:
            # Deadline first, every iteration: the stale-break and
            # lock-vanished paths used to `continue` past the check, so
            # lock churn (or an NFS getmtime that keeps raising) could
            # busy-loop the acquire arbitrarily past its budget.
            if time.monotonic() > deadline:
                from datagrowth_spark.plans.dataset import DGConcurrentWrite

                raise DGConcurrentWrite(
                    f"could not acquire commit lock {lock}") from None
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return lock
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(lock) > self.LOCK_STALE_S:
                        # Break via RENAME, not unlink: rename of one
                        # inode succeeds for exactly one waiter, so a
                        # slow breaker can never delete the fresh lock
                        # a faster waiter just created (two writers in
                        # the CAS window = the lost update returns).
                        import uuid as _uuid

                        broken = f"{lock}.broken-{_uuid.uuid4().hex}"
                        os.rename(lock, broken)
                        os.unlink(broken)
                        continue
                except OSError:
                    continue  # lock vanished/was broken by another waiter
                time.sleep(0.02)

    def commit(self, signature: str, meta: dict,
               expected_generation: int | None = None) -> None:
        from datagrowth_spark.plans.dataset import DGConcurrentWrite

        path = self.meta_path(signature)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        lock = self._acquire_lock(path)
        try:
            on_disk = self.read(signature).get("generation", 0)
            if expected_generation is not None and on_disk != expected_generation:
                raise DGConcurrentWrite(
                    f"meta generation moved {expected_generation} -> "
                    f"{on_disk} for {signature}")
            meta["generation"] = on_disk + 1
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(meta, fh, indent=2)
            os.replace(tmp, path)  # atomic is_current flip
        finally:
            try:
                os.unlink(lock)
            except OSError:
                pass


class ObjectStoreMetaCommitter(MetaCommitter):
    """Lock-free committer over a :class:`ConditionalStore`: the whole
    commit is ONE conditional put keyed on the store generation
    observed at read time, so any interleaved writer — even one whose
    process then crashes — fails the precondition instead of being
    silently overwritten. Nothing is ever left to clean up (no
    lockfile, no lease): a crashed writer simply never put.
    """

    def __init__(self, store: ConditionalStore, prefix: str = "meta/") -> None:
        self.store = store
        self.prefix = prefix

    def _key(self, signature: str) -> str:
        return f"{self.prefix}{signature}.json"

    def read(self, signature: str) -> dict:
        found = self.store.get(self._key(signature))
        if found is None:
            return _empty_meta(signature)
        return json.loads(found[0].decode())

    #: Unconditional (last-write-wins) commits re-read and re-put on a
    #: lost store race this many times — POSIX parity, where the
    #: lockfile makes every no-CAS commit eventually succeed.
    LWW_RETRIES = 16

    def commit(self, signature: str, meta: dict,
               expected_generation: int | None = None) -> None:
        from datagrowth_spark.plans.dataset import DGConcurrentWrite

        key = self._key(signature)
        # expected_generation=None is the last-write-wins contract: the
        # POSIX committer's lockfile makes that path always succeed, so
        # here a lost store race is retried against the fresh
        # generation instead of surfacing DGConcurrentWrite — the two
        # backends must behave identically above this interface.
        attempts = 1 if expected_generation is not None else self.LWW_RETRIES
        for attempt in range(attempts):
            found = self.store.get(key)
            store_gen = found[1] if found is not None else None
            current = json.loads(found[0].decode()) if found is not None \
                else _empty_meta(signature)
            current_gen = current.get("generation", 0)
            if (expected_generation is not None
                    and current_gen != expected_generation):
                raise DGConcurrentWrite(
                    f"meta generation moved {expected_generation} -> "
                    f"{current_gen} for {signature}")
            meta["generation"] = current_gen + 1
            try:
                self.store.put_if(key, json.dumps(meta, indent=2).encode(),
                                  expected=store_gen)
                return
            except StorePreconditionFailed as exc:
                if attempt == attempts - 1:
                    raise DGConcurrentWrite(
                        f"conditional put lost the race for {signature}: "
                        f"{exc}") from exc
                time.sleep(0.01 * attempt)
