"""Persist and reload trained models — the save/load half of the
trainer family (``logreg_train`` / ``unigram_train`` / ``bpe_train`` /
``wordpiece_train``).

A real pipeline trains a tokenizer or quality classifier ONCE and
applies it across many jobs and sessions; without persistence the only
way to reuse a model is to retrain it in the same SparkSession. This
module gives every trainer result a content-verified on-disk artifact,
following the engine's signature-store pattern
(``operators/sigstore.py``): an artifact is a DIRECTORY published by
stage-then-rename (a crash mid-save leaves only a hidden
``.staging-*`` dir that loaders never see), carrying a
``manifest.json`` whose sha256 content signature is re-derived and
verified on load — a corrupted or hand-edited artifact fails loudly
instead of silently scoring wrong.

Reference behavior anchor: content-addressed persistence of expensive
work is the reference's core architecture — request signatures
(``/root/reference/datagrowth/resources/utils.py`` via
``datagrowth/signatures.py:84-103``) key a cache of fetched resources
(``resources/storage/file_system.py:52-83``); here the expensive
artifact is a trained model instead of a fetched document, and the
signature guards integrity rather than identity.

Layout per model type (all driver-bounded payloads are canonical JSON
— sorted keys, compact separators — so the signature is stable across
sessions and platforms):

* **logreg** — ``model.json`` with the full ``w6`` weight vector
  (micro-units) and ``n_buckets``. Model-sized (≤ a few MB at
  fastText's 2M buckets), exactly the driver constant the in-session
  object holds.
* **unigram** — ``model.json`` with ``scores6`` / ``counts`` /
  ``totals`` / ``maxp``. Vocabulary-sized (a sentencepiece.model
  equivalent).
* **bpe** / **wordpiece** — ``merges.json`` (the ordered merge table,
  k rows — a merges.txt equivalent, signature-covered) plus a
  ``vocab/`` parquet dir written by Spark (vocabulary-sized, scale-
  safe to write and read on a cluster) whose content is covered by an
  order-independent ``bit_xor(xxhash64(...))`` fingerprint in the
  manifest. ``word_symbols`` is NOT persisted: it is corpus-vocabulary
  sized and exactly reproducible by replaying ``merges`` with
  :func:`~datagrowth_spark.operators.bpe.bpe_encode` (merge-replay is
  the definition of BPE encode, Sennrich et al. 2016 §3.2).

Loads are bit-equal: a reloaded logreg model scores every document to
the same 6dp probability on both carriers, a reloaded unigram model
produces identical Viterbi segmentations, and a reloaded merge table
produces identical encodes — pinned by round-trip tests
(tests/test_modelstore.py) and the ``*_reloaded`` oracle queries,
which share their oracle SQL verbatim with the in-session variants.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FORMAT = "datagrowth-spark-model/1"

MANIFEST = "manifest.json"


def _canonical(obj) -> bytes:
    return json.dumps(obj, sort_keys=True, separators=(",", ":")).encode()


def _sha256(payload: bytes) -> str:
    return hashlib.sha256(payload).hexdigest()


def _stage_dir(path: str) -> str:
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    return os.path.join(parent, f".staging-{uuid.uuid4().hex}")


def _publish(staging: str, path: str, overwrite: bool) -> None:
    """Atomic publish; with ``overwrite`` the old artifact is swapped
    out only after the new one is fully staged."""
    if os.path.exists(path):
        if not overwrite:
            shutil.rmtree(staging)
            raise FileExistsError(
                f"model artifact exists: {path} (pass overwrite=True)")
        old = path + f".old-{uuid.uuid4().hex}"
        os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old)
    else:
        os.rename(staging, path)


def _write_manifest(staging: str, manifest: dict) -> None:
    with open(os.path.join(staging, MANIFEST), "w") as fh:
        json.dump(manifest, fh, sort_keys=True, indent=1)


def _read_manifest(path: str, expect_type: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    if manifest.get("format") != FORMAT:
        raise ValueError(f"not a {FORMAT} artifact: {path}")
    if manifest.get("type") != expect_type:
        raise ValueError(
            f"artifact type {manifest.get('type')!r} != {expect_type!r}")
    return manifest


def _verify(name: str, recorded: str, derived: str, path: str) -> None:
    if recorded != derived:
        raise ValueError(
            f"{name} signature mismatch in {path}: manifest {recorded} "
            f"!= derived {derived} — artifact corrupted or edited")


# -- logreg ----------------------------------------------------------


def save_logreg_model(model, path: str, overwrite: bool = False) -> str:
    """Persist a :class:`~datagrowth_spark.operators.classifier.
    LogRegModel`; returns the payload sha256 (the content signature)."""
    payload = _canonical({"w6": model.w6, "n_buckets": model.n_buckets})
    sig = _sha256(payload)
    staging = _stage_dir(path)
    os.makedirs(staging)
    with open(os.path.join(staging, "model.json"), "wb") as fh:
        fh.write(payload)
    _write_manifest(staging, {
        "format": FORMAT, "type": "logreg", "sha256": sig,
        "n_buckets": model.n_buckets,
        "n_nonzero": sum(1 for w in model.w6 if w != 0)})
    _publish(staging, path, overwrite)
    return sig


def load_logreg_model(path: str):
    """Load a logreg artifact back into a fresh
    :class:`~datagrowth_spark.operators.classifier.LogRegModel`
    (signature-verified)."""
    from datagrowth_spark.operators.classifier import LogRegModel

    manifest = _read_manifest(path, "logreg")
    with open(os.path.join(path, "model.json"), "rb") as fh:
        payload = fh.read()
    _verify("model.json", manifest["sha256"], _sha256(payload), path)
    data = json.loads(payload)
    return LogRegModel(list(data["w6"]), int(data["n_buckets"]))


# -- unigram ---------------------------------------------------------


def save_unigram_model(result, path: str, overwrite: bool = False) -> str:
    """Persist a :class:`~datagrowth_spark.operators.unigram.
    UnigramTrainResult`'s model state (scores, counts, per-round
    totals, maxp); returns the payload sha256."""
    payload = _canonical({
        "scores6": result.scores6, "counts": result.counts,
        "totals": [list(t) for t in result.totals], "maxp": result._maxp})
    sig = _sha256(payload)
    staging = _stage_dir(path)
    os.makedirs(staging)
    with open(os.path.join(staging, "model.json"), "wb") as fh:
        fh.write(payload)
    _write_manifest(staging, {
        "format": FORMAT, "type": "unigram", "sha256": sig,
        "n_pieces": len(result.scores6), "maxp": result._maxp})
    _publish(staging, path, overwrite)
    return sig


def load_unigram_model(path: str):
    """Load a unigram artifact back into a fresh
    :class:`~datagrowth_spark.operators.unigram.UnigramTrainResult`
    (``caches`` empty — nothing to release) whose ``segment`` /
    ``pieces_df`` are bit-equal to the trained object's."""
    from datagrowth_spark.operators.unigram import UnigramTrainResult

    manifest = _read_manifest(path, "unigram")
    with open(os.path.join(path, "model.json"), "rb") as fh:
        payload = fh.read()
    _verify("model.json", manifest["sha256"], _sha256(payload), path)
    data = json.loads(payload)
    return UnigramTrainResult(
        scores6={p: int(s) for p, s in data["scores6"].items()},
        counts={p: int(c) for p, c in data["counts"].items()},
        totals=[tuple(t) for t in data["totals"]],
        caches=[], maxp=int(data["maxp"]))


# -- bpe / wordpiece -------------------------------------------------


def _vocab_fingerprint(vocab: DataFrame) -> int:
    """Order-independent content fingerprint of the (symbol, freq)
    vocabulary: ``bit_xor(xxhash64(symbol, freq))`` — one bounded
    aggregate, no ordering assumption on parquet layout, safe at any
    vocabulary size."""
    row = vocab.select(
        F.bit_xor(F.xxhash64(F.col("symbol"), F.col("freq")))
        .alias("fp")).collect()[0]
    return int(row["fp"]) if row["fp"] is not None else 0


def save_bpe_model(result, path: str, overwrite: bool = False) -> str:
    """Persist a :class:`~datagrowth_spark.operators.bpe.
    BPETrainResult`'s shippable state: the ordered merge table
    (signature-covered JSON) and the symbol vocabulary (parquet,
    fingerprint-covered). Returns the merges sha256."""
    merges_rows = [list(r) for r in result.merges.orderBy("step").collect()]
    merges_ddl = result.merges.schema.simpleString()
    payload = _canonical({"schema": merges_ddl, "rows": merges_rows})
    sig = _sha256(payload)
    staging = _stage_dir(path)
    os.makedirs(staging)
    with open(os.path.join(staging, "merges.json"), "wb") as fh:
        fh.write(payload)
    result.vocab.write.parquet(os.path.join(staging, "vocab"))
    _write_manifest(staging, {
        "format": FORMAT, "type": "bpe", "sha256": sig,
        "vocab_fingerprint": _vocab_fingerprint(result.vocab),
        "vocab_schema": result.vocab.schema.simpleString(),
        "n_merges": len(merges_rows)})
    _publish(staging, path, overwrite)
    return sig


def load_bpe_model(spark: SparkSession, path: str):
    """Load a BPE/WordPiece artifact back into a fresh
    :class:`~datagrowth_spark.operators.bpe.BPETrainResult`
    (``word_symbols`` is ``None`` — not persisted; replay ``merges``
    with ``bpe_encode`` to re-derive segmentations bit-equally)."""
    from datagrowth_spark.operators.bpe import BPETrainResult

    manifest = _read_manifest(path, "bpe")
    with open(os.path.join(path, "merges.json"), "rb") as fh:
        payload = fh.read()
    _verify("merges.json", manifest["sha256"], _sha256(payload), path)
    data = json.loads(payload)
    schema = data["schema"]
    if schema.startswith("struct<"):  # simpleString -> DDL
        schema = schema[len("struct<"):-1].replace(":", " ")
    merges = spark.createDataFrame(
        [tuple(r) for r in data["rows"]], schema)
    vocab = spark.read.parquet(os.path.join(path, "vocab"))
    _verify("vocab", str(manifest["vocab_fingerprint"]),
            str(_vocab_fingerprint(vocab)), path)
    return BPETrainResult(merges, vocab, None, [])


def merges_list(merges: DataFrame) -> list[tuple[str, str]]:
    """The ordered (lhs, rhs) list ``bpe_encode`` consumes, from a
    merge table (in-session or reloaded) — k driver-bounded rows."""
    return [(r["lhs"], r["rhs"])
            for r in merges.orderBy("step").collect()]
