"""File-download sink: content-addressed, hash-sharded blob store (R6).

The Spark form of ``HttpFileResource`` (reference
``datagrowth/resources/http/files.py:18-120``): response bodies stream
to ``MEDIA_ROOT/.../x/yz/`` hash-sharded directories and the row keeps
the relative path. Here the store is content-addressed outright (sha256
of the bytes — the hashing convention of the reference's binary
signatures, ``datagrowth/signatures.py:69-82``), which makes writes
idempotent: a re-fetch of identical content lands on the same path and
is skipped, so replayed jobs never duplicate blobs.

Scale design: the writer is a ``mapInPandas`` stage — each executor
writes its own partition's blobs directly to the (shared/object) store,
no driver involvement, no shuffle; two-level hex sharding (16 × 256
directories) keeps any single directory listing small at billions of
objects. Collisionless naming means concurrent writers are safe without
coordination (same content → same bytes at the same path).
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def shard_path(root: str, content_hash: str, ext: str = "") -> str:
    """``<root>/<h[0]>/<h[1:3]>/<hash><ext>`` — the reference's sharding
    shape (files.py default_image_upload_to), content-addressed."""
    return os.path.join(root, content_hash[0], content_hash[1:3], content_hash + ext)


def download_files(
    df: DataFrame,
    root: str,
    content_col: str = "body",
    id_col: str = "signature",
    ext: str = "",
) -> DataFrame:
    """Write each row's content into the blob store; return the manifest.

    Input: any DataFrame with an id column and a string/binary content
    column. Output: (id, path, content_hash, size_bytes, written) — one
    row per input row; ``written`` is False when the blob already
    existed (idempotent replay / cross-row dedup).
    """
    out_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("path", T.StringType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("written", T.BooleanType()),
    ])

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for batch in batches:
            rows = []
            for rec in batch.to_dict("records"):
                content = rec[content_col]
                if content is None:
                    rows.append({id_col: rec[id_col], "path": None, "content_hash": None,
                                 "size_bytes": None, "written": False})
                    continue
                blob = content.encode() if isinstance(content, str) else bytes(content)
                digest = hashlib.sha256(blob).hexdigest()
                path = shard_path(root, digest, ext)
                written = not os.path.exists(path)
                if written:
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    tmp = f"{path}.tmp.{os.getpid()}"
                    with open(tmp, "wb") as handle:
                        handle.write(blob)
                    os.replace(tmp, path)  # atomic publish
                rows.append({id_col: rec[id_col], "path": path, "content_hash": digest,
                             "size_bytes": len(blob), "written": written})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(id_col, content_col).mapInPandas(run, out_schema)
