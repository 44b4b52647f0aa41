"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's multimodal surface is file downloads stored by content
hash (``datagrowth/resources/http/files.py:18-120``) plus Tika text
extraction from binary documents (``datagrowth/vendors/apache/tika/
resources.py:36-120``, payload hashing of raw bytes in
``datagrowth/signatures.py:69-82``). This module gives those assets a
first-class columnar shape and the decode/feature plumbing a training
pipeline needs at 100 TB:

* media rows: ``content BINARY`` + a typed ``media`` metadata struct —
  the parquet-friendly layout (metadata columns prune; blobs are only
  read by stages that touch ``content``);
* decode / resize / feature-extract as Arrow-batched ``mapInPandas``
  stages behind a ``codec`` switch: ``pil`` drives real Pillow when it
  is importable (optional dependency — ffmpeg/torchaudio would slot in
  the same way), and ``fake`` is a clearly-marked DETERMINISTIC
  stand-in (documented formulas below) that keeps every query
  oracle-checkable in environments without codec libraries; the
  Spark-side plumbing (schema, batching, partitioning) is identical on
  both paths and is what the tests/oracles verify;
* video frame sampling as a pure JVM-side explode of binary slices —
  no Python in that hot path at all.

Deterministic fake-decode formulas (mirrored by the DuckDB oracles in
``queries.py``; all arithmetic on ``size_bytes = octet_length(content)``):

* ``width  = 64 + size_bytes % 512``
* ``height = 64 + (size_bytes * 7) % 512``
* ``channels = 3``
* ``mean_pixel = int(md5(content)[:8], 16) % 256``
* feature ``j`` of :func:`media_features` = window ``j % 4`` of
  ``md5(content || ascii(str(j // 4)))`` — each md5 digest yields four
  8-hex-char windows, each divided by 2**32 into [0, 1). The chunk
  suffix is ASCII (not packed binary) precisely so a SQL engine can
  reproduce it with ``md5(text || CAST(c AS VARCHAR))``.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE = "image"
AUDIO = "audio"
VIDEO = "video"

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("size_bytes", T.LongType()),
])

DECODED_IMAGE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("channels", T.LongType()),
    T.StructField("mean_pixel", T.LongType()),
])

_FAKE_FORMATS = {IMAGE: "png", AUDIO: "wav", VIDEO: "mjpeg"}


def synthesize_media(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kind: str = IMAGE,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic binary assets from a text column (utf-8 bytes).

    The test tables carry no blobs, so — exactly like the reference's
    deterministic entity generators used for end-to-end tests
    (``tests/django_project/project/entities/generators.py:10-27``) —
    assets are synthesized reproducibly from existing data. The text is
    ASCII, so byte offsets equal character offsets and every downstream
    byte computation has an exact SQL oracle.

    Output: (asset_id, content BINARY, media STRUCT, *keep_cols).
    """
    content = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit(kind).alias("kind"),
        F.lit(_FAKE_FORMATS[kind]).alias("format"),
        F.octet_length(content).cast("long").alias("size_bytes"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        content.alias("content"),
        meta.alias("media"),
        *[F.col(c) for c in keep_cols],
    )


class _FakeCodec:
    """Deterministic byte-arithmetic stand-in (formulas in the module
    docstring, mirrored by the SQL oracles)."""

    @staticmethod
    def decode(b: bytes) -> tuple[int, int, int, int]:
        import hashlib

        size = len(b)
        digest = int(hashlib.md5(bytes(b)).hexdigest()[:8], 16)
        return 64 + size % 512, 64 + (size * 7) % 512, 3, digest % 256

    @staticmethod
    def resize(b: bytes, target_w: int, target_h: int) -> bytes:
        return bytes(b)[: target_w * target_h]

    @staticmethod
    def features(b: bytes, dim: int) -> list[float]:
        import hashlib

        out: list[float] = []
        chunk = 0
        while len(out) < dim:
            digest = hashlib.md5(bytes(b) + str(chunk).encode()).hexdigest()
            for i in range(0, 32, 8):
                if len(out) >= dim:
                    break
                out.append(int(digest[i:i + 8], 16) / 2 ** 32)
            chunk += 1
        return out


class _PilCodec:
    """Real image codec via Pillow (optional dependency)."""

    @staticmethod
    def decode(b: bytes) -> tuple[int, int, int, int]:
        import io

        import numpy as np
        from PIL import Image

        img = Image.open(io.BytesIO(bytes(b)))
        mean = int(np.asarray(img.convert("L"), dtype="float64").mean())
        return img.width, img.height, len(img.getbands()), mean

    @staticmethod
    def resize(b: bytes, target_w: int, target_h: int) -> bytes:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(bytes(b)))
        fmt = img.format or "PNG"
        buf = io.BytesIO()
        img.resize((target_w, target_h)).save(buf, format=fmt)
        return buf.getvalue()

    @staticmethod
    def features(b: bytes, dim: int) -> list[float]:
        # Grayscale thumbnail flattened to `dim` values in [0, 1) — the
        # cheap classical baseline; a learned encoder slots in the same
        # way (bytes in, fixed-dim floats out).
        import io

        import numpy as np
        from PIL import Image

        img = Image.open(io.BytesIO(bytes(b))).convert("L")
        arr = np.asarray(img.resize((dim, 1)), dtype="float64").ravel()
        return list(arr / 256.0)


def _get_codec(codec: str):
    """Resolve a codec name, failing fast on the driver.

    ``fake`` is always available (deterministic, oracle-checkable);
    ``pil`` degrades to an ImportError only when Pillow is genuinely
    missing. The returned object ships to workers inside the closure.
    """
    if codec == "fake":
        return _FakeCodec
    if codec == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "codec='pil' requires Pillow; install it or use codec='fake'"
            ) from exc
        return _PilCodec
    raise ValueError(f"unknown codec {codec!r}; available: 'fake', 'pil'")


def available_codec() -> str:
    """Best codec importable in this environment ('pil' when Pillow is
    installed, else the deterministic 'fake')."""
    try:
        import PIL  # noqa: F401

        return "pil"
    except ImportError:
        return "fake"


def decode_images(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode image blobs to per-image pixel statistics.

    Arrow-batched ``mapInPandas``: each Python worker receives whole
    record batches (content + asset_id only — column pruning keeps the
    metadata struct out of the transfer), decodes every blob, and emits
    one stats row per asset. Partitioning is preserved — no shuffle; at
    100 TB this stage scales linearly with executor count and the blob
    bytes cross into Python exactly once.

    Output: DECODED_IMAGE_SCHEMA rows (asset_id, width, height,
    channels, mean_pixel).
    """
    impl = _get_codec(codec)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for batch in batches:
            stats = batch["content"].map(impl.decode)
            yield pd.DataFrame({
                "asset_id": batch["asset_id"],
                "width": stats.map(lambda s: s[0]),
                "height": stats.map(lambda s: s[1]),
                "channels": stats.map(lambda s: s[2]),
                "mean_pixel": stats.map(lambda s: s[3]),
            })

    return df.select("asset_id", "content").mapInPandas(run, DECODED_IMAGE_SCHEMA)


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  codec: str = "fake") -> DataFrame:
    """Resize image blobs; same mapInPandas shape as :func:`decode_images`.

    The fake codec truncates/keeps bytes to ``target_w * target_h`` as a
    stand-in for re-encoding, so output sizes are deterministic and the
    metadata struct is recomputed honestly from the new content.

    Output: (asset_id, content, media) with media.size_bytes updated.
    """
    impl = _get_codec(codec)
    out_schema = T.StructType([
        T.StructField("asset_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media", MEDIA_META_SCHEMA),
    ])

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for batch in batches:
            resized = batch["content"].map(lambda b: impl.resize(b, target_w, target_h))
            yield pd.DataFrame({
                "asset_id": batch["asset_id"],
                "content": resized,
                "media": [
                    {"kind": IMAGE, "format": _FAKE_FORMATS[IMAGE], "size_bytes": len(b)}
                    for b in resized
                ],
            })

    return df.select("asset_id", "content").mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, frame_size: int = 64, every: int = 4) -> DataFrame:
    """Sample every Nth fixed-size frame from video blobs — pure JVM path.

    A "video" is a concatenation of ``frame_size``-byte frames (the
    container-parsing stand-in). Frame extraction is expressed entirely
    with built-in array/binary functions (sequence → transform →
    posexplode → substring), so it runs inside whole-stage codegen with
    zero Python involvement — at 100 TB this is a narrow map stage.
    Only full frames are emitted (the tail remainder is dropped).

    Output: (asset_id, frame_no, frame BINARY) where frame_no is the
    index within the source video (0, every, 2*every, ...).
    """
    n_frames = (F.octet_length("content") / frame_size).cast("long")
    indices = F.when(
        n_frames > 0, F.sequence(F.lit(0).cast("long"), n_frames - 1, F.lit(every).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    exploded = df.select(
        "asset_id", "content", F.explode(indices).alias("frame_no")
    )
    frame = F.expr(f"substring(content, cast(frame_no * {frame_size} + 1 as int), {frame_size})")
    return exploded.select("asset_id", "frame_no", frame.alias("frame"))


def media_features(df: DataFrame, dim: int = 8, codec: str = "fake") -> DataFrame:
    """Fixed-dim float feature vector per asset (the embed step).

    Arrow-batched ``mapInPandas``; the fake extractor derives ``dim``
    doubles in [0, 1) from successive 8-hex-char windows of
    md5(content || str(chunk)) — deterministic, uniform-ish, cheap, and
    exactly reproducible in SQL (see module docstring). Output vectors
    feed directly into ``operators.similarity`` (top-k / near-dup), which
    is the point: one pipeline from blob to ANN.

    Output: (asset_id, features ARRAY<DOUBLE>).
    """
    impl = _get_codec(codec)
    out_schema = T.StructType([
        T.StructField("asset_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for batch in batches:
            yield pd.DataFrame({
                "asset_id": batch["asset_id"],
                "features": batch["content"].map(lambda b: impl.features(b, dim)),
            })

    return df.select("asset_id", "content").mapInPandas(run, out_schema)


def media_metadata_col(content: Column, kind: str) -> Column:
    """Metadata struct for a binary column, derived JVM-side."""
    return F.struct(
        F.lit(kind).alias("kind"),
        F.lit(_FAKE_FORMATS[kind]).alias("format"),
        F.octet_length(content).cast("long").alias("size_bytes"),
    )
