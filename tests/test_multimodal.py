"""Multimodal operator tests.

The reference's multimodal surface is hash-addressed file downloads
(datagrowth/resources/http/files.py:18-120) and Tika binary-document
extraction (datagrowth/vendors/apache/tika/resources.py:36-120); here
the assets are first-class binary columns. The decode step is the
documented deterministic fake codec — these tests verify the Spark
plumbing (schemas, binary handling, mapInPandas batching, JVM frame
slicing) and the documented formulas.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators import multimodal as MM

TEXTS = [
    (0, "hello world, this is a tiny document"),
    (1, "b" * 200),
    (2, "abcdefgh" * 40),  # 320 bytes -> 5 full 64-byte frames
    (3, "x"),
]


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    return MM.synthesize_media(df, text_col="text", id_col="doc_id", kind=MM.VIDEO)


def test_synthesize_schema_and_metadata(media):
    assert [f.name for f in media.schema.fields] == ["asset_id", "content", "media"]
    assert dict(media.dtypes)["content"] == "binary"
    rows = {r.asset_id: r for r in media.collect()}
    assert bytes(rows[0].content) == TEXTS[0][1].encode()
    assert rows[1].media.size_bytes == 200
    assert rows[1].media.kind == MM.VIDEO
    assert rows[1].media.format == "mjpeg"


def test_decode_images_formulas(media):
    out = {r.asset_id: r for r in MM.decode_images(media).collect()}
    for doc_id, text in TEXTS:
        size = len(text)
        r = out[doc_id]
        assert r.width == 64 + size % 512
        assert r.height == 64 + (size * 7) % 512
        assert r.channels == 3
        expected = int(hashlib.md5(text.encode()).hexdigest()[:8], 16) % 256
        assert r.mean_pixel == expected


def test_unknown_codec_raises(media):
    with pytest.raises(ValueError):
        MM.decode_images(media, codec="pillow")


def test_pil_codec_gated_on_import(media):
    # Pillow is an optional dependency: importable -> real codec runs;
    # missing -> a clear ImportError at plan-build time, not a worker crash.
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(ImportError, match="Pillow"):
            MM.decode_images(media, codec="pil")
        assert MM.available_codec() == "fake"
    else:
        assert MM.available_codec() == "pil"


def test_pil_codec_roundtrip():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (10, 4), color=(8, 8, 8)).save(buf, format="PNG")
    w, h, ch, mean = MM._PilCodec.decode(buf.getvalue())
    assert (w, h, ch, mean) == (10, 4, 3, 8)
    resized = MM._PilCodec.resize(buf.getvalue(), 5, 2)
    assert MM._PilCodec.decode(resized)[:2] == (5, 2)
    feats = MM._PilCodec.features(buf.getvalue(), 6)
    assert len(feats) == 6 and all(0.0 <= f < 1.0 for f in feats)


def test_resize_truncates_and_recomputes_metadata(media):
    out = {r.asset_id: r for r in MM.resize_images(media, 8, 8).collect()}
    assert bytes(out[1].content) == b"b" * 64
    assert out[1].media.size_bytes == 64
    # shorter-than-budget assets pass through whole
    assert bytes(out[3].content) == b"x"
    assert out[3].media.size_bytes == 1


def test_sample_frames_jvm_path(media):
    frames = MM.sample_frames(media, frame_size=64, every=4)
    rows = sorted(
        ((r.asset_id, r.frame_no, bytes(r.frame)) for r in frames.collect())
    )
    # asset 3 (1 byte) has no full frame; asset 0 (36 bytes) none either
    assert {a for a, _, _ in rows} == {1, 2}
    # asset 2: 320 bytes -> frames 0..4, sampled 0 and 4
    a2 = [(n, f) for a, n, f in rows if a == 2]
    assert [n for n, _ in a2] == [0, 4]
    text = TEXTS[2][1].encode()
    assert a2[0][1] == text[0:64]
    assert a2[1][1] == text[256:320]
    # no Python stage: plan contains no mapInPandas / BatchEvalPython
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_media_features_formula_and_shape(media):
    out = {r.asset_id: r.features for r in MM.media_features(media, dim=8).collect()}
    assert all(len(v) == 8 for v in out.values())
    text = TEXTS[0][1].encode()
    d0 = hashlib.md5(text + b"0").hexdigest()
    d1 = hashlib.md5(text + b"1").hexdigest()
    expected = [int(d[i:i + 8], 16) / 2 ** 32 for d in (d0, d1) for i in range(0, 32, 8)]
    assert out[0] == pytest.approx(expected, abs=0)
    assert all(0.0 <= x < 1.0 for v in out.values() for x in v)
