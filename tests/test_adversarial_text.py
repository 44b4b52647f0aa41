"""Adversarial-input hardening for the text operator family.

The parquet fixtures are clean lowercase ASCII; real corpora ship
emoji, CJK, RTL marks, null-ish bytes, pathological whitespace, and
empty/huge documents. These tests assert the text operators neither
crash nor emit out-of-contract values on such input.
"""

import pytest

from pyspark.sql import functions as F

ADVERSARIAL = [
    (1, ""),                                     # empty
    (2, "   \t\n  "),                            # whitespace only
    (3, "héllo wörld héllo wörld héllo wörld"),  # accents, repetition
    (4, "日本語のテキスト 日本語のテキスト"),          # CJK, no ASCII letters
    (5, "🚀🚀🚀 emoji 🚀🚀🚀 storm 🚀🚀🚀"),        # surrogate-pair emoji
    (6, "a" * 10_000),                           # one huge token
    (7, ("word " * 2_000).strip()),              # one token repeated 2000x
    (8, "mixed العربية text עברית here"),         # RTL scripts
    (9, "null\x00byte and \x01control chars"),   # control characters
    (10, "'; DROP TABLE documents; --"),         # quoting hazards
]


@pytest.fixture()
def adv(spark):
    return spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")


def test_text_analysis_functions_survive(spark, adv):
    from datagrowth_spark.functions import text as TX

    out = adv.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.fingerprint("text").alias("fp"),
        TX.language_id("text").alias("lang"),
    ).collect()
    assert len(out) == len(ADVERSARIAL)
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_tokens"] == 0
    assert by_id[2]["n_tokens"] == 0
    assert by_id[7]["n_tokens"] == 2_000
    for r in out:
        assert r["fp"] is None or len(r["fp"]) == 32  # md5 or null, never garbage

def test_dedup_family_survives(spark, adv):
    from datagrowth_spark.operators.dedup import (
        exact_dedup, ngram_jaccard_pairs, ngram_novelty)

    assert exact_dedup(adv, "text", "doc_id").count() == len(ADVERSARIAL)
    # no crash; empty/short docs silently absent from gram-based outputs
    novelty = {r["doc_id"]: r for r in ngram_novelty(adv, n=3).collect()}
    assert 1 not in novelty and 2 not in novelty
    assert novelty[7]["n_grams"] == 1          # "word word word" distinct 3-gram
    assert 0.0 <= min(r["novelty"] for r in novelty.values())
    assert max(r["novelty"] for r in novelty.values()) <= 1.0
    ngram_jaccard_pairs(adv, n=3, threshold=0.1).collect()  # just: no crash


def test_entropy_and_self_dedup_shapes(spark, adv, tmp_path):
    """Run the two newest text queries over adversarial docs by pointing
    them at a parquet dir with the documents schema."""
    import os

    from datagrowth_spark.queries import q_text_char_entropy, q_text_self_dedup

    d = str(tmp_path / "advsf")
    os.makedirs(d, exist_ok=True)
    adv.select(
        "doc_id", "text", F.lit("xx").alias("lang"),
        F.lit("adv").alias("source"), F.length("text").alias("n_chars"),
    ).write.parquet(os.path.join(d, "documents.parquet"))

    ent = {r["doc_id"]: r for r in q_text_char_entropy(spark, d).collect()}
    assert 1 not in ent                         # empty doc excluded
    assert ent[6]["char_entropy"] == 0.0        # single repeated char
    assert all(r["char_entropy"] >= 0.0 for r in ent.values())

    sd = {r["doc_id"]: r for r in q_text_self_dedup(spark, d).collect()}
    assert 1 not in sd and 2 not in sd          # token-less docs excluded
    # doc 7: 2000 copies of "word" -> 250 blocks of 8, all identical
    assert sd[7]["n_blocks"] == 250 and sd[7]["n_dropped"] == 249
    assert sd[6]["n_blocks"] == 1 and sd[6]["n_dropped"] == 0


def test_pii_scan_survives(spark, adv):
    from datagrowth_spark.functions.pii import pii_count, redact_pii

    out = adv.select(
        "doc_id",
        pii_count("text", "email").alias("n_email"),
        redact_pii("text").alias("red"),
    ).collect()
    assert len(out) == len(ADVERSARIAL)
    assert all(r["n_email"] == 0 for r in out)
