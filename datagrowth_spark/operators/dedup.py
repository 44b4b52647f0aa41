"""Deduplication operators for large-scale document corpora.

All variants are pure DataFrame programs (no Python UDFs) designed
around shuffle discipline:

* exact / fingerprint — one hash-groupBy (single shuffle on the hash).
* n-gram Jaccard — shingle explode → self-join on shingle → per-pair
  count; the join key is the shingle hash so frequency skew can be
  capped with a document-frequency filter (stopword-shingle blowup
  guard), which is also what makes this survive 100 TB.
* MinHash + LSH — md5-based minhash signatures (engine-portable,
  deterministic), banded into LSH buckets; candidate pairs only join
  within a band bucket. Shuffle volume scales with bucket sizes, not
  with the corpus square.
* SimHash — 32-bit signature; near-dup pairs via identical signature
  (or small hamming distance using bit_count).

Reference had no dedup; these follow the standard MinHash/LSH
construction (Broder; see PAPERS.md) re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagrowth_spark.functions.text import fingerprint, md5_long, shingles, simhash


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups by content hash; keeps the minimum id.

    Returns one row per distinct content: (content_hash, keep_id, dup_count).
    """
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def fingerprint_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Vocabulary-fingerprint dup groups (order/punctuation-insensitive)."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def _shingle_frame(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity ≥ threshold.

    Plan shape: distinct shingles per doc → self-join on shingle
    (co-occurrence counts) → |A∩B| / (|A|+|B|−|A∩B|). ``max_shingle_df``
    drops shingles shared by more than N docs before the self-join — the
    skew guard that keeps the join linear-ish at scale.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6dp.
    """
    sh = _shingle_frame(df, text_col, id_col, n)
    if max_shingle_df is not None:
        keep = sh.groupBy("shingle").count().where(F.col("count") <= max_shingle_df).select("shingle")
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 16, n: int = 3) -> DataFrame:
    """MinHash signatures: mh_i = min over shingles of md5(i:shingle).

    md5-based so any engine reproduces the signature bit-for-bit —
    signatures are portable cache/compare keys across systems.
    Output: (id, mh_0 ... mh_{k-1}) as BIGINTs.
    """
    sh = _shingle_frame(df, text_col, id_col, n)
    aggs = [
        F.min(md5_long(F.concat_ws(":", F.lit(str(i)), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, verified by
    estimated Jaccard (fraction of agreeing minhashes).

    rows-per-band = num_hashes / bands; a pair is a candidate when all
    rows of at least one band agree (classic LSH S-curve). Estimated
    Jaccard over the full signature filters the candidates.
    Output: (id_a, id_b, est_jaccard).
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, num_hashes, n)
    mh_cols = [f"mh_{i}" for i in range(num_hashes)]

    band_frames = []
    for b in range(bands):
        band_cols = [F.col(c).cast("string") for c in mh_cols[b * rows:(b + 1) * rows]]
        key = F.md5(F.concat_ws(",", F.lit(str(b)), *band_cols))
        band_frames.append(sig.select(F.col("id"), key.alias("band_key")))
    banded = band_frames[0]
    for frame in band_frames[1:]:
        banded = banded.unionByName(frame)

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sig_a = sig.select(F.col("id").alias("id_a"), *[F.col(c).alias(f"a_{c}") for c in mh_cols])
    sig_b = sig.select(F.col("id").alias("id_b"), *[F.col(c).alias(f"b_{c}") for c in mh_cols])
    agree = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0) for c in mh_cols
    )
    return (
        candidates.join(sig_a, "id_a").join(sig_b, "id_b")
        .withColumn("est_jaccard", F.round(agree / F.lit(num_hashes), 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       bits: int = 32) -> DataFrame:
    """Per-document SimHash signature (32-bit, engine-portable)."""
    return df.select(F.col(id_col).alias("id"), simhash(text_col, bits).alias("simhash"))


def simhash_dup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      bits: int = 32, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs whose SimHash hamming distance ≤ max_hamming.

    Blocked on the top half of the signature (documents differing only
    in low bits still collide), then verified with bit_count(xor) —
    avoids the full cross join.
    """
    sig = simhash_signatures(df, text_col, id_col, bits)
    block = F.shiftright(F.col("simhash"), bits // 2)
    blocked = sig.withColumn("block", block)
    a = blocked.alias("a")
    b = blocked.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("hamming", F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))))
        .where(F.col("hamming") <= max_hamming)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "hamming")
    )
