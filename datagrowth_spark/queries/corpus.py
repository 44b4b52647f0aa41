"""Corpus query family.

Split from the single-module queries.py by scripts/split_queries.py (r12); definitions are verbatim.
"""

from __future__ import annotations
import os
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from datagrowth_spark.core.session import ensure_ts_readable
from datagrowth_spark.functions import text as TX
from datagrowth_spark.operators import dedup as DD
from datagrowth_spark.operators import multimodal as MM
from datagrowth_spark.operators import similarity as SIM
from datagrowth_spark.sources import testclient as TC
from datagrowth_spark.core.caching import persist_registered as _persist
from datagrowth_spark.core.caching import register as _register_cache
from datagrowth_spark.core.caching import release as release_caches
from datagrowth_spark.queries._shared import _NORM_TOKS_SQL, _RAW_TOKS_SQL, _SQL_SPLIT_CTES, _TOKS_SQL, _Z_BITS, _leakage_safe_split_frame, _t  # noqa: E501
from datagrowth_spark.queries.text import SQL_TEXT_QUALITY  # noqa: E501



def q_docs_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout key over (n_chars, token count): the multi-
    dimension clustering export key (sources/files.py
    ``add_zorder_key``/``write_zordered``). Each dimension is an exact
    NTILE(16) quantile tile — built through the batched sharded-rank
    machinery, never a global window — and the tiles bit-interleave
    into a Morton key, so files written in zkey order carry tight
    min/max stats on BOTH dimensions. Integer-only arithmetic end to
    end: the oracle reproduces the key bit-for-bit from SQL NTILE."""
    from datagrowth_spark.sources.files import add_zorder_key

    docs = _t(spark, sf_dir, "documents")
    # Persist (house pattern): the rank construction's sketch/counts
    # jobs would otherwise re-run the tokenize scan lineage per job.
    d = _persist(docs.select(
        "doc_id", "n_chars",
        TX.token_count("text").cast("long").alias("n_toks")))
    z = add_zorder_key(d, ["n_chars", "n_toks"], ("doc_id",), bits=_Z_BITS)
    return z.select("doc_id", "n_chars", "n_toks", "zkey")



def q_corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val/test split: every member of a near-dup
    cluster lands in the SAME split (split key = the cluster's
    canonical id, not the doc id), so train/eval leakage through
    near-duplicates is impossible by construction — the group-aware
    splitting rule real eval hygiene requires. Composition: jaccard
    pairs → connected components → salted-hash bucket of the group key.
    """
    return _leakage_safe_split_frame(spark, sf_dir)


SQL_CORPUS_SPLIT_LEAKAGE_SAFE = f"""
WITH {_SQL_SPLIT_CTES}
SELECT doc_id, group_key, split
FROM splits
"""



_SAMPLE_RATES = {"en": 60, "de": 40, "zh": 40}

_SAMPLE_DEFAULT = 20



def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sample: salted-md5 hash buckets,
    per-language keep rates. A pure projection+filter — zero shuffles,
    identical decisions at any partitioning/scale, replayable by the
    oracle engine (unlike seed-based sample()).
    """
    from datagrowth_spark.operators import sampling as SMP

    docs = _t(spark, sf_dir, "documents")
    out = SMP.stratified_sample(docs, _SAMPLE_RATES, "lang", "doc_id",
                                default_rate=_SAMPLE_DEFAULT)
    return out.select("doc_id", "lang", "bucket")



SQL_CORPUS_SAMPLE = f"""
WITH b AS (
  SELECT doc_id, lang,
         CAST(CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 100 AS INT) AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket FROM b
WHERE bucket < CASE lang WHEN 'en' THEN {_SAMPLE_RATES['en']}
                         WHEN 'de' THEN {_SAMPLE_RATES['de']}
                         WHEN 'zh' THEN {_SAMPLE_RATES['zh']}
                         ELSE {_SAMPLE_DEFAULT} END
"""



def q_corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-Res):
    200 documents drawn with probability proportional to length, as a
    pure function of the doc id — same sample on any partitioning, any
    engine. Executes as per-partition top-k + k-row driver merge, not a
    global sort."""
    from datagrowth_spark.operators import sampling as SMP

    docs = _t(spark, sf_dir, "documents")
    out = SMP.weighted_sample(docs, "n_chars", "doc_id", k=200)
    return out.select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"),
                      "sample_key")



SQL_CORPUS_WEIGHTED_SAMPLE = """
WITH keyed AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         round(pow((CAST(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                    + 0.5) / 4294967296.0,
                   1.0 / CAST(n_chars AS DOUBLE)), 9) AS sample_key
  FROM documents WHERE n_chars > 0
)
SELECT * FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 200
"""



def q_corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics (the tokenizer-training precursor):
    top tokens by occurrence with document frequency. One explode + one
    hash aggregate; map-side partial aggregation collapses the token
    distribution before the single shuffle, so the plan is scan-bound at
    100 TB. Full deterministic tiebreak on the top-k.
    """
    docs = _t(spark, sf_dir, "documents")
    ex = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(TX.tokens_col(F.lower(F.col("text")))).alias("token"),
    )
    return (
        ex.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(50)
    )



SQL_CORPUS_VOCAB = f"""
WITH ex AS (
  SELECT doc_id AS id, unnest({_TOKS_SQL}) AS token FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs
FROM ex GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT 50
"""



def q_corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (pack-then-chunk): concatenate all documents into
    one token stream in doc_id order, cut every 512 tokens, report
    per-chunk occupancy. Prefix sum via one global-sort window (sharded
    in production — see operators/packing.py), then an arithmetic
    explode + one hash aggregate. ``n_tokens`` == 512 for every chunk
    but the last, a built-in consistency check the oracle verifies.
    """
    from datagrowth_spark.operators import packing as PK

    docs = _t(spark, sf_dir, "documents")
    counted = docs.select("doc_id", TX.token_count("text").alias("n_toks"))
    layout = PK.pack_layout(counted, "doc_id", "n_toks", ctx=512)
    return PK.chunk_stats(layout, ctx=512)



SQL_CORPUS_PACK = f"""
WITH d AS (
  SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens FROM documents
),
p AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS stream_end
  FROM d WHERE n_tokens > 0
),
e AS (
  SELECT doc_id, n_tokens, stream_end - n_tokens AS start,
         (stream_end - n_tokens) // 512 AS first_chunk,
         (stream_end - 1) // 512 AS last_chunk
  FROM p
),
x AS (
  SELECT e.*, g.chunk_id
  FROM e, LATERAL unnest(generate_series(e.first_chunk, e.last_chunk)) AS g(chunk_id)
)
SELECT chunk_id, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN first_chunk = chunk_id THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
       CAST(SUM(LEAST(start + n_tokens, (chunk_id + 1) * 512) - GREATEST(start, chunk_id * 512)) AS BIGINT) AS n_tokens
FROM x GROUP BY chunk_id
"""



def q_curriculum_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordered sequence packing: the pack stream follows the
    EXACT global quality rank (best documents first) instead of doc_id
    — the rank operator composed with the sharded prefix-sum layout, a
    pattern LLM data pipelines use for quality-curriculum training
    runs. Both stages are the scale-safe sharded forms: no
    corpus-sized frame ever crosses one task, yet every placement is
    bit-identical to the oracle's global-window formulation.
    """
    from datagrowth_spark.operators import packing as PK
    from datagrowth_spark.operators.ranking import add_global_rank

    docs = _t(spark, sf_dir, "documents")
    scored = _persist(
        TX.add_quality_score(docs, out="quality", ntoks_col="__nt")
        .select("doc_id", "quality",
                F.col("__nt").cast("long").alias("n_toks"))
        .where(F.col("n_toks") > 0))
    ranked = add_global_rank(scored, "quality", ("doc_id",),
                             descending=True, out="rnk")
    layout = PK.pack_layout(ranked.select("rnk", "n_toks"),
                            "rnk", "n_toks", ctx=512)
    return (
        layout.join(ranked.select("doc_id", "rnk"), "rnk")
        .select("doc_id", "n_tokens", "start", "first_chunk", "last_chunk")
    )



SQL_CURRICULUM_PACK = f"""
WITH q AS ({SQL_TEXT_QUALITY}),
tok AS (
  SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens FROM documents
),
r AS (
  SELECT q.doc_id, tok.n_tokens,
         ROW_NUMBER() OVER (ORDER BY q.quality DESC, q.doc_id ASC) AS rnk
  FROM q JOIN tok ON q.doc_id = tok.doc_id
  WHERE tok.n_tokens > 0
),
p AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY rnk
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS stream_end
  FROM r
)
SELECT doc_id, n_tokens, stream_end - n_tokens AS start,
       (stream_end - n_tokens) // 512 AS first_chunk,
       (stream_end - 1) // 512 AS last_chunk
FROM p
"""



def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: every document gets a stable,
    uniformly-shuffled 1-based position — the permutation training
    loaders need per epoch — WITHOUT a global sort. The shuffle key is
    the first 60 bits of ``md5(doc_id)`` (engine-portable, seedable by
    salting the hashed text), and the position is the sharded exact
    global rank: quantile cuts partition the key space, so at 100 TB
    the permutation costs one bounded sketch plus one partitioned
    window — never a corpus through one task. Fixed-width lowercase
    hex sorts identically as string (oracle) and as its numeric value
    (engine), which is what makes the two formulations bit-equal.
    """
    from datagrowth_spark.operators.ranking import add_global_rank

    docs = _t(spark, sf_dir, "documents")
    key = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                 16, 10).cast("bigint")
    # Persist (house pattern, ADVICE r5): the eager rank's construction-
    # time sketch collect would otherwise re-run the md5 scan lineage
    # once per construction job in addition to the final job.
    keyed = _persist(docs.select("doc_id", key.alias("shuffle_key")))
    ranked = add_global_rank(keyed, "shuffle_key", ("doc_id",),
                             out="position")
    return ranked.select("doc_id", F.col("position").cast("long").alias("position"))



SQL_EPOCH_SHUFFLE = """
SELECT doc_id,
       ROW_NUMBER() OVER (
         ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 15), doc_id
       ) AS position
FROM documents
"""



def q_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference-time length bucketing: documents group into power-of-2
    token-length buckets (bucket = bit length of the token count —
    integer-exact in both engines, no float log2 edge at powers of
    two), and each bucket is cut into fixed-size batches in doc_id
    order. The naive plan is a window PARTITION BY bucket — ~20 fat
    partitions, each a corpus-sized task. Instead the within-bucket
    index comes from ONE sharded global rank over the composite key
    ``bucket * 2^55 + doc_id`` (tie-free, quantile-shardable) minus a
    broadcast per-bucket offset — the rank operator as the engine's
    universal ordering primitive.
    """
    from datagrowth_spark.operators.ranking import add_global_rank

    docs = _t(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id", TX.token_count("text").cast("long").alias("n_toks")
    ).where(F.col("n_toks") > 0)
    bucket = F.length(F.expr("bin(n_toks)")).cast("long")
    # Persist (house pattern, ADVICE r5): the eager sketch collect and
    # the final job otherwise each re-run the tokenize scan lineage.
    keyed = _persist(counted.select(
        "doc_id", bucket.alias("bucket"),
        (bucket * F.lit(2 ** 55) + F.col("doc_id")).alias("ck")))
    ranked = add_global_rank(keyed, "ck", (), out="grk")
    offsets = ranked.groupBy("bucket").agg(F.min("grk").alias("b_off"))
    return (
        ranked.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id", "bucket",
            F.expr("(grk - b_off) div 32").cast("long").alias("batch_id"))
    )



SQL_LENGTH_BUCKET_BATCHES = f"""
WITH d AS (
  SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n FROM documents
),
b AS (
  SELECT doc_id, CAST(length(bin(n)) AS BIGINT) AS bucket
  FROM d WHERE n > 0
),
r AS (
  SELECT doc_id, bucket,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS idx
  FROM b
)
SELECT doc_id, bucket, (idx - 1) // 32 AS batch_id FROM r
"""



def q_corpus_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out vocabulary coverage: deterministic 80/20 doc split
    (salted hash bucket — replayable on any engine), then the share of
    held-out token INSTANCES whose type never occurs in the train
    split, per language — the OOV-rate check run before freezing a
    vocabulary. Train vocab is one distinct (vocabulary-sized); the
    held-out side joins on the token key, so nothing corpus-sized ever
    sits on one task."""
    from datagrowth_spark.operators.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        (hash_bucket("doc_id", buckets=100, salt="oov") < 80).alias("is_train"),
        F.explode(TX.normalized_tokens(F.col("text"))).alias("w"))
    train_vocab = (toks.where(F.col("is_train")).select("w").distinct()
                   .withColumn("seen", F.lit(1)))
    test = toks.where(~F.col("is_train"))
    n_oov = F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
    return (test.join(train_vocab, "w", "left")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_test_tokens"),
                 n_oov.alias("n_oov"),
                 F.round(n_oov.cast("double")
                         / F.count(F.lit(1)), 6).alias("oov_rate")))



SQL_CORPUS_OOV_RATE = f"""
WITH toks AS (
  SELECT lang,
         CAST(('0x' || substr(md5('oov:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 100 < 80 AS is_train,
         unnest({_NORM_TOKS_SQL}) AS w
  FROM documents
),
vocab AS (SELECT DISTINCT w FROM toks WHERE is_train),
test AS (SELECT lang, w FROM toks WHERE NOT is_train)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_test_tokens,
       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM test t LEFT JOIN vocab v ON t.w = v.w
GROUP BY lang
"""



_SPLIT_TRAIN, _SPLIT_VALIDATE = 80, 90  # bucket < 80 → train, < 90 → validate



def q_corpus_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validate/test split audit: every document's
    split is a pure function of its key (salted-md5 bucket), so the
    assignment is identical on 1 executor or 1000, across re-runs and
    incremental growth — unlike seed-based randomSplit, whose output
    depends on partition layout (see operators/sampling.py). One
    projection + one count aggregate per (lang, split).
    """
    from datagrowth_spark.operators import sampling as SMP

    docs = _t(spark, sf_dir, "documents")
    bucket = SMP.hash_bucket("doc_id", 100, salt="split")
    split = (
        F.when(bucket < _SPLIT_TRAIN, F.lit("train"))
        .when(bucket < _SPLIT_VALIDATE, F.lit("validate"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )



SQL_CORPUS_SPLIT_STRATIFIED = f"""
WITH b AS (
  SELECT lang, n_chars,
         CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 100 AS INT) AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < {_SPLIT_TRAIN} THEN 'train'
            WHEN bucket < {_SPLIT_VALIDATE} THEN 'validate'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1, 2
"""



_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}



def q_corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing: downsample sources to hit target weights
    (see operators/mixing.py). The rate computation is a dimension-sized
    aggregate + broadcast join; keep decisions are deterministic hash
    buckets, so there is no corpus-sized shuffle and the oracle can
    replay every decision. Both engines evaluate the rate arithmetic in
    IEEE doubles with the same operation order, so the floor() lands
    identically.
    """
    from datagrowth_spark.operators import mixing as MX

    docs = _t(spark, sf_dir, "documents")
    kept = MX.rebalance(docs, _MIX_WEIGHTS, "source", "doc_id")
    return kept.groupBy("source", "rate_permille").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )



def q_corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened sampling weights (mBERT/XLM-R alpha=0.3):
    q_s ∝ p_s^0.3 over source shares — the standard recipe for
    upweighting low-resource sources. Dimension-sized aggregates and
    one-row broadcasts only; see operators/mixing.py temperature_rates
    for the determinism contract (6dp rounding + exact DECIMAL
    normalizer).
    """
    from datagrowth_spark.operators import mixing as MX

    docs = _t(spark, sf_dir, "documents")
    return MX.temperature_rates(docs, alpha=0.3, source_col="source")



SQL_CORPUS_MIX_TEMPERATURE = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
total AS (SELECT SUM(n_docs) AS n_total FROM counts),
powed AS (
  SELECT source, n_docs,
         round(n_docs / CAST(n_total AS DOUBLE), 6) AS p,
         CAST(round(pow(n_docs / CAST(n_total AS DOUBLE), 0.3), 6) AS DECIMAL(20,6)) AS w
  FROM counts, total
),
z AS (SELECT SUM(w) AS z FROM powed)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, p,
       round(CAST(w AS DOUBLE) / CAST(z AS DOUBLE), 6) AS mix_rate
FROM powed, z
"""



def _mix_weight_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN CAST({w} AS DOUBLE)" for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"CASE source {cases} END"



SQL_CORPUS_MIX_REBALANCE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs, {_mix_weight_sql()} AS weight FROM counts
),
t AS (
  SELECT MIN(n_docs / weight) AS t_max FROM w WHERE weight IS NOT NULL
),
rates AS (
  SELECT source, n_docs,
         CAST(COALESCE(floor(CAST(1000.0 AS DOUBLE) * weight * t_max / n_docs), 0) AS INT) AS rate_permille
  FROM w, t
),
kept AS (
  SELECT d.source, r.rate_permille, d.n_chars
  FROM documents d JOIN rates r USING (source)
  WHERE CAST(CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % 1000 AS INT) < r.rate_permille
)
SELECT source, rate_permille, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM kept GROUP BY 1, 2
"""



# ---------------------------------------------------------------------------
# As-of join (events ↔ latest prior order), oracle = DuckDB native ASOF JOIN
# ---------------------------------------------------------------------------

def q_corpus_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data selection (DCLM/FineWeb curation shape): per
    language, keep the highest-quality documents while the running
    token total fits a 3000-token budget. One shuffle on lang + a
    partition-local sort; see operators/selection.py for the rank-free
    approximate variant used when one stratum dominates at scale.
    """
    from datagrowth_spark.operators.selection import select_by_token_budget

    docs = TX.add_quality_score(
        _t(spark, sf_dir, "documents"), out="q", ntoks_col="toks").select(
        "doc_id", "lang", "q", "toks")  # q is 6dp-rounded in the frame form
    out = select_by_token_budget(
        docs, ["lang"], "q", "toks", budget=3000, tiebreak_col="doc_id")
    return out.select("doc_id", "lang", F.col("n_tokens"), "kept")



SQL_CORPUS_BUDGET_SELECT = f"""
WITH scored AS (
  SELECT d.doc_id, d.lang, len({_RAW_TOKS_SQL}) AS n_tokens, q.quality AS q
  FROM documents d JOIN ({SQL_TEXT_QUALITY}) q USING (doc_id)
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       SUM(n_tokens) OVER (PARTITION BY lang ORDER BY q DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) <= 3000 AS kept
FROM scored
"""



def q_cluster_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware budget selection (SemDeDup/DCLM curation shape):
    cluster the corpus in embedding space, then run the token-budget
    quality cut PER CLUSTER instead of per language — so a budget can
    never be monopolized by one dense region of the embedding space.
    Composition of three existing scale-safe pieces: the k-row
    centroid M-step + broadcast map-only assignment
    (operators/clustering.py), the per-doc quality score, and the
    per-stratum running-total selection (operators/selection.py) —
    strata = assigned cluster. The corpus pays one id-keyed join
    (embeddings↔documents) and one shuffle on the cluster key."""
    from datagrowth_spark.operators import clustering as CL
    from datagrowth_spark.operators.selection import select_by_token_budget

    emb = _t(spark, sf_dir, "embeddings")
    cents = CL.centroid_vectors(CL.label_centroids(emb, "label"), "label")
    assigned = CL.assign_to_centroids(emb, cents, id_col="vec_id") \
        .withColumnRenamed("vec_id", "doc_id")
    docs = TX.add_quality_score(
        _t(spark, sf_dir, "documents"), out="q", ntoks_col="toks").select(
        "doc_id", "q", "toks")  # q is 6dp-rounded in the frame form
    clustered = docs.join(assigned, "doc_id")
    out = select_by_token_budget(
        clustered, ["assigned"], "q", "toks", budget=2500, tiebreak_col="doc_id")
    return out.select("doc_id", "assigned", F.col("n_tokens"), "kept")



SQL_CLUSTER_BUDGET_SELECT = f"""
WITH flat AS (
  SELECT vec_id, label, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
         unnest(embedding) AS val
  FROM embeddings
),
cent AS (
  SELECT label AS centroid_id, pos,
         CAST(SUM(CAST(val AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS centroid
  FROM flat GROUP BY 1, 2
),
dists AS (
  SELECT f.vec_id, c.centroid_id,
         round(SUM((CAST(f.val AS DOUBLE) - c.centroid) ^ 2), 6) AS d2
  FROM flat f JOIN cent c USING (pos)
  GROUP BY 1, 2
),
best AS (
  SELECT vec_id, centroid_id AS assigned,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
  FROM dists
),
sel AS (
  SELECT d.doc_id, b.assigned, len({_RAW_TOKS_SQL}) AS n_tokens, q.quality AS q
  FROM documents d
  JOIN (SELECT vec_id, assigned FROM best WHERE rn = 1) b ON d.doc_id = b.vec_id
  JOIN ({SQL_TEXT_QUALITY}) q USING (doc_id)
)
SELECT doc_id, assigned, CAST(n_tokens AS BIGINT) AS n_tokens,
       SUM(n_tokens) OVER (PARTITION BY assigned ORDER BY q DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) <= 2500 AS kept
FROM sel
"""



def q_corpus_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the context-window prep step
    for RAG indexing / long-document training (size 64, stride 48 →
    16-token overlap). Entirely narrow JVM work: tokenize once,
    ``sequence`` the chunk starts, explode, ``slice`` each window — no
    shuffle anywhere, so at 100 TB this is a map-only stage that scales
    with executor count. Empty documents emit no chunks.
    """
    size, stride = 64, 48
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit("")).alias("toks"),
    ).withColumn("n", F.size("toks")).where(F.col("n") > 0)
    exploded = toks.select(
        "doc_id", "toks", "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
        ).alias("start"),
    )
    return exploded.select(
        "doc_id",
        (F.col("start") / stride).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.least(F.lit(size), F.col("n") - F.col("start")).cast("long").alias("n_chunk_tokens"),
        F.array_join(F.slice("toks", F.col("start") + 1, size), " ").alias("chunk_text"),
    )



SQL_CORPUS_CHUNKS = f"""
WITH t AS (
  SELECT doc_id, {_RAW_TOKS_SQL} AS toks FROM documents
),
nz AS (
  SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
),
s AS (
  SELECT doc_id, toks, n, unnest(range(0, n, 48)) AS start FROM nz
)
SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id, CAST(start AS BIGINT) AS start,
       CAST(least(64, n - start) AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text
FROM s
"""



def q_corpus_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift between two sub-corpora (English vs the
    rest): per-token Jensen-Shannon divergence contributions under
    Laplace smoothing — the distribution-shift audit run between crawl
    snapshots or data-mix candidates before training. One explode + one
    hash aggregate (map-side combine collapses the token distribution
    before the single shuffle); the totals are a 1-row broadcast scalar,
    every probability/log term is per-row arithmetic on exact integer
    counts — no cross-row float accumulation, so the rounded output is
    engine-portable. Scan-bound at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    ex = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
        F.explode(TX.tokens_col(F.lower(F.col("text")))).alias("token"),
    )
    # Session-lifetime cache, the house stance for rank/drift inputs
    # (cf. q_epoch_shuffle, q_dedup_incremental): the totals aggregate
    # and the join below both read it, so without the cache the
    # explode+aggregate lineage runs twice. One vocab-sized entry per
    # distinct sf_dir; caches are transparent to correctness.
    counts = _persist(ex.groupBy("token").agg(
        F.sum("is_en").alias("c_en"),
        F.sum(1 - F.col("is_en")).alias("c_other"),
    ))
    totals = counts.agg(
        F.sum("c_en").alias("tot_en"),
        F.sum("c_other").alias("tot_other"),
        F.count(F.lit(1)).alias("vocab"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    p_en = (F.col("c_en") + 1) / (F.col("tot_en") + F.col("vocab"))
    p_ot = (F.col("c_other") + 1) / (F.col("tot_other") + F.col("vocab"))
    m = (p_en + p_ot) / 2
    contrib = F.round(
        p_en * F.log(p_en / m) / 2 + p_ot * F.log(p_ot / m) / 2, 9)
    return (
        j.select(
            "token",
            F.col("c_en").cast("long").alias("c_en"),
            F.col("c_other").cast("long").alias("c_other"),
            contrib.alias("js_contribution"),
        )
        .orderBy(F.desc("js_contribution"), F.asc("token"))
        .limit(25)
    )



SQL_CORPUS_TOKEN_DRIFT = f"""
WITH ex AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
         unnest({_TOKS_SQL}) AS token
  FROM documents),
counts AS (
  SELECT token, SUM(is_en) AS c_en, SUM(1 - is_en) AS c_other
  FROM ex GROUP BY token),
totals AS (
  SELECT SUM(c_en) AS tot_en, SUM(c_other) AS tot_other,
         COUNT(*) AS vocab
  FROM counts),
j AS (
  SELECT token, c_en, c_other,
         (c_en + 1) / CAST(tot_en + vocab AS DOUBLE) AS p_en,
         (c_other + 1) / CAST(tot_other + vocab AS DOUBLE) AS p_ot
  FROM counts CROSS JOIN totals)
SELECT token, CAST(c_en AS BIGINT) AS c_en, CAST(c_other AS BIGINT) AS c_other,
       round(p_en * ln(p_en / ((p_en + p_ot) / 2)) / 2
             + p_ot * ln(p_ot / ((p_en + p_ot) / 2)) / 2, 9) AS js_contribution
FROM j
ORDER BY js_contribution DESC, token ASC
LIMIT 25
"""



def q_mixture_token_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture plan: given per-source TOKEN counts (not
    doc counts — sources with long documents weigh more) and a
    temperature-flattened target (alpha=0.5), compute each source's
    share of a 1M-token training budget and the oversampling factor
    (epochs) needed to fill it — the planning step before an epoch-
    aware pre-training data loader.

    Determinism contract (house rule): weights round to 6dp then cast
    DECIMAL(20,6) so the normalizer is an exact order-independent sum;
    only final ratios return to double. Dimension-sized aggregates and
    one-row broadcasts only.
    """
    docs = _t(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(TX.normalized_tokens(F.col("text")))).alias("n_tokens"))
    total = per_source.agg(F.sum("n_tokens").alias("n_total"))
    powed = per_source.crossJoin(F.broadcast(total)).withColumn(
        "w",
        F.round(F.pow(F.col("n_tokens") / F.col("n_total"), 0.5), 6)
        .cast("decimal(20,6)"))
    z = powed.agg(F.sum("w").alias("z"))
    mix_rate = F.round(F.col("w").cast("double") / F.col("z").cast("double"), 6)
    return (
        powed.crossJoin(F.broadcast(z))
        .withColumn("mix_rate", mix_rate)
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "mix_rate",
            F.round(F.lit(1_000_000) * F.col("mix_rate") / F.col("n_tokens"), 6)
            .alias("epochs"))
        .orderBy("source")
    )



SQL_MIXTURE_TOKEN_PLAN = f"""
WITH t AS (
  SELECT source, CAST(SUM(len({_NORM_TOKS_SQL})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
total AS (SELECT SUM(n_tokens) AS n_total FROM t),
powed AS (
  SELECT source, n_tokens,
         CAST(round(pow(n_tokens / CAST(n_total AS DOUBLE), 0.5), 6)
              AS DECIMAL(20,6)) AS w
  FROM t, total
),
z AS (SELECT SUM(w) AS z FROM powed),
m AS (
  SELECT source, n_tokens,
         round(CAST(w AS DOUBLE) / CAST(z AS DOUBLE), 6) AS mix_rate
  FROM powed, z
)
SELECT source, n_tokens, mix_rate,
       round(1000000 * mix_rate / n_tokens, 6) AS epochs
FROM m ORDER BY source
"""

