"""Pipeline query family.

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
from datagrowth_spark.queries._shared import _t  # noqa: E501
from datagrowth_spark.queries.text import SQL_TEXT_QUALITY, SQL_TEXT_REPETITION  # noqa: E501



def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML objective extraction (E2) as an oracle-checked query:
    deterministic HTML is synthesized from each document, then the
    reference-style soup objective ('@' node selector + '#' context
    key, eval-string expressions) runs through ExtractProcessor's
    text_html path — the mini-soup fallback in this container — and the
    extracted rows are compared against pure string SQL. One Arrow-
    batched flat-map, the same stage shape as response-stream
    extraction."""
    from datagrowth_spark.operators.extraction import extract_df

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body><h1>"), F.col("doc_id").cast("string"),
        F.lit('</h1><p class="intro">'), F.col("lang"),
        F.lit("</p><p>"), F.substring("text", 1, 40),
        F.lit("</p></body></html>"),
    )
    objective = {
        "@": "soup.find_all('p')",
        "#doc_id": "soup.find('h1').text",
        "text": "el.text",
    }
    out = extract_df(docs.select(html.alias("body")), "body", objective,
                     content_type="text/html")
    from datagrowth_spark.datatypes.document import prop_col
    return out.select(
        prop_col("properties", "$.doc_id").cast("long").alias("doc_id"),
        prop_col("properties", "$.text").alias("text"),
    )



SQL_HTML_EXTRACT = """
SELECT doc_id, lang AS text FROM documents
UNION ALL
SELECT doc_id, substr(text, 1, 40) AS text FROM documents
"""



# ---------------------------------------------------------------------------
# End-to-end ETL pipelines under the oracle (the reference's flagship
# capability — SURVEY §2.4 — not just its relational periphery). Both run
# hermetically against the in-package deterministic test client (R10), so
# every seeded/enriched value is pure arithmetic an ANSI-SQL oracle can
# reproduce: the gate hash-checks the PIPELINE (fetch → extract → merge →
# upsert → content), not a lookalike query.
# ---------------------------------------------------------------------------

def _entity_page_request(page: int) -> dict:
    from datagrowth_spark.sources.http import http_request

    return http_request("http://testclient/entities", params={"page": page})



def _entity_next_page(response: dict) -> dict | None:
    import json as _json

    body = _json.loads(response["body"])
    if body.get("next_page") is not None:
        return _entity_page_request(body["next_page"])
    return None



def _entity_detail_request(seed: dict) -> dict:
    from datagrowth_spark.sources.http import http_request

    return http_request("http://testclient/entities/{}".format(seed["id"]))



def q_pipeline_seed_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase seeding pipeline (P1-P3): paginated initial fetch →
    per-seed detail fetch → keyed merge → upsert into a collection.

    The cold fetch goes through the full cached-scan machinery (anti-
    join miss detection, partition-parallel transport, append-before-
    consume); the oracle regenerates the same rows from pure arithmetic.
    """
    import tempfile

    from datagrowth_spark.datatypes.collection import Collection
    from datagrowth_spark.datatypes.document import prop_col
    from datagrowth_spark.plans.seeding import SeedingProcessor
    from datagrowth_spark.sources.cache import ResourceCache

    cache = ResourceCache(spark, tempfile.mkdtemp(prefix="seed-cache-"))
    phases = [
        {
            "phase": "entities",
            "strategy": "initial",
            "retrieve_data": {
                "requests": [_entity_page_request(0)],
                "next_request": _entity_next_page,
                "continuation_limit": 10,
            },
            "contribute_data": {
                "objective": {"@": "$.results", "id": "$.id", "name": "$.name",
                              "group": "$.group"},
            },
        },
        {
            "phase": "details",
            "strategy": "merge",
            "retrieve_data": {"request_template": _entity_detail_request},
            "contribute_data": {
                "objective": {"@": "$", "id": "$.id", "detail": "$.detail", "score": "$.score"},
                "merge_on": "id",
            },
        },
    ]
    coll = Collection(spark, name="entities", identifier="id")
    SeedingProcessor(spark, cache, phases, transport=TC.testclient_transport)(coll)
    return coll.df.select(
        prop_col("properties", "$.id").cast("long").alias("id"),
        prop_col("properties", "$.name").alias("name"),
        prop_col("properties", "$.group").cast("long").alias("grp"),
        prop_col("properties", "$.detail").alias("detail"),
        prop_col("properties", "$.score").cast("double").alias("score"),
    )



SQL_PIPELINE_SEED_MERGE = f"""
SELECT i AS id, 'entity ' || i AS name, i % 3 AS grp,
       'detail ' || i AS detail, i / 10.0 AS score
FROM generate_series(0, {TC.TOTAL - 1}) t(i)
"""



def q_pipeline_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeding with ``composition_to`` (P3's nesting form): the detail
    fetch is composed UNDER a key of the seed record instead of merged
    into it — reference ``contribute_data.composition_to``. The nested
    JSON is projected back to typed columns so the oracle compares
    values, not text layout."""
    import tempfile

    from datagrowth_spark.datatypes.collection import Collection
    from datagrowth_spark.datatypes.document import prop_col
    from datagrowth_spark.plans.seeding import SeedingProcessor
    from datagrowth_spark.sources.cache import ResourceCache

    cache = ResourceCache(spark, tempfile.mkdtemp(prefix="comp-cache-"))
    phases = [
        {
            "phase": "entities",
            "strategy": "initial",
            "retrieve_data": {
                "requests": [_entity_page_request(0)],
                "next_request": _entity_next_page,
                "continuation_limit": 10,
            },
            "contribute_data": {
                "objective": {"@": "$.results", "id": "$.id", "name": "$.name"},
            },
        },
        {
            "phase": "details",
            "strategy": "merge",
            "retrieve_data": {"request_template": _entity_detail_request},
            "contribute_data": {
                "objective": {"@": "$", "id": "$.id", "detail": "$.detail", "score": "$.score"},
                "merge_on": "id",
                "composition_to": "extra",
            },
        },
    ]
    coll = Collection(spark, name="entities", identifier="id")
    SeedingProcessor(spark, cache, phases, transport=TC.testclient_transport)(coll)
    extra = prop_col("properties", "$.extra")
    return coll.df.select(
        prop_col("properties", "$.id").cast("long").alias("id"),
        prop_col("properties", "$.name").alias("name"),
        F.get_json_object(extra, "$.detail").alias("detail"),
        F.get_json_object(extra, "$.score").cast("double").alias("score"),
    )



SQL_PIPELINE_COMPOSITION = f"""
SELECT i AS id, 'entity ' || i AS name,
       'detail ' || i AS detail, i / 10.0 AS score
FROM generate_series(0, {TC.TOTAL - 1}) t(i)
"""



def q_collection_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Schema validation (E11) as an oracle-checked query: lift
    documents to payloads, deterministically break some (drop ``lang``
    for doc_id % 5 == 0), validate against a schema requiring ``lang``
    and capping ``n_chars`` at 500, and count violations per document.
    The oracle recomputes the expected error count from the same rules."""
    from datagrowth_spark.datatypes.document import properties_from_columns
    from datagrowth_spark.datatypes.validation import validation_errors

    docs = _t(spark, sf_dir, "documents")
    props = properties_from_columns("doc_id", "lang", "n_chars")
    props = F.when(
        F.col("doc_id") % 5 == 0,
        F.map_filter(props, lambda k, v: k != F.lit("lang")),
    ).otherwise(props)
    lifted = docs.select(F.col("doc_id").cast("string").alias("identity"),
                         props.alias("properties"))
    schema = {
        "type": "object",
        "required": ["lang"],
        "properties": {"n_chars": {"maximum": 500}},
    }
    errs = validation_errors(lifted, schema).groupBy("identity").agg(
        F.count(F.lit(1)).alias("n_errors"))
    return (
        docs.select("doc_id", F.col("doc_id").cast("string").alias("identity"))
        .join(errs, "identity", "left")
        .select(
            "doc_id",
            F.coalesce("n_errors", F.lit(0)).cast("long").alias("n_errors"),
            (F.coalesce("n_errors", F.lit(0)) == 0).alias("valid"),
        )
    )



SQL_COLLECTION_VALIDATE = """
SELECT doc_id,
       CAST((CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
            + (CASE WHEN n_chars > 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       (doc_id % 5 <> 0 AND n_chars <= 500) AS valid
FROM documents
"""



def q_pipeline_growth_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth enrichment pipeline (P6-P8) over the documents table:
    lift rows to documents (JVM-side payload encoding), fetch one
    enrichment per document through the cached scan, extract with an
    objective, merge into derivatives, project typed columns back out.

    Scale shape: request building, fetch and merge are all partition-
    parallel; the only driver-side state is the pipeline spec. At 100 TB
    the cache table turns replays and overlapping runs into joins.
    """
    import tempfile

    from datagrowth_spark.datatypes.collection import Collection
    from datagrowth_spark.datatypes.document import properties_from_columns
    from datagrowth_spark.plans.growth import GrowthProcessor
    from datagrowth_spark.sources.cache import ResourceCache

    docs = _t(spark, sf_dir, "documents")
    lifted = docs.select(properties_from_columns("doc_id", "lang").alias("properties"))
    coll = Collection(spark, name="docs", identifier="doc_id")
    coll.add(lifted)

    cache = ResourceCache(spark, tempfile.mkdtemp(prefix="growth-cache-"))
    # Declarative template + flat objective => request building, request
    # signatures AND contribution extraction all compile to JVM Columns;
    # the only Python stage left is the fetch worker on cache misses.
    config = {
        "growth_phase": "analyze",
        "retrieve_data": {"request_template": {
            "uri_template": "http://testclient/analyze/{}", "args": ["$.doc_id"],
        }},
        "contribute_data": {"objective": {"@": "$", "score": "$.score", "flag": "$.flag"}},
    }
    GrowthProcessor(config, transport=TC.testclient_transport)(coll, cache)

    analysis = F.col("derivatives")["analyze"]
    return coll.df.select(
        F.col("identity").cast("long").alias("doc_id"),
        analysis["score"].cast("double").alias("score"),
        F.get_json_object(analysis["flag"], "$").alias("flag"),
    )



SQL_PIPELINE_GROWTH_ENRICH = f"""
SELECT doc_id,
       (doc_id * {TC.KNUTH}) % 1000 / 1000.0 AS score,
       CASE WHEN doc_id % 3 = 0 THEN 'hi' ELSE 'lo' END AS flag
FROM documents
"""



def _tier_request(content: dict) -> dict | None:
    """Phase-2 growth template: needs phase-1's flag from the merged
    content (properties + derivatives) — the reference's dependent-
    enrichment contract, necessarily the Python template path."""
    from datagrowth_spark.sources.http import http_request

    flag = content.get("flag")
    if flag is None:
        return None
    return http_request(f"http://testclient/tier/{content['doc_id']}-{flag}")



def q_pipeline_growth_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-phase growth chain (E8 + P6-P8 end to end): phase 'analyze'
    enriches every document; phase 'tier' runs only where analyze
    succeeded (``depends_on`` gating) and its REQUEST is built from
    analyze's output — the merged-content Python template path, Arrow-
    batched in executors. Both phases' results land in derivatives and
    project back out; the oracle regenerates the whole chain from pure
    arithmetic.
    """
    import tempfile

    from datagrowth_spark.datatypes.collection import Collection
    from datagrowth_spark.datatypes.document import properties_from_columns
    from datagrowth_spark.plans.growth import GrowthProcessor
    from datagrowth_spark.sources.cache import ResourceCache

    docs = _t(spark, sf_dir, "documents")
    coll = Collection(spark, name="docs", identifier="doc_id")
    coll.add(docs.select(properties_from_columns("doc_id").alias("properties")))

    cache = ResourceCache(spark, tempfile.mkdtemp(prefix="chain-cache-"))
    analyze = {
        "growth_phase": "analyze",
        "retrieve_data": {"request_template": {
            "uri_template": "http://testclient/analyze/{}", "args": ["$.doc_id"],
        }},
        "contribute_data": {"objective": {"@": "$", "score": "$.score", "flag": "$.flag"}},
    }
    tier = {
        "growth_phase": "tier",
        "depends_on": "analyze",
        "retrieve_data": {"request_template": _tier_request},
        "contribute_data": {"objective": {"@": "$", "tier": "$.tier"}},
    }
    GrowthProcessor(analyze, transport=TC.testclient_transport)(coll, cache)
    # Snapshot between rounds, exactly like the task-DAG fixpoint loop
    # (plans/dataset.py): phase 2 consumes phase 1's output twice
    # (request building + final join-back), and without a checkpoint the
    # whole analyze lineage — cache scan included — re-executes per
    # consumer. At scale this is the write-intermediate-corpus step.
    coll._df = coll._df.localCheckpoint(eager=True)
    GrowthProcessor(tier, transport=TC.testclient_transport)(coll, cache)

    return coll.df.select(
        F.col("identity").cast("long").alias("doc_id"),
        F.get_json_object(F.col("derivatives")["analyze"]["flag"], "$").alias("flag"),
        F.get_json_object(F.col("derivatives")["tier"]["tier"], "$").alias("tier"),
    )



SQL_PIPELINE_GROWTH_CHAIN = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'hi' ELSE 'lo' END AS flag,
       'T' || CAST((doc_id + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) % 4 AS VARCHAR) AS tier
FROM documents
"""



def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation verdict: one pass assigns every document
    its keep/drop decision with the reason — exact-dup canonical
    election, repetition filters, quality threshold, deterministic
    sample. Composition of operators/repetition + operators/sampling +
    functions/text in a single plan: the per-doc scalars (lang, quality,
    content hash) ride the repetition aggregates via carry-first, the
    canonical election is one window over the content hash, and the
    sample is a pure projection — three exchanges total, no joins.
    """
    from datagrowth_spark.operators import repetition as RT
    from datagrowth_spark.operators import sampling as SMP

    # quality pre-computed by the frame form (one tokenize pass per
    # variant, r12) and carried as a plain column reference; carry
    # expressions evaluate once per doc in the pre-explode projection.
    docs = TX.add_quality_score(
        _t(spark, sf_dir, "documents"), out="__q")
    rep = RT.ngram_repetition(
        docs, "text", "doc_id", n=2,
        carry={
            "lang": F.col("lang"),
            "quality": F.col("__q"),
            "h": F.md5(F.encode(F.col("text"), "utf-8")),
        },
    )
    w = Window.partitionBy("h")
    keep_rep = (F.col("dup_ngram_frac") <= 0.6) & (F.col("top_ngram_char_frac") <= 0.2)
    out = (
        rep.withColumn("is_canonical", (F.col("id") == F.min("id").over(w)).cast("int"))
        .withColumn("bucket", SMP.hash_bucket(F.col("id"), salt="curation"))
    )
    verdict = (
        F.when(F.col("is_canonical") == 0, F.lit("duplicate"))
        .when(~keep_rep, F.lit("repetitive"))
        .when(F.col("quality") < 0.3, F.lit("low_quality"))
        .when(F.col("bucket") >= 80, F.lit("not_sampled"))
        .otherwise(F.lit("keep"))
    )
    return out.select(
        F.col("id").alias("doc_id"), "lang", "quality", "is_canonical",
        keep_rep.cast("int").alias("keep_repetition"),
        (F.col("bucket") < 80).cast("int").alias("sampled"),
        verdict.alias("verdict"),
    )



def _sql_curation_pipeline() -> str:
    return f"""
WITH qual AS (SELECT doc_id, quality FROM ({SQL_TEXT_QUALITY}) q),
rep AS (SELECT doc_id, dup_ngram_frac, top_ngram_char_frac FROM ({SQL_TEXT_REPETITION}) r),
canon AS (
  SELECT doc_id,
         CAST(doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS INT) AS is_canonical
  FROM documents
),
samp AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('curation:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 100 AS bucket
  FROM documents
)
SELECT d.doc_id, d.lang, q.quality, c.is_canonical,
       CAST(r.dup_ngram_frac <= 0.6 AND r.top_ngram_char_frac <= 0.2 AS INT) AS keep_repetition,
       CAST(s.bucket < 80 AS INT) AS sampled,
       CASE WHEN c.is_canonical = 0 THEN 'duplicate'
            WHEN NOT (r.dup_ngram_frac <= 0.6 AND r.top_ngram_char_frac <= 0.2) THEN 'repetitive'
            WHEN q.quality < 0.3 THEN 'low_quality'
            WHEN s.bucket >= 80 THEN 'not_sampled'
            ELSE 'keep' END AS verdict
FROM documents d
JOIN qual q USING (doc_id) JOIN rep r USING (doc_id)
JOIN canon c USING (doc_id) JOIN samp s USING (doc_id)
"""



SQL_CURATION_PIPELINE = _sql_curation_pipeline()



def q_dataset_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level diff between two dataset generations (P11's
    missing analytic: what changed between versions). v2 is a
    deterministic mutation of the documents table (drop doc_id%7,
    revise doc_id%5, add doc_id%11 under shifted ids); the diff is one
    full outer hash join on md5 fingerprints — no sort, no collect.
    """
    from datagrowth_spark.plans.dataset import version_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    v2_base = docs.where(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" rev2")))
        .otherwise(F.col("text")).alias("text"),
    )
    v2_adds = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    v2 = v2_base.unionByName(v2_adds)
    diff = version_diff(docs, v2, key="doc_id", fingerprint=F.md5("text"))
    return diff.select(F.col("key").alias("doc_id"), "status")



SQL_DATASET_VERSION_DIFF = """
WITH v1 AS (SELECT doc_id, text FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN md5(v1.text) <> md5(v2.text) THEN 'changed'
            ELSE 'unchanged' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
"""



def q_source_quota_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl governance: drop blocklisted sources, then cap every
    surviving source at its top-15 documents by quality (doc_id
    tiebreak) — the per-domain quota that keeps one boilerplate-heavy
    host from dominating a training mix. The ``rk <= k`` predicate over
    a partitioned ROW_NUMBER triggers Spark's WindowGroupLimit: each
    map task keeps only its local top-k per source BEFORE the shuffle,
    so per-source state is k rows and the exchange carries
    O(k × sources), not the corpus — with millions of hosts at 100 TB
    the partition-by-source window is both balanced and tiny."""
    docs = _t(spark, sf_dir, "documents")
    allowed = docs.where(~F.col("source").isin("src7", "src13"))
    scored = TX.add_quality_score(allowed, out="quality").select(
        "doc_id", "source", "quality")
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 15)
    )

