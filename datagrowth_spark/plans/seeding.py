"""Multi-phase seeding pipelines (SURVEY §2.4 P1-P5).

A seeding spec is an ordered list of phase dicts (JSON-serializable,
like the reference's ``SEEDING_PHASES``):

    {"phase": "papers", "strategy": "initial",
     "retrieve_data": {"requests": [...] | "build": callable,
                        "next_request": callable | None,
                        "continuation_limit": int},
     "contribute_data": {"objective": {...}}}

    {"phase": "details", "strategy": "merge",
     "retrieve_data": {"request_template": callable(seed) -> request},
     "contribute_data": {"objective": {...}, "merge_on": "id",
                          "composition_to": None}}

    {"phase": "deletes", "strategy": "back_fill",
     "contribute_data": {"callback": callable(seed, collection) -> [seed]}}

Strategies (reference seeding.py:168-213):

* ``initial`` / ``replace`` — the phase produces the seed stream itself:
  paginated fetch → extraction → upsert. Fully set-oriented: all pages
  of all links fetched breadth-first, one extraction job, one MERGE.
* ``merge`` — keyed merge join of per-seed detail fetches onto the
  current seed batch (merge_on defaults to the collection identifier);
  ``composition_to`` nests the merged record under a key instead.
* ``back_fill`` — driver-side callback flatMap with collection access
  (e.g. expand a tombstone seed into delete markers for every document
  of a journal).

Scale shape: the seed stream is a DataFrame of encoded properties
end-to-end — extraction runs Arrow-batched in executors, the merge
strategy is a keyed join + duplicate-safe map merge (detail wins),
and the per-seed ``request_template`` callable runs inside a
``mapInPandas`` worker, so no corpus-sized data ever crosses the
driver. The only driver-side strategies are the explicitly driver-bound
reference contracts: ``back_fill`` callbacks (they receive the
collection object) and first-phase ``build`` callables (they receive
the full seed list).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from datagrowth_spark.datatypes.collection import Collection
from datagrowth_spark.datatypes.document import (
    PROPERTIES_TYPE,
    decode_properties,
    encode_properties,
    prop_col,
)
from datagrowth_spark.functions.maps import map_set, merge_maps_last_win
from datagrowth_spark.operators.extraction import extract_df
from datagrowth_spark.sources.cache import (
    REQUEST_SCHEMA,
    ResourceCache,
    fetch,
    success_predicate,
)
from datagrowth_spark.sources.http import paginated_fetch, requests_to_df

_SEED_SCHEMA = T.StructType([T.StructField("properties", PROPERTIES_TYPE)])


def _as_dict(props: Any) -> dict:
    """Arrow hands MapType back as dict or list of (k, v) pairs."""
    if props is None:
        return {}
    return props if isinstance(props, dict) else dict(props)


def _seed_fingerprint(col: str = "properties") -> F.Column:
    """Deterministic row fingerprint of an encoded-properties map
    (entries sorted by key, mirroring the driver-side list dedup in
    ``Collection._rows_from_dicts``)."""
    return F.to_json(F.map_from_entries(F.array_sort(F.map_entries(F.col(col)))))


def _detail_json(col: F.Column) -> F.Column:
    """Render an encoded-properties map as one JSON object string.

    Map values are already JSON fragments (the properties encoding), so
    the object is assembled textually — pure Catalyst expressions, keys
    sorted like ``encode_properties``'s ``sort_keys``.
    """
    def json_key(key: F.Column) -> F.Column:
        escaped = F.replace(F.replace(key, F.lit("\\"), F.lit("\\\\")),
                            F.lit('"'), F.lit('\\"'))
        return F.concat(F.lit('"'), escaped, F.lit('"'))

    rendered = F.array_sort(F.transform(
        F.map_entries(col),
        lambda e: F.concat(json_key(e["key"]), F.lit(":"), e["value"]),
    ))
    return F.concat(F.lit("{"), F.concat_ws(",", rendered), F.lit("}"))


class SeedingProcessor:
    def __init__(self, spark, cache: ResourceCache, phases: list[dict],
                 transport=None, batch_size: int = 100) -> None:
        self.spark = spark
        self.cache = cache
        self.phases = phases
        self.transport = transport
        self.batch_size = batch_size
        self.report: list[dict] = []  # per-phase seed counts, for tests/monitoring

    # -- fetch + extract --------------------------------------------------
    def _fetch_kwargs(self, retrieve: dict) -> dict:
        kwargs = {}
        if self.transport is not None:
            kwargs["transport"] = self.transport
        if retrieve.get("cache_only"):
            kwargs["cache_only"] = True
        return kwargs

    def _extract_responses(self, responses: DataFrame, objective: dict) -> DataFrame:
        """Successful bodies → seed rows, extracted in executors.

        Per-row Content-Type comes from the cached response headers
        (reference: resource.content dispatches on the header mimetype).
        """
        ok = responses.where(success_predicate()).withColumn(
            "__content_type",
            F.coalesce(
                F.get_json_object("head", "$['content-type']"),
                F.get_json_object("head", "$['Content-Type']"),
                F.lit("application/json"),
            ),
        )
        return extract_df(ok, "body", objective, content_type_col="__content_type")

    def _collect_seeds(self, seeds_df: DataFrame) -> list[dict]:
        """Decode a seed frame to driver dicts — ONLY for the reference's
        driver-bound contracts (back_fill callbacks, build callables)."""
        return [decode_properties(_as_dict(r["properties"]))
                for r in seeds_df.select("properties").collect()]

    # -- strategies -------------------------------------------------------
    def _run_initial(self, phase: dict, collection: Collection,
                     seeds_in: DataFrame) -> DataFrame:
        retrieve = phase.get("retrieve_data", {})
        contribute = phase.get("contribute_data", {})
        requests = retrieve.get("requests") or []
        if "build" in retrieve:
            requests = retrieve["build"](self._collect_seeds(seeds_in))
        responses = paginated_fetch(
            self.spark, self.cache, list(requests),
            next_request=retrieve.get("next_request"),
            continuation_limit=retrieve.get("continuation_limit", 1),
            **self._fetch_kwargs(retrieve),
        )
        seeds = self._extract_responses(responses, contribute.get("objective", {}))
        # Page overlap / duplicate payload dedup, mirroring the in-memory
        # dedup of Collection._rows_from_dicts.
        return (
            seeds.withColumn("__fp", _seed_fingerprint())
            .dropDuplicates(["__fp"]).drop("__fp")
        )

    def _run_merge(self, phase: dict, collection: Collection,
                   seeds_in: DataFrame) -> DataFrame:
        """Keyed merge (P3): one detail fetch per seed, joined back on
        ``merge_on`` and struct-merged — reference seeding.py:86-112
        semantics as a join instead of driver dicts."""
        retrieve = phase.get("retrieve_data", {})
        contribute = phase.get("contribute_data", {})
        template: Callable[[dict], dict] = retrieve["request_template"]
        merge_on = contribute.get("merge_on") or collection.identifier
        composition_to = contribute.get("composition_to")
        objective = contribute.get("objective", {})

        # Request templating is a per-seed Python contract; run it
        # Arrow-batched in executors, never on the driver.
        fields = [f.name for f in REQUEST_SCHEMA.fields]

        def build_requests(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
            import pandas as pd

            for batch in batches:
                rows = []
                for props in batch["properties"]:
                    req = template(decode_properties(_as_dict(props)))
                    if req is None:
                        continue
                    rows.append({k: req.get(k) for k in fields})
                yield pd.DataFrame(rows, columns=fields)

        requests_df = seeds_in.select("properties").mapInPandas(
            build_requests, schema=REQUEST_SCHEMA)
        responses = fetch(requests_df, self.cache, **self._fetch_kwargs(retrieve))

        details = self._extract_responses(responses, objective)
        key = prop_col("properties", f"$.{merge_on}")
        # One detail per key (reference dict insert: last extracted wins;
        # order there is response iteration order, so any deterministic
        # winner is equally faithful — take the max fingerprint).
        details = (
            details.select(key.alias("__dkey"), F.col("properties").alias("__detail"))
            .where(F.col("__dkey").isNotNull())
            .withColumn("__dfp", _seed_fingerprint("__detail"))
            .withColumn("__rn", F.row_number().over(
                Window.partitionBy("__dkey").orderBy(F.desc("__dfp"))))
            .where(F.col("__rn") == 1)
            .select("__dkey", "__detail")
        )

        joined = seeds_in.withColumn("__key", key).join(
            details, F.col("__key") == F.col("__dkey"), "left")
        if composition_to:
            merged = F.when(
                F.col("__dkey").isNotNull(),
                map_set("properties", composition_to, _detail_json(F.col("__detail"))),
            ).otherwise(F.col("properties"))
        else:
            # dict.update(detail) semantics: detail keys overwrite seed
            # keys, independent of the session's mapKeyDedupPolicy.
            merged = F.when(
                F.col("__dkey").isNotNull(),
                merge_maps_last_win("properties", "__detail"),
            ).otherwise(F.col("properties"))
        return joined.select(merged.alias("properties"))

    def _run_back_fill(self, phase: dict, collection: Collection,
                       seeds_in: DataFrame) -> DataFrame:
        """Driver-side by contract: the callback receives the live
        collection object (reference seeding.py:200-213). Seeds at this
        point are the phase delta, not the corpus."""
        callback = phase["contribute_data"]["callback"]
        out: list[dict] = []
        for seed in self._collect_seeds(seeds_in):
            out.extend(callback(seed, collection))
        rows = [(encode_properties(item),) for item in out]
        return self.spark.createDataFrame(rows, _SEED_SCHEMA)

    # -- driver -----------------------------------------------------------
    def __call__(self, collection: Collection, *args, limit: int | None = None) -> Collection:
        """Run all phases; upsert resulting seeds into the collection.

        ``limit`` bounds the number of seeds taken from the first phase
        (the reference's seeding ``limit``; ``-1`` means retry-only: no
        new seeds, later phases still run over the pending batch).
        """
        strategies = {
            "initial": self._run_initial,
            "replace": self._run_initial,
            "merge": self._run_merge,
            "back_fill": self._run_back_fill,
        }
        self.report = []
        seeds: DataFrame = self.spark.createDataFrame([], _SEED_SCHEMA)
        n_seeds = 0
        persisted: list[DataFrame] = []
        try:
            for index, phase in enumerate(self.phases):
                strategy = phase.get("strategy", "initial")
                if index == 0 and limit == -1:
                    self.report.append({"phase": phase.get("phase"), "seeds": 0, "skipped": True})
                    continue
                seeds = strategies[strategy](phase, collection, seeds)
                if index == 0 and limit is not None and limit >= 0:
                    seeds = seeds.limit(limit)
                # Persist phase output: counted here AND consumed by the
                # next phase / final upsert — otherwise the fetch+extract
                # lineage re-runs per consumer.
                seeds = seeds.persist()
                persisted.append(seeds)
                n_seeds = seeds.count()
                self.report.append({"phase": phase.get("phase"), "seeds": n_seeds})

            if n_seeds:
                identifier = collection.identifier
                keyed = seeds.where(prop_col("properties", f"$.{identifier}").isNotNull())
                # _pristine knows emptiness without a count job over the
                # collection lineage.
                if collection._pristine:
                    collection.add(keyed)
                else:
                    collection.update(keyed, by_property=identifier)
                # Snapshot the collection over this batch so the persisted
                # phase frames can be released (no lazy lineage pins them).
                collection._df = collection._df.localCheckpoint(eager=True)
        finally:
            for frame in persisted:
                frame.unpersist()
        return collection
