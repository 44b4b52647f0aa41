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

Scale shape: phase k's requests are built from phase k-1's seed batch;
the fetch is the only non-relational step and it is partition-parallel
behind the cache. Seed batches stay DataFrames end-to-end except where
the reference's contract is inherently per-row (request templating,
back_fill callbacks) — those run over collected batches, bounded by
``batch_size`` to keep driver memory flat.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable

from pyspark.sql import functions as F

from datagrowth_spark.datatypes.collection import Collection
from datagrowth_spark.operators.extraction import ExtractProcessor
from datagrowth_spark.sources.cache import ResourceCache, fetch
from datagrowth_spark.sources.http import paginated_fetch, requests_to_df


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

    def _extract_bodies(self, responses, objective: dict) -> list[dict]:
        processor = ExtractProcessor(objective=objective)
        seeds: list[dict] = []
        for row in responses.where(F.col("status") == 200).collect():
            content_type = "application/json"
            head = json.loads(row["head"]) if row["head"] else {}
            content_type = head.get("content-type", content_type)
            seeds.extend(processor.extract(content_type, row["body"]))
        return seeds

    # -- strategies -------------------------------------------------------
    def _run_initial(self, phase: dict, collection: Collection,
                     seeds_in: list[dict]) -> list[dict]:
        retrieve = phase.get("retrieve_data", {})
        contribute = phase.get("contribute_data", {})
        requests = retrieve.get("requests") or []
        if "build" in retrieve:
            requests = retrieve["build"](seeds_in)
        responses = paginated_fetch(
            self.spark, self.cache, list(requests),
            next_request=retrieve.get("next_request"),
            continuation_limit=retrieve.get("continuation_limit", 1),
            **self._fetch_kwargs(retrieve),
        )
        return self._extract_bodies(responses, contribute.get("objective", {}))

    def _run_merge(self, phase: dict, collection: Collection,
                   seeds_in: list[dict]) -> list[dict]:
        retrieve = phase.get("retrieve_data", {})
        contribute = phase.get("contribute_data", {})
        template: Callable[[dict], dict] = retrieve["request_template"]
        merge_on = contribute.get("merge_on") or collection.identifier
        composition_to = contribute.get("composition_to")
        objective = contribute.get("objective", {})

        requests, request_for_seed = [], {}
        for seed in seeds_in:
            req = template(seed)
            if req is None:
                continue
            requests.append(req)
            request_for_seed[id(seed)] = req["signature"]
        responses = fetch(requests_to_df(self.spark, requests), self.cache,
                          **self._fetch_kwargs(retrieve))
        by_signature = {r["signature"]: r for r in responses.collect()}

        processor = ExtractProcessor(objective=objective)
        details_by_key: dict[Any, dict] = {}
        for row in by_signature.values():
            if row["status"] != 200:
                continue
            for detail in processor.extract("application/json", row["body"]):
                if merge_on in detail:
                    details_by_key[detail[merge_on]] = detail

        merged = []
        for seed in seeds_in:
            detail = details_by_key.get(seed.get(merge_on))
            out = dict(seed)
            if detail is not None:
                if composition_to:
                    out[composition_to] = detail
                else:
                    out.update(detail)
            merged.append(out)
        return merged

    def _run_back_fill(self, phase: dict, collection: Collection,
                       seeds_in: list[dict]) -> list[dict]:
        callback = phase["contribute_data"]["callback"]
        out: list[dict] = []
        for seed in seeds_in:
            out.extend(callback(seed, collection))
        return out

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
        seeds: list[dict] = []
        for index, phase in enumerate(self.phases):
            strategy = phase.get("strategy", "initial")
            if index == 0 and limit == -1:
                seeds = []
                self.report.append({"phase": phase.get("phase"), "seeds": 0, "skipped": True})
                continue
            seeds = strategies[strategy](phase, collection, seeds)
            if index == 0 and limit is not None and limit >= 0:
                seeds = seeds[:limit]
            self.report.append({"phase": phase.get("phase"), "seeds": len(seeds)})

        if seeds:
            identifier = collection.identifier
            keyed = [s for s in seeds if s.get(identifier) is not None]
            if len(collection) == 0:
                collection.add(keyed)
            else:
                collection.update(keyed, by_property=identifier)
        return collection
