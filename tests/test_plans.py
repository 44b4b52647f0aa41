"""Pipeline-plan tests: seeding strategies, growth enrichment, dataset
versioning strategies and the task DAG.

End-to-end against the deterministic mock entity API — the reference's
test strategy (SURVEY §5): assert resulting documents, cache behavior,
and delta/tombstone handling for simple / merge / back_fill pipelines.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.core.registry import Registry
from datagrowth_spark.datatypes.collection import Collection
from datagrowth_spark.functions.maps import map_set
from datagrowth_spark.plans.dataset import (
    Dataset,
    DatasetWarehouse,
    DGGrowthFrozen,
    GrowthStrategy,
)
from datagrowth_spark.plans.growth import GrowthProcessor
from datagrowth_spark.plans.seeding import SeedingProcessor
from datagrowth_spark.sources.cache import ResourceCache
from datagrowth_spark.sources.http import http_request

from mock_transports import TOTAL, mock_api_transport


def entity_pages_phase(**over):
    phase = {
        "phase": "entities",
        "strategy": "initial",
        "retrieve_data": {
            "requests": [http_request("http://mockapi/entities", params={"page": 0})],
            "next_request": _next_page,
            "continuation_limit": 10,
        },
        "contribute_data": {
            "objective": {"@": "$.results", "id": "$.id", "name": "$.name", "group": "$.group"},
        },
    }
    phase.update(over)
    return phase


def _next_page(response):
    body = json.loads(response["body"])
    if body.get("next_page") is not None:
        return http_request("http://mockapi/entities", params={"page": body["next_page"]})
    return None


def _detail_request(seed):
    return http_request("http://mockapi/entities/{}".format(seed["id"]))


class TestSeeding:
    def test_initial_strategy_seeds_all_entities(self, spark, tmp_path):
        cache = ResourceCache(spark, str(tmp_path / "cache"))
        coll = Collection(spark, name="entities", identifier="id")
        processor = SeedingProcessor(spark, cache, [entity_pages_phase()],
                                     transport=mock_api_transport)
        processor(coll)
        assert len(coll) == TOTAL
        contents = {c["id"]: c for c in coll.content()}
        assert contents[7]["name"] == "entity 7"
        assert processor.report[0]["seeds"] == TOTAL

    def test_merge_strategy_joins_details(self, spark, tmp_path):
        cache = ResourceCache(spark, str(tmp_path / "cache"))
        coll = Collection(spark, name="entities", identifier="id")
        phases = [
            entity_pages_phase(),
            {
                "phase": "details",
                "strategy": "merge",
                "retrieve_data": {"request_template": _detail_request},
                "contribute_data": {
                    "objective": {"@": "$", "id": "$.id", "detail": "$.detail", "score": "$.score"},
                    "merge_on": "id",
                },
            },
        ]
        SeedingProcessor(spark, cache, phases, transport=mock_api_transport)(coll)
        contents = {c["id"]: c for c in coll.content()}
        assert len(contents) == TOTAL
        assert contents[3]["detail"] == "detail 3"
        assert contents[3]["name"] == "entity 3"  # phase-1 keys survive the merge

    def test_merge_composition_to_nests(self, spark, tmp_path):
        cache = ResourceCache(spark, str(tmp_path / "cache"))
        coll = Collection(spark, name="entities", identifier="id")
        phases = [
            entity_pages_phase(),
            {
                "phase": "details",
                "strategy": "merge",
                "retrieve_data": {"request_template": _detail_request},
                "contribute_data": {
                    "objective": {"@": "$", "id": "$.id", "detail": "$.detail"},
                    "merge_on": "id",
                    "composition_to": "meta",
                },
            },
        ]
        SeedingProcessor(spark, cache, phases, transport=mock_api_transport)(coll)
        contents = {c["id"]: c for c in coll.content()}
        assert contents[3]["meta"]["detail"] == "detail 3"

    def test_back_fill_tombstones(self, spark, tmp_path):
        """deletes=5 marks every 5th entity deleted; back_fill expands the
        tombstones into delete-marker updates (reference nested-seeding
        delta test shape)."""
        cache = ResourceCache(spark, str(tmp_path / "cache"))
        coll = Collection(spark, name="entities", identifier="id")
        SeedingProcessor(spark, cache, [entity_pages_phase()], transport=mock_api_transport)(coll)

        def tombstone_callback(seed, collection):
            if seed.get("deleted"):
                return [{"id": seed["id"], "state": "deleted"}]
            return [{"id": seed["id"], "state": "active",
                     "name": seed.get("name"), "group": seed.get("group")}]

        delta_phases = [
            entity_pages_phase(retrieve_data={
                "requests": [http_request("http://mockapi/entities",
                                          params={"page": 0, "deletes": 5})],
                "next_request": None,
                "continuation_limit": 1,
            }, contribute_data={
                "objective": {"@": "$.results", "id": "$.id", "name": "$.name",
                              "group": "$.group", "deleted": "$.deleted"},
            }),
            {"phase": "tombstones", "strategy": "back_fill",
             "contribute_data": {"callback": tombstone_callback}},
        ]
        SeedingProcessor(spark, cache, delta_phases, transport=mock_api_transport)(coll)
        contents = {c["id"]: c for c in coll.content()}
        assert len(contents) == TOTAL  # updates, not duplicates
        assert contents[0]["state"] == "deleted"
        assert contents[1]["state"] == "active"
        assert contents[1]["name"] == "entity 1"

    def test_limit_bounds_first_phase(self, spark, tmp_path):
        cache = ResourceCache(spark, str(tmp_path / "cache"))
        coll = Collection(spark, name="entities", identifier="id")
        SeedingProcessor(spark, cache, [entity_pages_phase()],
                         transport=mock_api_transport)(coll, limit=5)
        assert len(coll) == 5

    def test_retry_only_limit_skips_seeding(self, spark, tmp_path):
        cache = ResourceCache(spark, str(tmp_path / "cache"))
        coll = Collection(spark, name="entities", identifier="id")
        processor = SeedingProcessor(spark, cache, [entity_pages_phase()],
                                     transport=mock_api_transport)
        processor(coll, limit=-1)
        assert len(coll) == 0
        assert processor.report[0].get("skipped") is True


class TestGrowth:
    @pytest.fixture()
    def seeded(self, spark, tmp_path):
        cache = ResourceCache(spark, str(tmp_path / "cache"))
        coll = Collection(spark, name="entities", identifier="id")
        coll.add([{"id": i, "name": f"entity {i}"} for i in range(5)])
        return coll, cache

    def growth_config(self, **over):
        config = {
            "growth_phase": "detail",
            "retrieve_data": {"request_template": _detail_request},
            "contribute_data": {"objective": {"@": "$", "detail": "$.detail", "score": "$.score"}},
        }
        config.update(over)
        return config

    def test_growth_writes_derivatives_and_task_results(self, seeded):
        coll, cache = seeded
        processor = GrowthProcessor(self.growth_config(), transport=mock_api_transport)
        processor(coll, cache)
        contents = {c["id"]: c for c in coll.content()}
        assert contents[2]["detail"] == "detail 2"  # via derivatives merge
        assert contents[2]["score"] == 0.2
        row = coll.df.where("identity = '2'").collect()[0]
        assert json.loads(row["task_results"]["detail"])["success"] is True

    def test_growth_skips_already_processed(self, seeded):
        coll, cache = seeded
        processor = GrowthProcessor(self.growth_config(), transport=mock_api_transport)
        processor(coll, cache)
        assert processor.filter_documents(coll.df).count() == 0

    def test_growth_to_property_routing(self, seeded):
        coll, cache = seeded
        processor = GrowthProcessor(self.growth_config(to_property="enriched"),
                                    transport=mock_api_transport)
        processor(coll, cache)
        contents = {c["id"]: c for c in coll.content()}
        assert contents[1]["enriched"] == {"detail": "detail 1", "score": 0.1}

    def test_growth_pass_resource_through_extractor(self, seeded):
        """extractor='ExtractProcessor.pass_resource_through' hands the
        whole parsed body to the contribution fold (reference growth
        test test_synchronous_pass_resource_through, growth/http.py:
        253-280)."""
        coll, cache = seeded
        processor = GrowthProcessor(
            self.growth_config(
                extractor="ExtractProcessor.pass_resource_through",
                contribute_data={}),
            transport=mock_api_transport)
        processor(coll, cache)
        contents = {c["id"]: c for c in coll.content()}
        # whole body (id/detail/score) landed, not an objective subset
        assert contents[2]["detail"] == "detail 2"
        assert contents[2]["score"] == 0.2

    def test_growth_error_resources_yield_no_derivatives(self, spark, tmp_path):
        """Error resources with pass_resource_through contribute
        nothing (reference test_synchronous_error_resources)."""
        cache = ResourceCache(spark, str(tmp_path / "cache"))
        coll = Collection(spark, name="entities", identifier="id")
        coll.add([{"id": 999}])  # 404 from the mock API
        processor = GrowthProcessor(
            self.growth_config(
                extractor="ExtractProcessor.pass_resource_through",
                contribute_data={}),
            transport=mock_api_transport)
        processor(coll, cache)
        row = coll.df.collect()[0]
        assert row["derivatives"] is None or "detail" not in row["derivatives"]
        assert json.loads(row["task_results"]["detail"])["success"] is False

    def test_growth_reduce_contributions_callable(self, spark, tmp_path):
        """A callable reduce folds multiple extracted contributions into
        one (reference test_synchronous_multi_contributions's
        reduce_contributions override, growth/http.py:282-323)."""
        def multi_transport(method, url, headers, data):
            return 200, {"content-type": "application/json"}, json.dumps(
                {"items": [{"extra": "test 1"}, {"extra": "test 2"}]})

        def reduce_contributions(contributions):
            return {"extra": " & ".join(c["extra"] for c in contributions)}

        cache = ResourceCache(spark, str(tmp_path / "cache"))
        coll = Collection(spark, name="entities", identifier="id")
        coll.add([{"id": 1}])
        processor = GrowthProcessor(
            self.growth_config(
                contribute_data={"objective": {"@": "$.items",
                                               "extra": "$.extra"}},
                reduce=reduce_contributions),
            transport=multi_transport)
        processor(coll, cache)
        contents = {c["id"]: c for c in coll.content()}
        assert contents[1]["extra"] == "test 1 & test 2"

    def test_growth_apply_resource_to(self, seeded):
        """apply_resource_to columns take the resource status string
        (reference test_synchronous_apply_resource_to)."""
        coll, cache = seeded
        processor = GrowthProcessor(
            self.growth_config(apply_resource_to=["reference"]),
            transport=mock_api_transport)
        processor(coll, cache)
        rows = coll.df.collect()
        assert all(r["reference"] == "200" for r in rows)
        with pytest.raises(ValueError, match="not a document column"):
            GrowthProcessor(
                self.growth_config(apply_resource_to=["nope"]),
                transport=mock_api_transport)(coll, cache)

    def test_growth_failure_recorded(self, spark, tmp_path):
        cache = ResourceCache(spark, str(tmp_path / "cache"))
        coll = Collection(spark, name="entities", identifier="id")
        coll.add([{"id": 999}])  # 404 from the mock API
        processor = GrowthProcessor(self.growth_config(), transport=mock_api_transport)
        processor(coll, cache)
        row = coll.df.collect()[0]
        result = json.loads(row["task_results"]["detail"])
        assert result["success"] is False
        assert result["status"] == 404
        # failed docs stay pending for retry
        assert processor.filter_documents(coll.df).count() == 1


def _mark_long_names(df, pending, name):
    """Document task: succeed when the name is 'long' (>= 8 chars)."""
    result = F.to_json(F.struct(
        (F.length(F.get_json_object(F.col("properties")["name"], "$")) >= 8).alias("success")
    ))
    new = F.when(pending, map_set("task_results", name, result)).otherwise(F.col("task_results"))
    return df.withColumn("task_results", new)


class EntityDataset(Dataset):
    NAME = "entities"
    COLLECTION_IDENTIFIER = "id"
    DOCUMENT_TASKS = {"check_name": {"run": "mark_long_names"}}


class TestDatasetVersioning:
    @pytest.fixture()
    def warehouse(self, spark, tmp_path):
        registry = Registry()
        registry.register("mark_long_names", _mark_long_names)
        return DatasetWarehouse(spark, str(tmp_path / "warehouse"), registry=registry)

    def seeder(self, spark, tmp_path, n=5, prefix="entity"):
        def run(collection):
            collection.add([{"id": i, "name": f"{prefix} {i}"} for i in range(n)])
            return collection

        return run

    def test_grow_creates_version_and_runs_tasks(self, spark, tmp_path, warehouse):
        ds = EntityDataset({"n": 5})
        entry = warehouse.grow(ds, self.seeder(spark, tmp_path))
        assert entry["version"] == 1 and entry["is_current"]
        assert entry["task_results"]["check_name"]["success"] == 5  # "entity N" >= 8 chars
        coll = warehouse.load_collection(ds, 1)
        assert len(coll) == 5

    def test_reset_strategy_starts_empty(self, spark, tmp_path, warehouse):
        ds = EntityDataset({"s": "reset"})
        warehouse.grow(ds, self.seeder(spark, tmp_path, n=5), strategy=GrowthStrategy.RESET)
        entry = warehouse.grow(ds, self.seeder(spark, tmp_path, n=3), strategy=GrowthStrategy.RESET)
        assert entry["version"] == 2
        assert len(warehouse.load_collection(ds, 2)) == 3  # not 5+3

    def test_revise_strategy_clones_current(self, spark, tmp_path, warehouse):
        ds = EntityDataset({"s": "revise"})
        warehouse.grow(ds, self.seeder(spark, tmp_path, n=5), strategy=GrowthStrategy.REVISE)

        def add_more(collection):
            collection.update([{"id": 99, "name": "latecomer 99"}], by_property="id")
            return collection

        entry = warehouse.grow(ds, add_more, strategy=GrowthStrategy.REVISE)
        assert entry["version"] == 2
        coll = warehouse.load_collection(ds, 2)
        assert len(coll) == 6  # 5 cloned + 1 new

    def test_revise_keeps_documents_and_invalidates_failed_tasks(self, spark, tmp_path, warehouse):
        """REVISE prepares the clone relationally (reference
        dataset.py:180-210): weeded docs anti-joined out, documents kept
        INTACT ('_'-keys, derivatives, bookkeeping survive), failed task
        results + their derivative phases invalidated, missing/failed
        docs re-flagged pending."""

        class WeedingDataset(EntityDataset):
            NAME = "weeding"

            def weed_document(self, content):
                return content.get("name") == "drop me"

        ds = WeedingDataset({})
        coll = Collection(spark, name="main", identifier="id")
        coll.add([
            {"id": 1, "name": "long enough name", "_secret": "s1"},
            {"id": 2, "name": "shrt", "_secret": "s2"},
            {"id": 3, "name": "drop me"},
        ])
        coll._df = _mark_long_names(coll.df, F.lit(True), "check_name")
        coll._df = coll.df.withColumn(
            "derivatives",
            F.create_map(
                F.lit("check_name"), F.create_map(F.lit("d"), F.lit('"1"')),
                F.lit("other"), F.create_map(F.lit("x"), F.lit('"2"')),
            ),
        ).withColumn("finished_at", F.current_timestamp())

        revised = warehouse._revise_collection(ds, coll)
        rows = {r["identity"]: r for r in revised.df.collect()}
        assert set(rows) == {"1", "2"}  # id 3 weeded, others kept intact
        assert json.loads(rows["1"]["properties"]["_secret"]) == "s1"  # '_' keys survive
        assert json.loads(rows["2"]["properties"]["_secret"]) == "s2"
        # success kept, failure invalidated (result + derivative phase)
        assert "check_name" in rows["1"]["task_results"]
        assert "check_name" not in rows["2"]["task_results"]
        assert set(rows["1"]["derivatives"]) == {"check_name", "other"}
        assert set(rows["2"]["derivatives"]) == {"other"}
        # prepare_processing only where work remains
        assert rows["2"]["pending_at"] is not None and rows["2"]["finished_at"] is None
        assert rows["1"]["pending_at"] is None and rows["1"]["finished_at"] is not None

    def test_freeze_strategy_raises_after_complete(self, spark, tmp_path, warehouse):
        ds = EntityDataset({"s": "freeze"})
        warehouse.grow(ds, self.seeder(spark, tmp_path), strategy=GrowthStrategy.FREEZE)
        with pytest.raises(DGGrowthFrozen):
            warehouse.grow(ds, self.seeder(spark, tmp_path), strategy=GrowthStrategy.FREEZE)

    def test_stack_strategy_keeps_all_versions(self, spark, tmp_path, warehouse):
        ds = EntityDataset({"s": "stack"})
        warehouse.grow(ds, self.seeder(spark, tmp_path, n=2), strategy=GrowthStrategy.STACK)
        warehouse.grow(ds, self.seeder(spark, tmp_path, n=2), strategy=GrowthStrategy.STACK)
        meta = warehouse.read_meta(ds)
        assert [v["version"] for v in meta["versions"]] == [1, 2]
        assert not any(v["is_current"] for v in meta["versions"])

    def test_diff_versions_between_stacked_generations(self, spark, tmp_path, warehouse):
        ds = EntityDataset({"s": "diff"})
        warehouse.grow(ds, self.seeder(spark, tmp_path, n=3), strategy=GrowthStrategy.STACK)

        def v2(collection):
            collection.add([{"id": i, "name": f"entity {i}"} for i in range(1, 4)])
            collection.update([{"id": 2, "name": "renamed"}], by_property="id")
            return collection

        warehouse.grow(ds, v2, strategy=GrowthStrategy.STACK)
        got = {r["key"]: r["status"]
               for r in warehouse.diff_versions(ds, 1, 2).collect()}
        # v1 = ids 0..2; v2 = ids 1..3 with id 2 renamed
        assert got == {"0": "removed", "1": "unchanged", "2": "changed", "3": "added"}

    def test_signature_depends_on_config(self):
        assert EntityDataset({"a": 1}).signature != EntityDataset({"a": 2}).signature
        assert EntityDataset({"a": 1}).signature == EntityDataset({"a": 1}).signature

    def test_write_meta_cas_rejects_stale_generation(self, warehouse):
        """The lost-update guard (reference: select_for_update row
        locks, resources/growth.py:154-170): two writers read the same
        generation; the second commit must raise, not clobber."""
        from datagrowth_spark.plans.dataset import DGConcurrentWrite

        ds = EntityDataset({"cas": 1})
        meta_a = warehouse.read_meta(ds)
        meta_b = warehouse.read_meta(ds)
        gen = meta_a.get("generation", 0)
        meta_a["versions"].append({"version": 1, "state": "growing",
                                   "is_current": False})
        warehouse.write_meta(ds, meta_a, expected_generation=gen)
        meta_b["versions"].append({"version": 1, "state": "growing",
                                   "is_current": False})
        with pytest.raises(DGConcurrentWrite):
            warehouse.write_meta(ds, meta_b, expected_generation=gen)
        # The winner's claim survived; generation advanced exactly once.
        final = warehouse.read_meta(ds)
        assert len(final["versions"]) == 1
        assert final["generation"] == gen + 1

    def test_concurrent_grows_keep_both_versions(self, spark, tmp_path, warehouse):
        """Two interleaved grow() drivers on one dataset: both claims
        and both final commits must survive (the r4-flagged
        read-modify-write dropped the loser's versions). A barrier in
        the seed callables holds both runs mid-flight so each one's
        final commit happens against meta the other has changed."""
        import threading

        ds = EntityDataset({"race": 1})
        barrier = threading.Barrier(2, timeout=60)
        errors = []

        def seeder(n):
            def run(collection):
                barrier.wait()  # both grows claimed before either commits
                collection.add([{"id": i, "name": f"e {i}"} for i in range(n)])
                return collection
            return run

        def work(n):
            try:
                warehouse.grow(ds, seeder(n), strategy=GrowthStrategy.STACK)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=work, args=(n,)) for n in (2, 3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        meta = warehouse.read_meta(ds)
        assert [v["version"] for v in meta["versions"]] == [1, 2]
        assert all(v["state"] == "complete" for v in meta["versions"])
        sizes = sorted(len(warehouse.load_collection(ds, v)) for v in (1, 2))
        assert sizes == [2, 3]

    def test_commit_entry_merges_into_fresh_meta(self, warehouse):
        ds = EntityDataset({"merge": 1})
        warehouse.commit_entry(ds, {"version": 1, "state": "complete",
                                    "is_current": False}, flip_current=True)
        warehouse.commit_entry(ds, {"version": 2, "state": "complete",
                                    "is_current": False}, flip_current=True)
        meta = warehouse.read_meta(ds)
        assert [v["version"] for v in meta["versions"]] == [1, 2]
        assert [v["is_current"] for v in meta["versions"]] == [False, True]


def _number_documents(df):
    """Harvest-phase example: enumerate documents (reference
    tests/django_project/processors/processors/output.py:10-27)."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("identity"))
    return df.withColumn(
        "properties",
        map_set("properties", "number", F.row_number().over(w).cast("string")),
    )


def _filter_even(df):
    return df.where(F.col("properties")["number"].cast("int") % 2 == 0)


class HarvestDataset(Dataset):
    NAME = "harvested"
    COLLECTION_IDENTIFIER = "id"
    HARVEST_PHASES = ["number_documents", "filter_even"]


class TestHarvestPhases:
    def test_harvest_chain_applied_after_growth(self, spark, tmp_path):
        registry = Registry()
        registry.register("number_documents", _number_documents)
        registry.register("filter_even", _filter_even)
        warehouse = DatasetWarehouse(spark, str(tmp_path / "wh"), registry=registry)
        ds = HarvestDataset()

        def seed(collection):
            collection.add([{"id": i, "name": f"doc {i}"} for i in range(6)])
            return collection

        warehouse.grow(ds, seed)
        coll = warehouse.load_collection(ds, 1)
        content = sorted(coll.content(), key=lambda d: int(d["number"]))
        assert [int(d["number"]) for d in content] == [2, 4, 6]


class TestSkewUtilities:
    def _skewed(self, spark):
        # 900 rows of hot key "A", 100 spread over others
        rows = [("A", i) for i in range(900)] + [(chr(66 + i % 5), i) for i in range(100)]
        return spark.createDataFrame(rows, ["k", "v"])

    def test_salted_join_matches_plain_join(self, spark):
        from datagrowth_spark.operators.skew import salted_join

        left = self._skewed(spark)
        right = spark.createDataFrame(
            [("A", "hot"), ("B", "b"), ("Z", "unmatched")], ["k", "tag"])
        plain = left.join(right, "k", "inner")
        salted = salted_join(left, right, "k", "inner", salt=8)
        assert sorted(salted.columns) == sorted(plain.columns)
        assert salted.count() == plain.count() == 900 + 20
        a = {(r.k, r.v, r.tag) for r in plain.collect()}
        b = {(r.k, r.v, r.tag) for r in salted.collect()}
        assert a == b
        # left join keeps unmatched left rows exactly once
        from pyspark.sql import functions as F
        lp = left.join(right, "k", "left")
        ls = salted_join(left, right, "k", "left", salt=8)
        assert ls.count() == lp.count() == 1000

    def test_salted_aggregate_matches_plain(self, spark):
        from pyspark.sql import functions as F

        from datagrowth_spark.operators.skew import salted_aggregate

        df = self._skewed(spark)
        plain = {
            (r.k): (r.n, r.total, r.lo, r.hi)
            for r in df.groupBy("k").agg(
                F.count("*").alias("n"), F.sum("v").alias("total"),
                F.min("v").alias("lo"), F.max("v").alias("hi")).collect()
        }
        salted = {
            (r.k): (r.n, r.total, r.lo, r.hi)
            for r in salted_aggregate(
                df, "k",
                {"n": ("count", F.lit(1)), "total": ("sum", F.col("v")),
                 "lo": ("min", F.col("v")), "hi": ("max", F.col("v"))},
                salt=8).collect()
        }
        assert salted == plain


class TestCollectionTasks:
    def test_collection_tasks_run_after_document_fixpoint(self, spark, tmp_path):
        registry = Registry()
        registry.register("mark_long_names", _mark_long_names)

        def summarize(collection):
            # collection-level task: write a count into the collection name
            n = len(collection)
            collection.name = f"main"  # unchanged; side-effect free check
            assert n == 3
            return collection

        def explode_task(collection):
            raise RuntimeError("boom")

        registry.register("summarize", summarize)
        registry.register("explode_task", explode_task)

        class DS(Dataset):
            NAME = "ct"
            COLLECTION_IDENTIFIER = "id"
            DOCUMENT_TASKS = {"check_name": {"run": "mark_long_names"}}
            COLLECTION_TASKS = {
                "summary": {"run": "summarize", "depends_on": ["check_name"]},
                "broken": {"run": "explode_task"},
                "blocked": {"run": "summarize", "depends_on": ["missing_task"]},
            }

        warehouse = DatasetWarehouse(spark, str(tmp_path / "wh"), registry=registry)

        def seed(collection):
            collection.add([{"id": i, "name": f"entity {i}"} for i in range(3)])
            return collection

        entry = warehouse.grow(DS(), seed)
        tr = entry["task_results"]
        assert tr["collection:summary"] == {"success": True}
        assert tr["collection:broken"]["success"] is False
        assert "boom" in tr["collection:broken"]["error"]
        assert tr["collection:blocked"] == {"success": None, "skipped": True}
        # document tallies still present
        assert tr["check_name"]["success"] == 3


class TestVersionTasks:
    def test_version_task_merges_entry_and_records_outcome(self, spark, tmp_path):
        registry = Registry()

        def publish(collection, entry):
            return {"published": True, "n_docs": len(collection)}

        def broken(collection, entry):
            raise ValueError("nope")

        registry.register("publish", publish)
        registry.register("broken", broken)

        class DS(Dataset):
            NAME = "vt"
            COLLECTION_IDENTIFIER = "id"
            DATASET_VERSION_TASKS = {
                "publish": {"run": "publish"},
                "broken": {"run": "broken"},
            }

        warehouse = DatasetWarehouse(spark, str(tmp_path / "wh"), registry=registry)

        def seed(collection):
            collection.add([{"id": 1}, {"id": 2}])
            return collection

        entry = warehouse.grow(DS(), seed)
        assert entry["published"] is True and entry["n_docs"] == 2
        assert entry["task_results"]["version:publish"] == {"success": True}
        assert entry["task_results"]["version:broken"]["success"] is False


class TestGrowthJvmPaths:
    """Declarative request templates and flat objectives compile to pure
    Column expressions; these pin their equivalence to the Python paths."""

    def test_declarative_template_signature_parity(self, spark):
        coll = Collection(spark, name="x", identifier="id")
        coll.add([{"id": 7}])
        gp = GrowthProcessor({
            "growth_phase": "p",
            "retrieve_data": {"request_template": {
                "uri_template": "http://mockapi/entities/{}", "args": ["$.id"],
            }},
        })
        row = gp._build_requests(gp.filter_documents(coll.df)).collect()[0]
        expected = http_request("http://mockapi/entities/7")
        assert row.url == "http://mockapi/entities/7"
        assert row.signature == expected["signature"]  # shared cache rows

    def test_flat_objective_jvm_matches_python_path(self, spark, tmp_path):
        coll = Collection(spark, name="entities", identifier="id")
        coll.add([{"id": i} for i in range(4)] + [{"id": 999}])  # 999 -> 404

        def run(force_python):
            c = Collection(spark, name="entities", identifier="id", df=coll.df)
            cache = ResourceCache(
                spark, str(tmp_path / f"cache-{force_python}"))
            gp = GrowthProcessor({
                "growth_phase": "detail",
                "retrieve_data": {"request_template": {
                    "uri_template": "http://mockapi/entities/{}", "args": ["$.id"],
                }},
                "contribute_data": {"objective": {"@": "$", "detail": "$.detail", "score": "$.score"}},
            }, transport=mock_api_transport)
            if force_python:
                gp._extract_contributions_jvm = lambda joined: None
            else:
                # The root "@" selector must stay JVM-compilable
                # (ADVICE r7): otherwise this parity test degenerates
                # to Python == Python.
                assert gp._flat_objective() == {
                    "detail": "$.detail", "score": "$.score"}
            gp(c, cache)
            return {r["identity"]: r.asDict() for r in c.df.collect()}

        jvm, py = run(False), run(True)
        assert set(jvm) == set(py)
        for k in jvm:
            # value-equality, not byte-equality: the variant path
            # canonicalizes number text ("0.0" -> "0")
            jd = {p: {t: json.loads(v) for t, v in (m or {}).items()}
                  for p, m in (jvm[k]["derivatives"] or {}).items()}
            pd_ = {p: {t: json.loads(v) for t, v in (m or {}).items()}
                   for p, m in (py[k]["derivatives"] or {}).items()}
            assert jd == pd_, k
            jr = {t: json.loads(v) for t, v in (jvm[k]["task_results"] or {}).items()}
            pr = {t: json.loads(v) for t, v in (py[k]["task_results"] or {}).items()}
            assert jr == pr, k
        ok = jvm["2"]
        assert json.loads(ok["derivatives"]["detail"]["detail"]) == "detail 2"
        assert json.loads(ok["derivatives"]["detail"]["score"]) == 0.2
        bad = jvm["999"]
        assert json.loads(bad["task_results"]["detail"])["success"] is False


class TestCommitLockTiming:
    def test_waiter_outlasts_stale_threshold_and_breaks_dead_lock(
            self, spark, tmp_path, monkeypatch):
        """ADVICE r5: the acquire deadline must exceed the stale
        threshold, or no waiter arriving right after a writer crash can
        ever break the dead lock. Simulated crash: a lockfile left just
        under the (shrunk) stale threshold — the commit must wait it
        out, break the lock, and succeed."""
        import os as _os
        import time as _time

        from datagrowth_spark.plans.committers import PosixMetaCommitter
        from datagrowth_spark.plans.dataset import DatasetWarehouse

        assert PosixMetaCommitter.LOCK_WAIT_S > PosixMetaCommitter.LOCK_STALE_S
        monkeypatch.setattr(PosixMetaCommitter, "LOCK_STALE_S", 0.6)
        monkeypatch.setattr(PosixMetaCommitter, "LOCK_WAIT_S", 2.0)
        warehouse = DatasetWarehouse(spark, str(tmp_path / "wh"))
        ds = EntityDataset({"stale_lock": 1})
        path = warehouse._meta_path(ds)
        _os.makedirs(_os.path.dirname(path), exist_ok=True)
        with open(path + ".lock", "w") as fh:
            fh.write("99999")  # crashed writer's pid
        start = _time.monotonic()
        warehouse.write_meta(ds, {"signature": ds.signature, "versions": []})
        assert _time.monotonic() - start < PosixMetaCommitter.LOCK_WAIT_S
        assert warehouse.read_meta(ds)["generation"] == 1
        assert not _os.path.exists(path + ".lock")


def _make_cond_store(kind, tmp_path):
    from datagrowth_spark.plans.committers import (
        FileConditionalStore, InMemoryConditionalStore)

    if kind == "memory":
        return InMemoryConditionalStore()
    return FileConditionalStore(str(tmp_path / "objstore"))


@pytest.fixture(params=["memory", "file"])
def cond_store(request, tmp_path):
    """Both ConditionalStore backends: the in-memory executable spec
    and the hard-link filesystem emulation — every race shape below
    runs against each (VERDICT r6 item 5's third backend)."""
    return _make_cond_store(request.param, tmp_path)


class TestObjectStoreCommitter:
    """The warehouse commit protocol on the object-store backend (r5
    verdict item 1): same generation CAS, but the whole commit is one
    conditional put — validated with the same race shapes the POSIX
    backend is tested under, against BOTH ConditionalStore backends."""

    @staticmethod
    def _warehouse(spark, tmp_path, store=None):
        from datagrowth_spark.plans.committers import (
            InMemoryConditionalStore, ObjectStoreMetaCommitter)
        from datagrowth_spark.plans.dataset import DatasetWarehouse

        store = store or InMemoryConditionalStore()
        registry = Registry()
        registry.register("mark_long_names", _mark_long_names)
        return DatasetWarehouse(
            spark, str(tmp_path / "wh"), registry=registry,
            committer=ObjectStoreMetaCommitter(store))

    def test_cas_rejects_stale_generation(self, spark, tmp_path, cond_store):
        from datagrowth_spark.plans.dataset import DGConcurrentWrite

        warehouse = self._warehouse(spark, tmp_path, store=cond_store)
        ds = EntityDataset({"cas_os": 1})
        meta_a = warehouse.read_meta(ds)
        meta_b = warehouse.read_meta(ds)
        gen = meta_a.get("generation", 0)
        meta_a["versions"].append({"version": 1, "state": "growing",
                                   "is_current": False})
        warehouse.write_meta(ds, meta_a, expected_generation=gen)
        meta_b["versions"].append({"version": 1, "state": "growing",
                                   "is_current": False})
        with pytest.raises(DGConcurrentWrite):
            warehouse.write_meta(ds, meta_b, expected_generation=gen)
        final = warehouse.read_meta(ds)
        assert len(final["versions"]) == 1
        assert final["generation"] == gen + 1

    def test_conditional_put_detects_read_put_interleaving(self, spark, tmp_path):
        """A competitor committing BETWEEN our read and our put must
        fail our conditional put (the window a lockfile closes on
        POSIX); commit_entry's retry loop then absorbs it."""
        import json as _json

        from datagrowth_spark.plans.committers import InMemoryConditionalStore

        class RacingStore(InMemoryConditionalStore):
            def __init__(self):
                super().__init__()
                self.raced = False

            def get(self, key):
                out = super().get(key)
                if out is not None and not self.raced:
                    self.raced = True
                    data, gen = out
                    sneaked = _json.loads(data.decode())
                    sneaked["generation"] = sneaked.get("generation", 0) + 1
                    sneaked.setdefault("versions", []).append(
                        {"version": 99, "state": "complete",
                         "is_current": False})
                    super().put_if(key, _json.dumps(sneaked).encode(),
                                   expected=gen)
                return out

        store = RacingStore()
        warehouse = self._warehouse(spark, tmp_path, store=store)
        ds = EntityDataset({"race_os": 1})
        warehouse.commit_entry(ds, {"version": 1, "state": "complete",
                                    "is_current": False})
        # arm the race: next get triggers the sneaked competitor commit
        warehouse.commit_entry(ds, {"version": 2, "state": "complete",
                                    "is_current": False})
        final = warehouse.read_meta(ds)
        assert store.raced
        # both our version 2 AND the competitor's version 99 survive
        assert [v["version"] for v in final["versions"]] == [1, 2, 99]

    def test_concurrent_grows_keep_both_versions(self, spark, tmp_path,
                                                 cond_store):
        """The interleaved-grow race test, identical in shape to the
        POSIX one, against the conditional-put backend."""
        import threading

        from datagrowth_spark.plans.dataset import GrowthStrategy

        warehouse = self._warehouse(spark, tmp_path, store=cond_store)
        ds = EntityDataset({"race_os_grow": 1})
        barrier = threading.Barrier(2, timeout=60)
        errors = []

        def seeder(n):
            def run(collection):
                barrier.wait()
                collection.add([{"id": i, "name": f"e {i}"} for i in range(n)])
                return collection
            return run

        def work(n):
            try:
                warehouse.grow(ds, seeder(n), strategy=GrowthStrategy.STACK)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=work, args=(n,)) for n in (2, 3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        meta = warehouse.read_meta(ds)
        assert [v["version"] for v in meta["versions"]] == [1, 2]
        assert all(v["state"] == "complete" for v in meta["versions"])
        sizes = sorted(len(warehouse.load_collection(ds, v)) for v in (1, 2))
        assert sizes == [2, 3]

    def test_unconditional_commit_retries_like_posix(self, spark, tmp_path):
        """write_meta with NO expected_generation is last-write-wins on
        BOTH backends: POSIX serializes via the lockfile and always
        succeeds, so a lost store race here must be retried against the
        fresh generation, not surfaced as DGConcurrentWrite."""
        import json as _json

        from datagrowth_spark.plans.committers import InMemoryConditionalStore

        class RacingStore(InMemoryConditionalStore):
            def __init__(self):
                super().__init__()
                self.races = 0

            def get(self, key):
                out = super().get(key)
                if self.races < 3:  # competitor sneaks in 3 times
                    self.races += 1
                    if out is not None:
                        data, gen = out
                        sneaked = _json.loads(data.decode())
                    else:
                        gen, sneaked = None, {"versions": []}
                    sneaked["generation"] = sneaked.get("generation", 0) + 1
                    super().put_if(key, _json.dumps(sneaked).encode(),
                                   expected=gen)
                    return out  # stale view: our next put must lose
                return out

        store = RacingStore()
        warehouse = self._warehouse(spark, tmp_path, store=store)
        ds = EntityDataset({"lww_os": 1})
        warehouse.write_meta(ds, {"signature": ds.signature,
                                  "versions": [{"version": 7}]})
        final = warehouse.read_meta(ds)
        assert store.races == 3
        assert [v["version"] for v in final["versions"]] == [7]

    def test_many_writers_stress(self, spark, tmp_path, cond_store):
        """8 threads each CAS-commit a distinct version entry; every
        one must survive (no lost updates under sustained contention)."""
        import threading

        warehouse = self._warehouse(spark, tmp_path, store=cond_store)
        ds = EntityDataset({"stress_os": 1})
        errors = []

        def committer(i):
            try:
                warehouse.commit_entry(
                    ds, {"version": i, "state": "complete",
                         "is_current": False}, retries=50)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=committer, args=(i,))
                   for i in range(1, 9)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        meta = warehouse.read_meta(ds)
        assert [v["version"] for v in meta["versions"]] == list(range(1, 9))


class TestFileConditionalStore:
    """Unit semantics of the hard-link generation CAS itself (the
    warehouse-level races run via the cond_store fixture above)."""

    @staticmethod
    def _store(tmp_path):
        from datagrowth_spark.plans.committers import FileConditionalStore

        return FileConditionalStore(str(tmp_path / "store"))

    def test_generation_semantics(self, tmp_path):
        from datagrowth_spark.plans.committers import StorePreconditionFailed

        store = self._store(tmp_path)
        assert store.get("k") is None
        assert store.put_if("k", b"v1", expected=None) == 1
        assert store.get("k") == (b"v1", 1)
        with pytest.raises(StorePreconditionFailed):
            store.put_if("k", b"again", expected=None)  # must-not-exist
        with pytest.raises(StorePreconditionFailed):
            store.put_if("k", b"stale", expected=0)
        assert store.put_if("k", b"v2", expected=1) == 2
        assert store.get("k") == (b"v2", 2)

    def test_put_if_is_atomic_under_thread_hammer(self, tmp_path):
        import threading

        from datagrowth_spark.plans.committers import StorePreconditionFailed

        store = self._store(tmp_path)
        store.put_if("k", b"0", expected=None)
        wins, errors = [], []
        barrier = threading.Barrier(8, timeout=30)

        def racer(i):
            barrier.wait()
            try:
                store.put_if("k", f"winner-{i}".encode(), expected=1)
                wins.append(i)
            except StorePreconditionFailed:
                pass
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=racer, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errors, errors
        assert len(wins) == 1  # exactly one link-into-place succeeds
        data, gen = store.get("k")
        assert gen == 2 and data == f"winner-{wins[0]}".encode()

    def test_pruning_keeps_window_and_reverts_stale_low_link(self, tmp_path):
        import os as _os

        from datagrowth_spark.plans.committers import StorePreconditionFailed

        store = self._store(tmp_path)
        gen = None
        for i in range(store.KEEP_GENERATIONS + 5):
            gen = store.put_if("k", str(i).encode(), expected=gen)
        d = store._dir("k")
        gens = store._gens(d)
        assert gens[-1] == store.KEEP_GENERATIONS + 5
        assert gens[0] >= gens[-1] - store.KEEP_GENERATIONS
        # ABA guard: a writer whose expected-generation view went stale
        # (its listdir predates newer commits AND the pruning of its
        # target slot) links a below-the-keep-window number — the
        # post-link re-list must self-revert and fail the precondition.
        # The target slot sits where real pruning vacates slots: below
        # max - KEEP (ADVICE r7 narrowed the revert to exactly this).
        real_gens = store._gens
        low = gens[0] - 3          # writer's stale max (long pruned)
        assert (low + 1) not in gens  # its target slot is vacant
        stale = [True]

        def stale_gens(path):
            if stale:  # first call: the writer's pre-link listdir
                stale.pop()
                return [low]
            return real_gens(path)

        store._gens = stale_gens
        with pytest.raises(StorePreconditionFailed, match="pruned slot"):
            store.put_if("k", b"stale", expected=low)
        store._gens = real_gens
        # The reverted link left no below-window file behind...
        assert (low + 1) not in real_gens(d)
        # ...current state is unharmed, and a fresh-read CAS still works.
        data, g = store.get("k")
        assert g == gens[-1]
        assert store.put_if("k", b"next", expected=g) == g + 1

    def test_fast_follower_does_not_revert_committed_write(self, tmp_path):
        """ADVICE r7 (high): writer A links g2 (true max); follower B
        lists before A's re-list, sees g2, commits g3. A must NOT
        unlink its own committed-and-observed g2 — that would falsely
        fail a durable write B already chained from."""
        import os as _os

        store = self._store(tmp_path)
        store.put_if("k", b"base", expected=None)  # g1
        d = store._dir("k")
        real_gens = store._gens
        calls = []

        def gens_with_follower(path):
            calls.append(1)
            if len(calls) == 2:
                # Between A's link of g2 and its re-list, a fast
                # follower read g2 as max and committed g3.
                with open(_os.path.join(d, "g3"), "wb") as fh:
                    fh.write(b"follower")
            return real_gens(path)

        store._gens = gens_with_follower
        assert store.put_if("k", b"mine", expected=1) == 2
        store._gens = real_gens
        # A's durable write is intact (the follower's chain base holds)
        # and the keep window has no hole.
        assert real_gens(d) == [1, 2, 3]
        assert store.get("k") == (b"follower", 3)
        assert store.put_if("k", b"v4", expected=3) == 4

    def test_deep_follower_chain_does_not_revert_committed_write(self, tmp_path):
        """ADVICE r8: writer A links g2 (true max); MORE than
        KEEP_GENERATIONS followers commit g3..g11 inside A's post-link
        window, so A's re-list sees max > new_gen + KEEP — the pruned-
        slot condition — even though g2 was legitimately observed. The
        fresh-mtime successor g3 proves the chain started from A's
        write, so A must return success, not revert."""
        import os as _os

        store = self._store(tmp_path)
        store.put_if("k", b"base", expected=None)  # g1
        d = store._dir("k")
        real_gens = store._gens
        calls = []

        def gens_with_deep_chain(path):
            calls.append(1)
            if len(calls) == 2:
                # followers g3..g{2+KEEP+1} commit after A's link of g2;
                # their files carry post-link mtimes (they chained).
                for g in range(3, 3 + store.KEEP_GENERATIONS + 1):
                    with open(_os.path.join(d, f"g{g}"), "wb") as fh:
                        fh.write(b"follower")
            return real_gens(path)

        store._gens = gens_with_deep_chain
        assert store.put_if("k", b"mine", expected=1) == 2
        store._gens = real_gens
        assert 2 in real_gens(d)  # A's durable write was not unlinked

    def test_pruned_slot_with_surviving_old_successor_still_reverts(self, tmp_path):
        """ADVICE r8 boundary: in a TRUE pruned-slot landing, a
        surviving g{new_gen+1} belongs to the OLD chain (mtime predates
        the stray link) — the revert must still fire."""
        import os as _os

        from datagrowth_spark.plans.committers import StorePreconditionFailed

        store = self._store(tmp_path)
        gen = None
        for i in range(store.KEEP_GENERATIONS + 6):
            gen = store.put_if("k", str(i).encode(), expected=gen)
        d = store._dir("k")
        gens = store._gens(d)
        low = gens[0] - 3           # stale writer's view; slot low+1 vacant
        assert (low + 1) not in gens
        # resurrect an OLD successor file at low+2 with a past mtime —
        # the old chain's survivor the boundary case would see.
        succ = _os.path.join(d, f"g{low + 2}")
        with open(succ, "wb") as fh:
            fh.write(b"old-chain")
        past = _os.path.getmtime(succ) - 3600
        _os.utime(succ, (past, past))
        real_gens = store._gens
        stale = [True]

        def stale_gens(path):
            if stale:
                stale.pop()
                return [low]
            return real_gens(path)

        store._gens = stale_gens
        with pytest.raises(StorePreconditionFailed, match="pruned slot"):
            store.put_if("k", b"stale", expected=low)
        store._gens = real_gens
        assert (low + 1) not in real_gens(d)  # the stray link was reverted

    def test_get_retries_when_chosen_max_vanishes(self, tmp_path):
        """ADVICE r7: a reader whose chosen max file vanishes between
        the listing and the open (a concurrent pruned-slot revert)
        re-lists instead of crashing with FileNotFoundError."""
        store = self._store(tmp_path)
        store.put_if("k", b"v1", expected=None)
        store.put_if("k", b"v2", expected=1)
        real_gens = store._gens
        first = [True]

        def phantom_gens(path):
            if first:
                first.pop()
                return real_gens(path) + [99]  # unlinked before open
            return real_gens(path)

        store._gens = phantom_gens
        assert store.get("k") == (b"v2", 2)
        store._gens = real_gens

    def test_no_temp_debris_after_contention(self, tmp_path):
        from datagrowth_spark.plans.committers import StorePreconditionFailed

        store = self._store(tmp_path)
        store.put_if("k", b"a", expected=None)
        with pytest.raises(StorePreconditionFailed):
            store.put_if("k", b"b", expected=None)
        leftovers = [n for n in os.listdir(store._dir("k"))
                     if n.startswith(".tmp-")]
        assert leftovers == []


class TestSnapshotIsolatedReads:
    """r5 verdict item 4: collection reads pin an immutable snapshot
    path, so a reader holding a DataFrame survives a concurrent regrow
    that re-saves the same version (the old layout rmtree'd the very
    directory under the reader's lazily-read files)."""

    @staticmethod
    def _warehouse(spark, tmp_path):
        registry = Registry()
        registry.register("mark_long_names", _mark_long_names)
        return DatasetWarehouse(spark, str(tmp_path / "wh"), registry=registry)

    @staticmethod
    def _seeder(ids, prefix="entity"):
        def run(collection):
            collection.add([{"id": i, "name": f"{prefix} {i}"} for i in ids])
            return collection
        return run

    def test_long_reader_survives_concurrent_regrow(self, spark, tmp_path):
        warehouse = self._warehouse(spark, tmp_path)
        ds = EntityDataset({"snap": 1})
        warehouse.grow(ds, self._seeder(range(3)))
        # Long reader: pins version 1's current snapshot, collects LATER.
        reader = warehouse.load_collection(ds, 1)
        reader_df = reader.df.select(F.col("properties")["id"].alias("id"))
        # Concurrent regrow of the SAME version re-saves its collection.
        warehouse.grow(ds, self._seeder(range(3, 6), prefix="another"),
                       retry=True)
        got = sorted(r["id"] for r in reader_df.collect())
        assert got == ["0", "1", "2"]  # the pinned snapshot, unchanged
        # A fresh load sees the regrown state.
        fresh = warehouse.load_collection(ds, 1)
        assert len(fresh) == 6

    def test_snapshots_are_garbage_collected_with_one_grace_generation(
            self, spark, tmp_path):
        warehouse = self._warehouse(spark, tmp_path)
        ds = EntityDataset({"snap_gc": 1})
        warehouse.grow(ds, self._seeder(range(2)))
        for i in range(3):
            warehouse.grow(ds, self._seeder([10 + i]), retry=True)
        vdir = warehouse._version_dir(ds, 1)
        snaps = warehouse._snapshots(vdir, "main")
        assert len(snaps) == 2  # current + one grace generation
        assert snaps[-1][0] == 4  # 4 saves happened
        assert not any(n.startswith(".staging-") for n in os.listdir(vdir))

    def test_crashed_staging_dirs_are_swept_when_stale(self, spark, tmp_path):
        """A writer that died mid-save leaves a .staging-* dir; the next
        save sweeps it once it's older than any legitimate in-flight
        write could be — fresh staging dirs are left alone."""
        import time as _time

        warehouse = self._warehouse(spark, tmp_path)
        ds = EntityDataset({"staging_gc": 1})
        warehouse.grow(ds, self._seeder(range(2)))
        vdir = warehouse._version_dir(ds, 1)
        crashed = os.path.join(vdir, ".staging-deadbeef-main-s9.parquet")
        fresh = os.path.join(vdir, ".staging-cafebabe-main-s9.parquet")
        active = os.path.join(vdir, ".staging-0ddba11-main-s9.parquet")
        os.makedirs(crashed)
        os.makedirs(fresh)
        old = _time.time() - 7200
        os.utime(crashed, (old, old))
        # A >1h-running Spark write: top-level dir mtime is job-START
        # time (task files land under _temporary/), but inner files are
        # being touched — inactivity-based staleness must keep it.
        tmp_inner = os.path.join(active, "_temporary", "0")
        os.makedirs(tmp_inner)
        with open(os.path.join(tmp_inner, "task-file.parquet"), "w") as fh:
            fh.write("x")
        os.utime(active, (old, old))
        warehouse.grow(ds, self._seeder([99]), retry=True)
        assert not os.path.exists(crashed)
        assert os.path.exists(fresh)
        assert os.path.exists(active)  # fresh inner file ⇒ in-flight, kept

    def test_revise_clone_copies_only_latest_snapshot(self, spark, tmp_path):
        warehouse = self._warehouse(spark, tmp_path)
        ds = EntityDataset({"snap_clone": 1})
        warehouse.grow(ds, self._seeder(range(2)))
        warehouse.grow(ds, self._seeder([7]), retry=True)  # two snapshots in v1
        entry = warehouse.grow(ds, self._seeder([8]),
                               strategy=GrowthStrategy.REVISE)
        assert entry["version"] == 2
        v2 = warehouse._version_dir(ds, 2)
        # clone seeded exactly one snapshot; the grow's save made the 2nd
        snaps = warehouse._snapshots(v2, "main")
        assert [k for k, _ in snaps] == [1, 2]
        assert len(warehouse.load_collection(ds, 2)) == 4  # 0,1,7 + 8

    def test_save_reraises_non_race_rename_failures(self, spark, tmp_path,
                                                    monkeypatch):
        """Only ENOTEMPTY/EEXIST (a concurrent retry-grow won the
        publish) may swallow the staged snapshot; an EACCES/EXDEV/EIO
        rename failure must raise instead of repointing the collection
        at a path that does not exist (ADVICE r6)."""
        import errno

        warehouse = self._warehouse(spark, tmp_path)
        ds = EntityDataset({"snap_errno": 1})
        warehouse.grow(ds, self._seeder(range(2)))
        coll = warehouse.load_collection(ds, 1)
        coll.add([{"id": 9, "name": "later"}])

        def deny(src, dst):
            raise PermissionError(errno.EACCES, "denied", dst)

        monkeypatch.setattr(os, "replace", deny)
        with pytest.raises(PermissionError):
            warehouse.save_collection(ds, 1, coll)
        monkeypatch.undo()
        # The infra fault did not corrupt state: a plain retry succeeds.
        warehouse.save_collection(ds, 1, coll)
        assert len(warehouse.load_collection(ds, 1)) == 3

    def test_save_race_loser_adopts_winner_snapshot(self, spark, tmp_path,
                                                    monkeypatch):
        """The legitimate race path: rename fails ENOTEMPTY because the
        other retry-grow already published this K — the loser drops its
        staged dir and reads the winner's committed snapshot."""
        import errno

        warehouse = self._warehouse(spark, tmp_path)
        ds = EntityDataset({"snap_race": 1})
        warehouse.grow(ds, self._seeder(range(2)))
        winner = warehouse.load_collection(ds, 1)
        winner.add([{"id": 7, "name": "winner"}])
        warehouse.save_collection(ds, 1, winner)  # publishes s2

        loser = warehouse.load_collection(ds, 1)
        real_replace = os.replace

        def contended(src, dst):
            if ".staging-" in src:
                raise OSError(errno.ENOTEMPTY, "not empty", dst)
            return real_replace(src, dst)

        # Force the loser to compute the same K as an in-flight winner
        # would: point it at the pre-publish snapshot list.
        vdir = warehouse._version_dir(ds, 1)
        snaps = warehouse._snapshots(vdir, "main")
        monkeypatch.setattr(warehouse, "_snapshots",
                            lambda *a, **k: snaps[:-1])
        monkeypatch.setattr(os, "replace", contended)
        warehouse.save_collection(ds, 1, loser)
        monkeypatch.undo()
        # Loser adopted the winner's s2 content; no staging debris.
        assert {r["name"] for r in loser.content()} >= {"winner"}
        assert not [p for p in os.listdir(vdir) if p.startswith(".staging-")]

    def test_legacy_flat_layout_reads_as_snapshot_zero(self, spark, tmp_path):
        warehouse = self._warehouse(spark, tmp_path)
        ds = EntityDataset({"snap_legacy": 1})
        coll = Collection(spark, name="main", identifier="id")
        coll.add([{"id": 1, "name": "legacy"}])
        flat = os.path.join(warehouse._version_dir(ds, 1), "main.parquet")
        os.makedirs(os.path.dirname(flat), exist_ok=True)
        coll.df.write.mode("overwrite").parquet(flat)
        loaded = warehouse.load_collection(ds, 1)
        assert len(loaded) == 1
        # the next save supersedes the flat layout, then GCs it one save later
        loaded.add([{"id": 2, "name": "second"}])
        warehouse.save_collection(ds, 1, loaded)
        assert os.path.exists(flat)  # grace generation
        again = warehouse.load_collection(ds, 1)
        warehouse.save_collection(ds, 1, again)
        assert not os.path.exists(flat)
        assert len(warehouse.load_collection(ds, 1)) == 2
