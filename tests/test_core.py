"""Kernel-utility tests: reach, config, registry (no Spark needed).

Behavioral expectations mirror the reference's unit suites
(tests/utils/test_data.py, tests/configuration/*, tests/registry/*).
"""

import pytest

from datagrowth_spark.core.config import ConfigurationNotFoundError, ConfigurationType, create_config
from datagrowth_spark.core.reach import override_dict, reach
from datagrowth_spark.core.registry import ProcessorFactory, Registry, RegistryError


DATA = {
    "dict": {"test": "nested value", "list": ["nested value 0", "nested value 1"], "dict": {"test": "test"}},
    "list": ["value 0", "value 1", {"test": "nested value"}],
    "dotted.key": "another value",
    "value": "value",
}


class TestReach:
    def test_dict_access(self):
        assert reach("$.dict.test", DATA) == "nested value"
        assert reach("$.value", DATA) == "value"

    def test_list_access(self):
        assert reach("$.list.0", DATA) == "value 0"
        assert reach("$.list.2.test", DATA) == "nested value"
        assert reach("$.dict.list.1", DATA) == "nested value 1"

    def test_whole_value(self):
        assert reach("$", DATA) is DATA
        assert reach(None, DATA) is DATA

    def test_missing_returns_default(self):
        assert reach("$.nope", DATA) is None
        assert reach("$.nope.deeper", DATA, default=42) == 42
        assert reach("$.list.9", DATA) is None

    def test_literal_key_fallback(self):
        assert reach("$.dotted.key", DATA) == "another value"

    def test_invalid_path_raises(self):
        with pytest.raises(ValueError):
            reach("dict.test", DATA)

    def test_override_dict(self):
        out = override_dict({"a": 1, "b": 2}, {"b": 3})
        assert out == {"a": 1, "b": 3}


class TestConfiguration:
    def test_namespace_fallback(self):
        config = create_config("http_resource", {"test": 1})
        assert config.test == 1
        assert config.timeout == 30  # http_resource_timeout default
        assert config.batch_size == 100  # global fallback

    def test_missing_raises(self):
        config = create_config("global", {})
        with pytest.raises(ConfigurationNotFoundError):
            _ = config.does_not_exist

    def test_user_input_keys(self):
        config = create_config("global", {"$page_size": 10})
        assert config.page_size == 10

    def test_supplement_does_not_override(self):
        config = create_config("global", {"x": 1})
        config.supplement(x=2, y=3)
        assert config.x == 1 and config.y == 3

    def test_serde_roundtrip(self):
        config = create_config("http_resource", {"test": 1, "_protected": "p"})
        as_dict = config.to_dict(protected=True, private=True)
        clone = ConfigurationType.from_dict(as_dict)
        assert clone.test == 1
        assert clone.timeout == 30
        assert "_protected" not in config.to_dict()

    def test_clone_independent(self):
        config = create_config("global", {"x": 1})
        clone = config.clone()
        clone.x = 2
        assert config.x == 1 and clone.x == 2


class TestRegistry:
    def test_register_and_resolve(self):
        reg = Registry()

        @reg.register()
        def my_func():
            return "ok"

        assert reg.get("my_func") is my_func
        assert "my_func" in reg

    def test_missing_raises(self):
        reg = Registry()
        with pytest.raises(RegistryError):
            reg.get("ghost")

    def test_processor_factory(self):
        reg = Registry()

        class EchoProcessor:
            config_namespace = "global"

            def __init__(self, config):
                self.config = config

            def run(self, value):
                return value, self.config.batch_size

        reg.register("EchoProcessor", EchoProcessor)
        factory = ProcessorFactory("EchoProcessor.run", registry=reg)
        method = factory.build({"batch_size": 7})
        assert method("x") == ("x", 7)


class TestTaggedRegistry:
    """Tagged registration with lazy import paths and default configs
    (reference registry/types.py:42-223)."""

    def test_tag_parsing(self):
        from datagrowth_spark.core.registry import Tag

        tag = Tag.from_string("Processor:Extract")
        assert tag == ("processor", "extract") and str(tag) == "processor:extract"
        with pytest.raises(ValueError):
            Tag.from_string("no-colon")

    def test_import_class_walks_path(self):
        from datagrowth_spark.core.registry import import_class

        cls = import_class("datagrowth_spark.operators.extraction.ExtractProcessor")
        from datagrowth_spark.operators.extraction import ExtractProcessor

        assert cls is ExtractProcessor
        with pytest.raises(ImportError):
            import_class("no.such.module.Class")

    def test_register_by_path_is_lazy(self):
        reg = Registry()
        # a bogus path registers fine (nothing imports yet)...
        reg.register_class("processor:ghost", "no.such.module.Ghost")
        assert reg.tags("processor") == [("processor", "ghost")]
        # ...and only resolution fails
        with pytest.raises(ImportError):
            reg.get_class("processor:ghost")

    def test_build_tagged_merges_default_config(self):
        reg = Registry()

        class TunedProcessor:
            config_namespace = "global"

            def __init__(self, config):
                self.config = config

        reg.register_class("processor:tuned", TunedProcessor,
                           config={"batch_size": 5, "sample_size": 9})
        built = reg.get_processor("processor:tuned", {"batch_size": 7})
        assert built.config.batch_size == 7  # override wins
        assert built.config.sample_size == 9  # registered default survives
        with pytest.raises(RegistryError):
            reg.get_resource("processor:tuned")  # category checked

    def test_resolve_falls_back_to_import_path(self):
        reg = Registry()
        fn = reg.resolve(
            "datagrowth_spark.operators.extraction.ExtractProcessor.extract_from_resource")
        from datagrowth_spark.operators.extraction import ExtractProcessor

        assert fn is ExtractProcessor.extract_from_resource


class TestDefaultsLoading:
    """register_defaults + file/env loading (reference
    configuration/types.py:371-388, configuration/loaders.py)."""

    def setup_method(self):
        from datagrowth_spark.core.config import DEFAULT_CONFIG

        self._snapshot = dict(DEFAULT_CONFIG)

    def teardown_method(self):
        from datagrowth_spark.core.config import DEFAULT_CONFIG

        DEFAULT_CONFIG.clear()
        DEFAULT_CONFIG.update(self._snapshot)

    def test_register_defaults_feeds_new_configs(self):
        from datagrowth_spark.core.config import ConfigurationType, register_defaults

        register_defaults("my_pipeline", {"chunk_size": 64})
        config = ConfigurationType(namespace="my_pipeline")
        assert config.chunk_size == 64

    def test_defaults_file_discovery_and_load(self, tmp_path):
        import json

        from datagrowth_spark.core.config import (
            ConfigurationType, discover_defaults_file, load_defaults_file)

        nested = tmp_path / "project" / "sub"
        nested.mkdir(parents=True)
        path = tmp_path / "project" / "datagrowth.json"
        path.write_text(json.dumps({"my_source": {"timeout": 5}}))
        found = discover_defaults_file(str(nested))
        assert found == str(path)
        assert load_defaults_file(found) == ["my_source"]
        assert ConfigurationType(namespace="my_source").timeout == 5

    def test_env_overlay_coerces_and_warns_on_unknown(self, caplog):
        from datagrowth_spark.core.config import ConfigurationType, load_env_defaults

        applied = load_env_defaults({
            "DATAGROWTH_SPARK_HTTP_RESOURCE_TIMEOUT": "60",
            "DATAGROWTH_SPARK_GLOBAL_CACHE_ONLY": "true",
            "DATAGROWTH_SPARK_NO_SUCH_KEY": "x",
            "UNRELATED": "y",
        })
        assert applied == {"http_resource_timeout": 60, "global_cache_only": True}
        config = ConfigurationType(namespace="http_resource")
        assert config.timeout == 60 and config.get("cache_only") is True


class TestDatetimeParity:
    """Reference utils/datetime.py round-trip semantics."""

    def test_driver_roundtrip_and_fallback(self):
        from datetime import datetime

        from datagrowth_spark.functions.datetime import (
            format_datetime,
            parse_datetime_string,
        )

        dt = datetime(2020, 5, 17, 13, 45, 30, 123456)
        assert parse_datetime_string(format_datetime(dt)) == dt
        assert parse_datetime_string("garbage") == datetime(1970, 1, 1)
        assert parse_datetime_string(None) == datetime(1970, 1, 1)

    def test_column_roundtrip_matches_driver(self, spark):
        from datetime import datetime

        from datagrowth_spark.functions.datetime import (
            format_datetime,
            format_datetime_col,
            parse_datetime_col,
        )

        dt = datetime(2020, 5, 17, 13, 45, 30, 123456)
        df = spark.createDataFrame([(format_datetime(dt),), ("junk",), (None,)], ["s"])
        rows = df.select(parse_datetime_col("s").alias("ts")).collect()
        assert rows[0].ts == dt
        assert rows[1].ts == datetime(1970, 1, 1)
        assert rows[2].ts == datetime(1970, 1, 1)
        back = df.limit(1).select(
            format_datetime_col(parse_datetime_col("s")).alias("s2")
        ).collect()[0].s2
        assert back == format_datetime(dt)


class TestScopedConf:
    """scoped_conf — set/restore without leaking caller session state."""

    def test_restores_previous_value(self, spark):
        from datagrowth_spark.core.session import scoped_conf

        before = spark.conf.get("spark.sql.shuffle.partitions")
        with scoped_conf(spark, {"spark.sql.shuffle.partitions": 3}):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
        assert spark.conf.get("spark.sql.shuffle.partitions") == before

    def test_unsets_previously_unset_key(self, spark):
        from datagrowth_spark.core.session import scoped_conf

        key = "spark.sql.legacy.sessionInitWithConfigDefaults.dgsprobe"
        assert spark.conf.get(key, None) is None
        with scoped_conf(spark, {key: "true"}):
            assert spark.conf.get(key) == "true"
        assert spark.conf.get(key, None) is None

    def test_restores_on_exception(self, spark):
        import pytest as _pytest

        from datagrowth_spark.core.session import scoped_conf

        before = spark.conf.get("spark.sql.shuffle.partitions")
        with _pytest.raises(RuntimeError):
            with scoped_conf(spark, {"spark.sql.shuffle.partitions": 5}):
                raise RuntimeError("boom")
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
