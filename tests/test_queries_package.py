"""The queries package split (r11 verdict item 7): the by-family
modules must re-export a registry identical to the former
single-module surface — same keys, same function objects, same
pairing invariants the driver contract relies on."""

import importlib

from datagrowth_spark import queries as Q


class TestRegistryIntegrity:
    def test_queries_and_oracle_keys_pair(self):
        qs, sql = Q.queries(), Q.oracle_sql()
        assert set(sql) <= set(qs)
        assert all(isinstance(v, str) and v.strip().upper().startswith(
            ("WITH", "SELECT")) for v in sql.values())

    def test_every_registry_entry_is_the_hoisted_function(self):
        for key, fn in Q.queries().items():
            assert getattr(Q, f"q_{key}") is fn

    def test_every_q_function_is_registered(self):
        qs = Q.queries()
        defined = {n[2:] for n in dir(Q) if n.startswith("q_")}
        assert defined == set(qs)

    def test_family_modules_hoisted_identically(self):
        # the package namespace must expose exactly the family
        # modules' definitions (same objects, not copies)
        for fam in ["relational", "events", "text", "dedup",
                    "similarity", "multimodal", "corpus", "trainer",
                    "pipeline", "streaming", "registry", "_shared"]:
            mod = importlib.import_module(f"datagrowth_spark.queries.{fam}")
            for name in vars(mod):
                if name.startswith("q_") or name.startswith("SQL_"):
                    assert getattr(Q, name) is getattr(mod, name), name

    def test_compat_helpers_still_importable(self):
        # consumers import these from the queries namespace directly
        from datagrowth_spark.queries import (  # noqa: F401
            _events, _t, oracle_sql, queries, release_caches)
