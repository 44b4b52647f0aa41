"""Connected-components / cluster resolution / decontamination tests.

The graph operator has no reference counterpart (beyond-reference LLM
pipeline layer); tests cover component correctness on adversarial
shapes (chains force multi-round convergence, unlike the near-clique
dedup graphs) and the keep/drop cluster decision.
"""

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators.dedup import contamination_flags
from datagrowth_spark.operators.graph import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


class TestConnectedComponents:
    def test_two_components_and_isolated_pair(self, spark):
        # {1,2,3} triangle, {10,11} pair — labels are each component's min
        edges = _edges(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
        got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_chain_converges_beyond_one_round(self, spark):
        # A path graph 9-8-7-...-1 has diameter 8: the min label must
        # propagate the full length, which single-round banding-style
        # reasoning would miss.
        edges = _edges(spark, [(i, i + 1) for i in range(1, 9)])
        got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
        assert got == {i: 1 for i in range(1, 10)}

    def test_direction_does_not_matter(self, spark):
        got = {r["node"]: r["component"]
               for r in connected_components(_edges(spark, [(5, 2), (2, 9)])).collect()}
        assert got == {2: 2, 5: 2, 9: 2}

    @pytest.mark.parametrize("algorithm", ["min_label", "star", "auto"])
    def test_algorithms_agree_on_mixed_graph(self, spark, algorithm):
        # chain 1..6, triangle {10,11,12}, pair {20,21}, isolated self-loop 30
        pairs = [(i, i + 1) for i in range(1, 6)]
        pairs += [(10, 11), (11, 12), (10, 12), (20, 21), (30, 30)]
        got = {r["node"]: r["component"]
               for r in connected_components(_edges(spark, pairs),
                                             algorithm=algorithm).collect()}
        expected = {i: 1 for i in range(1, 7)}
        expected.update({10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30})
        assert got == expected

    def test_star_chain_logarithmic_rounds(self, spark):
        # Path graph of 128 nodes (diameter 127): min-label needs ~127
        # rounds; large-star/small-star must finish in O(log d) — the
        # Kiveris bound. 12 rounds is ~1.7x log2(127), far below O(d).
        from datagrowth_spark.operators.graph import _star_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 128)], "u long, v long")
        labels, rounds = _star_components(pairs)
        assert rounds <= 12
        got = {r["node"]: r["component"] for r in labels.collect()}
        assert got == {i: 1 for i in range(1, 129)}

    def test_auto_contracts_unconverged_chain(self, spark):
        # With a tiny min-label budget the auto path must hand off to
        # star rounds and still produce exact components.
        edges = _edges(spark, [(i, i + 1) for i in range(1, 64)])
        got = {r["node"]: r["component"]
               for r in connected_components(edges, algorithm="auto",
                                             min_label_rounds=2).collect()}
        assert got == {i: 1 for i in range(1, 65)}


class TestDedupClusters:
    def test_cluster_decision(self, spark):
        edges = _edges(spark, [(3, 7), (7, 12), (20, 21)])
        rows = {r["doc_id"]: r for r in dedup_clusters(edges).collect()}
        assert rows[3]["cluster_id"] == 3 and rows[3]["is_canonical"]
        assert rows[7]["cluster_id"] == 3 and not rows[7]["is_canonical"]
        assert rows[12]["cluster_size"] == 3
        assert rows[20]["is_canonical"] and rows[21]["cluster_id"] == 20
        # exactly one canonical per cluster
        assert sum(r["is_canonical"] for r in rows.values()) == 2


class TestDecontamination:
    def test_overlap_flags(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "completely unrelated text about nothing shared at all"),
                (3, "the quick brown fox jumps over something else entirely"),
            ],
            "doc_id long, text string",
        )
        benchmark = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in
                contamination_flags(corpus, benchmark, min_overlap=3).collect()}
        assert rows[1]["contaminated"] and rows[1]["overlap"] >= 5
        assert not rows[2]["contaminated"] and rows[2]["overlap"] == 0
        # shares "the quick brown", "quick brown fox", "brown fox jumps",
        # "fox jumps over" = 4 shingles
        assert rows[3]["overlap"] == 4 and rows[3]["contaminated"]

    def test_every_corpus_doc_reported(self, spark):
        corpus = spark.createDataFrame(
            [(i, f"doc number {i} unique words only") for i in range(6)],
            "doc_id long, text string")
        benchmark = spark.createDataFrame([(9, "nothing in common")],
                                          "doc_id long, text string")
        out = contamination_flags(corpus, benchmark)
        assert out.count() == 6
        assert out.where(F.col("contaminated")).count() == 0


class TestPageRank:
    """pagerank — fixed-iteration power method with dangling mass."""

    def test_two_cycle_is_uniform_fixed_point(self, spark):
        from datagrowth_spark.operators.graph import pagerank

        e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(e, iterations=7).collect()}
        assert got[1] == pytest.approx(0.5) and got[2] == pytest.approx(0.5)

    def test_dangling_mass_redistributed_hand_computed(self, spark):
        from datagrowth_spark.operators.graph import pagerank

        # 1 -> 2, node 2 dangling. One iteration from (0.5, 0.5):
        # dangling = 0.5; r(1) = 0.075 + 0.85*0.25 = 0.2875,
        # r(2) = 0.075 + 0.85*(0.5 + 0.25) = 0.7125. Sum stays 1.
        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(e, iterations=1).collect()}
        assert got[1] == pytest.approx(0.2875)
        assert got[2] == pytest.approx(0.7125)
        assert sum(got.values()) == pytest.approx(1.0)

    def test_hub_outranks_leaves(self, spark):
        from datagrowth_spark.operators.graph import pagerank

        edges = [(i, 0) for i in range(1, 6)] + [(0, i) for i in range(1, 6)]
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(e, iterations=10).collect()}
        assert got[0] > max(got[i] for i in range(1, 6))
        assert sum(got.values()) == pytest.approx(1.0)


class TestHybridComponents:
    """driver-side union-find (small graphs) vs distributed rounds."""

    def test_driver_and_distributed_paths_agree(self, spark):
        import random

        rng = random.Random(31)
        pairs = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
        edges = _edges(spark, pairs)
        local = {(r["node"], r["component"])
                 for r in connected_components(edges).collect()}
        dist = {(r["node"], r["component"])
                for r in connected_components(edges, driver_threshold=0).collect()}
        star = {(r["node"], r["component"])
                for r in connected_components(edges, algorithm="star").collect()}
        assert local == dist == star and local

    def test_distributed_path_still_used_above_threshold(self, spark):
        got = {r["node"]: r["component"]
               for r in connected_components(_edges(spark, [(1, 2), (2, 3)]),
                                             driver_threshold=1).collect()}
        assert got == {1: 1, 2: 1, 3: 1}
