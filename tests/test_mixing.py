"""Mixture rebalancing (operators/mixing.py)."""

from datagrowth_spark.operators import mixing as MX


def _docs(spark):
    rows = [(i, "web") for i in range(100)] + [(100 + i, "books") for i in range(20)] + [
        (200 + i, "junk") for i in range(10)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_rates_bottleneck_source(spark):
    # books is the bottleneck: T = min(100/0.5, 20/0.5) = 40 →
    # web keeps 20/100 (200‰), books keeps 20/20 (1000‰), junk drops.
    rates = {
        r["source"]: (r["n_docs"], r["rate_permille"])
        for r in MX.mixture_rates(_docs(spark), {"web": 0.5, "books": 0.5}).collect()
    }
    assert rates["web"] == (100, 200)
    assert rates["books"] == (20, 1000)
    assert rates["junk"] == (10, 0)


def test_rebalance_filters_and_audits(spark):
    kept = MX.rebalance(_docs(spark), {"web": 0.5, "books": 0.5}).collect()
    by_source = {}
    for r in kept:
        assert r["bucket"] < r["rate_permille"]
        by_source.setdefault(r["source"], 0)
        by_source[r["source"]] += 1
    assert "junk" not in by_source
    assert by_source["books"] == 20  # rate 1000‰ keeps everything
    # Hash buckets approximate the 200‰ rate on 100 keys.
    assert 10 <= by_source["web"] <= 30


def test_temperature_rates_flatten_toward_uniform(spark):
    # alpha=0.3 flattens shares: low-resource sources get mix_rate above
    # their raw share p, dominant sources below; rates sum to ~1.
    rows = {
        r["source"]: r for r in MX.temperature_rates(_docs(spark), alpha=0.3).collect()
    }
    assert abs(rows["web"]["p"] - 100 / 130) < 1e-6
    assert rows["web"]["mix_rate"] < rows["web"]["p"]
    assert rows["books"]["mix_rate"] > rows["books"]["p"]
    assert rows["junk"]["mix_rate"] > rows["junk"]["p"]
    assert abs(sum(r["mix_rate"] for r in rows.values()) - 1.0) < 1e-4
    # ordering preserved: bigger corpus still gets the bigger rate
    assert rows["web"]["mix_rate"] > rows["books"]["mix_rate"] > rows["junk"]["mix_rate"]


def test_temperature_alpha_one_is_proportional(spark):
    rows = {
        r["source"]: r for r in MX.temperature_rates(_docs(spark), alpha=1.0).collect()
    }
    for r in rows.values():
        assert abs(r["mix_rate"] - r["p"]) < 1e-5


def test_rebalance_is_deterministic(spark):
    a = sorted(r["doc_id"] for r in MX.rebalance(_docs(spark), {"web": 1.0}).collect())
    b = sorted(
        r["doc_id"]
        for r in MX.rebalance(_docs(spark).repartition(7), {"web": 1.0}).collect()
    )
    assert a == b  # partition-layout independent
