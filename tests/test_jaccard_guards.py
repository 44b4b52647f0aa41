"""r13 guards on the n-gram pair family: the size-ratio prune (a
provably result-identical map-side filter below the pair exchange) and
the ``max_shingle_df`` stop-shingle cap engaged on the query paths.

Both are pinned against a brute-force Python reference over the same
distinct-shingle sets, so any drift in the pruned plan's OUTPUT (not
just its shape) fails here before the oracle sees it.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _shingle_sets(docs: dict[int, str], n: int = 3) -> dict[int, set]:
    out = {}
    for i, text in docs.items():
        toks = [t for t in text.lower().split() if t]
        out[i] = {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}
    return out


def _brute_jaccard(sets: dict[int, set], threshold: float,
                   max_df: int | None = None) -> dict[tuple, float]:
    """Reference semantics: inter over shingles with df <= max_df (when
    set), DENOMINATORS over the full distinct sets, 6dp round-half-up
    like both engines."""
    from decimal import ROUND_HALF_UP, Decimal

    df: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    ids = sorted(sets)
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter_set = sets[a] & sets[b]
            if max_df is not None:
                inter_set = {g for g in inter_set if df[g] <= max_df}
            if not inter_set:
                continue
            inter = len(inter_set)
            jac = Decimal(inter) / Decimal(len(sets[a]) + len(sets[b]) - inter)
            jac = float(jac.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))
            if jac >= threshold:
                out[(a, b)] = jac
    return out


@pytest.fixture(scope="module")
def hetero_docs():
    """Heterogeneous sizes ON PURPOSE: stubs sharing a shingle with
    books exercise the size-ratio prune's drop side; mutated copies
    exercise its keep side near the threshold boundary."""
    rng = random.Random(137)
    vocab = [f"w{i}" for i in range(40)]
    docs: dict[int, str] = {}
    for i in range(60):
        r = rng.random()
        if i > 5 and r < 0.3:
            src = docs[rng.randrange(i)].split()
            for _ in range(max(1, len(src) // 10)):
                src[rng.randrange(len(src))] = rng.choice(vocab)
            docs[i] = " ".join(src)
        elif r < 0.55:
            docs[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 8)))
        else:
            docs[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(60, 160)))
    return docs


@pytest.mark.parametrize("threshold", [0.1, 0.5, 0.8])
def test_size_ratio_prune_matches_bruteforce(spark, hetero_docs, threshold):
    from datagrowth_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(list(hetero_docs.items()), "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, n=3, threshold=threshold).collect()}
    want = _brute_jaccard(_shingle_sets(hetero_docs), threshold)
    assert got == want
    if threshold == 0.1:
        assert got, "fixture must produce pairs at the loose threshold"


def test_size_ratio_prune_actually_prunes(spark, hetero_docs):
    """The fixture must contain co-occurring pairs whose size-ratio
    BOUND misses the threshold — i.e. the prune is exercised, not
    vacuously green (a stub and a book sharing one shingle)."""
    sets = _shingle_sets(hetero_docs)
    pruned = 0
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not sets[a] & sets[b]:
                continue
            lo = min(len(sets[a]), len(sets[b]))
            if round(lo / (len(sets[a]) + len(sets[b]) - lo), 6) < 0.1:
                pruned += 1
    assert pruned > 0


def test_max_shingle_df_semantics(spark):
    """Cap semantics pinned: a stop-shingle in > cap docs contributes
    NOTHING to any intersection, while denominators stay the full
    per-doc distinct-shingle counts (computed before the cap)."""
    from datagrowth_spark.operators.dedup import ngram_jaccard_pairs

    stop = "the quick fox"  # one 3-gram in every doc
    docs = {
        0: stop + " a b c d e",
        1: stop + " a b c d f",
        2: stop + " x y z q r",
        3: stop + " m n o p s",
        4: stop + " g h i j k",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(
               df, n=3, threshold=0.01, max_shingle_df=3).collect()}
    want = _brute_jaccard(_shingle_sets(docs), 0.01, max_df=3)
    assert got == want
    # the stop-gram alone linked every pair; with the cap only the
    # 0-1 mutated pair (real 3-gram overlap) survives
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got)
    # denominator check: sizes include the capped stop shingles
    sets = _shingle_sets(docs)
    inter_kept = len({g for g in sets[0] & sets[1]
                      if sum(g in s for s in sets.values()) <= 3})
    assert got[(0, 1)] == round(
        inter_kept / (len(sets[0]) + len(sets[1]) - inter_kept), 6)


def test_containment_cap_matches_bruteforce(spark):
    from datagrowth_spark.operators.dedup import ngram_containment_pairs

    stop = "lorem ipsum dolor sit"
    docs = {
        0: stop + " a b c d e f g h",
        1: stop + " a b c",          # subset-ish of 0 plus the stop run
        2: stop + " x y z w v u",
        3: stop + " p q r s t o",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): (r["cont_a"], r["cont_b"])
           for r in ngram_containment_pairs(
               df, n=3, threshold=0.3, max_shingle_df=2).collect()}
    # brute force with the same cap
    sets = _shingle_sets(docs)
    dfreq: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            dfreq[g] = dfreq.get(g, 0) + 1
    want = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len({g for g in sets[a] & sets[b] if dfreq[g] <= 2})
            if not inter:
                continue
            ca = round(inter / len(sets[a]), 6)
            cb = round(inter / len(sets[b]), 6)
            if max(ca, cb) >= 0.3:
                want[(a, b)] = (ca, cb)
    assert got == want
    assert (0, 1) in got  # the genuine doc-in-doc pair survives the cap
