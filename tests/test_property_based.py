"""Property-based tests (hypothesis) for the engine kernel.

The reference's path language, signature hashing, and properties
encoding are the invariants the whole engine leans on (cache keys,
upsert keys, extraction); fuzzing them buys more assurance than more
examples would. Spark-side equivalence (prop_col vs reach) runs once
over a seeded generated corpus in a single action — hypothesis drives
the pure-Python invariants only, so the suite stays fast.
"""

import json
import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from datagrowth_spark.core.reach import override_dict, reach
from datagrowth_spark.datatypes.document import decode_properties, encode_properties
from datagrowth_spark.sources.signatures import (
    make_signature,
    normalize_cmd,
    normalize_url,
)

# -- strategies -------------------------------------------------------------

keys = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-10**6, 10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=20),
)
json_data = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(keys, children, max_size=4),
    ),
    max_leaves=12,
)
payloads = st.dictionaries(keys, json_data, max_size=6)


# -- reach ------------------------------------------------------------------

def _all_paths(data, prefix="$"):
    """Every resolvable dot-path (skipping dict keys that contain dots —
    those are only reachable via the literal-key fallback)."""
    out = []
    if isinstance(data, dict):
        for key, value in data.items():
            if "." in key or not key:
                continue
            out.append((f"{prefix}.{key}", value))
            out.extend(_all_paths(value, f"{prefix}.{key}"))
    elif isinstance(data, (list, tuple)):
        for idx, value in enumerate(data):
            out.append((f"{prefix}.{idx}", value))
            out.extend(_all_paths(value, f"{prefix}.{idx}"))
    return out


@settings(max_examples=200, deadline=None)
@given(json_data)
def test_reach_resolves_every_existing_path(data):
    for path, expected in _all_paths(data):
        assert reach(path, data) == expected
    assert reach("$", data) == data


@settings(max_examples=100, deadline=None)
@given(payloads)
def test_reach_missing_paths_return_default(data):
    sentinel = object()
    assert reach("$.zzznot.there", data, default=sentinel) is sentinel


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(keys, scalars, max_size=4), json_data)
def test_reach_literal_dotted_key_fallback(data, value):
    data = dict(data)
    data["a.b.c"] = value
    result = reach("$.a.b.c", data)
    if "a" not in data:  # stepwise walk fails -> whole-path literal key
        assert result == value


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(keys, scalars), st.dictionaries(keys, scalars))
def test_override_dict_is_union_child_wins(parent, child):
    merged = override_dict(parent, child)
    assert set(merged) == set(parent) | set(child)
    for key in child:
        assert merged[key] == child[key]
    for key in set(parent) - set(child):
        assert merged[key] == parent[key]


# -- signatures -------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(payloads)
def test_signature_key_order_invariant(data):
    shuffled_items = list(data.items())
    random.Random(0).shuffle(shuffled_items)
    assert make_signature("u", data) == make_signature("u", dict(shuffled_items))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(keys, st.text(string.ascii_letters, max_size=8)), max_size=5))
def test_url_normalization_param_order_invariant(params):
    from urllib.parse import quote

    base = "https://api.example.org/path"
    qs = "&".join(f"{quote(k)}={quote(v)}" for k, v in params)
    reordered = "&".join(f"{quote(k)}={quote(v)}" for k, v in reversed(params))
    assert normalize_url(f"{base}?{qs}") == normalize_url(f"{base}?{reordered}")
    assert normalize_url(f"http://api.example.org/path?{qs}") == normalize_url(
        f"https://api.example.org/path?{qs}")


def test_cmd_normalization_flag_order_invariant():
    assert normalize_cmd(["tool", "--b=2", "--a=1", "input"]) == \
        normalize_cmd(["tool", "--a=1", "--b=2", "input"])


@settings(max_examples=100, deadline=None)
@given(payloads)
def test_properties_encoding_roundtrip(data):
    assert decode_properties(encode_properties(data)) == json.loads(json.dumps(data))


def test_prop_col_matches_reach_on_generated_corpus(spark):
    """Column path compiler agrees with the driver-side reach on a
    seeded random corpus — one DataFrame, one action."""
    from datagrowth_spark.datatypes.document import prop_col

    rng = random.Random(7)
    corpus = []
    for i in range(60):
        corpus.append({
            "id": i,
            "a": {"b": [rng.randint(0, 9) for _ in range(3)], "c": f"s{i}"},
            "flag": rng.random() < 0.5,
            "items": [{"k": rng.randint(0, 3)} for _ in range(2)],
        })
    df = spark.createDataFrame(
        [(encode_properties(p),) for p in corpus], "properties map<string,string>")
    paths = ["$.id", "$.a.b.1", "$.a.c", "$.flag", "$.items.0.k", "$.a", "$.missing"]
    cols = [prop_col("properties", p).alias(f"c{i}") for i, p in enumerate(paths)]
    rows = df.select(*cols).collect()

    def as_json_string(value):
        if value is None:
            return None
        if isinstance(value, str):
            return value  # get_json_object unquotes scalars
        return json.dumps(value, sort_keys=True, separators=(",", ":"))

    for row, payload in zip(rows, corpus):
        for i, path in enumerate(paths):
            assert row[f"c{i}"] == as_json_string(reach(path, payload)), (
                f"path {path} over {payload}")


def test_simhash_banding_full_recall_on_adversarial_signatures(spark):
    """Pigeonhole banding recall: EVERY pair within the hamming budget is
    found, regardless of WHICH bits differ — including pairs whose
    differing bits all sit in the high half (the case a top-half-only
    blocking scheme silently drops). Verified against the exhaustive
    O(n²) answer on seeded random signatures plus adversarial flips."""
    from datagrowth_spark.operators.dedup import simhash_pairs_from_signatures

    rng = random.Random(11)
    bits, max_hamming = 32, 3
    sigs = []
    base_ids = []
    for i in range(40):
        sigs.append((2 * i, rng.getrandbits(bits)))
        base_ids.append(2 * i)
    # One partner per base, flipping 1..max_hamming bits biased to the
    # HIGH half so every block boundary gets exercised.
    for i, base in enumerate(base_ids):
        flips = rng.sample(range(16, 32), k=(i % max_hamming) + 1) if i % 2 \
            else rng.sample(range(32), k=(i % max_hamming) + 1)
        partner = sigs[i][1]
        for b in flips:
            partner ^= 1 << b
        sigs.append((base + 1, partner))
    df = spark.createDataFrame(sigs, "id long, simhash long")

    found = {(r["id_a"], r["id_b"], r["hamming"])
             for r in simhash_pairs_from_signatures(df, bits, max_hamming).collect()}
    expected = set()
    for (ia, sa) in sigs:
        for (ib, sb) in sigs:
            if ia < ib and bin(sa ^ sb).count("1") <= max_hamming:
                expected.add((ia, ib, bin(sa ^ sb).count("1")))
    assert found == expected
    assert len(expected) >= 40  # every constructed partner pair present


def test_merge_maps_matches_dict_update_on_generated_corpus(spark):
    """merge_maps_last_win over a seeded random corpus equals Python
    dict-update of the decoded payloads — one DataFrame, one action,
    running under the default EXCEPTION dedup policy (the vanilla-
    session contract the driver oracle enforces)."""
    from pyspark.sql import functions as F

    from datagrowth_spark.functions.maps import merge_maps_first_win, merge_maps_last_win

    rng = random.Random(11)
    key_pool = [f"k{i}" for i in range(8)]  # small pool -> frequent overlap
    rows, expected_last, expected_first = [], [], []
    for i in range(80):
        base = {k: rng.randint(0, 99) for k in rng.sample(key_pool, rng.randint(0, 6))}
        over = {k: rng.randint(0, 99) for k in rng.sample(key_pool, rng.randint(0, 6))}
        rows.append((encode_properties(base), encode_properties(over)))
        expected_last.append(encode_properties({**base, **over}))
        expected_first.append(encode_properties({**over, **base}))
    df = spark.createDataFrame(rows, "m1 map<string,string>, m2 map<string,string>")
    got = df.select(
        merge_maps_last_win("m1", "m2").alias("lw"),
        merge_maps_first_win("m1", "m2").alias("fw"),
    ).collect()
    for row, el, ef in zip(got, expected_last, expected_first):
        assert dict(row["lw"]) == el
        assert dict(row["fw"]) == ef


def test_span_rewrite_matches_bruteforce_on_generated_corpus(spark):
    """drop_duplicated_spans over a seeded random dup-heavy corpus
    equals a brute-force Python rewrite: same covered positions, same
    keeper election, same reassembled text — one DataFrame, one action."""
    from datagrowth_spark.operators.dedup import drop_duplicated_spans

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab -> organic span collisions
    n = 4
    docs = {}
    for i in range(60):
        if i > 0 and rng.random() < 0.3:
            src = docs[rng.randrange(i)].split()
            cut = rng.randrange(len(src) + 1)
            toks = src[:cut] + [rng.choice(vocab) for _ in range(rng.randint(0, 8))]
        else:
            toks = [rng.choice(vocab) for _ in range(rng.randint(0, 14))]
        docs[i] = " ".join(toks)

    # brute force: span -> doc set; covered positions per non-keeper doc
    span_docs = {}
    for i, text in docs.items():
        toks = text.split()
        for p in range(len(toks) - n + 1):
            span_docs.setdefault(tuple(toks[p:p + n]), set()).add(i)
    expected = {}
    for i, text in docs.items():
        toks = text.split()
        covered = set()
        for p in range(len(toks) - n + 1):
            holders = span_docs[tuple(toks[p:p + n])]
            if len(holders) > 1 and i != min(holders):
                covered.update(range(p, p + n))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        expected[i] = (len(toks), len(covered), " ".join(kept))

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_deduped"])
           for r in drop_duplicated_spans(df, n=n).collect()}
    assert got == expected


def test_incremental_dedup_consistent_with_full_lsh(spark):
    """Verdicts from the store+batch incremental path must equal what
    full-corpus banded LSH implies for the batch ids: same candidate
    construction, so for every new doc the minimum qualifying partner
    (store or earlier batch member) and its est_jaccard agree."""
    from datagrowth_spark.operators.dedup import (
        incremental_minhash_dedup, minhash_lsh_pairs, minhash_signature)

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(30)]
    docs = {}
    for i in range(50):
        if i > 10 and rng.random() < 0.4:
            src = docs[rng.randrange(i)].split()
            # light mutation -> near-dup with high (not always 1.0) sim
            if src and rng.random() < 0.5:
                src[rng.randrange(len(src))] = rng.choice(vocab)
            docs[i] = " ".join(src)
        else:
            docs[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 20)))
    from pyspark.sql import functions as F

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    store_docs = df.where(F.col("doc_id") % 3 != 0)
    batch = df.where(F.col("doc_id") % 3 == 0)

    store_sigs = minhash_signature(store_docs, num_hashes=16, n=3)
    result = incremental_minhash_dedup(
        batch, store_sigs, num_hashes=16, bands=4, n=3, threshold=0.4)
    got = {r["id"]: (r["dup_of"], r["est_jaccard"])
           for r in result.verdicts.collect()}
    result.cleanup()

    full = minhash_lsh_pairs(df, num_hashes=16, bands=4, n=3, threshold=0.4).collect()
    batch_ids = {r["doc_id"] for r in batch.collect()}
    best = {}
    for r in full:
        a, b, est = r["id_a"], r["id_b"], r["est_jaccard"]
        # orient: new doc vs (store or earlier-batch) partner
        for new, other in ((a, b), (b, a)):
            if new in batch_ids and (other not in batch_ids or other < new):
                cur = best.get(new)
                if cur is None or other < cur[0]:
                    best[new] = (other, est)
    for new_id, (dup_of, est) in got.items():
        exp = best.get(new_id)
        if exp is None:
            assert dup_of is None, (new_id, dup_of)
        else:
            assert (dup_of, est) == exp, (new_id, (dup_of, est), exp)
    assert any(v[0] is not None for v in got.values())  # dups actually found


def test_ngram_novelty_matches_bruteforce_on_generated_corpus(spark):
    """ngram_novelty over a seeded dup-heavy corpus equals a brute-force
    Python first-owner computation — one DataFrame, one action."""
    from datagrowth_spark.operators.dedup import ngram_novelty

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(9)]  # tiny vocab -> heavy gram sharing
    n = 3
    docs = {}
    for i in range(50):
        if i > 0 and rng.random() < 0.25:
            docs[i] = docs[rng.randrange(i)]  # exact copy
        else:
            docs[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 10)))

    first = {}
    for i in sorted(docs):
        toks = docs[i].split()
        for p in range(len(toks) - n + 1):
            first.setdefault(tuple(toks[p:p + n]), i)
    expected = {}
    for i, text in docs.items():
        grams = {tuple(text.split()[p:p + n]) for p in range(len(text.split()) - n + 1)}
        if grams:
            novel = sum(1 for g in grams if first[g] == i)
            expected[i] = (len(grams), novel)

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"])
           for r in ngram_novelty(df, n=n).collect()}
    assert got == expected
