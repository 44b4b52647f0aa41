"""Unigram-LM tokenizer trainer (operators/unigram.py): segmentation
optimality, reconstruction invariants, layout independence, contracts."""

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators.unigram import (
    MAX_PIECE_LEN, _segment_word_py, unigram_train)


def _wf(spark, rows):
    return spark.createDataFrame(rows, "w string, freq int")


class TestUnigramTrain:
    def test_frequent_substring_becomes_piece(self, spark):
        """'est' dominates the corpus, so the trained model segments
        the -est words with it rather than char-by-char."""
        wf = _wf(spark, [("newest", 8), ("widest", 6), ("lowest", 7),
                         ("low", 5), ("new", 4)])
        res = unigram_train(wf, k=2, vocab_multi=30)
        try:
            assert res.counts.get("est", 0) >= 2
            segs = {r["w"]: list(r["pieces"])
                    for r in res.segment(res.caches[0]).collect()}
            for w in ("newest", "lowest"):
                assert "est" in segs[w], segs
            # every -est word splits into multi-char pieces, never chars
            for w in ("newest", "widest", "lowest"):
                assert all(len(p) >= 2 for p in segs[w]), segs
        finally:
            res.cleanup()

    def test_pieces_rejoin_to_word(self, spark):
        """Any Viterbi segmentation concatenates back to the word —
        the reconstruction never drops or duplicates characters."""
        wf = _wf(spark, [("abcabc", 3), ("bcabca", 2), ("cabcab", 1),
                         ("a", 9), ("abc", 5)])
        res = unigram_train(wf, k=2, vocab_multi=10)
        try:
            for r in res.segment(res.caches[0]).collect():
                assert "".join(r["pieces"]) == r["w"]
        finally:
            res.cleanup()

    def test_segmentation_achieves_forward_optimum(self, spark):
        """Σ score(piece) of the reconstructed segmentation equals the
        forward DP's best value — backtrack is consistent with forward."""
        wf = _wf(spark, [("banana", 4), ("bandana", 3), ("nana", 5)])
        res = unigram_train(wf, k=1, vocab_multi=20)
        try:
            from datagrowth_spark.operators.unigram import (
                _forward, _map_score_at, _piece_map)
            pm = _piece_map(res.scores6)
            score_at = _map_score_at(F.col("w"), F.col("__pm"))
            rows = (res.segment(res.caches[0])
                    .withColumn("__pm", pm)
                    .withColumn("bests", _forward(F.col("w"), score_at,
                                                  MAX_PIECE_LEN))
                    .select("w", "pieces", "bests").collect())
            for r in rows:
                got = sum(res.scores6[p] for p in r["pieces"])
                assert got == r["bests"][len(r["w"])], r["w"]
        finally:
            res.cleanup()

    def test_layout_independent(self, spark):
        """Integer path sums and model-sized collects make training a
        pure function of the data — identical on any partitioning."""
        rows = [(w, f) for f, w in enumerate(
            ["alpha", "alphabet", "bet", "beta", "betray", "ray"], 2)]
        a = unigram_train(_wf(spark, rows).repartition(7), k=2, vocab_multi=15)
        b = unigram_train(_wf(spark, rows).coalesce(1), k=2, vocab_multi=15)
        try:
            assert a.scores6 == b.scores6
            assert a.counts == b.counts
        finally:
            a.cleanup()
            b.cleanup()

    def test_long_words_excluded(self, spark):
        wf = _wf(spark, [("short", 5), ("a" * 20, 100)])
        res = unigram_train(wf, k=1, vocab_multi=10, maxw=16)
        try:
            assert res.caches[0].count() == 1
            assert all("aaaa" != p for p in res.scores6)
        finally:
            res.cleanup()

    def test_unseen_char_segments_null(self, spark):
        """Documented contract: segmenting a word with a character the
        model never saw yields NULL pieces instead of a wrong split."""
        wf = _wf(spark, [("abc", 3), ("bca", 2)])
        res = unigram_train(wf, k=1, vocab_multi=10)
        try:
            frame = spark.createDataFrame([("abz",)], "w string")
            (row,) = res.segment(frame).collect()
            assert row["pieces"] is None
        finally:
            res.cleanup()

    def test_em_rounds_do_not_decrease_viterbi_objective(self, spark):
        """Hard-EM sanity: the freq-weighted best-path total under the
        round-(r+1) model is >= under the round-r model evaluated on
        its own segmentation counts (monotone on this fixture)."""
        wf = _wf(spark, [("mamma", 6), ("mam", 4), ("amma", 5), ("ma", 8)])
        objs = []
        for k in (0, 1, 2):
            res = unigram_train(wf, k=k, vocab_multi=12)
            try:
                total = sum(c * res.scores6[p]
                            for p, c in res.counts.items()) if k else None
                if k:
                    objs.append(total)
            finally:
                res.cleanup()
        assert objs[1] >= objs[0]

    def test_cleanup_releases_caches(self, spark):
        res = unigram_train(_wf(spark, [("ab", 1)]), k=1, vocab_multi=5)
        assert res.caches
        res.cleanup()
        assert res.caches == []


class TestBroadcastCarrier:
    """The one-row broadcast piece-map carrier (r9 verdict item 1)
    must produce bit-equal models and segmentations vs the literal
    expression, including at realistic structural bounds (maxp=8,
    multi-k vocab — r9 verdict item 5)."""

    def test_train_and_segment_bit_equal(self, spark):
        wf = _wf(spark, [("newest", 8), ("widest", 6), ("lowest", 7),
                         ("low", 5), ("new", 4), ("west", 3)])
        lit = unigram_train(wf, k=2, vocab_multi=30, use_broadcast=False)
        bc = unigram_train(wf, k=2, vocab_multi=30, use_broadcast=True)
        try:
            assert lit.scores6 == bc.scores6
            assert lit.counts == bc.counts
            lseg = {r["w"]: list(r["pieces"])
                    for r in lit.segment(lit.caches[0],
                                         use_broadcast=False).collect()}
            bseg = {r["w"]: list(r["pieces"])
                    for r in bc.segment(bc.caches[0],
                                        use_broadcast=True).collect()}
            assert lseg == bseg
        finally:
            lit.cleanup()
            bc.cleanup()

    def test_broadcast_plan_shape(self, spark):
        """The join E-step's plan broadcast-HASH-joins the piece frame
        (O(1) per candidate) — no model-sized literal, no map column
        at all (map lookups are linear scans, the measured r10
        cliff)."""
        wf = _wf(spark, [("banana", 4), ("bandana", 3)])
        res = unigram_train(wf, k=1, vocab_multi=10)
        try:
            plan = res.segment(res.caches[0], use_broadcast=True) \
                ._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan
            assert "map_from_arrays" not in plan
        finally:
            res.cleanup()

    def test_arrow_train_and_segment_bit_equal(self, spark):
        """The r12 Arrow carrier (mapInPandas integer DP) trains and
        segments bit-equal to BOTH JVM carriers — the three-way
        equality that lets auto select it for large vocabs."""
        wf = _wf(spark, [("newest", 8), ("widest", 6), ("lowest", 7),
                         ("low", 5), ("new", 4), ("west", 3)])
        lit = unigram_train(wf, k=2, vocab_multi=30, carrier="map")
        ar = unigram_train(wf, k=2, vocab_multi=30, carrier="arrow")
        try:
            assert ar.carrier == "arrow" and lit.carrier == "map"
            assert lit.scores6 == ar.scores6
            assert lit.counts == ar.counts
            lseg = {r["w"]: list(r["pieces"])
                    for r in lit.segment(lit.caches[0],
                                         carrier="map").collect()}
            aseg = {r["w"]: list(r["pieces"])
                    for r in ar.segment(ar.caches[0],
                                        carrier="arrow").collect()}
            assert lseg == aseg
        finally:
            lit.cleanup()
            ar.cleanup()

    def test_arrow_is_the_auto_carrier_above_threshold(self, spark):
        """Auto selection: tiny vocab → literal map (job count
        dominates), past MAP_BCAST_THRESHOLD → the Arrow segmenter;
        the join carrier stays reachable only via the forced flag
        (the *_bcast queries' contract)."""
        wf = _wf(spark, [("newest", 8), ("widest", 6), ("lowest", 7)])
        small = unigram_train(wf, k=1, vocab_multi=5)
        forced = unigram_train(wf, k=1, vocab_multi=5, use_broadcast=True)
        try:
            assert small.carrier == "map"
            assert forced.carrier == "join"
        finally:
            small.cleanup()
            forced.cleanup()
        import random
        rng = random.Random(3)
        words = {"".join(rng.choice("abcdef") for _ in range(rng.randint(4, 12))):
                 rng.randint(1, 9) for _ in range(400)}
        big = unigram_train(_wf(spark, list(words.items())), k=1,
                            vocab_multi=400)
        try:
            assert len(big.scores6) > 256  # fixture really crosses the bound
            assert big.carrier == "arrow"
        finally:
            big.cleanup()

    def test_arrow_unseen_char_and_null_word(self, spark):
        """Contract parity on the degenerate inputs: OOV char → NULL
        pieces, NULL word → NULL pieces — exactly the JVM
        when(reachable, ...) semantics."""
        wf = _wf(spark, [("abc", 3), ("bca", 2)])
        res = unigram_train(wf, k=1, vocab_multi=10)
        try:
            frame = spark.createDataFrame([("abz",), (None,)], "w string")
            rows = {r["w"]: r["pieces"]
                    for r in res.segment(frame, carrier="arrow").collect()}
            assert rows["abz"] is None
            assert rows[None] is None
        finally:
            res.cleanup()

    def test_segment_word_py_smallest_piece_tiebreak(self):
        """On a tied optimum the backtrack must take the SMALLEST
        piece length first — the fixed rule both JVM carriers and the
        oracle apply. scores: 'ab'+'c' ties 'a'+'bc' ties 'abc'; the
        walk runs right-to-left, so at pos 3 the 1-char 'c' wins, then
        at pos 2 the 1-char 'b', then 'a'."""
        scores = {"a": -10, "b": -10, "c": -10,
                  "ab": -20, "bc": -20, "abc": -30}
        assert _segment_word_py("abc", scores, 4) == ["a", "b", "c"]
        # drop the single chars: the 2-gram split must win over 'abc'
        scores2 = {"ab": -20, "c": -10, "abc": -30}
        assert _segment_word_py("abc", scores2, 4) == ["ab", "c"]
        assert _segment_word_py("", scores, 4) == []
        assert _segment_word_py(None, scores, 4) is None
        assert _segment_word_py("zz", scores, 4) is None

    def test_maxp8_large_vocab_paths_equal(self, spark):
        """Realistic structural bounds: maxp=8 with a multi-thousand-
        piece seed vocab on a zipf-ish synthetic corpus. Pins (a) the
        Viterbi fold's O(maxp) lambda still compiles at maxp=8, and
        (b) literal and broadcast E-steps pick identical
        segmentations at a vocab the literal path can still inline."""
        import random

        rng = random.Random(7)
        alphabet = "abcdefgh"
        words = {}
        for i in range(600):
            n = rng.randint(4, 14)
            w = "".join(rng.choice(alphabet) for _ in range(n))
            words[w] = words.get(w, 0) + rng.randint(1, 50)
        # a few heavy stems so multi-char pieces actually win
        for stem in ("abcdefgh", "hgfedcba", "aabbccdd"):
            for suf in ("", "ab", "gh", "cd"):
                words[stem + suf] = 400
        wf = _wf(spark, list(words.items()))
        lit = unigram_train(wf, k=1, vocab_multi=4000, maxp=8,
                            use_broadcast=False)
        bc = unigram_train(wf, k=1, vocab_multi=4000, maxp=8,
                           use_broadcast=True)
        ar = unigram_train(wf, k=1, vocab_multi=4000, maxp=8,
                           carrier="arrow")
        try:
            assert len(lit.scores6) > 2000  # the fixture really is big
            assert lit.scores6 == bc.scores6
            assert lit.scores6 == ar.scores6  # r12 Arrow carrier too
            assert lit.counts == ar.counts
            lseg = {r["w"]: list(r["pieces"])
                    for r in lit.segment(lit.caches[0], use_broadcast=False)
                    .collect()}
            bseg = {r["w"]: list(r["pieces"])
                    for r in bc.segment(bc.caches[0], use_broadcast=True)
                    .collect()}
            aseg = {r["w"]: list(r["pieces"])
                    for r in ar.segment(ar.caches[0], carrier="arrow")
                    .collect()}
            assert lseg == bseg
            assert lseg == aseg
            heavy = lseg["abcdefghab"]
            assert "".join(heavy) == "abcdefghab"
            assert any(len(p) >= 4 for p in heavy), heavy
        finally:
            lit.cleanup()
            bc.cleanup()
            ar.cleanup()
