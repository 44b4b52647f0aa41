"""BPE-merge trainer (operators/bpe.py): textbook fixture, greedy
non-overlap semantics, determinism, checkpointing, early stop."""

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators.bpe import SEP, bpe_train


def _wf(spark, rows):
    return spark.createDataFrame(rows, "w string, freq int")


class TestBpeTrain:
    def test_textbook_merges(self, spark):
        """The Sennrich running example: es -> est dominate, then the
        tie-broken tail; merged symbols participate in later rounds."""
        wf = _wf(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
        res = bpe_train(wf, k=4)
        try:
            merges = [tuple(r) for r in res.merges.collect()]
            assert merges[0] == (1, "e", "s", "es", 9)
            assert merges[1] == (2, "es", "t", "est", 9)
            # round 3: (l,o)=7 from low+lower beats everything else
            assert merges[2] == (3, "l", "o", "lo", 7)
            assert merges[3] == (4, "lo", "w", "low", 7)
            segs = {tuple(r["syms"]) for r in res.word_symbols.collect()}
            assert ("low",) in segs
            assert ("n", "e", "w", "est") in segs
            vocab = {r["symbol"]: r["freq"] for r in res.vocab.collect()}
            assert vocab["est"] == 9 and vocab["low"] == 7
        finally:
            res.cleanup()

    def test_greedy_nonoverlapping_merge(self, spark):
        """'aaaa' + pair (a,a): counts include overlaps (3 per word),
        the rewrite is greedy left-to-right -> [aa, aa]; 'aaa' -> [aa, a]."""
        wf = _wf(spark, [("aaaa", 2), ("aaa", 1)])
        res = bpe_train(wf, k=1)
        try:
            (m,) = res.merges.collect()
            assert (m["lhs"], m["rhs"], m["pair_count"]) == ("a", "a", 2 * 3 + 1 * 2)
            segs = sorted(tuple(r["syms"]) for r in res.word_symbols.collect())
            assert segs == [("aa", "a"), ("aa", "aa")]
        finally:
            res.cleanup()

    def test_tiebreak_on_pair_string(self, spark):
        """Equal counts resolve by (lhs ASC, rhs ASC) — a total order,
        so training is layout-independent."""
        wf = _wf(spark, [("ba", 3), ("ab", 3)])
        res = bpe_train(wf, k=1)
        try:
            (m,) = res.merges.collect()
            assert (m["lhs"], m["rhs"]) == ("a", "b")
        finally:
            res.cleanup()

    def test_early_stop_when_fully_merged(self, spark):
        """k larger than the available merges stops at an empty pair
        table instead of erroring or emitting bogus rows."""
        wf = _wf(spark, [("ab", 4)])
        res = bpe_train(wf, k=10)
        try:
            merges = res.merges.collect()
            assert len(merges) == 1
            assert merges[0]["merged"] == "ab"
            assert [tuple(r["syms"]) for r in res.word_symbols.collect()] == [("ab",)]
        finally:
            res.cleanup()

    def test_checkpoint_rounds_bound_caches(self, spark):
        """checkpoint_rounds re-persists and drops the prior cache, so
        the handle never holds more than base + one checkpoint."""
        wf = _wf(spark, [("abcdefgh", 2), ("abcdefgi", 1), ("bcdefgh", 1)])
        res = bpe_train(wf, k=5, checkpoint_rounds=2)
        try:
            assert len(res.caches) <= 2
            assert res.merges.count() == 5
            # result equals the unchunked run
            res2 = bpe_train(wf, k=5, checkpoint_rounds=100)
            try:
                assert ([tuple(r) for r in res.merges.collect()]
                        == [tuple(r) for r in res2.merges.collect()])
            finally:
                res2.cleanup()
        finally:
            res.cleanup()

    def test_newline_chars_stay_encoded(self, spark):
        """(?s) DOTALL (ADVICE r8): a newline inside a word is a symbol
        like any other — without DOTALL it would escape the separator
        wrapping and glue onto neighbor symbols."""
        wf = _wf(spark, [("a\nb", 3), ("a\nc", 1)])
        res = bpe_train(wf, k=1)
        try:
            (m,) = res.merges.collect()
            assert (m["lhs"], m["rhs"], m["pair_count"]) == ("a", "\n", 4)
            segs = sorted(tuple(r["syms"]) for r in res.word_symbols.collect())
            assert segs == [("a\n", "b"), ("a\n", "c")]
        finally:
            res.cleanup()

    def test_sep_words_excluded_from_training(self, spark):
        """Hard input contract (ADVICE r8): a word containing the
        symbol separator cannot be represented — the trainer drops it
        instead of mining fake boundaries out of it."""
        wf = _wf(spark, [(f"x{SEP}y", 100), ("ab", 2)])
        res = bpe_train(wf, k=1)
        try:
            (m,) = res.merges.collect()
            assert (m["lhs"], m["rhs"], m["pair_count"]) == ("a", "b", 2)
            assert res.word_symbols.count() == 1
        finally:
            res.cleanup()

    def test_separator_encoding_roundtrip(self, spark):
        """Initial encoding wraps every char; symbols never leak the
        separator into merged tokens."""
        wf = _wf(spark, [("xyz", 1)])
        res = bpe_train(wf, k=2)
        try:
            for r in res.vocab.collect():
                assert SEP not in r["symbol"]
        finally:
            res.cleanup()


class TestBpeEncode:
    def test_encode_replays_training_segmentation(self, spark):
        """Merge-replay on the trained words reproduces word_symbols
        (BPE encode = replay, Sennrich 2016 §3.2)."""
        from datagrowth_spark.operators.bpe import bpe_encode

        wf = _wf(spark, [("low", 5), ("lower", 2), ("newest", 6),
                         ("widest", 3), ("aaa", 4)])
        res = bpe_train(wf, k=4)
        try:
            merges = [(r["lhs"], r["rhs"]) for r in res.merges.collect()]
            enc = bpe_encode(wf.select("w"), merges)
            got = {r["w"]: tuple(r["syms"]) for r in enc.collect()}
            want = {r["w"]: tuple(r["syms"])
                    for r in res.word_symbols.collect()}
            assert got == want
        finally:
            res.cleanup()

    def test_encode_sep_word_passes_through_unsegmented(self, spark):
        """Hard input contract (ADVICE r8): a SEP-carrying word comes
        back as one opaque symbol instead of corrupting segmentation."""
        from datagrowth_spark.operators.bpe import bpe_encode

        weird = f"x{SEP}ab"
        frame = spark.createDataFrame([(weird,), ("ab",)], "w string")
        got = {r["w"]: tuple(r["syms"])
               for r in bpe_encode(frame, [("a", "b")]).collect()}
        assert got[weird] == (weird,)
        assert got["ab"] == ("ab",)

    def test_encode_unseen_word(self, spark):
        """Unseen words segment with whatever merges apply — the
        open-vocabulary property."""
        from datagrowth_spark.operators.bpe import bpe_encode

        wf = _wf(spark, [("newest", 6), ("widest", 3)])
        res = bpe_train(wf, k=2)  # es, then est
        try:
            merges = [(r["lhs"], r["rhs"]) for r in res.merges.collect()]
            unseen = spark.createDataFrame([("bestest",)], "w string")
            (row,) = bpe_encode(unseen, merges).collect()
            assert tuple(row["syms"]) == ("b", "est", "est")
        finally:
            res.cleanup()


class TestWordpieceTrain:
    def test_likelihood_score_beats_raw_count(self, spark):
        """The defining WordPiece/BPE difference: (c, ##d) has count 2
        but score 2/(2*2)=0.5; (a, ##b) has count 10 but score
        10/(10*10)=0.1 — WordPiece merges the rare-but-cohesive pair
        first where BPE would take the frequent one."""
        from datagrowth_spark.operators.bpe import wordpiece_train

        wf = _wf(spark, [("ab", 10), ("cd", 2)])
        res = wordpiece_train(wf, k=1)
        try:
            (m,) = res.merges.collect()
            assert (m["lhs"], m["rhs"], m["merged"]) == ("c", "##d", "cd")
            assert m["pair_count"] == 2
            assert m["score"] == 0.5
        finally:
            res.cleanup()

    def test_continuation_prefix_convention(self, spark):
        """First char bare, later chars ##-prefixed; merging two
        continuations strips the right ##; reconstruction re-joins to
        the original word."""
        from datagrowth_spark.operators.bpe import wordpiece_train

        # only (##b, ##c) exists beyond single occurrences: one word.
        wf = _wf(spark, [("abc", 4)])
        res = wordpiece_train(wf, k=1)
        try:
            (m,) = res.merges.collect()
            # two candidate pairs, both score 4/(4*4)=0.25 -> l ASC
            # tiebreak: '##b' < 'a' (ASCII '#' < 'a')
            assert (m["lhs"], m["rhs"], m["merged"]) == ("##b", "##c", "##bc")
            segs = {tuple(r["syms"]): r["w"] for r in res.word_symbols.collect()}
            assert segs == {("a", "##bc"): "abc"}
            vocab = {r["symbol"]: r["freq"] for r in res.vocab.collect()}
            assert vocab == {"a": 4, "##bc": 4}
        finally:
            res.cleanup()

    def test_merged_symbol_participates_in_later_rounds(self, spark):
        from datagrowth_spark.operators.bpe import wordpiece_train

        wf = _wf(spark, [("abc", 3)])
        res = wordpiece_train(wf, k=2)
        try:
            merges = [(r["lhs"], r["rhs"], r["merged"])
                      for r in res.merges.collect()]
            assert len(merges) == 2
            # round 1: (a,##b) and (##b,##c) tie at 3/(3*3) -> l ASC
            # ('#' < 'a') picks (##b,##c)
            assert merges[0] == ("##b", "##c", "##bc")
            # round 2: the merged ##bc pairs with a
            assert merges[1] == ("a", "##bc", "abc")
        finally:
            res.cleanup()

    def test_hash_and_sep_words_excluded(self, spark):
        """Input contract: '#'-carrying words would fake continuation
        prefixes, SEP-carrying words would fake symbol boundaries —
        both are filtered out of training."""
        from datagrowth_spark.operators.bpe import wordpiece_train

        wf = _wf(spark, [("a#b", 100), (f"x{SEP}y", 100), ("cd", 1), ("", 5)])
        res = wordpiece_train(wf, k=1)
        try:
            (m,) = res.merges.collect()
            assert (m["lhs"], m["rhs"]) == ("c", "##d")
        finally:
            res.cleanup()

    def test_early_stop_when_fully_merged(self, spark):
        from datagrowth_spark.operators.bpe import wordpiece_train

        wf = _wf(spark, [("ab", 2)])
        res = wordpiece_train(wf, k=5)
        try:
            assert res.merges.count() == 1
            segs = [tuple(r["syms"]) for r in res.word_symbols.collect()]
            assert segs == [("ab",)]
        finally:
            res.cleanup()

    def test_checkpointing_matches_unchckpointed(self, spark):
        from datagrowth_spark.operators.bpe import wordpiece_train

        wf = _wf(spark, [("lowlow", 5), ("lower", 2), ("newest", 6),
                         ("widest", 3), ("wide", 1)])
        a = wordpiece_train(wf, k=6, checkpoint_rounds=2)
        b = wordpiece_train(wf, k=6, checkpoint_rounds=16)
        try:
            assert [tuple(r) for r in a.merges.collect()] == \
                [tuple(r) for r in b.merges.collect()]
        finally:
            a.cleanup()
            b.cleanup()
