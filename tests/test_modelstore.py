"""Model persistence round-trips (operators/modelstore.py — r12):
train → save → load into a FRESH object → bit-equal scores /
segmentations / encodes, plus the integrity and atomicity contracts
the signature-store pattern promises."""

import json
import os

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators import modelstore as MS
from datagrowth_spark.operators.bpe import bpe_encode, bpe_train, wordpiece_train
from datagrowth_spark.operators.classifier import LogRegModel, logreg_train
from datagrowth_spark.operators.unigram import unigram_train


def _docs(spark):
    rows = [(i, f"alpha beta w{i % 7} gamma" if i % 3 else f"delta e{i} zeta",
             1 if i % 3 else 0) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _word_freq(spark):
    rows = [("banana", 30), ("bandana", 20), ("cabana", 10), ("ban", 5)]
    return spark.createDataFrame(rows, "w string, freq long")


class TestLogRegRoundTrip:
    def test_scores_bit_equal_on_both_carriers(self, spark, tmp_path):
        docs = _docs(spark)
        trained = logreg_train(docs, F.col("y") == 1, k=2,
                               n_buckets=64, lr=50.0)
        path = str(tmp_path / "clf")
        try:
            sig = MS.save_logreg_model(trained.model, path)
            loaded = MS.load_logreg_model(path)
            assert loaded is not trained.model
            assert loaded.w6 == trained.model.w6
            assert loaded.n_buckets == trained.model.n_buckets
            for bc in (False, True):
                a = trained.model.score_docs(docs, use_broadcast=bc) \
                    .select("doc_id", "score").collect()
                b = loaded.score_docs(docs, use_broadcast=bc) \
                    .select("doc_id", "score").collect()
                assert sorted(a) == sorted(b)
            # signature is the canonical-payload sha256, stable
            assert sig == MS.save_logreg_model(
                trained.model, str(tmp_path / "clf2"))
        finally:
            trained.cleanup()

    def test_corrupted_payload_fails_loudly(self, spark, tmp_path):
        path = str(tmp_path / "clf")
        MS.save_logreg_model(LogRegModel([0, 1000000, 0, -500], 4), path)
        with open(os.path.join(path, "model.json"), "r+") as fh:
            data = json.load(fh)
            data["w6"][1] = 999999
            fh.seek(0)
            fh.write(json.dumps(data, sort_keys=True,
                                separators=(",", ":")))
            fh.truncate()
        with pytest.raises(ValueError, match="signature mismatch"):
            MS.load_logreg_model(path)

    def test_exists_without_overwrite_refuses(self, spark, tmp_path):
        path = str(tmp_path / "clf")
        model = LogRegModel([5, -5], 2)
        MS.save_logreg_model(model, path)
        with pytest.raises(FileExistsError):
            MS.save_logreg_model(model, path)
        MS.save_logreg_model(LogRegModel([7, -7], 2), path, overwrite=True)
        assert MS.load_logreg_model(path).w6 == [7, -7]
        # no staging debris left behind
        parent = os.path.dirname(path)
        assert not [n for n in os.listdir(parent)
                    if n.startswith(".staging-")]

    def test_wrong_type_refuses(self, spark, tmp_path):
        path = str(tmp_path / "clf")
        MS.save_logreg_model(LogRegModel([1], 1), path)
        with pytest.raises(ValueError, match="artifact type"):
            MS.load_unigram_model(path)


class TestUnigramRoundTrip:
    def test_segmentations_bit_equal(self, spark, tmp_path):
        res = unigram_train(_word_freq(spark), k=1, vocab_multi=8, maxp=4)
        path = str(tmp_path / "uni")
        try:
            MS.save_unigram_model(res, path)
            loaded = MS.load_unigram_model(path)
            assert loaded.scores6 == res.scores6
            assert loaded.counts == res.counts
            assert loaded.totals == res.totals
            assert loaded.caches == []
            words = spark.createDataFrame(
                [("banana",), ("ban",), ("nab",), ("xyzzy",)], "w string")
            for bc in (False, True):
                a = {r["w"]: r["pieces"] for r in res.segment(
                    words, use_broadcast=bc).collect()}
                b = {r["w"]: r["pieces"] for r in loaded.segment(
                    words, use_broadcast=bc).collect()}
                assert a == b
            a = sorted(map(tuple, res.pieces_df(spark).collect()))
            b = sorted(map(tuple, loaded.pieces_df(spark).collect()))
            assert a == b
        finally:
            res.cleanup()


class TestBpeRoundTrip:
    def test_encodes_bit_equal(self, spark, tmp_path):
        res = bpe_train(_word_freq(spark), k=3)
        path = str(tmp_path / "bpe")
        try:
            MS.save_bpe_model(res, path)
            loaded = MS.load_bpe_model(spark, path)
            assert loaded.word_symbols is None
            assert (sorted(map(tuple, loaded.merges.collect()))
                    == sorted(map(tuple, res.merges.collect())))
            assert (sorted(map(tuple, loaded.vocab.collect()))
                    == sorted(map(tuple, res.vocab.collect())))
            words = spark.createDataFrame(
                [("banana",), ("ban",), ("unseen",)], "w string")
            a = {r["w"]: r["syms"] for r in bpe_encode(
                words, MS.merges_list(res.merges)).collect()}
            b = {r["w"]: r["syms"] for r in bpe_encode(
                words, MS.merges_list(loaded.merges)).collect()}
            assert a == b
            # replaying reloaded merges reproduces the trained
            # segmentation on every trained word (merge-replay IS the
            # encode definition)
            trained_syms = {r["w"]: list(r["syms"])
                            for r in res.word_symbols.collect()}
            enc = {r["w"]: list(r["syms"]) for r in bpe_encode(
                _word_freq(spark), MS.merges_list(loaded.merges)).collect()}
            assert enc == trained_syms
        finally:
            res.cleanup()

    def test_wordpiece_merges_with_score_round_trip(self, spark, tmp_path):
        res = wordpiece_train(_word_freq(spark), k=2)
        path = str(tmp_path / "wp")
        try:
            MS.save_bpe_model(res, path)
            loaded = MS.load_bpe_model(spark, path)
            assert loaded.merges.schema == res.merges.schema
            assert (sorted(map(tuple, loaded.merges.collect()))
                    == sorted(map(tuple, res.merges.collect())))
        finally:
            res.cleanup()

    def test_vocab_tamper_fails_loudly(self, spark, tmp_path):
        res = bpe_train(_word_freq(spark), k=2)
        path = str(tmp_path / "bpe")
        try:
            MS.save_bpe_model(res, path)
            with open(os.path.join(path, MS.MANIFEST), "r+") as fh:
                manifest = json.load(fh)
                manifest["vocab_fingerprint"] += 1
                fh.seek(0)
                json.dump(manifest, fh)
                fh.truncate()
            with pytest.raises(ValueError, match="signature mismatch"):
                MS.load_bpe_model(spark, path)
        finally:
            res.cleanup()
