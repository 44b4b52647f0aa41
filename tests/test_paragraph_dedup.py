"""Paragraph-level dedup (operators/dedup.py paragraph_dedup) and the
CCNet-style normalization key (functions/text.py normalize_text) —
new round-11 surface."""

from pyspark.sql import functions as F

from datagrowth_spark.functions.text import normalize_text
from datagrowth_spark.operators.dedup import paragraph_dedup


def _rows(df):
    return {r["doc_id"]: r for r in df.collect()}


class TestParagraphDedup:
    def test_first_occurrence_kept_rest_dropped(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha\n\nbeta"),
             (2, "beta\n\ngamma"),       # beta already in doc 1
             (3, "alpha\n\nbeta")],      # both already seen
            "doc_id long, text string")
        out = _rows(paragraph_dedup(docs))
        assert out[1]["new_text"] == "alpha\n\nbeta"
        assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 2)
        assert out[2]["new_text"] == "gamma"
        assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)
        assert out[3]["new_text"] == ""
        assert (out[3]["n_paras"], out[3]["n_kept"]) == (2, 0)

    def test_order_preserved_and_intra_doc_dups_collapse(self, spark):
        docs = spark.createDataFrame(
            [(7, "x\n\ny\n\nx\n\nz")],   # second 'x' is an intra-doc dup
            "doc_id long, text string")
        (row,) = paragraph_dedup(docs).collect()
        assert row["new_text"] == "x\n\ny\n\nz"
        assert (row["n_paras"], row["n_kept"]) == (4, 3)

    def test_empty_paragraphs_and_empty_docs(self, spark):
        docs = spark.createDataFrame(
            [(1, "\n\na\n\n\n\nb\n\n"),  # leading/run/trailing seps
             (2, "")],                    # no paragraphs at all
            "doc_id long, text string")
        out = _rows(paragraph_dedup(docs))
        assert out[1]["new_text"] == "a\n\nb"
        assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 2)
        assert (out[2]["n_paras"], out[2]["n_kept"]) == (0, 0)
        assert out[2]["new_text"] == ""

    def test_keeper_is_smallest_id_then_position(self, spark):
        # 'p' appears at (5, pos 1) and (9, pos 0): doc 5 wins on id
        docs = spark.createDataFrame(
            [(9, "p\n\nq"), (5, "r\n\np")],
            "doc_id long, text string")
        out = _rows(paragraph_dedup(docs))
        assert out[5]["new_text"] == "r\n\np"
        assert out[9]["new_text"] == "q"

    def test_layout_independent(self, spark):
        rows = [(i, f"c{i % 5}\n\nu{i}") for i in range(40)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        a = _rows(paragraph_dedup(docs.repartition(7)))
        b = _rows(paragraph_dedup(docs.coalesce(1)))
        assert a == b
        # the 5 shared 'c*' paragraphs survive only in their first docs
        assert sum(r["n_kept"] for r in a.values()) == 40 + 5

    def test_regex_metacharacter_separator_is_literal(self, spark):
        """``sep`` is a LITERAL (ADVICE r11): a regex-active separator
        like ``"||"`` must split on the literal characters, not on the
        regex alternation (which would split between every char)."""
        docs = spark.createDataFrame(
            [(1, "alpha||beta"), (2, "beta||gamma"), (3, "a.b")],
            "doc_id long, text string")
        out = _rows(paragraph_dedup(docs, sep="||"))
        assert out[1]["new_text"] == "alpha||beta"
        assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 2)
        assert out[2]["new_text"] == "gamma"
        # '.' separator must not match every character either
        dot = _rows(paragraph_dedup(docs, sep="."))
        assert dot[3]["new_text"] == "a.b"
        assert (dot[3]["n_paras"], dot[3]["n_kept"]) == (2, 2)


class TestNormalizeText:
    def test_case_whitespace_punct_collapse(self, spark):
        frame = spark.createDataFrame(
            [("  Hello,\tWORLD!!  again ",)], "t string")
        (row,) = frame.select(normalize_text("t").alias("n")).collect()
        assert row["n"] == "hello world again"

    def test_idempotent(self, spark):
        frame = spark.createDataFrame(
            [("MiXeD   CASE; with.punct",), ("already normal",)], "t string")
        out = frame.select(
            normalize_text(normalize_text("t")).alias("twice"),
            normalize_text("t").alias("once")).collect()
        assert all(r["twice"] == r["once"] for r in out)

    def test_null_and_empty(self, spark):
        frame = spark.createDataFrame([(None,), ("",), ("...",)], "t string")
        vals = [r["n"] for r in
                frame.select(normalize_text("t").alias("n")).collect()]
        assert vals == [None, "", ""]

    def test_digits_survive(self, spark):
        frame = spark.createDataFrame([("Call 555-0199 now",)], "t string")
        (row,) = frame.select(normalize_text("t").alias("n")).collect()
        assert row["n"] == "call 555 0199 now"


class TestParagraphDedupFuzzy:
    def _out(self, spark, rows, **kw):
        from datagrowth_spark.operators.dedup import paragraph_dedup_fuzzy
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r
                for r in paragraph_dedup_fuzzy(docs, **kw).collect()}

    def test_near_dup_paragraph_dropped_first_kept(self, spark):
        a = "the quick brown fox jumps over the lazy dog"
        b = a + " today"          # J = 7/8 on word 3-shingles
        other = "completely different words about distributed shuffles"
        out = self._out(spark, [(1, f"{a}\n\n{other}"), (2, f"{b}\n\nunique tail paragraph here")])
        assert out[1]["new_text"] == f"{a}\n\n{other}"
        assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)
        assert out[2]["new_text"] == "unique tail paragraph here"

    def test_exact_dups_still_collapse(self, spark):
        a = "alpha beta gamma delta epsilon zeta"
        out = self._out(spark, [(1, f"{a}"), (2, f"{a}")])
        assert out[1]["new_text"] == a
        assert out[2]["new_text"] == ""

    def test_short_paragraphs_only_exact_dedup(self, spark):
        # < 3 tokens -> no shingles -> no signature -> fuzzy can't fire
        out = self._out(spark, [(1, "ab cd"), (2, "ab cd"), (3, "ab ce")])
        assert out[1]["new_text"] == "ab cd"
        assert out[2]["new_text"] == ""
        assert out[3]["new_text"] == "ab ce"

    def test_keeper_is_earliest_first_occurrence(self, spark):
        a = ("one two three four five six seven eight nine ten "
             "eleven twelve thirteen fourteen fifteen sixteen")
        b = a + " seventeen"
        # b's first occurrence is (doc 1, pos 0); a's is (doc 2, pos 0):
        # doc 1 wins, a is the near-dup that drops
        out = self._out(spark, [(2, a), (1, b)])
        assert out[1]["new_text"] == b
        assert out[2]["new_text"] == ""

    def test_layout_independent(self, spark):
        from datagrowth_spark.operators.dedup import paragraph_dedup_fuzzy
        base = "w%d x%d common trailing words here and there"
        rows = [(i, (base % (i % 4, i % 4)) + f"\n\nunique u{i} v{i} w{i} x{i}")
                for i in range(30)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, paragraph_dedup_fuzzy(docs.repartition(7)).collect()))
        b = sorted(map(tuple, paragraph_dedup_fuzzy(docs.coalesce(1)).collect()))
        assert a == b
