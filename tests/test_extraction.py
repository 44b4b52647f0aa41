"""Extraction operator tests.

Golden expectations mirror the reference's transformation tests
(tests/django_project/processors/tests/transformation.py) against
inline mock JSON documents.
"""

import json

import pytest
from pyspark.sql import types as T

from datagrowth_spark.datatypes.document import decode_properties
from datagrowth_spark.operators.extraction import (
    ExtractProcessor,
    extract_df,
    extract_typed_df,
    is_json_mimetype,
)

MOCK_JSON = {
    "meta": {"total": 2, "source": "unit"},
    "records": [
        {"id": 1, "title": "alpha", "tags": ["x", "y"]},
        {"id": 2, "title": "beta", "tags": []},
    ],
}

OBJECTIVE = {
    "@": "$.records",
    "#total": "$.meta.total",
    "id": "$.id",
    "title": "$.title",
    "first_tag": "$.tags.0",
}


class TestPurePython:
    def test_application_json(self):
        processor = ExtractProcessor(objective=OBJECTIVE)
        out = list(processor.application_json(MOCK_JSON))
        assert out == [
            {"id": 1, "title": "alpha", "first_tag": "x", "total": 2},
            {"id": 2, "title": "beta", "first_tag": None, "total": 2},
        ]

    def test_from_string(self):
        processor = ExtractProcessor(objective=OBJECTIVE)
        out = list(processor.extract("application/json", json.dumps(MOCK_JSON)))
        assert len(out) == 2

    def test_callable_values(self):
        objective = {"@": "$.records", "upper": lambda node: node["title"].upper()}
        processor = ExtractProcessor(objective=objective)
        assert [o["upper"] for o in processor.application_json(MOCK_JSON)] == ["ALPHA", "BETA"]

    def test_dict_at_node(self):
        processor = ExtractProcessor(objective={"@": "$.meta", "t": "$.total"})
        assert list(processor.application_json(MOCK_JSON)) == [{"t": 2}]

    def test_extract_from_object_values(self):
        from datagrowth_spark.core.config import create_config

        config = create_config("extract_processor", {"extract_from_object_values": True})
        processor = ExtractProcessor(config=config, objective={"@": "$.by_key", "v": "$.v"})
        data = {"by_key": {"a": {"v": 1}, "b": {"v": 2}}}
        assert sorted(o["v"] for o in processor.application_json(data)) == [1, 2]

    def test_unsupported_content_type(self):
        processor = ExtractProcessor(objective=OBJECTIVE)
        with pytest.raises(TypeError):
            list(processor.extract("application/pdf", "x"))

    def test_scalar_at_node_wraps(self):
        # A '@' resolving to a string yields ONE row, not one per char
        # (reference extraction.py:147-148 wraps non-list nodes).
        processor = ExtractProcessor(
            objective={"@": "$.meta.source", "v": lambda node: node})
        assert list(processor.application_json(MOCK_JSON)) == [{"v": "unit"}]

    def test_missing_at_raises_no_content(self):
        from datagrowth_spark.operators.extraction import DGNoContent

        processor = ExtractProcessor(objective={"@": "$.nope", "v": "$.v"})
        with pytest.raises(DGNoContent):
            list(processor.application_json(MOCK_JSON))

    def test_mimetype_helper(self):
        assert is_json_mimetype("application/json")
        assert is_json_mimetype("application/vnd.api+json")
        assert not is_json_mimetype("text/html")


class TestDataFrameOps:
    def test_extract_df(self, spark):
        bodies = spark.createDataFrame([(json.dumps(MOCK_JSON),)], "body string")
        out = extract_df(bodies, "body", OBJECTIVE).collect()
        props = [decode_properties(r["properties"]) for r in out]
        assert props[0] == {"id": 1, "title": "alpha", "first_tag": "x", "total": 2}
        assert len(props) == 2

    def test_extract_df_skips_contentless_rows(self, spark):
        # A body whose '@' path is missing raises DGNoContent in the pure
        # API; the distributed flat-map drops that row and keeps the task.
        bodies = spark.createDataFrame(
            [(json.dumps(MOCK_JSON),), (json.dumps({"other": 1}),), (None,)],
            "body string")
        out = extract_df(bodies, "body", OBJECTIVE).collect()
        assert len(out) == 2

    def test_extract_typed_df_stays_jvm_side(self, spark):
        bodies = spark.createDataFrame([(json.dumps(MOCK_JSON),)] * 3, "body string")
        node_schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("title", T.StringType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ])
        objective = {"@": "$.records", "#source": "$.meta.source",
                     "id": "$.id", "title": "$.title", "first_tag": "$.tags.0"}
        out = extract_typed_df(bodies, "body", objective, node_schema)
        rows = out.collect()
        assert len(rows) == 6
        assert {(r["id"], r["title"], r["first_tag"], r["source"]) for r in rows} == {
            (1, "alpha", "x", "unit"), (2, "beta", None, "unit"),
        }
        # No Python evaluation in the plan (pure Catalyst).
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "mapInPandas" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# E2: HTML/XML extraction on the stdlib mini-soup fallback (golden tests
# mirroring the reference's transformation tests: objective over markup
# with soup/el expressions and callables — reference
# tests/django_project/processors/tests/transformation.py:45-140)
# ---------------------------------------------------------------------------

PAGE_HTML = """
<!doctype html>
<html>
<head><title>Catalog</title></head>
<body>
<div id="content" class="main listing">
  <p>Links:
    <ul>
      <li><a href="/items/1">alpha</a></li>
      <li><a href="/items/2">beta</a></li>
      <li><a href="/items/3">gamma</a></li>
      <li>no link here</li>
    </ul>
  </p>
  <img src="/banner.png">
</div>
</body>
</html>
"""

PAGE_XML = """
<xml>
  <meta><title>Feed</title></meta>
  <results>
    <result><label>one</label><url>/r/1</url></result>
    <result><label>two</label><url>/r/2</url></result>
  </results>
</xml>
"""


class TestHtmlExtraction:
    def test_mini_soup_dom(self):
        from datagrowth_spark.operators.html import mini_soup

        soup = mini_soup(PAGE_HTML)
        assert soup.find("title").text == "Catalog"
        anchors = soup.find_all("a")
        assert [a["href"] for a in anchors] == ["/items/1", "/items/2", "/items/3"]
        assert [a.text for a in anchors] == ["alpha", "beta", "gamma"]
        div = soup.find("div", {"class": "listing"})
        assert div is not None and div.get("id") == "content"
        # void element does not swallow siblings
        assert soup.find("img").get("src") == "/banner.png"
        assert soup.find("img").children == []

    def test_mini_soup_css_select(self):
        from datagrowth_spark.operators.html import mini_soup

        soup = mini_soup(PAGE_HTML)
        assert [a["href"] for a in soup.select("div.listing a")] == \
            ["/items/1", "/items/2", "/items/3"]
        assert soup.select_one("#content").name == "div"
        assert soup.select_one("div.main.listing") is not None
        assert soup.select_one("div.absent") is None
        assert [a.text for a in soup.select("li > a[href='/items/2']")] == ["beta"]
        assert [e.name for e in soup.select("title, img")] == ["title", "img"]
        assert soup.select_one("a[href]").text == "alpha"

    def test_mini_soup_text_helpers(self):
        from datagrowth_spark.operators.html import mini_soup

        soup = mini_soup(PAGE_HTML)
        li = soup.find_all("li")
        assert li[0].get_text(strip=True) == "alpha"
        assert soup.find("ul").get_text("|", strip=True) == \
            "alpha|beta|gamma|no link here"
        assert soup.find("title").string == "Catalog"
        assert li[0].string == "alpha"  # recurses through single <a>
        assert soup.find("ul").string is None  # ambiguous content

    def test_mini_soup_siblings(self):
        from datagrowth_spark.operators.html import mini_soup

        soup = mini_soup(PAGE_HTML)
        first_li = soup.find("li")
        nxt = first_li.find_next_sibling("li")
        assert nxt is not None and nxt.text == "beta"
        assert nxt.find_previous_sibling("li").text == "alpha"
        assert soup.find("img").find_next_sibling() is None

    def test_mini_soup_bs4_parity_extensions(self):
        """The r6 parity batch: boolean attr filters, name lists,
        recursive/limit, has_attr, find_parent, tag-attribute access,
        element sibling properties — the bs4 idioms real objectives
        lean on beyond the original subset."""
        from datagrowth_spark.operators.html import mini_soup

        soup = mini_soup(PAGE_HTML)
        # href=True keeps only real links; href=False the bare <li>
        assert [a.text for a in soup.find_all("a", href=True)] == \
            ["alpha", "beta", "gamma"]
        lis = soup.find("ul").find_all("li", recursive=False)
        assert len(lis) == 4
        bare = [li for li in soup.find_all("li") if not li.find("a")]
        assert len(bare) == 1 and bare[0].text == "no link here"
        # list-of-names + limit
        assert [e.name for e in soup.find_all(["title", "img"])] == \
            ["title", "img"]
        assert len(soup.find_all("li", limit=2)) == 2
        assert soup.find_all("a", limit=1)[0].text == "alpha"
        # has_attr / boolean absence
        img = soup.find("img")
        assert img.has_attr("src") and not img.has_attr("href")
        assert soup.find("img", href=False) is img
        # find_parent walks up with filters
        a = soup.find("a")
        assert a.find_parent("div")["id"] == "content"
        assert a.find_parent("ul").name == "ul"
        assert a.find_parent("table") is None
        # tag-attribute access chains like bs4
        assert soup.body.div["id"] == "content"
        assert soup.head.title.text == "Catalog"
        assert soup.body.table is None
        with pytest.raises(AttributeError):
            soup.Missing  # non-tag-ish names still raise
        # element-only sibling properties
        li1 = soup.find("li")
        assert li1.next_sibling.text == "beta"
        assert li1.next_sibling.previous_sibling is li1
        assert li1.previous_sibling is None

    def test_css_objective_eval_strings(self):
        processor = ExtractProcessor(objective={
            "@": "soup.select('div.listing li > a')",
            "text": "el.get_text(strip=True)",
            "link": "el['href']",
            "#page": "soup.select_one('title').string",
        })
        rows = list(processor.extract("text/html", PAGE_HTML))
        assert rows == [
            {"text": "alpha", "link": "/items/1", "page": "Catalog"},
            {"text": "beta", "link": "/items/2", "page": "Catalog"},
            {"text": "gamma", "link": "/items/3", "page": "Catalog"},
        ]

    def test_html_objective_eval_strings(self):
        processor = ExtractProcessor(objective={
            "@": "soup.find_all('a')",
            "text": "el.text",
            "link": "el['href']",
            "#page": "soup.find('title').text",
        })
        rows = list(processor.extract("text/html", PAGE_HTML))
        assert rows == [
            {"text": "alpha", "link": "/items/1", "page": "Catalog"},
            {"text": "beta", "link": "/items/2", "page": "Catalog"},
            {"text": "gamma", "link": "/items/3", "page": "Catalog"},
        ]

    def test_html_objective_callables(self):
        processor = ExtractProcessor(objective={
            "@": lambda soup: soup.find_all("a"),
            "text": lambda soup, el: el.text,
            "link": lambda soup, el: el["href"],
            "#page": lambda soup: soup.find("title").text,
        })
        rows = list(processor.extract("text/html", PAGE_HTML))
        assert [r["link"] for r in rows] == ["/items/1", "/items/2", "/items/3"]
        assert rows[0]["page"] == "Catalog"

    def test_xml_objective(self):
        processor = ExtractProcessor(objective={
            "@": "soup.find_all('result')",
            "label": "el.find('label').text",
            "url": "el.find('url').text",
        })
        rows = list(processor.extract("application/xml", PAGE_XML))
        assert rows == [
            {"label": "one", "url": "/r/1"},
            {"label": "two", "url": "/r/2"},
        ]


class TestReferenceParity:
    """The reference's OWN HTML/XML fixtures and objective expressions,
    verbatim (tests/django_project/processors/tests/transformation.py:62-84,
    project/mocks/data.py:39-92) — proof the mini-soup subset covers
    every soup expression the reference repo actually evaluates."""

    MOCK_HTML = """
<!doctype html>
<html>

<head>
    <title>Test</title>
</head>

<body>

</body>

<div id="content">
    <p>
        A list with links:
        <ul>
            <li><a href="/test">test</a></li>
            <li><a href="/test2">test 2</a></li>
            <li><a href="/test3">test 3</a></li>
            <li>That's it!</li>
        </ul>
    </p>
</div>

</html>
"""

    MOCK_XML = """
<xml>
    <meta>
        <title>Test</title>
    </meta>

    <results>
        <result>
            <label>test</label>
            <url>/test</url>
        </result>
        <result>
            <label>test 2</label>
            <url>/test2</url>
        </result>
        <result>
            <label>test 3</label>
            <url>/test3</url>
        </result>
    </results>
</xml>
"""

    MOCK_SCRAPE_DATA = [
        {"text": "test", "link": "/test", "page": "Test"},
        {"text": "test 2", "link": "/test2", "page": "Test"},
        {"text": "test 3", "link": "/test3", "page": "Test"},
    ]

    def test_html_string_expressions(self):
        processor = ExtractProcessor(objective={
            "@": "soup.find_all('a')",
            "text": "el.text",
            "link": "el['href']",
            "#page": "soup.find('title').text",
        })
        assert list(processor.extract("text/html", self.MOCK_HTML)) == \
            self.MOCK_SCRAPE_DATA

    def test_xml_callables(self):
        def get_xml_elements(soup):
            return soup.find_all("result")

        def get_xml_link(soup, el):
            return el.find("url").text

        def get_page_text(soup):
            return soup.find("title").text

        processor = ExtractProcessor(objective={
            "@": get_xml_elements,
            "text": "el.find('label').text",
            "link": get_xml_link,
            "#page": get_page_text,
        })
        assert list(processor.extract("text/xml", self.MOCK_XML)) == \
            self.MOCK_SCRAPE_DATA

    def test_xml_generator_callback(self):
        from collections import namedtuple

        Info = namedtuple("Info", ["label", "url"])
        processor = ExtractProcessor(objective={
            "@": lambda soup: (Info(label, url) for label, url in
                               zip(soup.find_all("label"), soup.find_all("url"))),
            "text": "el.label.text",
            "link": "el.url.text",
        })
        rows = list(processor.extract("application/xml", self.MOCK_XML))
        assert [r["text"] for r in rows] == ["test", "test 2", "test 3"]
        assert [r["link"] for r in rows] == ["/test", "/test2", "/test3"]

    def test_xml_list_callback(self):
        processor = ExtractProcessor(objective={
            "@": lambda soup: soup.find_all("url"),
            "link": "el.text",
        })
        rows = list(processor.extract("text/xml", self.MOCK_XML))
        assert [r["link"] for r in rows] == ["/test", "/test2", "/test3"]

    def test_single_element_at_wraps(self):
        # Reference _extract_soup (extraction.py:171-173): a non-list '@'
        # result becomes a single-element iteration, not char iteration.
        processor = ExtractProcessor(objective={
            "@": "soup.find('title')",
            "text": "el.text",
        })
        rows = list(processor.extract("text/xml", self.MOCK_XML))
        assert rows == [{"text": "Test"}]

    def test_falsy_objective_skipped_soup(self):
        # Reference extraction.py:177-178: falsy per-element objectives are
        # skipped entirely (key absent), not evaluated to None.
        processor = ExtractProcessor(objective={
            "@": "soup.find_all('result')",
            "text": "el.find('label').text",
            "nothing": "",
        })
        rows = list(processor.extract("text/xml", self.MOCK_XML))
        assert all("nothing" not in r for r in rows)
        assert [r["text"] for r in rows] == ["test", "test 2", "test 3"]

    def test_eval_error_wraps_value_error(self):
        # Reference extraction.py:160-163: eval failures raise
        # ValueError("Can't extract '<name>'") chained from the cause.
        processor = ExtractProcessor(objective={
            "@": "soup.find_all('result')",
            "boom": "el.find('missing').text",
        })
        with pytest.raises(ValueError, match="Can't extract 'boom'"):
            list(processor.extract("text/xml", self.MOCK_XML))


class TestKeyClashPrecedence:
    """Objective values overwrite context values on a `#key`/plain-key
    clash — reference extraction.py:141-154 and :176-181 build the row
    from copy(context) then assign objective keys."""

    def test_json_objective_wins_over_context(self):
        processor = ExtractProcessor(objective={
            "@": "$.items",
            "name": "$.name",
            "#name": "$.page_title",
        })
        data = {"page_title": "CTX", "items": [{"name": "a"}, {"name": "b"}]}
        rows = list(processor.extract("application/json", data))
        assert [r["name"] for r in rows] == ["a", "b"]

    def test_soup_objective_wins_over_context(self):
        processor = ExtractProcessor(objective={
            "@": "soup.find_all('result')",
            "text": "el.find('label').text",
            "#text": "soup.find('title').text",
        })
        rows = list(processor.extract("text/xml", TestReferenceParity.MOCK_XML))
        assert [r["text"] for r in rows] == ["test", "test 2", "test 3"]


class TestReferenceTransformParity:
    """The reference's TransformProcessor test corpus, verbatim
    (tests/django_project/processors/tests/transformation.py:36-302,
    project/mocks/data.py:7-36): resource pass-through, getattr
    dispatch, objective splitting, JSON records / object-values /
    from-dict, nested generator/list callbacks, and the
    ExtractProcessor alias contract."""

    MOCK_DATA = {
        "dict": {
            "test": "nested value",
            "list": ["nested value 0", "nested value 1", "nested value 2"],
            "dict": {"test": "test"},
        },
        "list": ["value 0", "value 1", "value 2"],
        "dotted.key": "another value",
        "unicode": ["überhaupt"],
    }
    RECORDS = [
        {"id": 1, "record": "Hallelujah"},
        {"id": 2, "record": "The Beatles"},
        {"id": 3, "record": "The Stones"},
    ]
    JSON_CONTEXT = {"unicode": "überhaupt", "goal": "test"}

    @classmethod
    def data_with_records(cls):
        d = json.loads(json.dumps(cls.MOCK_DATA))
        d["records"] = json.loads(json.dumps(cls.RECORDS))
        return d

    @classmethod
    def data_with_keys(cls):
        d = json.loads(json.dumps(cls.MOCK_DATA))
        d["keys"] = {str(r["id"]): dict(r) for r in cls.RECORDS}
        return d

    @classmethod
    def expected_json(cls):
        return [dict(r, **cls.JSON_CONTEXT) for r in cls.RECORDS]

    def get_json_processor(self, callables=False, object_values=False,
                           from_dict=False):
        from datagrowth_spark.operators.extraction import TransformProcessor

        if not object_values and not from_dict:
            at = "$.records" if not callables else \
                (lambda root: root.get("records", []))
        elif from_dict:
            at = "$.records.0" if not callables else \
                (lambda root: root.get("records")[0])
        else:
            at = "$.keys" if not callables else \
                (lambda root: root.get("keys", []))
        uni = "$.unicode.0" if not callables else \
            (lambda root: root.get("unicode", [None])[0])
        rid = "$.id" if not callables else (lambda node: node.get("id"))
        objective = {
            "@": at,
            "#unicode": uni,
            "#goal": "$.dict.dict.test",
            "id": rid,
            "record": "$.record",
        }
        return TransformProcessor(config={
            "objective": objective,
            "extract_from_object_values": object_values})

    def test_backward_compatibility(self):
        from datagrowth_spark.operators.extraction import (
            ExtractProcessor, TransformProcessor)

        assert issubclass(TransformProcessor, ExtractProcessor)
        assert ExtractProcessor.config_namespace == "extract_processor"
        assert TransformProcessor.config_namespace == "transform_processor"
        prc = self.get_json_processor()
        data = self.data_with_records()
        assert list(prc.transform("application/json", data)) == \
            list(prc.extract("application/json", data))

        class Res:
            content = ("application/json", data)

        assert list(prc.transform_resource(Res())) == \
            list(prc.extract_from_resource(Res()))

    def test_init_and_load_objective(self):
        from datagrowth_spark.operators.extraction import TransformProcessor

        prc = TransformProcessor(config={"objective": {
            "@": "soup.find_all('a')",
            "text": "el.text",
            "link": "el['href']",
            "#page": "soup.find('title').text",
        }})
        assert prc._at == "soup.find_all('a')"
        assert prc._context == {"page": "soup.find('title').text"}
        assert prc._objective == {"text": "el.text", "link": "el['href']"}

    def test_load_objective_asserts(self):
        from datagrowth_spark.operators.extraction import ExtractProcessor

        with pytest.raises(AssertionError, match="should be a dict"):
            ExtractProcessor(objective=["@"])
        with pytest.raises(AssertionError, match="No objectives loaded"):
            ExtractProcessor(objective={"@": "$.records"})
        with pytest.raises(AssertionError, match="'@' is specified"):
            ExtractProcessor(objective={"id": "$.id"})

    def test_transform_dispatch(self):
        from datagrowth_spark.operators.extraction import TransformProcessor

        prc = self.get_json_processor()
        for ct in ("text/html", "text/xml", "application/xml"):
            assert hasattr(prc, ct.replace("/", "_"))
        with pytest.raises(TypeError, match="application/quantum"):
            prc.transform("application/quantum", {"test": "test"})
        assert prc.transform(None, None) == []

        class PdfProcessor(TransformProcessor):
            content_handlers = (TransformProcessor.content_handlers
                                | {"application_pdf"})

            def application_pdf(self, data):
                return [{"pdf": data}]

        sub = PdfProcessor(config={"objective": {"@": "$", "x": "$.x"}})
        assert sub.transform("application/pdf", "raw") == [{"pdf": "raw"}]

    def test_transform_only_dispatches_registered_handlers(self):
        """Content-Type is server-controlled (ADVICE r7): a hostile
        type that maps onto a real public method must NOT invoke it —
        only names in content_handlers dispatch."""
        prc = self.get_json_processor()
        for hostile in ("load/objective", "extract/from_resource",
                        "transform/x", "_eval/x"):
            with pytest.raises(TypeError, match="does not support"):
                prc.transform(hostile, "{}")

    def test_pass_resource_through(self):
        data = self.data_with_records()

        class Res:
            content = ("application/json", data)

        prc = self.get_json_processor()
        assert prc.pass_resource_through(Res()) is data

    @pytest.mark.parametrize("callables", [False, True])
    def test_application_json_records(self, callables):
        from types import GeneratorType

        prc = self.get_json_processor(callables=callables)
        rsl = prc.application_json(self.data_with_records())
        assert isinstance(rsl, GeneratorType)
        assert list(rsl) == self.expected_json()

    @pytest.mark.parametrize("callables", [False, True])
    def test_application_json_object_values(self, callables):
        prc = self.get_json_processor(callables=callables,
                                      object_values=True)
        got = sorted(prc.application_json(self.data_with_keys()),
                     key=lambda r: r["id"])
        assert got == self.expected_json()

    @pytest.mark.parametrize("callables", [False, True])
    def test_application_json_from_dict(self, callables):
        prc = self.get_json_processor(callables=callables, from_dict=True)
        assert list(prc.application_json(self.data_with_records())) == \
            [self.expected_json()[0]]

    def test_application_json_nested_transformation(self):
        from datagrowth_spark.operators.extraction import TransformProcessor

        data = self.data_with_records()
        for at in (
            lambda d: (v for rec in d for v in rec["list"]),   # generator
            lambda d: [v for rec in d for v in rec["list"]],   # list
        ):
            prc = TransformProcessor(config={"objective": {
                "@": at, "value": "$"}})
            out = list(prc.application_json([data, data]))
            assert [r["value"] for r in out] == \
                ["value 0", "value 1", "value 2"] * 2
            assert all(len(r) == 1 for r in out)

    def test_soup_methods_accept_parsed_soup(self):
        """The reference's resource layer hands PARSED soups to
        text_html/text_xml (transformation tests :204-224); raw markup
        must also keep working."""
        from types import GeneratorType

        from datagrowth_spark.operators.extraction import TransformProcessor
        from datagrowth_spark.operators.html import mini_soup

        prc = TransformProcessor(config={"objective": {
            "@": "soup.find_all('result')",
            "text": "el.find('label').text",
            "#page": "soup.find('title').text",
        }})
        raw = TestReferenceParity.MOCK_XML
        parsed = mini_soup(raw)
        for rsl in (prc.text_xml(raw), prc.text_xml(parsed),
                    prc.application_xml(parsed), prc.text_html(parsed)):
            assert isinstance(rsl, GeneratorType)
            assert [r["text"] for r in rsl] == ["test", "test 2", "test 3"]


class TestContentIterator:
    """content_iterator parity (reference processors/tests/iterators.py:
    34-80): generator composition over a resource stream, one extractor
    instance, error resources yield nothing."""

    class Res:
        def __init__(self, content):
            self.content = content

    OBJECTIVE = {"@": "$.list", "value": "$"}

    def _page(self, values):
        return self.Res(("application/json", {"list": values}))

    def test_success_stream(self):
        from types import GeneratorType

        from datagrowth_spark.operators.extraction import content_iterator

        resources = [self._page([f"value {i}" for i in range(3)]),
                     self._page([f"value {i}" for i in range(3, 6)])]
        contents = content_iterator(iter(resources), self.OBJECTIVE)
        assert isinstance(contents, GeneratorType)
        rows = list(contents)
        assert [r["value"] for r in rows] == [f"value {i}" for i in range(6)]
        assert all(len(r) == 1 for r in rows)

    def test_error_resources_yield_nothing(self):
        from datagrowth_spark.operators.extraction import content_iterator

        resources = [self.Res((None, None)), self.Res((None, None))]
        assert list(content_iterator(iter(resources), self.OBJECTIVE)) == []

    def test_mixed_stream_skips_errors(self):
        from datagrowth_spark.operators.extraction import content_iterator

        resources = [self._page(["value 0"]), self.Res((None, None)),
                     self._page(["value 1"])]
        rows = list(content_iterator(iter(resources), self.OBJECTIVE))
        assert [r["value"] for r in rows] == ["value 0", "value 1"]
