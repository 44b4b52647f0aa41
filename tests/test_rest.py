"""REST read-path tests (SURVEY §2.3 REST).

Mirrors the reference's paginated collection content view
(datagrowth/datatypes/documents/views/collection.py:14-36,
views/content.py:35-56): content serialization, page/page_size params,
max page size, Link headers, 404s.
"""

import json
import urllib.request

import pytest

from datagrowth_spark.datatypes.collection import Collection
from datagrowth_spark.rest import (
    MAX_PAGE_SIZE,
    ContentServer,
    content_after,
    content_page,
)


@pytest.fixture()
def collection(spark):
    coll = Collection(spark, name="docs", identifier="id")
    coll.add([{"id": f"{i:03d}", "word": f"w{i}", "n": i} for i in range(25)])
    return coll


class TestPagination:
    def test_offset_pages(self, collection):
        first = content_page(collection, page=1, page_size=10)
        assert [d["_id"] for d in first["results"]] == [f"{i:03d}" for i in range(10)]
        assert first["has_next"] and not first["has_prev"]
        assert first["results"][0] == {"id": "000", "word": "w0", "n": 0, "_id": "000"}

        last = content_page(collection, page=3, page_size=10)
        assert len(last["results"]) == 5
        assert not last["has_next"] and last["has_prev"]

    def test_page_size_clamped(self, collection):
        out = content_page(collection, page=1, page_size=10_000)
        assert out["page_size"] == MAX_PAGE_SIZE

    def test_keyset_walk_covers_corpus(self, collection):
        seen, after = [], None
        for _ in range(10):
            page = content_after(collection, after=after, page_size=10)
            seen.extend(d["_id"] for d in page["results"])
            if not page["has_next"]:
                break
            after = page["next_after"]
        assert seen == [f"{i:03d}" for i in range(25)]


class TestServer:
    def test_http_roundtrip_with_link_headers(self, collection):
        server = ContentServer({"docs": collection}).start()
        try:
            with urllib.request.urlopen(
                f"{server.url}/collections/docs/content?page=1&page_size=10"
            ) as resp:
                body = json.loads(resp.read())
                link = resp.headers.get("Link", "")
            assert len(body["results"]) == 10
            assert 'rel="next"' in link and 'rel="prev"' not in link
            # the advertised next link is the KEYSET form (O(1) per page
            # at any depth), not an offset skip; the numbered form is
            # the explicitly-labeled alternative
            next_url = link.split(";")[0].strip("<>")
            assert "after=009" in next_url and "page=" not in next_url
            assert 'rel="next-offset"' in link

            # follow the next link like a reference API client would
            with urllib.request.urlopen(next_url) as resp:
                body2 = json.loads(resp.read())
                link2 = resp.headers.get("Link", "")
            assert body2["results"][0]["_id"] == "010"
            # keyset pages keep advertising keyset next links
            assert "after=019" in link2

            with urllib.request.urlopen(f"{server.url}/collections") as resp:
                assert json.loads(resp.read()) == ["docs"]

            with pytest.raises(urllib.error.HTTPError) as err:
                urllib.request.urlopen(f"{server.url}/collections/nope/content")
            assert err.value.code == 404

            # keyset route
            with urllib.request.urlopen(
                f"{server.url}/collections/docs/content?after=019&page_size=10"
            ) as resp:
                body3 = json.loads(resp.read())
            assert [d["_id"] for d in body3["results"]] == [f"{i:03d}" for i in range(20, 25)]
            assert not body3["has_next"]
        finally:
            server.stop()

    def test_link_cursor_percent_encoded(self, spark):
        # Identities with reserved characters must survive the Link
        # header roundtrip (ADVICE r3: next_after was interpolated raw).
        coll = Collection(spark, name="odd", identifier="id")
        coll.add([{"id": f"a b&c#{i}", "n": i} for i in range(4)])
        server = ContentServer({"odd": coll}).start()
        try:
            with urllib.request.urlopen(
                f"{server.url}/collections/odd/content?page=1&page_size=2"
            ) as resp:
                link = resp.headers.get("Link", "")
            next_url = link.split(";")[0].strip("<>")
            assert "a%20b%26c%23" in next_url
            with urllib.request.urlopen(next_url) as resp:
                body = json.loads(resp.read())
            assert [d["_id"] for d in body["results"]] == ["a b&c#2", "a b&c#3"]
        finally:
            server.stop()
