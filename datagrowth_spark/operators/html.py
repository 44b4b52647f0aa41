"""Minimal BeautifulSoup-compatible DOM on the stdlib html.parser.

The reference's HTML/XML extraction evaluates objective expressions
against a soup (``_extract_soup``, reference
``datagrowth/processors/input/extraction.py:156-193``) — expressions
like ``soup.find_all("p")`` or ``el.text``. bs4 is not in this
container, so this module provides the subset those objectives actually
use — ``find`` / ``find_all`` (by tag and attrs, recursive), ``.text``,
``.get``/``[]`` attribute access, ``.children`` — on a tree built by
``html.parser``. When bs4 IS available the extractor prefers it; the
API here is call-compatible for the supported subset, so objectives
don't change between environments.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Any, Iterator

# HTML void elements never get a closing tag; treat them as self-closing
# so the tree doesn't nest siblings under them.
_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "link", "meta", "param", "source", "track", "wbr"}


class MiniElement:
    __slots__ = ("name", "attrs", "children", "parent", "_texts")

    def __init__(self, name: str, attrs: dict[str, str | None] | None = None,
                 parent: "MiniElement | None" = None) -> None:
        self.name = name
        self.attrs = attrs or {}
        self.children: list[MiniElement] = []
        self.parent = parent
        self._texts: list[tuple[int, str]] = []  # (position among children, text)

    # -- bs4-compatible surface -------------------------------------------
    @property
    def text(self) -> str:
        """Concatenated descendant text, document order (bs4 get_text)."""
        out: list[str] = []
        self._collect_text(out)
        return "".join(out)

    def _collect_text(self, out: list[str]) -> None:
        texts = dict(enumerate_texts(self._texts))
        for idx in range(len(self.children) + 1):
            if idx in texts:
                out.append(texts[idx])
            if idx < len(self.children):
                self.children[idx]._collect_text(out)

    def get(self, key: str, default: Any = None) -> Any:
        return self.attrs.get(key, default)

    def __getitem__(self, key: str) -> Any:
        return self.attrs[key]

    def _matches(self, name: str | None, attrs: dict | None) -> bool:
        if name is not None and self.name != name:
            return False
        for key, want in (attrs or {}).items():
            have = self.attrs.get(key)
            if key == "class":
                classes = (have or "").split()
                if want not in classes:
                    return False
            elif have != want:
                return False
        return True

    def find_all(self, name: str | None = None, attrs: dict | None = None,
                 **kwargs: str) -> list["MiniElement"]:
        attrs = {**(attrs or {}), **{k.rstrip("_"): v for k, v in kwargs.items()}}
        out: list[MiniElement] = []
        for child in self.children:
            if child._matches(name, attrs):
                out.append(child)
            out.extend(child.find_all(name, attrs))
        return out

    def find(self, name: str | None = None, attrs: dict | None = None,
             **kwargs: str) -> "MiniElement | None":
        found = self.find_all(name, attrs, **kwargs)
        return found[0] if found else None

    def __repr__(self) -> str:  # pragma: no cover — debugging aid
        return f"<MiniElement {self.name} attrs={self.attrs}>"


def enumerate_texts(texts: list[tuple[int, str]]) -> Iterator[tuple[int, str]]:
    merged: dict[int, str] = {}
    for idx, chunk in texts:
        merged[idx] = merged.get(idx, "") + chunk
    return iter(merged.items())


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = MiniElement("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = MiniElement(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in _VOID:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = MiniElement(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag: str) -> None:
        for idx in range(len(self.stack) - 1, 0, -1):
            if self.stack[idx].name == tag:
                del self.stack[idx:]
                break

    def handle_data(self, data: str) -> None:
        top = self.stack[-1]
        top._texts.append((len(top.children), data))


def mini_soup(markup: str) -> MiniElement:
    """Parse HTML/XML-ish markup into a MiniElement tree (the soup)."""
    builder = _TreeBuilder()
    builder.feed(markup)
    builder.close()
    return builder.root
