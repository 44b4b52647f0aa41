"""Minimal BeautifulSoup-compatible DOM on the stdlib html.parser.

The reference's HTML/XML extraction evaluates objective expressions
against a soup (``_extract_soup``, reference
``datagrowth/processors/input/extraction.py:156-193``) — expressions
like ``soup.find_all("p")`` or ``el.text``. bs4 is not in this
container, so this module provides the subset those objectives actually
use on a tree built by ``html.parser``:

* ``find`` / ``find_all`` — by tag name (string or list of names) and
  attrs; keyword filters incl. ``class_`` and boolean presence
  (``href=True`` / ``href=False``); ``recursive=`` and ``limit=``
* ``select`` / ``select_one`` — CSS subset: tag, ``.class``, ``#id``,
  ``[attr]`` / ``[attr=val]``, descendant (space) and child (``>``)
  combinators, comma-separated selector lists
* ``.text`` / ``get_text(separator, strip=...)`` / ``.string``
* ``.get`` / ``[]`` attribute access, ``.attrs``, ``has_attr``,
  ``.children``, ``.parent``, ``find_parent``, tag-attribute access
  (``soup.body.div``), ``.next_sibling`` / ``.previous_sibling``
  (element-only), ``find_next_sibling`` / ``find_previous_sibling``

When bs4 IS available the extractor prefers it; the API here is
call-compatible for the supported subset, so objectives don't change
between environments.
"""

from __future__ import annotations

import re
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

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """bs4 ``get_text``: join every descendant text node with
        ``separator``; with ``strip`` each node is stripped and empty
        nodes are skipped."""
        chunks: list[str] = []
        self._iter_text_nodes(chunks)
        if strip:
            chunks = [c.strip() for c in chunks]
            chunks = [c for c in chunks if c]
        return separator.join(chunks)

    def _iter_text_nodes(self, out: list[str]) -> None:
        texts = dict(enumerate_texts(self._texts))
        for idx in range(len(self.children) + 1):
            if idx in texts:
                out.append(texts[idx])
            if idx < len(self.children):
                self.children[idx]._iter_text_nodes(out)

    @property
    def string(self) -> str | None:
        """bs4 ``.string``: the single text child, recursing through a
        single element child; None when the content is ambiguous."""
        texts = [t for _, t in enumerate_texts(self._texts)]
        if not self.children and len(texts) == 1:
            return texts[0]
        if len(self.children) == 1 and not texts:
            return self.children[0].string
        return None


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

    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    def _matches(self, name, attrs: dict | None) -> bool:
        if name is not None:
            # bs4 accepts a tag name or a list/tuple/set of names.
            if isinstance(name, (list, tuple, set, frozenset)):
                if self.name not in name:
                    return False
            elif self.name != name:
                return False
        for key, want in (attrs or {}).items():
            have = self.attrs.get(key)
            # bs4 boolean filters: attr=True → present, attr=False → absent.
            if want is True:
                if key not in self.attrs:
                    return False
            elif want is False:
                if key in self.attrs:
                    return False
            elif key == "class":
                classes = (have or "").split()
                if want not in classes:
                    return False
            elif have != want:
                return False
        return True

    def find_all(self, name=None, attrs: dict | None = None,
                 recursive: bool = True, limit: int | None = None,
                 **kwargs) -> list["MiniElement"]:
        attrs = {**(attrs or {}), **{k.rstrip("_"): v for k, v in kwargs.items()}}
        out: list[MiniElement] = []
        for child in self.children:
            if child._matches(name, attrs):
                out.append(child)
                if limit is not None and len(out) >= limit:
                    return out
            if recursive:
                rest = (limit - len(out)) if limit is not None else None
                out.extend(child.find_all(name, attrs, limit=rest))
                if limit is not None and len(out) >= limit:
                    return out[:limit]
        return out

    def find(self, name=None, attrs: dict | None = None,
             recursive: bool = True, **kwargs) -> "MiniElement | None":
        found = self.find_all(name, attrs, recursive=recursive, limit=1, **kwargs)
        return found[0] if found else None

    def __getattr__(self, name: str) -> "MiniElement | None":
        """bs4 tag-attribute access: ``soup.body``, ``el.div`` — the
        first matching descendant (None when absent). Only plain
        lowercase tag-ish names resolve; anything else raises so real
        attribute errors stay visible."""
        if name.startswith("_") or not name.islower():
            raise AttributeError(name)
        return self.find(name)

    # -- tree navigation ---------------------------------------------------
    def find_parent(self, name=None, attrs: dict | None = None,
                    **kwargs) -> "MiniElement | None":
        attrs = {**(attrs or {}), **{k.rstrip("_"): v for k, v in kwargs.items()}}
        node = self.parent
        while node is not None:
            if node.name != "[document]" and node._matches(name, attrs):
                return node
            node = node.parent
        return None

    @property
    def next_sibling(self) -> "MiniElement | None":
        """Adjacent ELEMENT sibling (bs4's property also yields text
        nodes; objectives that need those use get_text on the parent)."""
        return self._sibling(1, None, {})

    @property
    def previous_sibling(self) -> "MiniElement | None":
        return self._sibling(-1, None, {})

    def find_next_sibling(self, name: str | None = None, attrs: dict | None = None,
                          **kwargs: str) -> "MiniElement | None":
        return self._sibling(1, name, {**(attrs or {}),
                                       **{k.rstrip("_"): v for k, v in kwargs.items()}})

    def find_previous_sibling(self, name: str | None = None, attrs: dict | None = None,
                              **kwargs: str) -> "MiniElement | None":
        return self._sibling(-1, name, {**(attrs or {}),
                                        **{k.rstrip("_"): v for k, v in kwargs.items()}})

    def _sibling(self, step: int, name: str | None, attrs: dict) -> "MiniElement | None":
        if self.parent is None:
            return None
        sibs = self.parent.children
        idx = sibs.index(self) + step
        while 0 <= idx < len(sibs):
            if sibs[idx]._matches(name, attrs):
                return sibs[idx]
            idx += step
        return None

    # -- CSS selector subset ----------------------------------------------
    def select(self, selector: str) -> list["MiniElement"]:
        """CSS subset: tag, ``.class``, ``#id``, ``[attr]``/``[attr=val]``,
        descendant and ``>`` combinators, comma lists. Document order,
        deduplicated."""
        out: list[MiniElement] = []
        seen: set[int] = set()
        for part in selector.split(","):
            for el in self._select_single(part.strip()):
                if id(el) not in seen:
                    seen.add(id(el))
                    out.append(el)
        return out

    def select_one(self, selector: str) -> "MiniElement | None":
        found = self.select(selector)
        return found[0] if found else None

    def _select_single(self, selector: str) -> list["MiniElement"]:
        steps = _parse_selector(selector)
        current: list[MiniElement] = [self]
        for combinator, name, conds in steps:
            nxt: list[MiniElement] = []
            seen: set[int] = set()
            for el in current:
                pool = el.children if combinator == ">" else _descendants(el)
                for cand in pool:
                    if id(cand) not in seen and _compound_matches(cand, name, conds):
                        seen.add(id(cand))
                        nxt.append(cand)
            current = nxt
        return current

    def __repr__(self) -> str:  # pragma: no cover — debugging aid
        return f"<MiniElement {self.name} attrs={self.attrs}>"


_COMPOUND_RE = re.compile(
    r"(?P<tag>[A-Za-z][\w-]*|\*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)$"
)
_COND_RE = re.compile(r"[.#][\w-]+|\[[^\]]+\]")


def _parse_selector(selector: str) -> list[tuple[str, str | None, list[tuple[str, str | None]]]]:
    """``div.a > p [href]`` → [(combinator, tag, [(kind, value)...]), ...]
    where combinator is ``" "`` (descendant) or ``">"`` (child) and kind
    is ``class`` / ``id`` / attribute name (value None = existence)."""
    tokens = re.findall(r">|[^\s>]+", selector)
    steps: list[tuple[str, str | None, list[tuple[str, str | None]]]] = []
    combinator = " "
    for tok in tokens:
        if tok == ">":
            combinator = ">"
            continue
        m = _COMPOUND_RE.match(tok)
        if not m or (not m.group("tag") and not m.group("rest")):
            raise ValueError(f"unsupported CSS selector fragment: {tok!r}")
        tag = m.group("tag")
        conds: list[tuple[str, str | None]] = []
        for cond in _COND_RE.findall(m.group("rest") or ""):
            if cond.startswith("."):
                conds.append(("class", cond[1:]))
            elif cond.startswith("#"):
                conds.append(("id", cond[1:]))
            else:
                inner = cond[1:-1]
                if "=" in inner:
                    key, _, val = inner.partition("=")
                    conds.append((key.strip(), val.strip().strip("'\"")))
                else:
                    conds.append((inner.strip(), None))
        steps.append((combinator, None if tag in (None, "*") else tag, conds))
        combinator = " "
    if not steps:
        raise ValueError(f"empty CSS selector: {selector!r}")
    return steps


def _descendants(el: "MiniElement") -> Iterator["MiniElement"]:
    for child in el.children:
        yield child
        yield from _descendants(child)


def _compound_matches(el: "MiniElement", name: str | None,
                      conds: list[tuple[str, str | None]]) -> bool:
    if name is not None and el.name != name:
        return False
    for kind, want in conds:
        if kind == "class":
            if want not in (el.attrs.get("class") or "").split():
                return False
        elif kind == "id":
            if el.attrs.get("id") != want:
                return False
        elif want is None:
            if kind not in el.attrs:
                return False
        elif el.attrs.get(kind) != want:
            return False
    return True


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
