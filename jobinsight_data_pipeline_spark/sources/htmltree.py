"""Tolerant HTML element tree on the stdlib parser.

The reference parses crawled pages with ``BeautifulSoup(html,
'html.parser')`` (/root/reference/src/crawler/parser.py:151) — a thin
tree-builder over Python's stdlib ``html.parser.HTMLParser``. bs4 is not
installed in this image, so this module rebuilds the same tolerant tree
semantics directly on the same stdlib event stream:

- stray end tags are ignored; unclosed tags auto-close at the nearest
  matching open ancestor (never popping past it);
- void elements (``img``, ``br``, …) never take children;
- character and entity references are decoded (``convert_charrefs``);
- comments, doctypes, and processing instructions are dropped;
- tag and attribute names arrive lowercased; bare attributes map to
  ``""`` (bs4's html.parser treebuilder does the same);
- duplicate attributes keep the last value.

The query surface mirrors the subset of the bs4/soupsieve API the
reference extractor uses (parser.py:192-377): ``find``/``find_all`` with
class-TOKEN matching, descendant-combinator ``select``/``select_one``
with ``tag.class[attr]`` simple selectors, and ``get_text``.

One pinned deviation, shared with the previous regex extractor and
documented in tests/test_html_fidelity.py: ``get_text`` joins text
fragments with a single space (bs4's ``get_text(strip=True)``
concatenates without separators) — strictly more readable, same
information.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

_WS = re.compile(r"\s+")

#: HTML void elements — may not have children (WHATWG §13.1.2).
VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Element:
    """One element node; text nodes are plain ``str`` children."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent: "Element | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []
        self.parent = parent

    # -- attribute helpers -------------------------------------------------
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def has_attr(self, name: str) -> bool:
        return name in self.attrs

    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    # -- traversal ---------------------------------------------------------
    def iter_elements(self) -> Iterator["Element"]:
        """Strict descendants, depth-first document order."""
        for child in self.children:
            if isinstance(child, Element):
                yield child
                yield from child.iter_elements()

    def _matches(self, tag: str | None, cls: str | None) -> bool:
        if tag is not None and self.tag != tag:
            return False
        return cls is None or cls in self.classes()

    def find_all(self, tag: str | None = None, cls: str | None = None) -> list["Element"]:
        return [el for el in self.iter_elements() if el._matches(tag, cls)]

    def find(
        self,
        tag: str | None = None,
        cls: str | None = None,
        href: bool = False,
    ) -> "Element | None":
        """First matching descendant; ``href=True`` additionally requires
        an ``href`` attribute (bs4 ``find('a', href=True)``)."""
        for el in self.iter_elements():
            if el._matches(tag, cls) and (not href or "href" in el.attrs):
                return el
        return None

    # -- CSS descendant chains --------------------------------------------
    def select(self, selector: str) -> list["Element"]:
        parts = [_parse_simple(p) for p in selector.split()]
        if not parts:
            return []
        out = []
        for el in self.iter_elements():
            if _match_simple(el, parts[-1]) and _ancestors_satisfy(el, parts[:-1]):
                out.append(el)
        return out

    def select_one(self, selector: str) -> "Element | None":
        parts = [_parse_simple(p) for p in selector.split()]
        if not parts:
            return None
        for el in self.iter_elements():
            if _match_simple(el, parts[-1]) and _ancestors_satisfy(el, parts[:-1]):
                return el
        return None

    # -- text --------------------------------------------------------------
    def strings(self) -> Iterator[str]:
        for child in self.children:
            if isinstance(child, Element):
                yield from child.strings()
            else:
                yield child

    def get_text(self) -> str:
        """Whitespace-normalized text of all string descendants (space
        between fragments — the pinned deviation from bs4's ``''``-join)."""
        parts = []
        for s in self.strings():
            s = _WS.sub(" ", s).strip()
            if s:
                parts.append(s)
        return " ".join(parts)


_SIMPLE_RE = re.compile(r"^([\w-]+|\*)?((?:\.[\w-]+)*)(?:\[([\w-]+)\])?$")


def _parse_simple(part: str) -> tuple[str | None, list[str], str | None]:
    m = _SIMPLE_RE.match(part)
    if not m:
        raise ValueError(f"unsupported selector part: {part!r}")
    tag = m.group(1) if m.group(1) not in (None, "*") else None
    classes = m.group(2).lstrip(".").split(".") if m.group(2) else []
    return tag, classes, m.group(3)


def _match_simple(el: Element, simple: tuple) -> bool:
    tag, classes, attr = simple
    if tag is not None and el.tag != tag:
        return False
    if classes:
        toks = el.classes()
        if any(c not in toks for c in classes):
            return False
    return attr is None or attr in el.attrs


def _ancestors_satisfy(el: Element, parts: list) -> bool:
    """Greedy upward match of the remaining descendant chain."""
    i = len(parts) - 1
    anc = el.parent
    while i >= 0 and anc is not None:
        if _match_simple(anc, parts[i]):
            i -= 1
        anc = anc.parent
    return i < 0


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self._stack = [self.root]

    def _attach(self, tag: str, attrs: list) -> Element:
        node = Element(
            tag, {k: (v if v is not None else "") for k, v in attrs}, self._stack[-1]
        )
        self._stack[-1].children.append(node)
        return node

    def handle_starttag(self, tag: str, attrs: list):
        node = self._attach(tag, attrs)
        if tag not in VOID_ELEMENTS:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list):
        self._attach(tag, attrs)

    def handle_endtag(self, tag: str):
        # Close the nearest matching open tag (auto-closing everything
        # opened since); a stray end tag with no open match is ignored.
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str):
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: str) -> Element:
    """Parse ``html`` into a document Element (never raises on malformed
    markup — html.parser is tolerant by construction)."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
