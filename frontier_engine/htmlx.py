"""Minimal HTML DOM on top of stdlib ``html.parser``.

This sandbox has neither BeautifulSoup nor lxml, so the engine carries its
own tiny DOM with the *exact* text-extraction semantics the reference relies
on (``/root/reference/src/parser.py`` — see each method's citation).  The
semantics replicated here are those of modern bs4 (>=4.10) with an HTML tree
builder:

* ``get_text(separator, strip)`` walks descendant text nodes in document
  order; text inside ``<script>``/``<style>``/``<template>`` and comments is
  NOT emitted (bs4 ``DEFAULT_STRING_CONTAINERS``); with ``strip=True`` each
  string is stripped and empties are skipped.
* character/entity references are decoded (``convert_charrefs=True``), same
  as lxml's entity resolution.
* void elements (``<img>``, ``<br>``, ...) never take children; unclosed
  tags are closed when an enclosing tag closes (lenient, lxml-like).

Pure Python, zero Spark imports — safe to use inside pandas UDF workers and
as the sequential oracle in tests.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# bs4 HTMLTreeBuilder.DEFAULT_STRING_CONTAINERS: strings inside these tags
# are Script/Stylesheet/TemplateString instances, excluded from get_text().
NON_TEXT_CONTAINERS = frozenset(("script", "style", "template"))


class Node:
    """One element (or the document root). Text children are plain ``str``."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict[str, str] | None = None, parent: "Node | None" = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list[object] = []  # Node | str
        self.parent = parent

    # -- traversal ---------------------------------------------------------

    def iter_desc(self):
        """Yield descendant Nodes and strings in document order."""
        for child in self.children:
            yield child
            if isinstance(child, Node):
                yield from child.iter_desc()

    def find_all(self, names, attrs: dict[str, str] | None = None, has_attr: str | None = None):
        """All descendant elements matching tag name(s) + exact attrs.

        ``has_attr`` additionally requires the attribute key to be present
        (bs4's ``find_all('a', href=True)``).
        """
        if isinstance(names, str):
            names = (names,)
        names = frozenset(names)
        out = []
        for d in self.iter_desc():
            if not isinstance(d, Node) or d.name not in names:
                continue
            if has_attr is not None and has_attr not in d.attrs:
                continue
            if attrs and any(d.attrs.get(k) != v for k, v in attrs.items()):
                continue
            out.append(d)
        return out

    def find(self, names, attrs: dict[str, str] | None = None, has_attr: str | None = None):
        found = self.find_all(names, attrs, has_attr)
        return found[0] if found else None

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    # -- text --------------------------------------------------------------

    def _strings(self, in_container: bool = False):
        for child in self.children:
            if isinstance(child, str):
                if not in_container:
                    yield child
            else:
                yield from child._strings(in_container or child.name in NON_TEXT_CONTAINERS)

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """bs4 ``Tag.get_text`` semantics (see module docstring)."""
        skip = self.name in NON_TEXT_CONTAINERS
        if strip:
            parts = [s.strip() for s in self._strings(skip)]
            parts = [s for s in parts if s]
        else:
            parts = list(self._strings(skip))
        return separator.join(parts)

    @property
    def string(self) -> str | None:
        """bs4 ``.string``: the single text child if exactly one child."""
        if len(self.children) == 1 and isinstance(self.children[0], str):
            return self.children[0]
        return None

    # -- minimal CSS select (enough for the reference's config selectors) ---

    def select(self, selector: str):
        """Descendant-combinator chains of simple selectors.

        Supports ``tag``, ``.cls``, ``#id``, ``tag.cls``, ``tag#id``,
        ``tag.a.b`` and whitespace descendant combinators — the full selector
        surface used by the reference config (``config.yaml:115-119``).
        """
        parts = [_parse_simple(p) for p in selector.split()]
        if not parts:
            return []
        ctx = [self]
        for part in parts:
            nxt = []
            seen = set()
            for node in ctx:
                for d in node.iter_desc():
                    if isinstance(d, Node) and _match_simple(d, part) and id(d) not in seen:
                        seen.add(id(d))
                        nxt.append(d)
            ctx = nxt
        return ctx

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"<Node {self.name} {self.attrs}>"


def _parse_simple(sel: str):
    tag, cid, classes = None, None, []
    buf, mode = "", "tag"

    def flush():
        nonlocal tag, cid, buf
        if not buf:
            return
        if mode == "tag":
            tag = buf
        elif mode == "id":
            cid = buf
        else:
            classes.append(buf)
        buf = ""

    for ch in sel:
        if ch == ".":
            flush()
            mode = "class"
        elif ch == "#":
            flush()
            mode = "id"
        else:
            buf += ch
    flush()
    return (tag, cid, tuple(classes))


def _match_simple(node: Node, part) -> bool:
    tag, cid, classes = part
    if tag and tag != "*" and node.name != tag:
        return False
    if cid is not None and node.attrs.get("id") != cid:
        return False
    if classes:
        have = set((node.attrs.get("class") or "").split())
        if not all(c in have for c in classes):
            return False
    return True


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    @staticmethod
    def _attr_dict(attrs):
        # duplicate attributes keep the FIRST occurrence — lxml semantics
        # (the reference parses with BeautifulSoup(..., 'lxml')); a dict
        # comprehension would keep the last and diverge on malformed pages
        d = {}
        for k, v in attrs:
            d.setdefault(k, v if v is not None else "")
        return d

    def handle_starttag(self, tag, attrs):
        node = Node(tag, self._attr_dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, self._attr_dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # lenient close: pop up to the nearest matching open tag, if any
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    # comments / declarations / PIs produce no text (bs4 get_text excludes
    # Comment/Declaration nodes with an HTML tree builder)
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass


def parse_html(html) -> Node:
    """Parse HTML (str or utf-8 bytes) into a document Node."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(html or "")
    builder.close()
    return builder.root
