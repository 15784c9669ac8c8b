"""Minimal DOM + CSS-ish selector helpers over stdlib ``html.parser``.

Replicates the subset of goquery/net/html semantics the reference parser
relies on (see /root/reference/ptt/parser_impl.go:24-139):

- ``find(".cls tag")``   -> all descendant elements, document order
- ``Selection.Text()``   -> concatenation of every descendant text node,
  entities decoded (net/html tokenizer behavior)
- ``Selection.Next()``   -> next sibling *element*
- attribute lookup returns the first matched element's attribute

Only element/class/descendant selectors are needed; this module implements
exactly those, with deterministic document order. No external deps (the
sandbox has no lxml/bs4), and it is only ever invoked from Arrow-batched
pandas UDFs / mapInPandas — never row-at-a-time Spark UDFs.

Two tokenizers produce the SAME tree:

- a strict single-regex FAST tokenizer (the hot path — the crawl's
  fetch_parse stage is bounded by pure-Python HTML parsing, measured
  ~1.8 MB/s/core through stdlib html.parser vs ~3-5x that here), which
  handles exactly the clean constructs whose html.parser semantics are
  unambiguous: text runs, comments, doctype, processing instructions,
  well-formed start/end tags with quoted/unquoted attributes;
- the stdlib ``html.parser`` SLOW path, used as an automatic fallback
  the moment the fast tokenizer sees anything else (script/style
  rawtext, marked sections, bare '<', malformed tags, unterminated
  constructs). Fallback is all-or-nothing per document, so every
  document is parsed end-to-end by ONE tokenizer and equivalence only
  has to hold on the clean subset — which tests/test_htmlparse.py pins
  by parsing the golden fixtures and datagen pages through BOTH paths
  and diffing the trees.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

# Elements that never take a closing tag (HTML5 void elements).
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

#: shared empty class-set for the (majority) class-less elements — never
#: mutated; Node.classes is read-only by construction.
_NO_CLASSES: frozenset = frozenset()


class Node:
    __slots__ = ("tag", "attrs", "classes", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent: "Node | None" = None):
        self.tag = tag
        self.attrs = dict(attrs) if attrs else {}
        cls = self.attrs.get("class")
        self.classes = set(cls.split()) if cls else _NO_CLASSES
        self.children: list = []  # Node or str (text)
        self.parent = parent

    # -- traversal ---------------------------------------------------------

    def iter_elements(self):
        """All descendant elements in document order (self excluded)."""
        stack = [c for c in reversed(self.children) if isinstance(c, Node)]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))

    def text(self) -> str:
        """goquery ``.Text()``: every descendant text node, concatenated."""
        out: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(out)

    def next_element(self) -> "Node | None":
        """goquery ``.Next()``: the following sibling element."""
        if self.parent is None:
            return None
        sibs = self.parent.children
        idx = None
        for i, c in enumerate(sibs):
            if c is self:
                idx = i
                break
        if idx is None:
            return None
        for c in sibs[idx + 1:]:
            if isinstance(c, Node):
                return c
        return None

    # -- selectors ---------------------------------------------------------

    def _matches(self, simple: str) -> bool:
        """Simple selector: ``tag``, ``.cls``, ``tag.cls`` (no combinators)."""
        tag, classes = _compile_simple(simple)
        if tag and self.tag != tag:
            return False
        return all(c in self.classes for c in classes)

    def find(self, selector: str) -> list["Node"]:
        """Descendant-combinator selector, document order (goquery Find).

        Selectors compile once (module cache); each level is a single
        iterative subtree walk with inlined tag/class checks — the
        per-element ancestor re-matching of the naive version is gone
        (it was ~40% of parse_articles wall in the crawl kernel)."""
        parts = _SELECTOR_CACHE.get(selector)
        if parts is None:
            parts = _SELECTOR_CACHE[selector] = tuple(
                _compile_simple(p) for p in selector.split()
            )
        current: list[Node] = [self]
        for tag, classes in parts:
            nxt: list[Node] = []
            # a single scope's subtree walk visits each element once, so
            # duplicates are only possible when one scope NESTS inside
            # another (multi-scope levels) — skip the id-set otherwise
            seen: set[int] | None = set() if len(current) > 1 else None
            for scope in current:
                stack = [c for c in reversed(scope.children)
                         if c.__class__ is Node]
                while stack:
                    el = stack.pop()
                    if tag is None or el.tag == tag:
                        cl = el.classes
                        for c in classes:
                            if c not in cl:
                                break
                        else:
                            if seen is None:
                                nxt.append(el)
                            else:
                                i = id(el)
                                if i not in seen:
                                    seen.add(i)
                                    nxt.append(el)
                    stack.extend([c for c in reversed(el.children)
                                  if c.__class__ is Node])
            current = nxt
        return current


_SELECTOR_CACHE: dict = {}
_SIMPLE_CACHE: dict = {}


def _compile_simple(simple: str):
    """'tag.cls1.cls2' -> (tag | None, (cls1, cls2))."""
    got = _SIMPLE_CACHE.get(simple)
    if got is None:
        bits = simple.split(".")
        got = _SIMPLE_CACHE[simple] = (
            bits[0] or None,
            tuple(b for b in bits[1:] if b),
        )
    return got


class _DomBuilder(HTMLParser):
    """Slow-path tree builder: stdlib tokenizer, reference semantics."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs, parent=self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, attrs, parent=self._stack[-1])
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # Pop to the nearest matching open tag; tolerate stray closers.
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


# --- fast tokenizer ---------------------------------------------------------

# One alternation, tried in order. Group 1 = end-tag name, group 2 =
# start-tag name, group 3 = raw attribute text, group 4 = self-closing
# slash. Tag/attr grammars are deliberately STRICTER than html.parser's
# tolerant patterns: anything outside them leaves a gap between matches
# and triggers the whole-document fallback, so the fast path never has
# to reproduce html.parser's error recovery.
_TOKEN = re.compile(
    r"""[^<]+                                    # text run
      | <!--.*?-->                               # comment
      | <![Dd][Oo][Cc][Tt][Yy][Pp][Ee][^>]*>     # doctype
      | <\?[^>]*>                                # processing instruction
      | </([a-zA-Z][a-zA-Z0-9:_-]*)\s*>          # end tag
      | <([a-zA-Z][a-zA-Z0-9:_-]*)               # start tag...
        ((?:\s+[a-zA-Z_:][a-zA-Z0-9_:.-]*
            (?:=(?:"[^"]*"|'[^']*'|[^\s>'"=`<]+))?)*)
        \s*(/?)>
    """,
    re.X | re.S,
)

_ATTR = re.compile(
    r"""\s+([a-zA-Z_:][a-zA-Z0-9_:.-]*)
        (?:=("[^"]*"|'[^']*'|[^\s>'"=`<]+))?
    """,
    re.X | re.S,
)


#: raw-attr-text -> (tuple of (name, value) pairs) memo. Class/structure
#: attributes repeat across every row of every page (class="r-ent",
#: class="title", ...), so the parse+lower+unquote work amortizes to a
#: dict hit. Bounded: cleared past _ATTR_CACHE_MAX entries (unique
#: hrefs would otherwise grow it without limit).
_ATTR_CACHE: dict = {}
_ATTR_CACHE_MAX = 8192

#: shared read-only empty attr dict for the (majority) attribute-less
#: elements — Node.attrs is never mutated after construction.
_EMPTY_ATTRS: dict = {}


def _parse_attrs(raw: str):
    """Raw attribute text -> ((name, value|None), ...) with html.parser
    semantics on the clean subset: names lowercased, quotes stripped,
    charrefs in values decoded, valueless attrs -> None, duplicate
    names resolved last-wins by the dict() in the caller."""
    got = _ATTR_CACHE.get(raw)
    if got is not None:
        return got
    out = []
    pos = 0
    for m in _ATTR.finditer(raw):
        if m.start() != pos:
            return None  # junk between attributes -> fall back
        pos = m.end()
        name, val = m.group(1, 2)
        if val is not None:
            if val[:1] in "\"'":
                val = val[1:-1]
            if "&" in val:
                val = unescape(val)
        out.append((name.lower(), val))
    if pos != len(raw):
        return None
    if len(_ATTR_CACHE) >= _ATTR_CACHE_MAX:
        _ATTR_CACHE.clear()
    got = _ATTR_CACHE[raw] = tuple(out)
    return got


def _fast_parse(html: str) -> Node | None:
    """Strict-subset tokenizer. Returns the tree, or None to signal
    'use the html.parser fallback' (script/style rawtext, marked
    sections, bare '<', anything malformed or unterminated).

    Token dispatch rides on Match.lastindex (text/comment/doctype/PI
    tokens bind no groups -> None; end tags bind group 1; start tags
    always bind group 4) and nodes are built with slot stores instead
    of the Node constructor — this loop is the crawl's fetch_parse
    inner loop and every call per token shows up at 100 TB."""
    new = Node.__new__
    root = Node("#document")
    root_children = root.children
    stack = [root]
    top_children = root_children
    pos = 0
    for m in _TOKEN.finditer(html):
        if m.start() != pos:
            return None
        pos = m.end()
        li = m.lastindex
        if li is None:  # text / comment / doctype / PI
            tok = m.group(0)
            if tok[0] != "<":  # decode charrefs like convert_charrefs
                top_children.append(unescape(tok) if "&" in tok else tok)
            # comments / doctype / PIs produce no tree nodes (the
            # builder defines no handlers for them either)
            continue
        if li == 1:  # end tag
            end = m.group(1).lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == end:
                    del stack[i:]
                    break
            top_children = stack[-1].children
            continue
        # start tag
        tag, raw_attrs, selfclose = m.group(2, 3, 4)
        tag = tag.lower()
        if tag == "script" or tag == "style":
            return None  # rawtext mode: html.parser's job
        node = new(Node)
        node.tag = tag
        node.parent = stack[-1]
        node.children = children = []
        if raw_attrs:
            pairs = _parse_attrs(raw_attrs)
            if pairs is None:
                return None
            node.attrs = attrs = dict(pairs)
            cls = attrs.get("class")
            node.classes = set(cls.split()) if cls else _NO_CLASSES
        else:
            node.attrs = _EMPTY_ATTRS
            node.classes = _NO_CLASSES
        top_children.append(node)
        if not selfclose and tag not in _VOID:
            stack.append(node)
            top_children = children
    if pos != len(html):
        return None  # unterminated construct at EOF
    return root


def parse_html(html: str | bytes) -> Node:
    """Parse HTML into a mini-DOM root node (fast tokenizer with
    automatic whole-document html.parser fallback — module docstring)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    root = _fast_parse(html)
    if root is not None:
        return root
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


def parse_html_slow(html: str | bytes) -> Node:
    """html.parser-only parse — the equivalence-test twin of the fast
    tokenizer (never called by the engine)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root
