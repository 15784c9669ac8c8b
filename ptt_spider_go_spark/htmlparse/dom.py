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
"""

from __future__ import annotations

from html.parser import HTMLParser

# Elements that never take a closing tag (HTML5 void elements).
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "classes", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent: "Node | None" = None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        cls = self.attrs.get("class") or ""
        self.classes = set(cls.split())
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
        tag = None
        classes = []
        for i, part in enumerate(simple.split(".")):
            if i == 0:
                tag = part or None
            elif part:
                classes.append(part)
        if tag and self.tag != tag:
            return False
        return all(c in self.classes for c in classes)

    def find(self, selector: str) -> list["Node"]:
        """Descendant-combinator selector, document order (goquery Find)."""
        parts = selector.split()
        current = [self]
        for part in parts:
            nxt = []
            seen_ids = set()
            for scope in current:
                for el in scope.iter_elements():
                    if id(el) not in seen_ids and el._matches(part):
                        seen_ids.add(id(el))
                        nxt.append(el)
            current = nxt
        return current


class _DomBuilder(HTMLParser):
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


def parse_html(html: str | bytes) -> Node:
    """Parse HTML into a mini-DOM root node."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root
