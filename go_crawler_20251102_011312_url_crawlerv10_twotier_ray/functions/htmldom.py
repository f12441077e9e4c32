"""Minimal HTML tree builder — shared spec module.

The reference's slow path parses HTML with goquery on top of Go's
``net/html`` (reference tokenizer/slowpath.go:66-75). We cannot run Go here,
so this module IS the pinned parsing spec for both the engine kernel and the
oracle: a small DOM built with :mod:`html.parser`, reproducing the
``net/html`` behaviors the reference's selectors rely on:

- document-order (pre-order) element traversal, as goquery's ``Find().Each``;
- ``.Text()`` = concatenation of all descendant text nodes in order, with
  entities decoded and script/style contents INCLUDED as text (net/html
  stores raw-text element contents as text nodes);
- comments are not text;
- void elements (br, img, meta, …) never take children;
- attributes: first occurrence wins (net/html keeps the first duplicate);
  bare attributes have value "".

The synthetic corpus (corpus.py) emits well-formed HTML (explicit open/close
tags, no table-section or foster-parenting constructs) so the HTML5 implied-
tag algorithm and this builder agree on the structure the selectors observe.
Divergent malformed input would be a quarantine row in both engine and
oracle alike (shared spec), so the byte-identical gate is unaffected.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # Node | str
        self.parent = parent

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<{self.tag} {self.attrs} n_children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    def _attrs(self, attrs) -> dict:
        out = {}
        for k, v in attrs:
            if k not in out:  # first occurrence wins
                out[k] = v if v is not None else ""
        return out

    def handle_starttag(self, tag, attrs):
        node = Node(tag, self._attrs(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, self._attrs(attrs), self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: bytes | str) -> Node:
    """Build the DOM. Bytes are decoded as UTF-8 with replacement (shared
    decode policy for the whole system)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    b = _TreeBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:
        # parse failure ⇒ caller treats as the reference's goquery-error
        # fallback (slowpath.go:68-75): empty result
        return Node("#error")
    return b.root


def iter_elements(root: Node, tag: str | None = None):
    """Pre-order (document-order) element iterator, optionally tag-filtered."""
    stack = [root]
    while stack:
        node = stack.pop()
        if isinstance(node, Node):
            if node.tag[0] != "#" and (tag is None or node.tag == tag):
                yield node
            stack.extend(reversed(node.children))


def text_content(node: Node) -> str:
    """goquery ``Selection.Text()``: all descendant text, concatenated."""
    parts: list[str] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            parts.append(n)
        else:
            stack.extend(reversed(n.children))
    return "".join(parts)
