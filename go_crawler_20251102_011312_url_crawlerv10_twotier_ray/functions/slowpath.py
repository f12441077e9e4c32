"""Engine slow-path DOM extractor (tier-2, content pages).

Reimplements the reference's full DOM analysis (reference
tokenizer/slowpath.go:57-171) as a single pre-order traversal over the
shared DOM spec (functions/htmldom.py): page metadata (first <title> text,
first meta[name=description] content, <nav> presence), every a[href] in
document order with RFC 3986 absolutization (Go ``baseURL.Parse``),
document detection (suffix-only match — deliberately different from the
crawl-side ``utils.IsDocumentURL``, see SURVEY.md §2.7.7), link-text title,
parent-text context truncated at 200 bytes + "...", and link density =
links per KB of the ORIGINAL byte length. Written independently of the
pinned oracle (oracle/reference.slow_analyze) and tested against it.
"""

from __future__ import annotations

from urllib.parse import urljoin

from .htmldom import Node, parse_html, text_content
from .urlnorm import has_ctrl


class SlowExtraction:
    __slots__ = ("links", "documents", "title", "description", "has_nav",
                 "link_density", "parse_error")

    def __init__(self):
        self.links: list[str] = []
        self.documents: list[tuple[str, str, str, str]] = []
        self.title = ""
        self.description = ""
        self.has_nav = False
        self.link_density = 0.0
        self.parse_error = False


def _extension_of(url_str: str) -> str:
    """slowpath.go:146-157: substring after the LAST dot, with anything from
    '?' on removed, '.'-prefixed; '' when the URL has no dot at all."""
    dot = url_str.rfind(".")
    if dot < 0:
        return ""
    ext = url_str[dot + 1 :]
    q = ext.find("?")
    return "." + (ext[:q] if q >= 0 else ext)


def _context_of(parent: Node | None) -> str:
    """slowpath.go:160-171: parent text → 200-byte truncation → '...' →
    TrimSpace (truncation happens BEFORE the trim)."""
    if parent is None or parent.tag == "#root":
        return ""
    text = text_content(parent)
    enc = text.encode("utf-8")
    if len(enc) > 200:
        text = enc[:200].decode("utf-8", "ignore") + "..."
    return text.strip()


def analyze_slow(
    html_bytes: bytes, base_url: str, doc_extensions: tuple[str, ...]
) -> SlowExtraction:
    res = SlowExtraction()
    root = parse_html(html_bytes)
    if root.tag == "#error":
        res.parse_error = True
        return res

    exts_lower = tuple(e.lower() for e in doc_extensions)
    saw_title = False
    saw_desc = False

    stack: list = [root]
    while stack:
        node = stack.pop()
        if not isinstance(node, Node):
            continue
        tag = node.tag
        if tag == "title" and not saw_title:
            res.title = text_content(node)
            saw_title = True
        elif tag == "meta" and not saw_desc and node.attrs.get("name") == "description":
            res.description = node.attrs.get("content", "")
            saw_desc = True
        elif tag == "nav":
            res.has_nav = True
        elif tag == "a" and "href" in node.attrs:
            href = node.attrs["href"]
            if href and href != "#" and not href.startswith(("javascript:", "mailto:")):
                if not has_ctrl(href):  # Go url.Parse errors on control chars
                    try:
                        url_str = urljoin(base_url, href)
                    except ValueError:
                        url_str = None
                    if url_str is not None:
                        res.links.append(url_str)
                        low = url_str.lower()
                        if any(low.endswith(e) for e in exts_lower):
                            res.documents.append(
                                (url_str, _extension_of(url_str),
                                 text_content(node), _context_of(node.parent))
                            )
        stack.extend(reversed(node.children))

    kb = len(html_bytes) / 1024.0
    if kb > 0:
        res.link_density = len(res.links) / kb
    return res
