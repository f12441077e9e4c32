"""Unit tests for the shared DOM builder (functions/htmldom) — the pinned
stand-in for Go net/html (SURVEY.md §7 hard part #1) — plus slow-path
property parity on generated HTML fragments."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.htmldom import (
    iter_elements,
    parse_html,
    text_content,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.slowpath import (
    analyze_slow,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.oracle import (
    reference as oracle,
)


class TestDomBuilder:
    def test_void_elements_take_no_children(self):
        root = parse_html(b"<p>a<br>b<img src=x>c</p>")
        p = next(iter_elements(root, "p"))
        assert text_content(p) == "abc"
        assert [n.tag for n in iter_elements(p) if n.tag != "p"] == ["br", "img"]

    def test_entities_decoded(self):
        root = parse_html(b"<p>a &amp; b &lt;c&gt;</p>")
        assert text_content(root) == "a & b <c>"

    def test_script_content_is_text(self):
        root = parse_html(b"<div><script>if (a<b) x()</script></div>")
        assert "if (a<b) x()" in text_content(root)

    def test_comments_are_not_text(self):
        root = parse_html(b"<p>x<!-- hidden -->y</p>")
        assert text_content(root) == "xy"

    def test_stray_end_tag_ignored(self):
        root = parse_html(b"<p>a</span>b</p>")
        assert text_content(next(iter_elements(root, "p"))) == "ab"

    def test_duplicate_attr_first_wins(self):
        root = parse_html(b'<a href="/first" href="/second">t</a>')
        a = next(iter_elements(root, "a"))
        assert a.attrs["href"] == "/first"

    def test_bare_attr_is_empty_string(self):
        root = parse_html(b"<a href>t</a>")
        assert next(iter_elements(root, "a")).attrs["href"] == ""

    def test_document_order(self):
        root = parse_html(
            b'<div><a href="/1">x</a><p><a href="/2">y</a></p><a href="/3">z</a></div>'
        )
        hrefs = [n.attrs["href"] for n in iter_elements(root, "a")]
        assert hrefs == ["/1", "/2", "/3"]

    def test_parent_links(self):
        root = parse_html(b"<div><p>ctx <a href='/x'>l</a></p></div>")
        a = next(iter_elements(root, "a"))
        assert a.parent.tag == "p"
        assert text_content(a.parent) == "ctx l"


_snippet = st.sampled_from(
    [
        "<p>",
        "</p>",
        "<div>",
        "</div>",
        '<a href="/x.html">t</a>',
        '<a href="/d.pdf">doc</a>',
        "<a href='rel.html'>r</a>",
        "<a href=unq>u</a>",
        '<a href="#">h</a>',
        '<a href="">e</a>',
        "<a>no-href</a>",
        "<title>T</title>",
        '<meta name="description" content="D">',
        "<nav>n</nav>",
        "text & entity",
        "<!-- href=/c.html -->",
        "<script>href='/s.html'</script>",
        "<br>",
        "<span>" + "x" * 120 + "</span>",
    ]
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_snippet, max_size=20))
def test_slowpath_property_parity(snippets):
    html = "".join(snippets).encode()
    base = "http://h.test/a/b"
    a = analyze_slow(html, base, (".pdf",))
    b = oracle.slow_analyze(html, base, (".pdf",))
    assert a.links == b.links
    assert (a.title, a.description, a.has_nav) == (b.title, b.description, b.has_nav)
    assert a.documents == b.documents
    assert a.link_density == pytest.approx(b.link_density)
