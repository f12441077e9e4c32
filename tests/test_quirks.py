"""Unit tests for the §2.7 reference quirks — on BOTH the pinned oracle and
the independently-written engine kernels (golden input/output pairs derived
by hand from the Go source in /root/reference)."""

import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.fastpath import (
    extract_links_fast,
    naive_absolute,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.slowpath import (
    analyze_slow,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.urlnorm import (
    fetch_key,
    normalize_url,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.oracle import reference as oracle

BASE = "http://h.test/a/b"

FAST_IMPLS = [
    pytest.param(oracle.fast_extract_links, id="oracle"),
    pytest.param(extract_links_fast, id="engine"),
]


@pytest.mark.parametrize("fast", FAST_IMPLS)
class TestFastQuirks:
    def test_href_anywhere_including_comments(self, fast):
        # fastpath.go:98-107: href= matches inside comments/scripts/plain text
        html = b'<!-- href="/c.html" --><script>href=\'/s.html\' </script>tail'
        assert fast(html, BASE) == ["http://h.test/c.html", "http://h.test/s.html"]

    def test_final_six_bytes_never_match(self, fast):
        # fastpath.go:41: loop bound is i < len-6
        assert fast(b"xxhref=y", BASE) == []  # match at n-6 → skipped
        assert fast(b"xhref=yz", BASE) == ["http://h.test/a/b/yz"]  # n-7 → taken

    def test_tiny_input(self, fast):
        assert fast(b"href=", BASE) == []
        assert fast(b"", BASE) == []

    def test_unquoted_value_keeps_tabs_and_newlines(self, fast):
        # fastpath.go:58-63: unquoted terminates only at ' ' or '>'
        html = b"<a href=/x\ty.html>z</a>pad"
        assert fast(html, BASE) == ["http://h.test/x\ty.html"]

    def test_quoted_value_keeps_spaces(self, fast):
        html = b'<a href="/x y.html">z</a>pad'
        assert fast(html, BASE) == ["http://h.test/x y.html"]

    def test_skip_hash_javascript_mailto(self, fast):
        html = (
            b'<a href="#">a</a><a href="#f">b</a>'
            b'<a href="javascript:void(0)">c</a><a href="mailto:x@y">d</a>pad'
        )
        assert fast(html, BASE) == []

    def test_consumed_region_not_rescanned(self, fast):
        # an href= inside a consumed value must not spawn a second link
        html = b'<a href="/a/href=b.html">x</a>pad'
        assert fast(html, BASE) == ["http://h.test/a/href=b.html"]

    def test_unterminated_value_runs_to_eof_region(self, fast):
        html = b'x<a href="/never-closed'
        assert fast(html, BASE) == ["http://h.test/never-closed"]


class TestMakeAbsoluteQuirks:
    # fastpath.go:109-127 — table derived by hand from the Go source
    CASES = [
        ("https:/oddity", "https:/oddity"),  # len>7 + 'https:/' prefix passes
        ("http://", "http://h.test/a/b/http://"),  # bare 7-char fails len>7
        ("http://x.test/p", "http://x.test/p"),
        ("//other.test/p", "http://other.test/p"),
        ("/root.html", "http://h.test/root.html"),
        ("rel.html", "http://h.test/a/b/rel.html"),  # naive concat, no ../
        ("../up.html", "http://h.test/a/b/../up.html"),
    ]

    @pytest.mark.parametrize("raw,expected", CASES)
    def test_cases(self, raw, expected):
        assert oracle.make_absolute(raw, "http", "h.test", BASE) == expected
        assert naive_absolute(raw, "http", "h.test", BASE) == expected

    def test_base_keeps_query_on_concat(self):
        base = "http://h.test/a?q=1"
        assert oracle.make_absolute("x", "http", "h.test", base) == "http://h.test/a?q=1/x"
        assert naive_absolute("x", "http", "h.test", base) == "http://h.test/a?q=1/x"

    def test_trailing_slash_base(self):
        base = "http://h.test/dir/"
        assert naive_absolute("x", "http", "h.test", base) == "http://h.test/dir/x"


SLOW_IMPLS = [
    pytest.param(
        lambda h, b, e: oracle.slow_analyze(h, b, e), id="oracle"
    ),
    pytest.param(lambda h, b, e: analyze_slow(h, b, e), id="engine"),
]


@pytest.mark.parametrize("slow", SLOW_IMPLS)
class TestSlowQuirks:
    def test_metadata_and_rfc_resolution(self, slow):
        html = (
            b"<html><head><title>T1</title><title>T2</title>"
            b'<meta name="description" content="D1">'
            b'<meta name="description" content="D2"></head>'
            b"<body><nav>n</nav>"
            b'<a href="../up.html">u</a>'
            b'<a href="#frag">f</a>'
            b'<a href="#">skip</a><a href="">skip</a>'
            b"</body></html>"
        )
        res = slow(html, "http://h.test/a/b/c", (".pdf",))
        assert res.title == "T1"
        assert res.description == "D1"
        assert res.has_nav is True
        # RFC-correct ../ resolution (≠ fast path), '#frag' RESOLVES on slow
        assert res.links == ["http://h.test/a/up.html", "http://h.test/a/b/c#frag"]

    def test_doc_detection_suffix_only_and_context(self, slow):
        ctx = "x" * 250
        html = (
            "<html><body>"
            f'<p>{ctx}<a href="/d/file.pdf">Get the PDF</a></p>'
            '<p><a href="/d/file.pdf?x=1">qv</a></p>'
            '<p><a href="/d/UP.PDF">caps</a></p>'
            "</body></html>"
        ).encode()
        res = slow(html, "http://h.test/", (".pdf",))
        # suffix-only: .pdf?x=1 is a link but NOT a document (slowpath.go:135-143)
        assert len(res.links) == 3
        assert [d[0] for d in res.documents] == [
            "http://h.test/d/file.pdf",
            "http://h.test/d/UP.PDF",
        ]
        d0 = res.documents[0]
        assert d0[1] == ".pdf" and d0[2] == "Get the PDF"
        # context: parent text truncated at 200 bytes then '...' then strip
        assert d0[3] == "x" * 200 + "..."
        assert res.documents[1][1] == ".PDF"

    def test_link_density_uses_byte_length(self, slow):
        html = b'<a href="/x">l</a>' + b" " * 1006  # 1024 bytes total
        res = slow(html, "http://h.test/", (".pdf",))
        assert res.link_density == pytest.approx(1.0)

    def test_script_text_is_text_but_not_links(self, slow):
        html = b"<p><script>href='/q/s.html'</script><a href='/x.pdf'>t</a></p>"
        res = slow(html, "http://h.test/", (".pdf",))
        assert res.links == ["http://h.test/x.pdf"]
        # parent context includes the script's raw text (net/html text nodes)
        assert "href='/q/s.html'" in res.documents[0][3]


class TestScalarFunctions:
    def test_get_extension(self):
        from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.slowpath import (
            _extension_of,
        )

        cases = [
            ("http://h/a.pdf", ".pdf"),
            ("http://h/a.pdf?x=1", ".pdf"),
            ("http://h/a.tar.gz", ".gz"),
            ("http://h/noext", ""),
            ("http://h/x.", "."),
            ("http://h/a.pdf?x=1.5", ".5"),  # last dot is in the query (Go quirk)
        ]
        for url, want in cases:
            assert oracle.get_extension(url) == want, url
            assert _extension_of(url) == want, url

    def test_is_document_url_asymmetry(self):
        # crawl-side utils.IsDocumentURL matches ext? / ext& ; slow-path
        # is_document is suffix-only (SURVEY.md §2.7.7)
        assert oracle.is_document_url("http://h/a.pdf?x=1", (".pdf",)) is True
        assert oracle.is_document("http://h/a.pdf?x=1", (".pdf",)) is False
        assert oracle.is_document("http://h/A.PDF", (".pdf",)) is True

    def test_sanitize_filename(self):
        assert oracle.sanitize_filename('a\\/:*?"<>|\x00b.pdf') == "a__________b.pdf"
        long = "x" * 300 + ".pdf"
        out = oracle.sanitize_filename(long)
        assert len(out) == 200 and out.endswith(".pdf")

    def test_extract_filename(self):
        assert oracle.extract_filename("http://h/d/file.pdf?x=1") == "file.pdf"
        assert oracle.extract_filename("http://h/d/") == "download"
        assert oracle.extract_filename("http://h/d/noext") == "download"

    def test_normalize_url(self):
        assert (
            normalize_url("HTTP://Host.TEST/Path/X?q=1#f") == "http://host.test/path/x"
        )
        assert normalize_url("http://h.test") == "http://h.test"
        assert normalize_url("/relative") is None  # no host
        assert normalize_url("http://h.test/a\tb") is None  # Go rejects ctrl chars

    def test_fetch_key(self):
        # fragment stripped, scheme+host lowercased, path/query case kept
        assert (
            fetch_key("HTTP://Host.TEST/Path?Q=A#sec") == "http://host.test/Path?Q=A"
        )
