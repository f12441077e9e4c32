"""Engine kernels vs pinned oracle: property-based and corpus-wide parity.

The engine kernels (regex fast scanner, one-pass DOM walk, vectorized
router) are written independently of the oracle transcription; these tests
are the byte-identical gate at the kernel level."""

import pandas as pd
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.config import CrawlConfig
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.fastpath import (
    extract_links_fast,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.router import (
    route_batch,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.slowpath import (
    analyze_slow,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.oracle import reference as oracle
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.stages.extract import (
    RouteAndExtract,
)

BASES = [
    "http://h.test/a/b",
    "http://h.test/dir/",
    "https://Host.TEST/Q?x=1",
    "http://h.test",
]

_frag = st.sampled_from(
    [
        b"<a href=",
        b"href=",
        b"HREF=",
        b"hReF=",
        b'"',
        b"'",
        b">",
        b" ",
        b"\t",
        b"#",
        b"/x.html",
        b"//h2.test/y",
        b"http://abs.test/z",
        b"https:/o",
        b"javascript:f()",
        b"mailto:a@b",
        b"plain text ",
        b"<!-- c -->",
        b"=",
        b"\n",
    ]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_frag, max_size=30), st.sampled_from(BASES))
def test_fastpath_property_parity(frags, base):
    html = b"".join(frags)
    assert extract_links_fast(html, base) == oracle.fast_extract_links(html, base)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200), st.sampled_from(BASES))
def test_fastpath_random_bytes_parity(html, base):
    assert extract_links_fast(html, base) == oracle.fast_extract_links(html, base)


URL_GRID = [
    "http://h.test/p",
    "http://h.test/a/b/c/d",
    "http://h.test/sitemap/x",
    "http://h.test/our-Documents/x",  # '/document' matches as substring
    "http://h.test/paper/1",
    "http://h.test/x?q=1",
    "http://h.test/x?",
    "http://h.test/x?#f",
    "http://h.test/x#f?notquery",
    "http://h.test/TAG/Y",
    "http://h.test/list",
    "http://h.test",
    "http://h.test/a/b/c/d/e?page=2#s",
]
SIZES = [0, 50_000, 99_999, 100_000, 150_000, 400_000, 500_001, 600_000]


def test_router_parity_grid():
    urls, sizes = [], []
    for u in URL_GRID:
        for s in SIZES:
            urls.append(u)
            sizes.append(s)
    got = route_batch(pd.Series(urls), sizes)
    want = [oracle.decide(u, s) for u, s in zip(urls, sizes)]
    assert list(got) == want


def test_slowpath_corpus_parity(smoke_corpus_dir):
    t = pq.read_table(smoke_corpus_dir + "/pages", columns=["url", "html"])
    cfg = CrawlConfig()
    n_slow = 0
    for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        body = html[: cfg.max_body_bytes]
        if oracle.decide(url, len(body)) != "slow":
            continue
        n_slow += 1
        a = analyze_slow(body, url, cfg.doc_extensions)
        b = oracle.slow_analyze(body, url, cfg.doc_extensions)
        assert a.links == b.links, url
        assert (a.title, a.description, a.has_nav) == (b.title, b.description, b.has_nav)
        assert a.link_density == b.link_density
        assert a.documents == b.documents, url
    assert n_slow > 10


def test_extract_stage_matches_minted_text(smoke_corpus_dir):
    """The M1 gate, kernel-level: RouteAndExtract output text == pages.text
    byte-for-byte for every corpus page."""
    t = pq.read_table(smoke_corpus_dir + "/pages")
    out = RouteAndExtract(CrawlConfig())(t.select(["url", "html"]))
    assert out["text"].to_pylist() == t["text"].to_pylist()
    paths = set(out["path"].to_pylist())
    assert paths == {"fast", "slow"}


def test_extract_stage_body_cap():
    """A >5 MB body is truncated (colly read-cap), dropping post-cap links."""
    import pyarrow as pa

    pre = b'<html><body><a href="/before">x</a>'
    pad = b"<!-- " + b"h" * (5 * 1024 * 1024) + b" -->"
    post = b'<a href="/after">y</a></body></html>'
    batch = pa.table({"url": ["http://h.test/big"], "html": [pre + pad + post]})
    out = RouteAndExtract(CrawlConfig())(batch)
    links = out["links"][0].as_py()
    assert "http://h.test/before" in links
    assert all("after" not in l for l in links)
    assert out["path"][0].as_py() == "slow"  # >500 KB forces slow
