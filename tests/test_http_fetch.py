"""fetch_mode="http" — the real-network fetch path (reference:
crawler/crawler_twotier.go:52-80 colly collector, downloader.go:184-222
http.Get).

The sandbox has no external network, so the gate runs the REAL client
stack (urllib over an actual TCP socket) against a loopback HTTP server
that serves the synthetic corpus — Ray worker actors connect to
127.0.0.1 and the full crawl must replay the pinned oracle byte-for-byte,
exactly like the broadcast/join/scan modes do."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.config import CrawlConfig
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.corpus import (
    load_corpus_dict,
    write_corpus,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.oracle import crawl_sim
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines.crawl import (
    run_crawl,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.urlnorm import (
    fetch_key,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.stages.fetch import (
    default_http_client,
)

from test_crawl_e2e import _seeds, assert_matches_oracle


class _CorpusHandler(BaseHTTPRequestHandler):
    """Serves corpus pages keyed on the X-Graft-Url header (the loopback
    client sends the ORIGINAL corpus url there — synthetic hosts don't
    resolve in DNS). Plain-path requests echo a fixed body so the default
    (non-rewriting) client can be exercised directly against 127.0.0.1."""

    corpus: dict = {}
    plain_body = b"<html><body>plain " * 200  # > tiny caps, for truncation

    def do_GET(self):  # noqa: N802 (http.server API)
        url = self.headers.get("X-Graft-Url")
        if url is None:
            if self.path.startswith("/missing"):
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            if self.path.startswith("/cd-attach"):
                # header names the file (reference branch utils.go:35-44)
                self.send_header(
                    "Content-Disposition",
                    'attachment; filename="Quarterly: Report.pdf"')
            elif self.path.startswith("/cd-inline"):
                # NON-attachment disposition: reference falls through to
                # the URL path
                self.send_header(
                    "Content-Disposition", 'inline; filename="nope.pdf"')
            self.end_headers()
            self.wfile.write(self.plain_body)
            return
        # HTTP semantics: fragments never reach a server and hosts are
        # case-insensitive — fetch_key is the engine's documented stand-in
        # for exactly this server-side behavior (functions/urlnorm.py:92)
        body = self.corpus.get(fetch_key(url))
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # keep pytest output clean
        pass


def loopback_client_factory(port: int):
    """A pluggable cfg.http_client_factory that keeps the REAL urllib
    request path but routes every fetch to the loopback corpus server via
    the X-Graft-Url header (module-level so cloudpickle ships it to the
    fetch actors cleanly)."""

    def factory(cfg):
        import urllib.error
        import urllib.request

        def fetch(url):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/fetch",
                headers={"X-Graft-Url": url,
                         "User-Agent": cfg.http_user_agent},
            )
            try:
                with urllib.request.urlopen(
                        req, timeout=cfg.http_timeout_s) as r:
                    return (r.status or 200), r.read(cfg.max_body_bytes)
            except urllib.error.HTTPError as e:
                return e.code, None
            except Exception:
                return 0, None

        return fetch

    return factory


@pytest.fixture(scope="module")
def http_corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus") / "httptiny")
    corpus_dir = write_corpus(d, n_pages=60, n_hosts=3, seed=7,
                              include_huge=False)
    _CorpusHandler.corpus = {
        fetch_key(u): (h if isinstance(h, bytes) else h.encode())
        for u, h in load_corpus_dict(corpus_dir).items()
    }
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CorpusHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield corpus_dir, srv.server_address[1]
    srv.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_http_crawl_matches_oracle(http_corpus):
    """Full crawl over live HTTP (loopback) replays the pinned oracle:
    same seen set, ordering trace, extracted text, and download log —
    including 404 pages and the 4-attempt retry lane for missing docs."""
    corpus_dir, port = http_corpus
    cfg = CrawlConfig(fetch_mode="http",
                      http_client_factory=loopback_client_factory(port))
    o = crawl_sim.crawl(load_corpus_dict(corpus_dir), _seeds(corpus_dir),
                        CrawlConfig())
    e = run_crawl(corpus_dir, cfg)
    assert_matches_oracle(e, o)
    statuses = set(e.fetch_log["status"].to_pylist())
    assert 200 in statuses and 404 in statuses


def test_default_http_client_real_socket(http_corpus):
    """The DEFAULT client (no factory injection) speaks real HTTP:
    status mapping, 404 -> no body, and colly-style truncation at
    max_body_bytes (crawler_twotier.go:57 limited reader)."""
    _, port = http_corpus
    cfg = CrawlConfig(max_body_bytes=100)
    fetch = default_http_client(cfg)
    st, body, hdrs = fetch(f"http://127.0.0.1:{port}/page")
    assert st == 200
    assert body == _CorpusHandler.plain_body[:100]  # truncated at the cap
    assert hdrs == {}  # no Content-Disposition served on this route
    st, body, hdrs = fetch(f"http://127.0.0.1:{port}/missing")
    assert st == 404 and body is None and hdrs is None
    st, body, hdrs = fetch("http://127.0.0.1:1/unreachable")  # refused conn
    assert st == 0 and body is None and hdrs is None


def test_content_disposition_names_http_downloads(http_corpus):
    """utils.go:35-44: an ``attachment; filename=`` response header wins
    over the URL path (quotes trimmed, result sanitized); any other
    disposition shape falls through to the URL filename. Exercised over a
    REAL socket through the http-mode download lane."""
    import pyarrow as pa

    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines.crawl import (
        DownloadHttp,
    )

    _, port = http_corpus
    dl = DownloadHttp(CrawlConfig())
    base = f"http://127.0.0.1:{port}"
    batch = pa.table(
        {
            "url": pa.array([f"{base}/cd-attach/from_url.bin",
                             f"{base}/cd-inline/from_url.pdf",
                             f"{base}/plain/from_url.pdf"]),
            "depth": pa.array([0, 0, 0], pa.int32()),
            "attempt": pa.array([0, 0, 0], pa.int32()),
        }
    )
    out = dl(batch)
    assert out["ok"].to_pylist() == [True, True, True]
    # ':' sanitized to '_' exactly like utils.SanitizeFilename
    assert out["filename"].to_pylist() == [
        "Quarterly_ Report.pdf", "from_url.pdf", "from_url.pdf"]


def test_extract_filename_header_branch_semantics():
    """Pure-function parity with utils.ExtractFilename's header branch:
    prefix-exact, quote-trimmed, empty header filename falls through."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.oracle.reference import (
        extract_filename,
    )

    u = "http://h.test/docs/paper.pdf"
    assert extract_filename(
        u, content_disposition='attachment; filename="r:1.pdf"') == "r_1.pdf"
    assert extract_filename(
        u, content_disposition="attachment; filename=bare.pdf") == "bare.pdf"
    # empty filename after the quote trim -> URL path fallback
    assert extract_filename(
        u, content_disposition='attachment; filename=""') == "paper.pdf"
    # non-attachment disposition shapes are ignored by the reference
    assert extract_filename(
        u, content_disposition='inline; filename="x.pdf"') == "paper.pdf"
    assert extract_filename(u, content_disposition=None) == "paper.pdf"


def test_fetch_result_normalizes_arity_and_header_case():
    """fetch_result is the single normalization choke point for pluggable
    clients: legacy 2-tuples gain a None headers slot, and header keys are
    lowercased — a user factory returning ``dict(r.headers)`` with
    canonical casing must still hit DownloadHttp's lowercase
    'content-disposition' lookup."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.stages.fetch import (
        fetch_result,
    )

    assert fetch_result((404, None)) == (404, None, None)
    assert fetch_result((200, b"x", None)) == (200, b"x", None)
    st, body, h = fetch_result(
        (200, b"x", {"Content-Disposition": 'attachment; filename="a.pdf"'}))
    assert (st, body) == (200, b"x")
    assert h == {"content-disposition": 'attachment; filename="a.pdf"'}
