"""Deterministic synthetic web-graph corpus generator.

Produces the primary input table per BASELINE.json ``input_hint`` —
``pages(url, warc_ts, html, text, lang)`` — plus ``seeds(url)`` and
``politeness(host, max_fetches_per_epoch, robots_disallow)``, all pure
functions of ``(seed, n_pages, n_hosts)`` (no wall clock, no network).

Coverage requirements (FIXTURES.md §1):
- Zipf-skewed host sizes (hot-host skew),
- link-graph reaching depth > 13 (depth-gate, reference config/config.go:7),
- duplicate links differing only in case/query/fragment (dedup-key
  asymmetry, utils/utils.go:14-18 vs crawler_twotier.go:200),
- dangling links (404 path), self/cycle links,
- body-size and URL-pattern variety driving every router branch
  (tokenizer/coordinator.go:42-99),
- every §2.7 scanner quirk (href= in comments/scripts, trailing href within
  the last 6 bytes, unquoted hrefs with tab, ``../`` links, protocol- and
  root-relative links, bare ``#``/``javascript:``/``mailto:``,
  long-context parents, ``.pdf`` / ``.pdf?x=1`` document links, one >5 MB
  body for the read-cap).

The ``text`` column is minted with the pinned oracle
(oracle/reference.extract_page) on the ≤5 MB-truncated body — the engine's
extracted text must match it byte-for-byte.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .config import CrawlConfig
from .oracle.reference import extract_page

_EPOCH_US = 1735689600_000000  # 2025-01-01T00:00:00Z in microseconds

# URL path patterns cycle through every router branch
# (f = fast nav-pattern, s = slow doc-pattern, q = query ⇒ slow,
#  sh = shallow ⇒ fast when mid-size, dp = deep plain ⇒ default slow when mid-size)
_PATTERNS = [
    ("/p{i}", "sh"),
    ("/sitemap/p{i}", "f"),
    ("/archive/2024/p{i}", "f"),
    ("/category/c{i}/p{i}", "f"),
    ("/tag/t{i}", "f"),
    ("/index/p{i}", "f"),
    ("/list/p{i}", "f"),
    ("/document/d{i}", "s"),
    ("/paper/p{i}", "s"),
    ("/publication/pub{i}", "s"),
    ("/research/r{i}", "s"),
    ("/library/lib{i}", "s"),
    ("/Docs/Mixed{i}/Page", "dp"),
    ("/a/b/c/d/p{i}", "dp"),
    ("/q/p{i}?page=2", "q"),
]


def _host(h: int) -> str:
    return f"host{h:02d}.test"


def _zipf_host(rng: random.Random, n_hosts: int) -> int:
    # weight 1/(k+1): host00 is the hot host
    r = rng.random() * sum(1.0 / (k + 1) for k in range(n_hosts))
    acc = 0.0
    for k in range(n_hosts):
        acc += 1.0 / (k + 1)
        if r <= acc:
            return k
    return n_hosts - 1


def build_corpus(
    n_pages: int = 200,
    n_hosts: int = 8,
    seed: int = 42,
    mint_text: bool = True,
    include_huge: bool = True,
    chain_len: int = 17,
    hub_fanout: int = 40,
    cfg: CrawlConfig = CrawlConfig(),
):
    """Build the corpus in memory.

    Returns (pages_rows, seeds, politeness_rows, page_stats) where
    pages_rows is a list of dicts (url, warc_ts, html, text, lang) and
    page_stats (None unless mint_text) is one (path, link_count, doc_count)
    dict per page from the same pinned-oracle extraction that minted text —
    the ground truth for the link-stats driver oracle.
    """
    rng = random.Random(seed)
    langs = ["en", "en", "en", "de", "fr"]

    root_url = f"http://{_host(0)}/"
    # default chain_len=17 > MaxDepth=13 exercises the depth gate; bench
    # corpora use a short chain so epochs stay extraction-dominated
    urls: list[str] = [root_url]
    kinds: dict[str, str] = {root_url: "root"}

    hub_urls = []
    for h in range(n_hosts):
        u = f"http://{_host(h)}/sitemap/hub"
        hub_urls.append(u)
        urls.append(u)
        kinds[u] = "hub"

    chain_urls = [f"http://{_host(0)}/chain/d{k}" for k in range(chain_len)]
    for u in chain_urls:
        urls.append(u)
        kinds[u] = "chain"

    n_pdf = max(3, n_pages // 40)
    pdf_urls = [f"http://{_host(h % n_hosts)}/files/doc{h}.pdf" for h in range(n_pdf)]
    for u in pdf_urls:
        urls.append(u)
        kinds[u] = "pdf"

    huge_url = f"http://{_host(1)}/archive/huge"
    if include_huge:
        urls.append(huge_url)
        kinds[huge_url] = "huge"

    # content pages fill the remainder
    content_urls: list[str] = []
    i = 0
    while len(urls) + len(content_urls) < n_pages:
        pat, cls = _PATTERNS[i % len(_PATTERNS)]
        h = _zipf_host(rng, n_hosts)
        u = f"http://{_host(h)}{pat.format(i=i)}"
        if u not in kinds:
            content_urls.append(u)
            kinds[u] = cls
        i += 1
    urls.extend(content_urls)

    by_host: dict[str, list[str]] = {}
    for u in content_urls:
        by_host.setdefault(u.split("/")[2], []).append(u)

    pages_rows = []
    page_stats = [] if mint_text else None
    for idx, u in enumerate(urls):
        kind = kinds[u]
        html = _render(u, kind, idx, rng, urls, hub_urls, chain_urls,
                       pdf_urls, content_urls, by_host, hub_fanout)
        body = html[: cfg.max_body_bytes]
        if mint_text:
            ext = extract_page(u, body, cfg.doc_extensions)
            text = ext.text
            page_stats.append(
                {"path": ext.path, "link_count": len(ext.links),
                 "doc_count": len(ext.documents)}
            )
        else:
            text = ""
        pages_rows.append(
            {"url": u, "warc_ts": _EPOCH_US + idx * 1_000_000, "html": html,
             "text": text, "lang": rng.choice(langs)}
        )

    seeds = [root_url]
    politeness_rows = [
        {"host": _host(h),
         "max_fetches_per_epoch": 3 if h == 0 else 0,
         "robots_disallow": ["/q/"] if h == 1 else []}
        for h in range(n_hosts)
    ]
    return pages_rows, seeds, politeness_rows, page_stats


def _anchor(rng: random.Random, target: str, i: int) -> str:
    """Render a link to ``target`` in a rng-chosen href form (dedup-variant
    and absolutization coverage)."""
    form = rng.randrange(8)
    if form == 0:
        return f'<a href="{target}">link {i}</a>'
    if form == 1:  # root-relative
        path = "/" + target.split("/", 3)[3] if target.count("/") >= 3 else "/"
        return f'<a href="{path}">rel {i}</a>'
    if form == 2:  # protocol-relative
        return f'<a href="{target.split(":", 1)[1]}">pr {i}</a>'
    if form == 3:  # fragment variant (same url_norm)
        return f'<a href="{target}#sec{i}">frag {i}</a>'
    if form == 4:  # query variant (same url_norm, different fetch)
        return f'<a href="{target}?ref=nav">qv {i}</a>'
    if form == 5:  # host-case variant (same fetch_key)
        scheme, rest = target.split("://", 1)
        host, _, path = rest.partition("/")
        return f'<a href="{scheme}://{host.upper()}/{path}">cv {i}</a>'
    if form == 6:  # unquoted
        return f"<a href={target}>uq {i}</a>"
    return f"<a href='{target}'>sq {i}</a>"


def _quirks(rng: random.Random, i: int, host: str) -> str:
    """§2.7 scanner-quirk snippets; each appears on a rng subset of pages."""
    out = []
    if rng.random() < 0.4:
        out.append(f"<!-- href=/q/comment{i}.html -->")
    if rng.random() < 0.4:
        out.append(f"<script>var a; href='/q/script{i}.html' ;</script>")
    if rng.random() < 0.3:
        out.append(f"<a href=/q/tab{i}.html\tx>tab</a>")
    if rng.random() < 0.3:
        out.append(f'<a href="../up{i}.html">up</a>')
    if rng.random() < 0.2:
        out.append('<a href="https:/oddity">odd</a>')
    if rng.random() < 0.2:
        out.append('<a href="http://">bare</a>')
    if rng.random() < 0.5:
        out.append('<a href="#">top</a> <a href="#frag">f</a> '
                   '<a href="javascript:void(0)">js</a> '
                   '<a href="mailto:a@b.test">m</a>')
    return "\n".join(out)


def _render(url, kind, idx, rng, urls, hub_urls, chain_urls, pdf_urls,
            content_urls, by_host, hub_fanout) -> bytes:
    host = url.split("/")[2]
    parts = []
    has_title = rng.random() < 0.8
    has_meta = rng.random() < 0.5
    has_nav = rng.random() < 0.4
    parts.append("<html><head>")
    if has_title:
        parts.append(f"<title>Page {idx} on {host}</title>")
    if has_meta:
        parts.append(f'<meta name="description" content="Synthetic page {idx}">')
    parts.append("</head><body>")
    if has_nav:
        parts.append('<nav><a href="/">home</a></nav>')

    links = []
    if kind == "root":
        links = hub_urls + [chain_urls[0]]
    elif kind == "hub":
        mine = by_host.get(host, [])
        links = mine[:hub_fanout]
        # cross-host spokes keep the graph connected
        links += [hub_urls[(idx + 1) % len(hub_urls)]]
    elif kind == "chain":
        k = chain_urls.index(url)
        if k + 1 < len(chain_urls):
            links = [chain_urls[k + 1]]
        links.append(url)  # self-link (cycle)
    elif kind == "pdf":
        return f"%PDF-1.4 synthetic document {idx}\n".encode() * 20
    elif kind == "huge":
        pre = f'<html><body><a href="{hub_urls[0]}">before-cap</a>'
        pad = "<!-- " + "h" * (5 * 1024 * 1024) + " -->"
        post = f'<a href="{hub_urls[1]}">after-cap</a></body></html>'
        return (pre + pad + post).encode()
    else:
        n_out = rng.randrange(2, 9)
        pool = content_urls if content_urls else urls
        links = [pool[rng.randrange(len(pool))] for _ in range(n_out)]
        if rng.random() < 0.3:
            links.append(url)  # self
        if rng.random() < 0.25:
            links.append(f"http://ghost{rng.randrange(99)}.test/missing{idx}")

    for j, target in enumerate(links):
        parts.append(f"<p>{_anchor(rng, target, idx * 100 + j)}</p>")

    # document links on slow-routed pages (and occasionally elsewhere)
    if kind in ("s", "q", "dp") or rng.random() < 0.15:
        doc = pdf_urls[idx % len(pdf_urls)]
        long_ctx = ("This is a long surrounding paragraph about the document. "
                    * 6)
        parts.append(f'<p>{long_ctx}<a href="{doc}">Download doc {idx}</a></p>')
        if rng.random() < 0.5:
            parts.append(f'<p><a href="{doc}?x=1">doc qv</a> '
                         f'<a href="{doc.replace(".pdf", ".PDF")}">DOC</a></p>')
        if rng.random() < 0.3:
            parts.append(f'<p><a href="http://{host}/files/missing{idx}.pdf">'
                         "gone</a></p>")

    parts.append(_quirks(rng, idx, host))

    # size classes drive the router branches
    if kind in ("sh", "f", "q", "root", "hub", "chain"):
        target_size = rng.randrange(2_000, 30_000)  # < 100 KB ⇒ size rules
    elif kind == "s":
        target_size = rng.randrange(2_000, 30_000)
    elif kind == "dp":
        target_size = rng.randrange(120_000, 300_000)  # mid ⇒ pattern/path rules
    else:
        target_size = 4_000
    if rng.random() < 0.02:
        target_size = 520_000 + rng.randrange(50_000)  # > 500 KB ⇒ forced slow

    parts.append("</body></html>")
    # trailing-bytes quirk: an href= that starts within the final 6 bytes
    parts.append("href=")
    html = "\n".join(parts)
    deficit = target_size - len(html)
    if deficit > 0:
        html = html.replace(
            "</body></html>", "<!-- " + "x" * deficit + " --></body></html>"
        )
    return html.encode()


# ---------------------------------------------------------------------------
# Parquet I/O with caching
# ---------------------------------------------------------------------------

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _mint_oracle_tables(out_dir: str, pages: list[dict], seeds: list[str],
                        page_stats: list[dict], cfg: CrawlConfig) -> None:
    """Run the pinned sequential simulator (oracle/crawl_sim.py) over the
    just-built corpus and persist its outputs as parquet next to ``pages/``
    — exactly the trick that made crawl_extract_text a hash-checked driver
    gate (the minted ``text`` column). These give the crawl loop's stateful
    outputs (T1 seen set / fetch log / T3+T8 downloads — the reference's
    crawler_twotier.go:223-245 and downloader.go:280-329 semantics)
    independent driver oracles via plain ``read_parquet`` SQL.

    Matches ``run_crawl(corpus_dir, CrawlConfig())`` as the crawl queries
    invoke it: default config, seeds.parquet seeds, NO politeness table."""
    from .oracle.crawl_sim import crawl as sim_crawl
    from .pipelines.multimodal import fake_decode

    corpus = {r["url"]: r["html"] for r in pages}
    res = sim_crawl(corpus, seeds, cfg)

    seen_rows = sorted(res.seen.items())  # url_norm-sorted
    pq.write_table(
        pa.table(
            {
                "url_norm": pa.array([n for n, _ in seen_rows], pa.string()),
                "first_depth": pa.array(
                    [d for _, (d, _) in seen_rows], pa.int32()
                ),
                "url": pa.array([u for _, (_, u) in seen_rows], pa.string()),
            }
        ),
        os.path.join(out_dir, "oracle_seen.parquet"),
    )
    fl = sorted(res.fetch_log, key=lambda r: (r["epoch"], r["url"], r["status"]))
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r["url"] for r in fl], pa.string()),
                "epoch": pa.array([r["epoch"] for r in fl], pa.int32()),
                "depth": pa.array([r["depth"] for r in fl], pa.int32()),
                "status": pa.array([r["status"] for r in fl], pa.int32()),
                "bytes": pa.array([r["bytes"] for r in fl], pa.int64()),
                "ok": pa.array([r["ok"] for r in fl], pa.bool_()),
            }
        ),
        os.path.join(out_dir, "oracle_fetch_log.parquet"),
    )
    dl = sorted(res.downloads, key=lambda r: (r["url"], r["attempt"]))
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r["url"] for r in dl], pa.string()),
                "depth": pa.array([r["depth"] for r in dl], pa.int32()),
                "attempt": pa.array([r["attempt"] for r in dl], pa.int32()),
                "ok": pa.array([r["ok"] for r in dl], pa.bool_()),
                "bytes": pa.array([r["bytes"] for r in dl], pa.int64()),
                "filename": pa.array([r["filename"] for r in dl], pa.string()),
                "epoch": pa.array([r["epoch"] for r in dl], pa.int32()),
            }
        ),
        os.path.join(out_dir, "oracle_downloads.parquet"),
    )

    # whole-corpus per-path link/doc aggregate (crawl_link_stats oracle),
    # from the same extraction pass that minted text
    agg: dict[str, list[int]] = {}
    for st in page_stats:
        a = agg.setdefault(st["path"], [0, 0, 0])
        a[0] += 1
        a[1] += st["link_count"]
        a[2] += st["doc_count"]
    paths = sorted(agg)
    pq.write_table(
        pa.table(
            {
                "path": pa.array(paths, pa.string()),
                "pages": pa.array([agg[p][0] for p in paths], pa.int64()),
                "links": pa.array([agg[p][1] for p in paths], pa.int64()),
                "docs": pa.array([agg[p][2] for p in paths], pa.int64()),
            }
        ),
        os.path.join(out_dir, "oracle_link_stats.parquet"),
    )

    # deterministic media features (multimodal stub decode) per page
    rows = sorted(pages, key=lambda r: r["url"])
    fmts, ws, hs, crcs = [], [], [], []
    for r in rows:
        f, w, h, c, _ = fake_decode(r["html"])
        fmts.append(f)
        ws.append(w)
        hs.append(h)
        crcs.append(c)
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "n_bytes": pa.array(
                    [len(r["html"]) for r in rows], pa.int64()
                ),
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "feat_crc": pa.array(crcs, pa.int64()),
            }
        ),
        os.path.join(out_dir, "oracle_media.parquet"),
    )


def write_corpus(
    out_dir: str,
    n_pages: int = 200,
    n_hosts: int = 8,
    seed: int = 42,
    mint_text: bool = True,
    include_huge: bool = True,
    chain_len: int = 17,
    hub_fanout: int = 40,
) -> str:
    """Generate and write pages/seeds/politeness parquet under ``out_dir``
    (plus the crawl-loop oracle tables when ``mint_text`` is on — test/query
    corpora carry their own ground truth; bench corpora skip both).

    Idempotent: if ``out_dir/_SUCCESS`` exists the cached corpus is reused
    (corpora are pure functions of the parameters, which are recorded in the
    marker)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    stamp = (f"v3:{n_pages}:{n_hosts}:{seed}:{mint_text}:{include_huge}"
             f":{chain_len}:{hub_fanout}")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == stamp:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # regenerating IN PLACE: derived layouts minted from the previous
    # corpus contents (hash-bucket pages, persisted link graph) would
    # silently serve stale page bodies — remove them (belt: they also
    # record the corpus stamp in their meta and self-invalidate)
    import glob as _glob
    import shutil as _shutil

    for d in _glob.glob(os.path.join(out_dir, "pages_by_key-*")) + \
            _glob.glob(os.path.join(out_dir, "derived_graph-*")):
        _shutil.rmtree(d, ignore_errors=True)
    pages, seeds, politeness, page_stats = build_corpus(
        n_pages, n_hosts, seed, mint_text, include_huge, chain_len, hub_fanout
    )
    # pages is a DIRECTORY of part files: ray.data.read_parquet issues one
    # read task per file, so a single-file corpus would serialize the read
    # (and fuse serially with downstream map_batches); part files are also
    # the resumable per-shard layout the 100 TB path assumes
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    for f in os.listdir(pages_dir):
        os.remove(os.path.join(pages_dir, f))
    tbl = pa.Table.from_pylist(pages, schema=PAGES_SCHEMA)
    rows_per_part = 1024
    n_parts = max(1, (tbl.num_rows + rows_per_part - 1) // rows_per_part)
    for p in range(n_parts):
        pq.write_table(
            tbl.slice(p * rows_per_part, rows_per_part),
            os.path.join(pages_dir, f"part-{p:05d}.parquet"),
            row_group_size=512,
            compression="none",  # synthetic html: trade disk for read speed
        )
    pq.write_table(
        pa.Table.from_pylist([{"url": s} for s in seeds],
                             schema=pa.schema([("url", pa.string())])),
        os.path.join(out_dir, "seeds.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            politeness,
            schema=pa.schema(
                [("host", pa.string()), ("max_fetches_per_epoch", pa.int32()),
                 ("robots_disallow", pa.list_(pa.string()))]
            ),
        ),
        os.path.join(out_dir, "politeness.parquet"),
    )
    if mint_text:
        _mint_oracle_tables(out_dir, pages, seeds, page_stats, CrawlConfig())
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir


def pages_path(corpus_dir: str) -> str:
    return os.path.join(corpus_dir, "pages")


def read_pages_table(corpus_dir: str, columns=None) -> pa.Table:
    return pq.read_table(pages_path(corpus_dir), columns=columns)


def load_corpus_dict(corpus_dir: str) -> dict[str, bytes]:
    """fetch_key → html mapping for the oracle simulator."""
    t = read_pages_table(corpus_dir, columns=["url", "html"])
    return dict(zip(t["url"].to_pylist(), t["html"].to_pylist()))
