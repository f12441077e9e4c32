"""Route + extract stage: the tier-2 tokenizer as one map_batches kernel.

The reference's OnResponse handler routes each page fast/slow and runs the
matching tokenizer (reference crawler/crawler_twotier.go:113-160,
tokenizer/coordinator.go:42-99). Here that becomes ONE vectorized-routing +
per-row-extraction kernel over zero-copy Arrow batches: routing decisions
are computed for the whole batch with numpy/pandas (functions/router.py),
then each row runs the fast regex scanner or the slow DOM walk. Routing the
whole batch first (instead of splitting into two datasets) avoids a
materializing split — per SURVEY.md §2.2 M11.

Usage::

    ds.map_batches(RouteAndExtract(cfg), batch_format="pyarrow",
                   batch_size=cfg.extract_batch_size)

``RouteAndExtract`` is a callable class so it can run as an actor pool
(``concurrency=N``) with per-actor setup done once, and pickles its config
(not per-batch state) to workers.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import CrawlConfig
from ..functions import textspec
from ..functions.fastpath import extract_links_fast
from ..functions.router import route_batch
from ..functions.slowpath import analyze_slow

DOC_STRUCT = pa.struct(
    [("url", pa.string()), ("extension", pa.string()),
     ("title", pa.string()), ("context", pa.string())]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("path", pa.string()),
        ("links", pa.list_(pa.string())),
        ("link_count", pa.int32()),
        ("title", pa.string()),
        ("description", pa.string()),
        ("has_nav", pa.bool_()),
        ("link_density", pa.float64()),
        ("documents", pa.list_(DOC_STRUCT)),
        ("doc_count", pa.int32()),
        ("text", pa.string()),
        # quarantine flag (S7): DOM build failed, page yielded an empty
        # slow-path result (reference logs such URLs to panic_urls.txt,
        # crawler/crawler.go:136-142)
        ("parse_error", pa.bool_()),
    ]
)


class RouteAndExtract:
    """Tier-2 tokenizer kernel. Extra input columns (depth, epoch, priority)
    are passed through unchanged after the extraction columns.

    User-extension surface (SURVEY.md §2.9): the router and both extractor
    kernels are pluggable callables — swap in a custom policy/extractor
    without touching the stage plumbing.

    - router_fn(urls: pd.Series, sizes) -> array of "fast"/"slow"
    - fast_fn(body: bytes, url: str) -> list[str]
    - slow_fn(body: bytes, url: str, doc_exts) -> SlowExtraction-like
    """

    def __init__(self, cfg: CrawlConfig | None = None,
                 url_col: str = "url", html_col: str = "html",
                 router_fn=None, fast_fn=None, slow_fn=None):
        self.cfg = cfg or CrawlConfig()
        self.url_col = url_col
        self.html_col = html_col
        self.router_fn = router_fn or route_batch
        self.fast_fn = fast_fn or extract_links_fast
        self.slow_fn = slow_fn or analyze_slow

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        urls = batch[self.url_col].to_pylist()
        bodies = batch[self.html_col].to_pylist()
        cap = cfg.max_body_bytes
        bodies = [b[:cap] if b is not None and len(b) > cap else (b or b"")
                  for b in bodies]

        import pandas as pd
        paths = self.router_fn(
            pd.Series(urls, dtype="object"),
            [len(b) for b in bodies],
            cfg.fast_path_size_limit,
            cfg.slow_path_size_limit,
        )

        n = len(urls)
        out_links: list[list[str]] = [None] * n  # type: ignore
        out_title: list[str | None] = [None] * n
        out_desc: list[str | None] = [None] * n
        out_nav: list[bool | None] = [None] * n
        out_ld: list[float | None] = [None] * n
        out_docs: list[list[dict]] = [[] for _ in range(n)]
        out_text: list[str] = [""] * n
        out_perr: list[bool] = [False] * n

        for i in range(n):
            if paths[i] == "fast":
                links = self.fast_fn(bodies[i], urls[i])
                out_links[i] = links
                out_text[i] = textspec.serialize_fast(links)
            else:
                res = self.slow_fn(bodies[i], urls[i], cfg.doc_extensions)
                out_perr[i] = bool(getattr(res, "parse_error", False))
                out_links[i] = res.links
                out_title[i] = res.title
                out_desc[i] = res.description
                out_nav[i] = res.has_nav
                out_ld[i] = res.link_density
                out_docs[i] = [
                    {"url": d[0], "extension": d[1], "title": d[2], "context": d[3]}
                    for d in res.documents
                ]
                out_text[i] = textspec.serialize_slow(
                    res.links, res.title, res.description, res.has_nav,
                    res.link_density, res.documents,
                )

        cols = {
            "url": pa.array(urls, pa.string()),
            "path": pa.array(paths.tolist(), pa.string()),
            "links": pa.array(out_links, pa.list_(pa.string())),
            "link_count": pa.array([len(x) for x in out_links], pa.int32()),
            "title": pa.array(out_title, pa.string()),
            "description": pa.array(out_desc, pa.string()),
            "has_nav": pa.array(out_nav, pa.bool_()),
            "link_density": pa.array(out_ld, pa.float64()),
            "documents": pa.array(out_docs, pa.list_(DOC_STRUCT)),
            "doc_count": pa.array([len(x) for x in out_docs], pa.int32()),
            "text": pa.array(out_text, pa.string()),
            "parse_error": pa.array(out_perr, pa.bool_()),
        }
        # pass through any extra input columns (depth, priority, epoch, ...)
        for name in batch.column_names:
            if name not in (self.url_col, self.html_col) and name not in cols:
                cols[name] = batch[name]
        return pa.table(cols)
