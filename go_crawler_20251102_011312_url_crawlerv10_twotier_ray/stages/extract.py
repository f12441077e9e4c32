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
    ]
)


class RouteAndExtract:
    """Tier-2 tokenizer kernel. Extra input columns (depth, epoch, priority)
    are passed through unchanged after the extraction columns."""

    def __init__(self, cfg: CrawlConfig | None = None,
                 url_col: str = "url", html_col: str = "html"):
        self.cfg = cfg or CrawlConfig()
        self.url_col = url_col
        self.html_col = html_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        urls = batch[self.url_col].to_pylist()
        bodies = batch[self.html_col].to_pylist()
        cap = cfg.max_body_bytes
        bodies = [b[:cap] if b is not None and len(b) > cap else (b or b"")
                  for b in bodies]

        import pandas as pd
        paths = route_batch(
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

        for i in range(n):
            if paths[i] == "fast":
                links = extract_links_fast(bodies[i], urls[i])
                out_links[i] = links
                out_text[i] = textspec.serialize_fast(links)
            else:
                res = analyze_slow(bodies[i], urls[i], cfg.doc_extensions)
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
        }
        # pass through any extra input columns (depth, priority, epoch, ...)
        for name in batch.column_names:
            if name not in (self.url_col, self.html_col) and name not in cols:
                cols[name] = batch[name]
        return pa.table(cols)
