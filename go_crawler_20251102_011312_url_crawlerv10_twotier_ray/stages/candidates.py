"""Candidate-link and document explosion stages.

``processDiscoveredURL`` in the reference (crawler/crawler_twotier.go:186-203)
validates each discovered URL, normalizes it, depth-gates it and marks it
seen. Here the per-page link lists from the extract stage are exploded into
candidate rows inside ``map_batches`` — with a *within-batch partial dedup*
(keep the min ``(depth, url)`` per ``url_norm``) so the epoch-wide
``groupby(url_norm)`` dedup that follows shuffles far fewer rows (partial
combine before the wide op, per the aggregation-at-scale pattern).

Document candidates (slow-path detections, crawler_twotier.go:146-159) are
exploded with their parent's deterministic sort key so the cross-epoch
download dedup (downloader.go:280-293) can replicate the oracle's
first-in-schedule-order acceptance without a global rank column.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import CrawlConfig
from ..functions.urlnorm import host_of, normalize_url

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_norm", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
    ]
)

DOC_CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("p_priority", pa.int32()),
        ("p_host", pa.string()),
        ("p_norm", pa.string()),
        ("p_url", pa.string()),
    ]
)


# per-worker-process normalization memo: hub/nav links repeat massively
# across pages (a 400-fanout hub is discovered by every page on its host),
# so one urlsplit per DISTINCT link replaces one per occurrence
_NORM_CACHE: dict[str, str | None] = {}


def _norm_cached(link: str) -> str | None:
    cache = _NORM_CACHE
    if len(cache) > 2_000_000:
        cache.clear()
    try:
        return cache[link]
    except KeyError:
        n = normalize_url(link)
        cache[link] = n
        return n


class CandidateLinks:
    """extracted batch -> candidate rows (url, url_norm, host, depth)."""

    def __init__(self, cfg: CrawlConfig, robots_disallow: dict[str, list[str]] | None = None):
        self.cfg = cfg
        self.robots = robots_disallow or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        max_depth = self.cfg.max_depth
        best: dict[str, tuple[int, str]] = {}
        depths = batch["depth"].to_pylist()
        links_col = batch["links"].to_pylist()
        for depth, links in zip(depths, links_col):
            if links is None or depth is None or depth >= max_depth:
                continue
            child = depth + 1
            for link in links:
                norm = _norm_cached(link)
                if norm is None:
                    continue
                cur = best.get(norm)
                if cur is None or (child, link) < cur:
                    best[norm] = (child, link)

        if self.robots:
            from ..functions.urlnorm import split_url

            def allowed(u: str) -> bool:
                h = host_of(u)
                rules = self.robots.get(h or "", ())
                if not rules:
                    return True
                sp = split_url(u)
                path = sp.path if sp else ""
                return not any(path.startswith(p) for p in rules)

            best = {k: v for k, v in best.items() if allowed(v[1])}

        norms = sorted(best)
        return pa.table(
            {
                "url": pa.array([best[n][1] for n in norms], pa.string()),
                "url_norm": pa.array(norms, pa.string()),
                "host": pa.array([host_of(best[n][1]) or "" for n in norms], pa.string()),
                "depth": pa.array([best[n][0] for n in norms], pa.int32()),
            }
        )


def explode_documents(batch: pa.Table) -> pa.Table:
    """extracted batch -> document-candidate rows with parent sort keys,
    partially deduplicated WITHIN the batch: hot documents are linked from
    many pages (every slow page links a PDF), so keeping only the best
    candidate per doc URL — min((-p_priority, p_host, p_norm, p_url)),
    exactly the comparator the driver's global dedup applies — shrinks the
    collected doc set by orders of magnitude without changing the winner."""
    best: dict[str, tuple] = {}
    docs_col = batch["documents"].to_pylist()
    depths = batch["depth"].to_pylist()
    prios = batch["priority"].to_pylist()
    hosts = batch["host"].to_pylist()
    norms = batch["url_norm"].to_pylist()
    purls = batch["url"].to_pylist()
    for i in range(batch.num_rows):
        docs = docs_col[i]
        if not docs:
            continue
        key = (-(prios[i] or 0), hosts[i], norms[i], purls[i])
        for doc in docs:
            u = doc["url"]
            cur = best.get(u)
            if cur is None or key < cur[0]:
                best[u] = (key, depths[i])
    urls = sorted(best)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([best[u][1] for u in urls], pa.int32()),
            "p_priority": pa.array([-best[u][0][0] for u in urls], pa.int32()),
            "p_host": pa.array([best[u][0][1] for u in urls], pa.string()),
            "p_norm": pa.array([best[u][0][2] for u in urls], pa.string()),
            "p_url": pa.array([best[u][0][3] for u in urls], pa.string()),
        }
    )
