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
                norm = normalize_url(link)
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
    """extracted batch -> document-candidate rows with parent sort keys."""
    urls, depths, prios, hosts, norms, purls = [], [], [], [], [], []
    docs_col = batch["documents"].to_pylist()
    for i in range(batch.num_rows):
        docs = docs_col[i]
        if not docs:
            continue
        d = batch["depth"][i].as_py()
        p = batch["priority"][i].as_py()
        h = batch["host"][i].as_py()
        nm = batch["url_norm"][i].as_py()
        pu = batch["url"][i].as_py()
        for doc in docs:
            urls.append(doc["url"])
            depths.append(d)
            prios.append(p)
            hosts.append(h)
            norms.append(nm)
            purls.append(pu)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "p_priority": pa.array(prios, pa.int32()),
            "p_host": pa.array(hosts, pa.string()),
            "p_norm": pa.array(norms, pa.string()),
            "p_url": pa.array(purls, pa.string()),
        }
    )
