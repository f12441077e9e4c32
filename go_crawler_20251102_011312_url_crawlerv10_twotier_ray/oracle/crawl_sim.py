"""Oracle crawl loop: sequential, deterministic reference simulation.

Defines THE deterministic scheduling spec ("epoch model") that both this
oracle and the Ray engine (pipelines/crawl.py) implement. The reference
itself is racy within a depth (colly async workers, crawler_twotier.go:64-69),
so per SURVEY.md §2.6 we define "matching crawl ordering" as equality of the
per-epoch scheduled sets under a deterministic tie-break sort.

Epoch model (shared spec):

1. frontier₀ = validated seed list at depth 0 (reference takes one stdin URL
   and defaults the scheme to https, main.go:50-66; we generalize to a list).
   Seeds are NOT entered into the URL-seen set (the reference only marks
   *discovered* URLs seen, crawler_twotier.go:186-203).
2. Each epoch: sort the frontier by (-priority, host, url_norm, url_raw);
   apply the per-host politeness budget in that order — over-budget rows are
   DEFERRED to the next epoch with priority=1 (they jump the line, like the
   reference's priority queue, downloader.go:122-132). rank within the epoch
   = position in the sorted scheduled list (the golden ordering trace).
3. Fetch each scheduled row: skip if its raw URL was already requested
   (colly's internal raw-URL revisit filter — T2, crawler_twotier.go:200);
   otherwise look up ``fetch_key(url)`` in the pages corpus (our
   deterministic stand-in for HTTP GET), truncate the body at 5 MB (colly
   MaxBodySize read cap, crawler_twotier.go:57), route + extract.
4. Candidate links: validity filter (crawler_twotier.go:187-190) + depth
   gate (parent_depth < max_depth, crawler_twotier.go:194). All candidates
   of the epoch are then deduplicated per url_norm with the deterministic
   tie-break min((depth, url_raw)), anti-joined against the global seen
   set, and the survivors are marked seen (first_depth = chosen depth) and
   become the next frontier (priority 0).
5. Documents detected on the slow path are deduplicated against the global
   downloaded∪pending set on their RAW url (downloader.go:280-293) and
   downloaded: success iff the fetch key exists in the corpus. A failed
   attempt with attempt < max_retries re-queues the task for the NEXT epoch
   with priority (the reference's retry lane jumps the queue,
   downloader.go:159-175); retry tasks are processed before new tasks, each
   group in url order. After max_retries failures the task is dropped.

Termination: empty frontier AND no pending retries (the reference's main()
likewise waits for the download manager to drain, main.go:112-120).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import CrawlConfig
from ..functions.urlnorm import fetch_key, host_of, normalize_url
from .reference import extract_filename, extract_page


def validate_seed(url: str) -> str | None:
    """main.go:58-66 — default scheme to https, require a host."""
    if "://" not in url:
        url = "https://" + url
    if normalize_url(url) is None:
        return None
    return url


@dataclass
class OracleCrawlResult:
    # extracted: one row per successfully fetched page
    extracted: list[dict] = field(default_factory=list)
    # seen: url_norm -> (first_depth, representative raw url)
    seen: dict[str, tuple[int, str]] = field(default_factory=dict)
    # order trace rows: dict(epoch, rank, url, host, depth, priority)
    order: list[dict] = field(default_factory=list)
    # fetch log rows: dict(url, epoch, depth, status, bytes, ok)
    fetch_log: list[dict] = field(default_factory=list)
    # download log rows, one per ATTEMPT:
    # dict(url, epoch, depth, attempt, ok, bytes, filename)
    downloads: list[dict] = field(default_factory=list)
    n_epochs: int = 0


def crawl(
    corpus: dict[str, bytes],
    seeds: list[str],
    cfg: CrawlConfig = CrawlConfig(),
    host_budgets: dict[str, int] | None = None,
    robots_disallow: dict[str, list[str]] | None = None,
) -> OracleCrawlResult:
    """Run the oracle crawl. ``corpus`` maps fetch_key -> html bytes."""
    host_budgets = host_budgets or {}
    robots_disallow = robots_disallow or {}
    res = OracleCrawlResult()

    fetched_raw: set[str] = set()
    downloaded_or_pending: set[str] = set()

    frontier: list[tuple[int, str, int]] = []  # (priority, url_raw, depth)
    seed_raws: set[str] = set()
    for s in seeds:
        v = validate_seed(s)
        if v is not None and v not in seed_raws:  # duplicate raw seeds collapse
            seed_raws.add(v)
            frontier.append((0, v, 0))

    pending_retry: list[tuple[str, int, int]] = []  # (url, depth, attempt)

    epoch = 0
    while frontier or pending_retry:
        def sort_key(row):
            prio, raw, depth = row
            return (-prio, host_of(raw) or "", normalize_url(raw) or "", raw)

        frontier.sort(key=sort_key)

        # politeness budget — schedule or defer
        scheduled: list[tuple[int, str, int]] = []
        deferred: list[tuple[int, str, int]] = []
        per_host: dict[str, int] = {}
        for prio, raw, depth in frontier:
            h = host_of(raw) or ""
            budget = host_budgets.get(h, cfg.default_host_budget)
            if budget <= 0 or per_host.get(h, 0) < budget:
                per_host[h] = per_host.get(h, 0) + 1
                scheduled.append((prio, raw, depth))
            else:
                deferred.append((1, raw, depth))

        candidates: list[tuple[str, int, str]] = []  # (raw, depth, norm)
        epoch_docs: list[tuple[str, int]] = []  # (doc raw url, depth)

        for rank, (prio, raw, depth) in enumerate(scheduled):
            res.order.append(
                {"epoch": epoch, "rank": rank, "url": raw,
                 "host": host_of(raw) or "", "depth": depth, "priority": prio}
            )
            if raw in fetched_raw:
                res.fetch_log.append(
                    {"url": raw, "epoch": epoch, "depth": depth,
                     "status": 304, "bytes": 0, "ok": False}
                )
                continue
            fetched_raw.add(raw)
            fk = fetch_key(raw)
            body = corpus.get(fk) if fk is not None else None
            if body is None:
                res.fetch_log.append(
                    {"url": raw, "epoch": epoch, "depth": depth,
                     "status": 404, "bytes": 0, "ok": False}
                )
                continue
            body = bytes(body)[: cfg.max_body_bytes]
            res.fetch_log.append(
                {"url": raw, "epoch": epoch, "depth": depth,
                 "status": 200, "bytes": len(body), "ok": True}
            )
            ext = extract_page(raw, body, cfg.doc_extensions)
            res.extracted.append(
                {"url": raw, "epoch": epoch, "depth": depth, "path": ext.path,
                 "links": ext.links, "link_count": len(ext.links),
                 "title": ext.title, "description": ext.description,
                 "has_nav": ext.has_nav, "link_density": ext.link_density,
                 "documents": ext.documents, "text": ext.text}
            )
            if depth < cfg.max_depth:
                for link in ext.links:
                    norm = normalize_url(link)
                    if norm is None:
                        continue
                    candidates.append((link, depth + 1, norm))
            for doc in ext.documents:
                if doc[0] not in downloaded_or_pending:
                    downloaded_or_pending.add(doc[0])
                    epoch_docs.append((doc[0], depth))

        # robots filtering (engine-side extension; reference ignores robots)
        if cfg.respect_robots and robots_disallow:
            def allowed(raw_url: str) -> bool:
                h = host_of(raw_url)
                from ..functions.urlnorm import split_url
                sp = split_url(raw_url)
                path = sp.path if sp else ""
                return not any(
                    path.startswith(p) for p in robots_disallow.get(h or "", [])
                )
            candidates = [c for c in candidates if allowed(c[0])]

        # per-epoch dedup on url_norm with deterministic tie-break,
        # then anti-join against the global seen set
        by_norm: dict[str, tuple[int, str]] = {}
        for raw, depth, norm in candidates:
            cur = by_norm.get(norm)
            if cur is None or (depth, raw) < cur:
                by_norm[norm] = (depth, raw)
        new_frontier: list[tuple[int, str, int]] = []
        for norm in sorted(by_norm):
            depth, raw = by_norm[norm]
            if norm in res.seen:
                continue
            res.seen[norm] = (depth, raw)
            new_frontier.append((0, raw, depth))

        # downloads (simulated): retry lane first (priority), then new
        # tasks; each group in url order (T8, downloader.go:122-145).
        # T5: the global per-epoch download budget defers the tail of the
        # work list to the next epoch unchanged (downloader.go:82 analogue)
        work = sorted(pending_retry) + [
            (u, d, 0) for u, d in sorted(epoch_docs)
        ]
        pending_retry = []
        if cfg.download_budget_per_epoch > 0:
            pending_retry = work[cfg.download_budget_per_epoch:]
            work = work[: cfg.download_budget_per_epoch]
        for doc_url, depth, attempt in work:
            fk = fetch_key(doc_url)
            body = corpus.get(fk) if fk is not None else None
            ok = body is not None
            res.downloads.append(
                {"url": doc_url, "epoch": epoch, "depth": depth,
                 "attempt": attempt, "ok": ok,
                 "bytes": len(body) if ok else 0,
                 "filename": extract_filename(doc_url)}
            )
            if not ok and attempt < cfg.max_retries:
                pending_retry.append((doc_url, depth, attempt + 1))

        frontier = deferred + new_frontier
        epoch += 1

    res.n_epochs = epoch
    return res
