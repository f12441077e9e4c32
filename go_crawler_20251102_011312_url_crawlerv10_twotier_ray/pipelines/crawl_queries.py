"""Driver-facing crawl queries over the synthetic pages corpus.

The crawl operators run over a Common-Crawl-shaped ``pages`` table
(BASELINE input_hint) which does not exist in the TPC-H-ish testdata, so
each query materializes the deterministic synthetic corpus for its scale
factor under ``/tmp/graft_corpus/<sf>/`` (pure function of (seed, size);
cached across calls via a _SUCCESS stamp). The DuckDB oracles reference the
same parquet file via ``read_parquet`` — in particular
``crawl_extract_text``'s oracle simply reads the ``text`` column the pinned
oracle minted at generation time, which makes the driver's value-hash
comparison EXACTLY the byte-identical-extraction gate.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import CrawlConfig
from ..corpus import write_corpus
from ..stages.extract import RouteAndExtract
from .crawl import run_crawl

CORPUS_ROOT = "/tmp/graft_corpus"
_SF_PAGES = {"sf0.001": 120, "sf0.01": 800, "sf0.1": 20000}
_SF_HOSTS = {"sf0.001": 6, "sf0.01": 12, "sf0.1": 40}
CORPUS_SEED = 42


def corpus_for(sf_dir: str) -> str:
    """Deterministic corpus directory for a testdata sf dir (cached)."""
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    n = _SF_PAGES.get(sf, 800)
    h = _SF_HOSTS.get(sf, 12)
    return write_corpus(
        os.path.join(CORPUS_ROOT, sf), n_pages=n, n_hosts=h, seed=CORPUS_SEED
    )


# paths the driver's sf0.01 oracle SQL reads (stable by construction);
# the oracle_* tables are minted by the pinned sequential simulator at
# corpus-generation time (corpus._mint_oracle_tables)
SF001_DIR = os.path.join(CORPUS_ROOT, "sf0.01")
SF001_PAGES = os.path.join(SF001_DIR, "pages", "part-*.parquet")


def crawl_extract_text(sf_dir: str) -> pd.DataFrame:
    """M1 slice: route+extract EVERY corpus page (read_parquet →
    map_batches → select). Output (url, text) must equal the pages table's
    oracle-minted text column byte-for-byte."""
    cdir = corpus_for(sf_dir)
    from ..sources.pages import read_pages

    ds = read_pages(cdir, columns=["url", "html"])
    out = ds.map_batches(
        RouteAndExtract(CrawlConfig()), batch_format="pyarrow", batch_size=64
    ).select_columns(["url", "text"])
    return out.to_pandas().sort_values("url").reset_index(drop=True)


CRAWL_EXTRACT_TEXT_SQL = f"""
SELECT url, text FROM read_parquet('{SF001_PAGES}') ORDER BY url
"""


def crawl_router_split(sf_dir: str) -> pd.DataFrame:
    """Routing decision counts over the corpus — the coordinator's
    fast/slow split (coordinator.go:102-112), SQL-checkable because the
    whole decision tree is re-expressed in the oracle SQL."""
    cdir = corpus_for(sf_dir)
    from ..sources.pages import read_pages

    ds = read_pages(cdir, columns=["url", "html"])

    import pyarrow.compute as pc

    from ..functions.router import route_batch

    cfg = CrawlConfig()

    def route(t: pa.Table) -> pa.Table:
        sizes = pc.min_element_wise(
            pc.binary_length(t["html"]).cast(pa.int64()),
            pa.scalar(cfg.max_body_bytes, pa.int64()),
        ).to_numpy(zero_copy_only=False)
        paths = route_batch(pd.Series(t["url"].to_pylist()), sizes)
        return pa.table({"path": pa.array(paths.tolist(), pa.string())})

    out = (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("path")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n"})
        .sort_values("path")
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


CRAWL_ROUTER_SPLIT_SQL = f"""
WITH p AS (
  SELECT url, least(octet_length(html), 5242880) AS sz, lower(url) AS lu,
         CASE WHEN strpos(url, '#') > 0
              THEN substr(url, 1, strpos(url, '#') - 1) ELSE url END AS prefrag
  FROM read_parquet('{SF001_PAGES}')
), q AS (
  SELECT url, sz, lu,
         CASE WHEN strpos(prefrag, '?') > 0
              THEN substr(prefrag, strpos(prefrag, '?') + 1) ELSE '' END AS qs,
         CASE WHEN strpos(prefrag, '?') > 0
              THEN substr(prefrag, 1, strpos(prefrag, '?') - 1)
              ELSE prefrag END AS noq
  FROM p
), r AS (
  SELECT url, sz, lu, qs,
         regexp_replace(noq, '^[^:/?#]+://[^/?#]*', '') AS pth
  FROM q
)
SELECT CASE
    WHEN sz > 512000 THEN 'slow'
    WHEN lu LIKE '%/document%' OR lu LIKE '%/paper%' OR lu LIKE '%/publication%'
         OR lu LIKE '%/research%' OR lu LIKE '%/library%' THEN 'slow'
    WHEN qs <> '' THEN 'slow'
    WHEN sz < 102400 THEN 'fast'
    WHEN lu LIKE '%/sitemap%' OR lu LIKE '%/archive%' OR lu LIKE '%/category%'
         OR lu LIKE '%/tag%' OR lu LIKE '%/index%' OR lu LIKE '%/list%' THEN 'fast'
    WHEN length(pth) - length(replace(pth, '/', '')) + 1 <= 3 THEN 'fast'
    ELSE 'slow' END AS path,
  count(*) AS n
FROM r GROUP BY 1 ORDER BY 1
"""


def crawl_link_stats(sf_dir: str) -> pd.DataFrame:
    """Per-path link/doc aggregate over the full extract — the reference's
    two-tier performance counters (T7, fastpath.go:129-139,
    slowpath.go:174-185) derived from data instead of atomics."""
    from ray.data.aggregate import Count, Sum

    from ..sources.pages import read_pages

    cdir = corpus_for(sf_dir)
    ds = read_pages(cdir, columns=["url", "html"])
    ext = ds.map_batches(
        RouteAndExtract(CrawlConfig()), batch_format="pyarrow", batch_size=64
    )
    out = (
        ext.groupby("path")
        .aggregate(
            Count(alias_name="pages"),
            Sum("link_count", alias_name="links"),
            Sum("doc_count", alias_name="docs"),
        )
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    for c in ("pages", "links", "docs"):
        out[c] = out[c].astype("int64")
    return out


CRAWL_LINK_STATS_SQL = f"""
SELECT path, pages, links, docs
FROM read_parquet('{SF001_DIR}/oracle_link_stats.parquet') ORDER BY path
"""


# the three crawl queries share one deterministic crawl run per corpus
_CRAWL_CACHE: dict[str, object] = {}


def _crawl_for(cdir: str):
    if cdir not in _CRAWL_CACHE:
        _CRAWL_CACHE.clear()  # keep at most one result in memory
        _CRAWL_CACHE[cdir] = run_crawl(cdir, CrawlConfig())
    return _CRAWL_CACHE[cdir]


def crawl_seen_set(sf_dir: str) -> pd.DataFrame:
    """Full frontier crawl; returns the final URL-seen set. The driver
    oracle is the simulator-minted oracle_seen.parquet — an independent
    check of the sharded seen actors (T1, crawler_twotier.go:223-245)."""
    cdir = corpus_for(sf_dir)
    res = _crawl_for(cdir)
    return (
        res.seen.to_pandas()[["url_norm", "first_depth", "url"]]
        .sort_values("url_norm")
        .reset_index(drop=True)
    )


CRAWL_SEEN_SQL = f"""
SELECT url_norm, first_depth, url
FROM read_parquet('{SF001_DIR}/oracle_seen.parquet') ORDER BY url_norm
"""


def crawl_fetch_log(sf_dir: str) -> pd.DataFrame:
    """Fetch log of the full crawl (statuses 200/304/404), checked against
    the simulator-minted oracle_fetch_log.parquet. Sorted on (epoch, url,
    status): a seed re-discovered in the same epoch yields a 200 and a 304
    row for one (epoch, url), so status breaks the tie deterministically."""
    cdir = corpus_for(sf_dir)
    res = _crawl_for(cdir)
    return (
        res.fetch_log.to_pandas()
        .sort_values(["epoch", "url", "status"], kind="mergesort")
        .reset_index(drop=True)
    )


CRAWL_FETCH_LOG_SQL = f"""
SELECT url, epoch, depth, status, bytes, ok
FROM read_parquet('{SF001_DIR}/oracle_fetch_log.parquet')
ORDER BY epoch, url, status
"""


def crawl_downloads(sf_dir: str) -> pd.DataFrame:
    """Document download log of the full crawl, checked against the
    simulator-minted oracle_downloads.parquet (T3 dedup + T8 retry lane,
    downloader.go:280-329)."""
    cdir = corpus_for(sf_dir)
    res = _crawl_for(cdir)
    return (
        res.downloads.to_pandas()
        .sort_values(["url", "attempt"], kind="mergesort")
        .reset_index(drop=True)
    )


CRAWL_DOWNLOADS_SQL = f"""
SELECT url, depth, attempt, ok, bytes, filename, epoch
FROM read_parquet('{SF001_DIR}/oracle_downloads.parquet')
ORDER BY url, attempt
"""


def media_features_query(sf_dir: str) -> pd.DataFrame:
    """Multimodal decode/featurize over the corpus pages. Returns the
    scalar columns (the float feature vector itself can't round-trip a SQL
    value-hash; feat_crc is its exact integer checksum)."""
    from .multimodal import media_features

    out = media_features(corpus_for(sf_dir))
    return out[["url", "n_bytes", "format", "width", "height", "feat_crc"]]


MEDIA_FEATURES_SQL = f"""
SELECT url, n_bytes, format, width, height, feat_crc
FROM read_parquet('{SF001_DIR}/oracle_media.parquet') ORDER BY url
"""


def media_resize_query(sf_dir: str) -> pd.DataFrame:
    """Aspect-fit resize plan per payload (actor-pool decode → exact
    integer geometry). SQL oracle recomputes the geometry from the minted
    decode table — the engine derives it from the PAYLOAD, so the hash
    match verifies decode + resize end to end."""
    from .multimodal import media_resize

    return media_resize(corpus_for(sf_dir))


def media_frames_query(sf_dir: str) -> pd.DataFrame:
    """Stride frame sampling (one row per sampled frame — the one-to-many
    explode of video pipelines) with deterministic per-frame checksums."""
    from .multimodal import media_frame_sample

    return media_frame_sample(corpus_for(sf_dir))


# geometry/sampling constants are duplicated literally in the SQL (frozen
# oracle): RESIZE_BOX=224, FRAME_BASE=8, FRAME_MOD=56, FRAME_STRIDE=4,
# FRAME_CRC_MOD=2147483647 (pipelines/multimodal.py)
MEDIA_RESIZE_SQL = f"""
SELECT url, width, height,
       CAST(width  * 224 // greatest(width, height) AS BIGINT) AS out_w,
       CAST(height * 224 // greatest(width, height) AS BIGINT) AS out_h,
       CAST(224 * 100 // greatest(width, height) AS BIGINT)    AS scale_pct
FROM read_parquet('{SF001_DIR}/oracle_media.parquet') ORDER BY url
"""

MEDIA_FRAMES_SQL = f"""
SELECT m.url,
       CAST(f.frame_idx AS BIGINT) AS frame_idx,
       CAST((m.feat_crc * 31 + f.frame_idx) % 2147483647 AS BIGINT)
         AS frame_crc
FROM read_parquet('{SF001_DIR}/oracle_media.parquet') m,
     LATERAL unnest(generate_series(0, 8 + m.n_bytes % 56 - 1, 4))
       AS f(frame_idx)
ORDER BY m.url, frame_idx
"""
