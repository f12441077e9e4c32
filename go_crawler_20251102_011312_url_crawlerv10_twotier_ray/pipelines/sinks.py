"""Output sinks mirroring the reference's file outputs.

- S4 visited-URL log (reference crawler/crawler_twotier.go:237-244 appends
  each newly-seen normalized URL to ``visitedURLs_<ts>.txt``): exported from
  the seen table in deterministic (epoch, url_norm) order for trace
  comparison.
- S5 download log (downloader.go:303-310).
- S6 document file sink (downloader.go:204-221 writes each body to
  ``targetDir/<sanitized filename>``): re-expressed as a partitioned Parquet
  document store with a binary payload column — one directory per epoch so a
  rerun skips finished partitions.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..corpus import read_pages_table
from ..functions.urlnorm import fetch_key
from .crawl import CrawlRunResult


def export_visited_txt(res: CrawlRunResult, path: str) -> int:
    """S4: one normalized URL per line, in deterministic accept order
    (epoch, then url_norm — the order the engine commits seen entries)."""
    df = res.seen.to_pandas().sort_values(["epoch", "url_norm"])
    with open(path, "w") as f:
        for u in df["url_norm"]:
            f.write(u + "\n")
    return len(df)


def export_downloads_txt(res: CrawlRunResult, path: str) -> int:
    """S5: one successfully downloaded URL per line."""
    df = res.downloads.to_pandas()
    df = df[df["ok"]].sort_values(["epoch", "url"])
    with open(path, "w") as f:
        for u in df["url"]:
            f.write(u + "\n")
    return len(df)


def write_document_store(
    corpus_dir: str, res: CrawlRunResult, out_dir: str
) -> int:
    """S6: persist successful document downloads as partitioned Parquet
    (epoch=K dirs) with (url, filename, payload). The payload comes from the
    corpus (the simulated download body)."""
    t = read_pages_table(corpus_dir, columns=["url", "html"])
    idx = {u: i for i, u in enumerate(t["url"].to_pylist())}
    html = t["html"]
    df = res.downloads.to_pandas()
    df = df[df["ok"]]
    n_total = 0
    for epoch, g in df.groupby("epoch"):
        payloads = []
        for u in g["url"]:
            fk = fetch_key(u)
            i = idx.get(fk) if fk else None
            payloads.append(html[i].as_py() if i is not None else b"")
        tbl = pa.table(
            {
                "url": pa.array(list(g["url"]), pa.string()),
                "filename": pa.array(list(g["filename"]), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
        d = os.path.join(out_dir, f"epoch={epoch}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("ok")
        n_total += tbl.num_rows
    return n_total
