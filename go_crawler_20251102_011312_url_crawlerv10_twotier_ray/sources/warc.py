"""WARC source/sink (ISO 28500 / WARC 1.0) — the standard web-archive
interchange format, so a corpus produced by any real crawler can feed
this engine and our fetched pages can feed external WARC tooling.

Reference analogue: the Go crawler persists fetched pages to disk
(crawler_twotier.go fetch path + downloader.go file sink); WARC is the
portable form of that archive.

Scale shape:
- ``write_warc``: one ``.warc`` file per input block, written inside the
  map task (the partitioned/resumable sink layout every other sink here
  uses — never one giant file). Record IDs are md5-derived from the URL
  and the record date is a pinned constant by default, so output is
  byte-deterministic for a given block layout.
- ``read_warc``: ``read_binary_files`` over the directory (one Ray read
  task per file) + a per-file record parser in ``map_batches`` — records
  never touch the driver.

Only plain (uncompressed) WARC is handled; response records carry a
minimal stored HTTP/1.1 response envelope.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data as rd

WARC_DATE_DEFAULT = "2026-01-01T00:00:00Z"  # pinned: deterministic output
_CRLF = b"\r\n"


def _response_record(url: str, html: bytes, date: str) -> bytes:
    rid = hashlib.md5(url.encode()).hexdigest()
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF + html
    )
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">" + _CRLF
        + b"WARC-Date: " + date.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def write_warc(ds: rd.Dataset, out_dir: str,
               url_col: str = "url", html_col: str = "html",
               date: str = WARC_DATE_DEFAULT) -> int:
    """Write (url, html) rows as one plain WARC file per block task.
    Returns the number of records written. File names are content-hashed
    (md5 of the member URLs) — re-running an identical job overwrites the
    same files, so the sink is idempotent/resumable."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        urls = t[url_col].to_pylist()
        htmls = t[html_col].to_pylist()
        if not urls:
            return pa.table({"records": pa.array([], pa.int64())})
        payload = b"".join(
            _response_record(u, h if isinstance(h, bytes) else
                             (h or "").encode(), date)
            for u, h in zip(urls, htmls)
        )
        tag = hashlib.md5("\n".join(urls).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{tag}.warc")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table({"records": pa.array([len(urls)], pa.int64())})

    parts = ds.map_batches(dump, batch_format="pyarrow").take_all()
    return int(sum(r["records"] for r in parts))


def _parse_warc_bytes(data: bytes) -> list[tuple[str, bytes]]:
    """(url, body) pairs from one WARC file's bytes: scan record headers,
    honor Content-Length for the block, strip the stored HTTP envelope of
    response records. Non-response records are skipped."""
    out: list[tuple[str, bytes]] = []
    pos = 0
    n = len(data)
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0 or start >= n:
            break
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            clen = 0
        block = data[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri", "")
            body = block
            http_end = block.find(_CRLF + _CRLF)
            if block[:5] == b"HTTP/" and http_end >= 0:
                body = block[http_end + 4:]
            if url:
                out.append((url, body))
    return out


def read_warc(path: str) -> rd.Dataset:
    """Dataset of (url, html) from a WARC file or directory of WARC
    files. One Ray read task per file; parsing happens in the map task."""

    def parse(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        bodies: list[bytes] = []
        for data in t["bytes"].to_pylist():
            for u, b in _parse_warc_bytes(data):
                urls.append(u)
                bodies.append(b)
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "html": pa.array(bodies, pa.binary())}
        )

    return rd.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow")
