"""Pinned oracle: row-at-a-time reimplementation of the reference algorithms.

This is a deliberately literal transcription of the Go code in
``/root/reference`` (tokenizer/fastpath.go, tokenizer/slowpath.go,
tokenizer/coordinator.go, utils/utils.go), used to mint golden outputs and
as the correctness oracle the Ray engine is tested against. The engine's
kernels (functions/fastpath.py, functions/slowpath.py, functions/router.py)
are written INDEPENDENTLY (regex scanner, one-pass DOM walk, vectorized
router) and must agree byte-for-byte with this module.

Shared spec modules (single source of truth for both sides):
- functions/urlnorm.py  — URL parse/normalize semantics
- functions/htmldom.py  — the DOM builder standing in for Go net/html
- functions/textspec.py — canonical serialization of extraction results
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urljoin

from ..functions import textspec
from ..functions.htmldom import iter_elements, parse_html, text_content
from ..functions.urlnorm import split_url

# ---------------------------------------------------------------------------
# Fast path — tokenizer/fastpath.go
# ---------------------------------------------------------------------------


def matches_href(b: bytes, i: int) -> bool:
    """fastpath.go:98-107 — case-insensitive 'href' followed by literal '='."""
    if len(b) - i < 5:
        return False
    return (
        b[i] in (0x68, 0x48)
        and b[i + 1] in (0x72, 0x52)
        and b[i + 2] in (0x65, 0x45)
        and b[i + 3] in (0x66, 0x46)
        and b[i + 4] == 0x3D
    )


def make_absolute(raw_url: str, base_scheme: str, base_host: str, base_str: str) -> str:
    """fastpath.go:109-127 — the deliberately naive absolutizer.

    Quirks preserved (SURVEY.md §2.7.4): ``len>7`` passes any ``https:/…``
    prefix but rejects a bare 7-char ``http://``; no ``../`` resolution; the
    base string keeps its query/fragment on relative concatenation.
    """
    if len(raw_url) > 7 and (raw_url[0:7] == "http://" or raw_url[0:7] == "https:/"):
        return raw_url
    if len(raw_url) > 2 and raw_url[0:2] == "//":
        return base_scheme + ":" + raw_url
    if len(raw_url) > 0 and raw_url[0] == "/":
        return base_scheme + "://" + base_host + raw_url
    if base_str and base_str[-1] == "/":
        return base_str + raw_url
    return base_str + "/" + raw_url


def fast_extract_links(html_bytes: bytes, base_url: str) -> list[str]:
    """fastpath.go:33-96 — byte-scan href extraction, transcribed 1:1.

    ``base_url`` is the raw fetched URL (crawler_twotier.go:123 passes
    ``r.Request.URL``); Go reconstructs it via ``url.URL.String()`` which is
    the identity for the URL shapes in our corpora, so the raw string is
    used as the base string directly.
    """
    sp = split_url(base_url)
    base_scheme = sp.scheme if sp else ""
    base_host = sp.netloc if sp else ""

    urls: list[str] = []
    n = len(html_bytes)
    i = 0
    while i < n - 6:
        if matches_href(html_bytes, i):
            i += 5
            quote = 0
            if i < n and html_bytes[i] in (0x22, 0x27):  # '"' or "'"
                quote = html_bytes[i]
                i += 1
            url_start = i
            while i < n:
                c = html_bytes[i]
                if quote != 0:
                    if c == quote:
                        break
                else:
                    if c == 0x20 or c == 0x3E:  # ' ' or '>'
                        break
                i += 1
            if i > url_start:
                raw = html_bytes[url_start:i].decode("utf-8", "replace")
                if (
                    len(raw) > 0
                    and raw[0] != "#"
                    and not raw.startswith("javascript:")
                    and not raw.startswith("mailto:")
                ):
                    abs_url = make_absolute(raw, base_scheme, base_host, base_url)
                    if abs_url != "":
                        urls.append(abs_url)
        i += 1
    return urls


# ---------------------------------------------------------------------------
# Slow path — tokenizer/slowpath.go
# ---------------------------------------------------------------------------


@dataclass
class SlowResult:
    links: list[str] = field(default_factory=list)
    documents: list[tuple[str, str, str, str]] = field(default_factory=list)
    title: str = ""
    description: str = ""
    has_nav: bool = False
    link_density: float = 0.0
    parse_error: bool = False


def is_document(url_str: str, extensions: tuple[str, ...]) -> bool:
    """slowpath.go:135-143 — suffix-only match (≠ utils.IsDocumentURL)."""
    url_lower = url_str.lower()
    return any(url_lower.endswith(ext) for ext in extensions)


def get_extension(url_str: str) -> str:
    """slowpath.go:146-157 — last '.'-segment, query stripped, '.'-prefixed."""
    parts = url_str.split(".")
    if len(parts) > 1:
        ext = parts[-1]
        idx = ext.find("?")
        if idx != -1:
            ext = ext[:idx]
        return "." + ext
    return ""


def get_context(parent_text: str | None) -> str:
    """slowpath.go:160-171 — parent text, truncated at 200 *bytes* then
    '...' appended, then TrimSpace. Go slices the string by bytes; we
    replicate on the UTF-8 encoding (the corpus keeps context text ASCII so
    no partial code points arise; 'ignore' drops any partial byte the same
    deterministic way on both sides)."""
    if parent_text is None:
        return ""
    b = parent_text.encode("utf-8")
    if len(b) > 200:
        text = b[:200].decode("utf-8", "ignore") + "..."
    else:
        text = parent_text
    return text.strip()


def resolve_ref(base_url: str, href: str) -> str | None:
    """Go ``baseURL.Parse(href)`` (slowpath.go:94) — RFC 3986 resolution.
    Returns None where Go would error (control characters)."""
    from ..functions.urlnorm import has_ctrl

    if has_ctrl(href):
        return None
    try:
        return urljoin(base_url, href)
    except ValueError:
        return None


def slow_analyze(
    html_bytes: bytes, base_url: str, doc_extensions: tuple[str, ...]
) -> SlowResult:
    """slowpath.go:57-132 — full DOM analysis, transcribed."""
    res = SlowResult()
    root = parse_html(html_bytes)
    if root.tag == "#error":
        res.parse_error = True
        return res

    # metadata — slowpath.go:77-79
    for node in iter_elements(root, "title"):
        res.title = text_content(node)
        break
    for node in iter_elements(root, "meta"):
        if node.attrs.get("name") == "description":
            res.description = node.attrs.get("content", "")
            break
    for _ in iter_elements(root, "nav"):
        res.has_nav = True
        break

    # links — slowpath.go:82-114
    for node in iter_elements(root, "a"):
        if "href" not in node.attrs:
            continue
        href = node.attrs["href"]
        if href == "" or href == "#":
            continue
        if href.startswith("javascript:") or href.startswith("mailto:"):
            continue
        url_str = resolve_ref(base_url, href)
        if url_str is None:
            continue
        res.links.append(url_str)
        if is_document(url_str, doc_extensions):
            parent = node.parent
            context = (
                get_context(text_content(parent))
                if parent is not None and parent.tag != "#root"
                else ""
            )
            res.documents.append(
                (url_str, get_extension(url_str), text_content(node), context)
            )

    # link density — slowpath.go:116-120
    html_kb = len(html_bytes) / 1024.0
    if html_kb > 0:
        res.link_density = len(res.links) / html_kb
    return res


# ---------------------------------------------------------------------------
# Router — tokenizer/coordinator.go:42-99
# ---------------------------------------------------------------------------

SLOW_URL_PATTERNS = ("/document", "/paper", "/publication", "/research", "/library")
FAST_URL_PATTERNS = ("/sitemap", "/archive", "/category", "/tag", "/index", "/list")


def decide(page_url: str, body_size: int, fast_limit: int = 100 * 1024,
           slow_limit: int = 500 * 1024) -> str:
    """coordinator.Decide — returns "fast" or "slow". Order of checks matters."""
    url_lower = page_url.lower()
    sp = split_url(page_url)
    raw_query = sp.query if sp else ""
    path = sp.path if sp else ""

    if body_size > slow_limit:
        return "slow"
    if any(p in url_lower for p in SLOW_URL_PATTERNS):
        return "slow"
    if raw_query != "":
        return "slow"
    if body_size < fast_limit:
        return "fast"
    if any(p in url_lower for p in FAST_URL_PATTERNS):
        return "fast"
    if len(path.split("/")) <= 3:
        return "fast"
    return "slow"


# ---------------------------------------------------------------------------
# utils.go scalar functions
# ---------------------------------------------------------------------------


def is_document_url(doc_url: str, extensions: tuple[str, ...]) -> bool:
    """utils.IsDocumentURL (utils/utils.go:21-31) — crawl-side predicate:
    suffix OR 'ext?' OR 'ext&' substring (≠ slow-path is_document)."""
    lower = doc_url.lower()
    return any(
        lower.endswith(ext) or (ext + "?") in lower or (ext + "&") in lower
        for ext in extensions
    )


def sanitize_filename(name: str) -> str:
    """utils.SanitizeFilename (utils/utils.go:60-69)."""
    for ch in ["\\", "/", ":", "*", "?", '"', "<", ">", "|", "\x00"]:
        name = name.replace(ch, "_")
    if len(name) > 200:
        dot = name.rfind(".")  # filepath.Ext: suffix from the final dot
        ext = name[dot:] if dot >= 0 else ""
        name = name[: 200 - len(ext)] + ext
    return name


def extract_filename(doc_url: str, default_stem: str = "download",
                     content_disposition: str | None = None) -> str:
    """utils.ExtractFilename (utils/utils.go:34-57), INCLUDING the header
    branch (utils.go:35-44): a ``Content-Disposition: attachment;
    filename=...`` header wins over the URL path — exactly the prefix
    match + quote trim the reference does (``inline; ...`` or any other
    shape falls through to the URL). Corpus-mode lanes have no response
    headers and pass None; ``fetch_mode="http"`` threads the real header
    through (DownloadHttp).

    The reference falls back to ``download_<UnixNano>`` — nondeterministic;
    we substitute a caller-provided deterministic stem (documented deviation;
    filenames are a reporting concern, not part of the byte-identical gate).
    """
    if content_disposition:
        prefix = "attachment; filename="
        if content_disposition.startswith(prefix):
            fn = content_disposition[len(prefix):].strip('"')
            if fn:
                return sanitize_filename(fn)
    segments = doc_url.split("/")
    filename = segments[-1]
    idx = filename.find("?")
    if idx != -1:
        filename = filename[:idx]
    if filename == "" or "." not in filename:
        filename = default_stem
    return sanitize_filename(filename)


# ---------------------------------------------------------------------------
# Whole-page extraction (route + extract + canonical text)
# ---------------------------------------------------------------------------


@dataclass
class PageExtraction:
    url: str
    path: str  # "fast" | "slow"
    links: list[str]
    title: str | None
    description: str | None
    has_nav: bool | None
    link_density: float | None
    documents: list[tuple[str, str, str, str]]
    text: str


def extract_page(
    url: str, html_bytes: bytes, doc_extensions: tuple[str, ...] = (".pdf",)
) -> PageExtraction:
    """Route then extract one page; mirrors OnResponse
    (crawler_twotier.go:113-160) minus the frontier side effects."""
    path = decide(url, len(html_bytes))
    if path == "fast":
        links = fast_extract_links(html_bytes, url)
        return PageExtraction(
            url=url, path="fast", links=links, title=None, description=None,
            has_nav=None, link_density=None, documents=[],
            text=textspec.serialize_fast(links),
        )
    res = slow_analyze(html_bytes, url, doc_extensions)
    return PageExtraction(
        url=url, path="slow", links=res.links, title=res.title,
        description=res.description, has_nav=res.has_nav,
        link_density=res.link_density, documents=res.documents,
        text=textspec.serialize_slow(
            res.links, res.title, res.description, res.has_nav,
            res.link_density, res.documents,
        ),
    )
