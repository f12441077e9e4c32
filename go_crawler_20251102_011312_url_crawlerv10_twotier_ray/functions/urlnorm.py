"""URL parsing / normalization — shared spec module.

Reproduces the Go net/url behaviors the reference depends on. Used by both
the engine kernels and the pinned oracle (it is *spec* code: the dedup keys
and fetch keys of the whole system).

Reference semantics reproduced here:

- ``utils.NormalizeParsedURL`` (reference utils/utils.go:14-18): strip
  fragment and query, reassemble, lowercase the ENTIRE string. This is the
  URL-seen dedup key. The RAW (case-preserved) URL is what gets fetched
  (crawler_twotier.go:200) — callers must preserve that asymmetry.
- ``processDiscoveredURL``'s validity filter (crawler_twotier.go:187-190):
  ``url.Parse`` error or empty Host ⇒ drop. Go's ``url.Parse`` rejects ASCII
  control characters (0x00-0x1f, 0x7f) — this matters because the reference's
  fast-path scanner can emit hrefs containing tabs/newlines (unquoted values
  terminate only at space or '>', fastpath.go:58-63); those die here. Python's
  ``urlsplit`` silently STRIPS those characters, so we reject them explicitly
  before parsing.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

_CTRL_RE = re.compile(r"[\x00-\x1f\x7f]")


def has_ctrl(s: str) -> bool:
    """True if s contains chars Go's url.Parse rejects (control chars)."""
    return _CTRL_RE.search(s) is not None


def split_url(raw: str):
    """Parse like Go url.Parse for our purposes.

    Returns (scheme, netloc, path, query, fragment) or None when Go would
    error (control characters) — mirroring the err branch at
    crawler_twotier.go:188.
    """
    if has_ctrl(raw):
        return None
    try:
        sp = urlsplit(raw)
    except ValueError:
        return None
    return sp


def normalize_url(raw: str) -> str | None:
    """utils.NormalizeParsedURL ∘ url.Parse with the validity filter.

    Returns the normalized dedup key, or None if the URL is invalid or has
    an empty host (crawler_twotier.go:187-190). The normalized form is
    ``lower(scheme://netloc/path)`` — query and fragment removed, whole
    string lowercased (utils/utils.go:14-18).
    """
    sp = split_url(raw)
    if sp is None or sp.netloc == "":
        return None
    return f"{sp.scheme}://{sp.netloc}{sp.path}".lower()


def host_of(raw: str) -> str | None:
    """Lowercased host (netloc) for politeness grouping; None if invalid."""
    sp = split_url(raw)
    if sp is None or sp.netloc == "":
        return None
    return sp.netloc.lower()


def norm_and_host(raw: str) -> tuple[str, str] | None:
    """(normalize_url(raw), host_of(raw)) with a single parse — the hot-path
    variant for bulk frontier processing."""
    sp = split_url(raw)
    if sp is None or sp.netloc == "":
        return None
    return (
        f"{sp.scheme}://{sp.netloc}{sp.path}".lower(),
        sp.netloc.lower(),
    )


def host_from_norm(norm: str) -> str:
    """Host of an ALREADY-normalized URL (lower scheme://netloc/path...):
    pure string slicing, no re-parse."""
    rest = norm.split("://", 1)[1] if "://" in norm else norm
    return rest.split("/", 1)[0]


def fetch_key(raw: str) -> str | None:
    """The corpus-lookup key for a raw URL: HTTP semantics.

    Fragments never reach the server and DNS hosts are case-insensitive, so
    the fetch key is the raw URL with the fragment stripped and
    scheme+netloc lowercased; path/query case is preserved (servers are
    case-sensitive there). This is OUR deterministic stand-in for the
    reference's live HTTP GET of the raw URL (crawler_twotier.go:200).
    """
    sp = split_url(raw)
    if sp is None or sp.netloc == "":
        return None
    out = f"{sp.scheme.lower()}://{sp.netloc.lower()}{sp.path}"
    if sp.query:
        out += "?" + sp.query
    return out
