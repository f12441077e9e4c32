"""Engine fast-path link extractor (tier-2, ~90% of pages).

Reimplements the reference's byte-scan href extraction (reference
tokenizer/fastpath.go:33-127) with a compiled-regex candidate scan instead
of a per-byte Python loop: ``re.finditer`` locates the case-insensitive
``href=`` positions at C speed, then a position cursor replicates the Go
scan loop's consume-and-skip behavior. Written independently of the pinned
oracle (oracle/reference.fast_extract_links) and property-tested against it.

Quirks preserved (SURVEY.md §2.7):
- ``href=`` matches anywhere in the bytes (comments/scripts/text);
- the scan loop bound ``i < len-6`` means a match starting in the final six
  bytes is never taken;
- unquoted values terminate only at space or '>', so tabs/newlines are
  captured into the URL;
- the naive absolutizer: ``len>7`` passes any ``https:/…``, a bare 7-char
  ``http://`` falls through to string concatenation, no ``../`` resolution,
  and the base string keeps its query/fragment.
"""

from __future__ import annotations

import re

from .urlnorm import split_url

_HREF = re.compile(rb"href=", re.IGNORECASE)
_SPACE = 0x20
_GT = 0x3E
_DQ = 0x22
_SQ = 0x27


def naive_absolute(raw: str, scheme: str, host: str, base_str: str) -> str:
    """tokenizer/fastpath.go:109-127 semantics."""
    if len(raw) > 7:
        head = raw[:7]
        if head == "http://" or head == "https:/":
            return raw
    if raw.startswith("//") and len(raw) > 2:
        return scheme + ":" + raw
    if raw.startswith("/"):
        return scheme + "://" + host + raw
    if base_str.endswith("/"):
        return base_str + raw
    return base_str + "/" + raw


def extract_links_fast(html: bytes, base_url: str) -> list[str]:
    """Extract links exactly as the reference fast path would."""
    n = len(html)
    if n < 7:
        return []
    limit = n - 6  # Go: for i < len(htmlBytes)-6 (fastpath.go:41)
    sp = split_url(base_url)
    scheme = sp.scheme if sp else ""
    host = sp.netloc if sp else ""

    urls: list[str] = []
    cursor = 0
    for m in _HREF.finditer(html):
        s = m.start()
        if s < cursor:
            continue  # inside a value the Go loop already consumed
        if s >= limit:
            break
        i = s + 5
        quote = 0
        c = html[i] if i < n else -1
        if c == _DQ or c == _SQ:
            quote = c
            i += 1
        start = i
        if quote:
            j = html.find(quote.to_bytes(1, "big"), i)
            i = j if j != -1 else n
        else:
            jsp = html.find(b" ", i)
            jgt = html.find(b">", i)
            if jsp == -1:
                i = jgt if jgt != -1 else n
            elif jgt == -1:
                i = jsp
            else:
                i = min(jsp, jgt)
        if i > start:
            raw = html[start:i].decode("utf-8", "replace")
            if (
                raw[0] != "#"
                and not raw.startswith("javascript:")
                and not raw.startswith("mailto:")
            ):
                abs_url = naive_absolute(raw, scheme, host, base_url)
                if abs_url:
                    urls.append(abs_url)
        cursor = i + 1
    return urls
