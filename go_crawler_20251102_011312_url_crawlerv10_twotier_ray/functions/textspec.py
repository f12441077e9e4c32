"""Canonical serialization of a tier-2 extraction result — shared spec.

The BASELINE gate is *byte-identical extracted text per url*. "Extracted
text" = the tier-2 tokenizer outputs (reference tokenizer/fastpath.go:21-25,
slowpath.go:25-49): the link list plus, on the slow path, page metadata and
detected documents. This module defines the one canonical string form both
the corpus generator (via the oracle) and the engine produce; the engine's
output must equal the pages.text column byte-for-byte.

The format is line-oriented and deterministic; it is never parsed back, so
embedded newlines in titles/contexts are harmless (both sides emit the same
bytes).
"""

from __future__ import annotations


def serialize_fast(links: list[str]) -> str:
    out = ["F|" + str(len(links))]
    out.extend(links)
    return "\n".join(out)


def serialize_slow(
    links: list[str],
    title: str,
    description: str,
    has_nav: bool,
    link_density: float,
    documents: list[tuple[str, str, str, str]],  # (url, extension, title, context)
) -> str:
    out = [
        "S|" + str(len(links)) + "|" + str(len(documents)),
        "T:" + title,
        "D:" + description,
        "N:" + ("1" if has_nav else "0"),
        "LD:" + repr(link_density),
    ]
    out.extend(links)
    for d in documents:
        out.append("DOC:" + "\x1f".join(d))
    return "\n".join(out)
