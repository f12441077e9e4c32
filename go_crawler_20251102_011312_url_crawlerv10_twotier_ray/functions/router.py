"""Engine path router — vectorized coordinator.Decide.

Reimplements the reference's per-page fast/slow routing (reference
tokenizer/coordinator.go:42-99) as vectorized pandas/numpy column ops over a
batch of (url, body_size). The check ORDER is load-bearing and preserved via
``np.select`` (first-true-wins):

1. body > 500 KB                     → slow
2. url contains a document pattern   → slow
3. non-empty query string            → slow
4. body < 100 KB                     → fast
5. url contains a navigation pattern → fast
6. path has ≤ 3 '/'-segments         → fast
default                              → slow

Written independently of the pinned oracle (oracle/reference.decide) and
property-tested against it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_SLOW_PATTERNS = ("/document", "/paper", "/publication", "/research", "/library")
_FAST_PATTERNS = ("/sitemap", "/archive", "/category", "/tag", "/index", "/list")
_SLOW_RE = "|".join(_SLOW_PATTERNS)
_FAST_RE = "|".join(_FAST_PATTERNS)
# strip "scheme://authority" to get the path+query+fragment remainder
_AUTHORITY_RE = r"^[^:/?#]+://[^/?#]*"


def route_batch(
    urls: pd.Series,
    body_sizes: np.ndarray,
    fast_limit: int = 100 * 1024,
    slow_limit: int = 500 * 1024,
) -> np.ndarray:
    """Vectorized Decide over a batch; returns an object array of "fast"/"slow"."""
    lower = urls.str.lower()
    slow_pat = lower.str.contains(_SLOW_RE, regex=True).to_numpy()
    fast_pat = lower.str.contains(_FAST_RE, regex=True).to_numpy()

    # RawQuery: the part after the first '?' of the pre-fragment string;
    # non-empty only if at least one char follows the '?'
    # (Go url.Parse: a trailing '?' yields RawQuery == "").
    pre_frag = urls.str.split("#", n=1).str[0]
    query = pre_frag.str.split("?", n=1).str[1]
    has_query = query.notna().to_numpy() & (query.fillna("") != "").to_numpy()

    # path: strip scheme://authority then anything from '?' on
    path = pre_frag.str.split("?", n=1).str[0].str.replace(
        _AUTHORITY_RE, "", regex=True
    )
    n_seg = (path.str.count("/") + 1).to_numpy()

    sizes = np.asarray(body_sizes)
    return np.select(
        [
            sizes > slow_limit,
            slow_pat,
            has_query,
            sizes < fast_limit,
            fast_pat,
            n_seg <= 3,
        ],
        ["slow", "slow", "slow", "fast", "fast", "fast"],
        default="slow",
    )
