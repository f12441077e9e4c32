"""Consistency tests for the bulk-frontier URL helpers: the fused/derived
variants must agree with the canonical per-field functions everywhere."""

from hypothesis import given, settings
from hypothesis import strategies as st

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.functions.urlnorm import (
    host_from_norm,
    host_of,
    norm_and_host,
    normalize_url,
)

_part = st.text(
    alphabet="abcXYZ019-._~%/?#&=:@ \t", min_size=0, max_size=12
)


@settings(max_examples=400, deadline=None)
@given(
    st.sampled_from(["http", "https", "HTTP", "ftp"]),
    st.sampled_from(["Host.TEST", "h", "h:8080", "user@h.x", ""]),
    _part,
)
def test_norm_and_host_matches_canonical(scheme, netloc, rest):
    url = f"{scheme}://{netloc}/{rest}"
    canonical = (normalize_url(url), host_of(url))
    fused = norm_and_host(url)
    if canonical[0] is None:
        assert fused is None
    else:
        assert fused == canonical
        assert host_from_norm(fused[0]) == canonical[1]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_norm_and_host_never_crashes(raw):
    nh = norm_and_host(raw)
    n = normalize_url(raw)
    assert (nh is None) == (n is None)
    if nh is not None:
        assert nh[0] == n
