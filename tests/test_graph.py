"""Integer PageRank over the crawl link graph (pipelines/graph.py)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines import (  # noqa: E402
    graph,
)

SF = "/root/testdata/sf0.001"


def test_pagerank_driver_hand_example(monkeypatch):
    """2-node chain a→b, 2 iterations, every value hand-derived from the
    integer spec (catches any drift in the recurrence constants)."""
    monkeypatch.setattr(graph, "PR_ITERS", 2)
    out = graph._pagerank_driver(
        ["a", "b"], pd.DataFrame({"src": ["a"], "dst": ["b"]})
    )
    scale = graph.PR_SCALE
    r0 = scale // 2                      # 500_000_000_000
    base = (15 * r0) // 100              # 75_000_000_000
    # iter 1: S(a)=0, S(b)=r0//1
    ra1, rb1 = base, base + (85 * r0) // 100
    # iter 2: S(a)=0, S(b)=ra1//1
    ra2, rb2 = base, base + (85 * ra1) // 100
    assert out.loc[out.url_norm == "a", "pr_scaled"].item() == ra2
    assert out.loc[out.url_norm == "b", "pr_scaled"].item() == rb2
    assert rb2 == 75_000_000_000 + (85 * 75_000_000_000) // 100


def test_pagerank_driver_dangling_and_isolated():
    """Dangling node drops its mass; an isolated node decays to base."""
    out = graph._pagerank_driver(
        ["a", "b", "iso"], pd.DataFrame({"src": ["a"], "dst": ["b"]})
    )
    base = (15 * (graph.PR_SCALE // 3)) // 100
    assert out.loc[out.url_norm == "iso", "pr_scaled"].item() == base
    assert out["pr_scaled"].sum() < graph.PR_SCALE  # mass strictly decays


@pytest.mark.usefixtures("ray_session")
def test_pagerank_modes_equal():
    drv = graph.link_pagerank(SF, mode="driver")
    dist = graph.link_pagerank(SF, mode="distributed")
    pd.testing.assert_frame_equal(drv, dist, check_dtype=True)
    assert len(drv) > 0
    assert drv["pr_scaled"].dtype == np.int64


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_duckdb_oracle():
    import duckdb

    got = graph.link_pagerank(SF)
    odir = graph.mint_graph_oracle(SF)
    want = duckdb.connect().execute(graph.pagerank_sql(odir)).df()
    want["pr_scaled"] = want["pr_scaled"].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
