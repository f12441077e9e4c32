"""Derived-layout staleness: the hash-bucket pages layout and the
persisted link graph are minted FROM corpus contents; when
corpus.write_corpus regenerates a corpus IN PLACE (parameter stamp
change), both must be invalidated — otherwise join-mode fetch and the
download lane silently serve old page bodies (ADVICE r4)."""

import json
import os

import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.corpus import (
    write_corpus,
)
from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.sources.pages import (
    bucketed_pages,
    corpus_stamp,
)


@pytest.mark.usefixtures("ray_session")
def test_bucketed_pages_invalidated_on_corpus_regeneration(tmp_path):
    cdir = str(tmp_path / "corpus")
    write_corpus(cdir, n_pages=40, n_hosts=3, seed=1, mint_text=False,
                 include_huge=False)
    root, _ = bucketed_pages(cdir)
    with open(os.path.join(root, "meta.json")) as f:
        meta1 = json.load(f)
    assert meta1["corpus_stamp"] == corpus_stamp(cdir) != ""

    # regenerate IN PLACE with different params: write_corpus must remove
    # the derived layout eagerly
    write_corpus(cdir, n_pages=60, n_hosts=3, seed=2, mint_text=False,
                 include_huge=False)
    assert not os.path.exists(os.path.join(root, "_SUCCESS"))
    root2, _ = bucketed_pages(cdir)
    with open(os.path.join(root2, "meta.json")) as f:
        meta2 = json.load(f)
    assert meta2["corpus_stamp"] == corpus_stamp(cdir) != meta1["corpus_stamp"]


@pytest.mark.usefixtures("ray_session")
def test_bucketed_pages_self_invalidates_on_stamp_mismatch(tmp_path):
    """Belt check: even if the eager cleanup is bypassed (e.g. an older
    writer regenerated the corpus), a layout whose recorded corpus stamp
    no longer matches is rebuilt, not trusted."""
    cdir = str(tmp_path / "corpus")
    write_corpus(cdir, n_pages=40, n_hosts=3, seed=1, mint_text=False,
                 include_huge=False)
    root, _ = bucketed_pages(cdir)
    meta_path = os.path.join(root, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    # simulate an out-of-band regeneration: corpus stamp changes while the
    # derived layout (with its _SUCCESS) survives
    with open(os.path.join(cdir, "_SUCCESS"), "w") as f:
        f.write(meta["corpus_stamp"] + ":regenerated")
    sentinel = os.path.join(root, "sentinel")
    open(sentinel, "w").close()
    root2, _ = bucketed_pages(cdir)
    assert root2 == root
    assert not os.path.exists(sentinel)  # layout was rebuilt, not reused
    with open(meta_path) as f:
        assert json.load(f)["corpus_stamp"].endswith(":regenerated")


def test_graph_cache_rechecks_corpus_stamp(tmp_path, monkeypatch):
    """The in-memory _GRAPH_CACHE must re-validate the corpus stamp on
    every hit — an in-place regeneration WITHIN one session (write_corpus
    rmtree's the on-disk derived layout but can't see this dict) must not
    be served the old graph."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines import (
        crawl_queries,
        graph,
    )

    cdir = str(tmp_path / "corpus")
    os.makedirs(cdir)
    with open(os.path.join(cdir, "_SUCCESS"), "w") as f:
        f.write("v3:params-A")
    monkeypatch.setattr(crawl_queries, "corpus_for", lambda s: cdir)
    old = ("N-old", "E-old", 7)
    graph._GRAPH_CACHE.clear()
    graph._GRAPH_CACHE[cdir] = (corpus_stamp(cdir), old)
    assert graph._edge_tables("any") == old  # stamp matches → cache hit

    # in-place regeneration: same directory, new parameter stamp
    with open(os.path.join(cdir, "_SUCCESS"), "w") as f:
        f.write("v3:params-B")
    fresh = ("N-new", "E-new", 9)
    monkeypatch.setattr(graph, "_load_derived_graph", lambda c: fresh)
    assert graph._edge_tables("any") == fresh  # stale entry NOT served
    assert graph._GRAPH_CACHE[cdir] == (corpus_stamp(cdir), fresh)
    graph._GRAPH_CACHE.clear()


def test_derived_graph_meta_records_corpus_stamp(tmp_path):
    """_load_derived_graph refuses a graph whose recorded stamp mismatches
    the corpus (unit-level: exercise the load gate directly)."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines import (
        graph,
    )

    cdir = str(tmp_path / "corpus")
    os.makedirs(cdir)
    with open(os.path.join(cdir, "_SUCCESS"), "w") as f:
        f.write("v3:params")
    gdir = graph._derived_graph_dir(cdir)
    os.makedirs(gdir)
    with open(os.path.join(gdir, "meta.json"), "w") as f:
        json.dump({"n_nodes": 5, "corpus_stamp": "v3:OLD"}, f)
    open(os.path.join(gdir, "_SUCCESS"), "w").close()
    assert graph._load_derived_graph(cdir) is None  # stale → re-derive
