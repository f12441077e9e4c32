"""Semantic tests for dedup_substring (exact duplicated-passage coverage)
on planted inputs with hand-computable expectations, plus the
driver/distributed mode-equality and empty/no-dup edge paths."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines.dedup import (
    SUBSTR_K,
    dedup_substring,
)


def _write_docs(d, texts):
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def substr_dir(tmp_path_factory):
    """High-entropy vocab (unique words; no accidental 8-gram collisions):
    - doc 0: 30 unique words; doc 3 is an exact copy -> full coverage
    - docs 1 and 2: a shared 12-word passage embedded in distinct
      contexts -> exactly the passage-internal K-grams are duplicated
    - doc 4: all-unique words -> zero coverage
    - doc 5: shorter than K tokens -> zero grams
    """
    d = tmp_path_factory.mktemp("substr")
    shared = [f"sh{i:03d}" for i in range(12)]
    texts = [
        " ".join(f"a{i:03d}" for i in range(30)),
        " ".join([f"b{i:03d}" for i in range(10)] + shared
                 + [f"c{i:03d}" for i in range(8)]),
        " ".join([f"d{i:03d}" for i in range(7)] + shared
                 + [f"e{i:03d}" for i in range(11)]),
        " ".join(f"a{i:03d}" for i in range(30)),
        " ".join(f"u{i:03d}" for i in range(25)),
        "tiny doc below gram length",
    ]
    return _write_docs(d, texts)


@pytest.mark.usefixtures("ray_session")
def test_substring_planted_coverage(substr_dir):
    assert SUBSTR_K == 8  # the expectations below are computed for K=8
    out = dedup_substring(substr_dir).set_index("doc_id")

    # exact copies: every gram duplicated, full token coverage
    for d in (0, 3):
        r = out.loc[d]
        assert r.n_tokens == 30 and r.n_grams == 23
        assert r.n_dup_grams == 23 and r.dup_tokens == 30
        assert r.dup_bp == 10000

    # shared 12-word passage: only the 12-8+1=5 fully-internal grams are
    # shared (boundary grams mix distinct context words), and their
    # interval union is exactly the 12-token passage
    for d, n_tok in ((1, 30), (2, 30)):
        r = out.loc[d]
        assert r.n_dup_grams == 5, r
        assert r.dup_tokens == 12, r
        assert r.dup_bp == 12 * 10000 // n_tok

    # unique doc and sub-K doc
    assert out.loc[4].n_dup_grams == 0 and out.loc[4].dup_bp == 0
    assert out.loc[5].n_tokens == 5 and out.loc[5].n_grams == 0
    assert out.loc[5].dup_bp == 0


@pytest.mark.usefixtures("ray_session")
def test_substring_modes_match(substr_dir):
    drv = dedup_substring(substr_dir, mode="driver")
    dst = dedup_substring(substr_dir, mode="distributed")
    pd.testing.assert_frame_equal(drv, dst)


@pytest.mark.usefixtures("ray_session")
def test_substring_no_duplicates(tmp_path):
    """All-distinct vocab: the dup-hash set is EMPTY -> the heal_blocks
    None-path must come back as all-zero coverage, not crash."""
    texts = [" ".join(f"w{j}x{i:03d}" for i in range(12)) for j in range(4)]
    d = _write_docs(tmp_path, texts)
    out = dedup_substring(d)
    assert len(out) == 4
    assert (out.n_dup_grams == 0).all() and (out.dup_bp == 0).all()
    assert (out.n_grams == 5).all()


@pytest.mark.usefixtures("ray_session")
def test_substring_empty_input(tmp_path):
    pq.write_table(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    out = dedup_substring(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_tokens", "n_grams",
                                 "n_dup_grams", "dup_tokens", "dup_bp"]
    assert all(str(t) == "int64" for t in out.dtypes)


@pytest.mark.usefixtures("ray_session")
def test_within_doc_repeat_straddling_block_split_not_double_counted(
        tmp_path):
    """Boundary-proofness (ADVICE r4): Ray splits map outputs at
    target_max_block_size at ARBITRARY row boundaries, so the two
    occurrences of a within-doc repeated gram can land in different
    batches of the doc-frequency pass. Global pair-distinctness must be
    re-established in the merge — a per-batch-only distinct would count
    n_docs=2 for a gram that lives in ONE doc and falsely mark it
    duplicated. The repeats here are separated by ~12k filler words
    (~290 KB of gram rows) and the block cap is forced down to 16 KiB, so
    the straddle is guaranteed."""
    from ray.data import DataContext

    rep = [f"rep{i:02d}" for i in range(SUBSTR_K)]
    filler = [f"fill{i:05d}" for i in range(12_000)]
    texts = [
        " ".join(rep + filler + rep),            # doc 0: repeat, far apart
        " ".join(f"other{i:04d}" for i in range(40)),   # doc 1: unrelated
    ]
    sf = _write_docs(tmp_path, texts)

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024
    try:
        for mode in ("driver", "distributed"):
            out = dedup_substring(sf, mode=mode)
            assert out["n_dup_grams"].sum() == 0, (mode, out)
            assert out["dup_tokens"].sum() == 0, (mode, out)
    finally:
        ctx.target_max_block_size = old
