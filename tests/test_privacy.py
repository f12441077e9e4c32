"""Privacy/contamination ops: shared-spec guards and edge cases.
The full hash gate vs DuckDB runs in test_queries_vs_duckdb.py; here we
pin (a) the engine gram kernel == the naive minted reference, (b) both
ops are NON-vacuous on the driver testdata, (c) empty-corpus typing."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines import (  # noqa: E402
    privacy,
)

SF_DIR = "/root/testdata/sf0.01"


def test_gram_kernel_matches_pinned_reference():
    """_batch_gram_sets (vectorized Arrow split + flat-array slicing) must
    equal _doc_grams (naive str.split), doc by doc — including whitespace
    runs, short docs, and empty text."""
    texts = ["a b c d e f g", "one two", "", "   ", "w "*20 + "end",
             "x\ty z\nx y z x y z", "solo solo solo solo solo solo"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = privacy._batch_gram_sets(t)
    want = [privacy._doc_grams(x) for x in texts]
    assert got == want
    chunked = pa.Table.from_batches(t.to_batches(max_chunksize=2))
    # chunk layout must not change per-doc sets
    assert privacy._batch_gram_sets(chunked) == want


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_non_vacuous():
    out = privacy.decontaminate(SF_DIR)
    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    assert len(out) == n_docs
    assert out["is_benchmark"].sum() > 0
    assert out["contaminated"].sum() >= 1  # measured: 4 docs at sf0.01
    # benchmark docs are never marked contaminated
    assert not (out["is_benchmark"] & out["contaminated"]).any()


@pytest.mark.usefixtures("ray_session")
def test_events_scrub_non_vacuous():
    out = privacy.events_scrub_ids(SF_DIR)
    assert (out["n_ids"] > 0).all()  # every props row carries a number
    assert not out["props_scrubbed"].str.contains(r"[0-9]").any()


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_empty_corpus(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())}),
        str(d / "documents.parquet"))
    out = privacy.decontaminate(str(d))
    assert len(out) == 0
    assert str(out["n_shared"].dtype) == "int64"
    assert str(out["contaminated"].dtype) == "bool"
