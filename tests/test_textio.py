"""Text/JSONL sources and sinks (sources/textio.py)."""

import os
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.sources import (  # noqa: E402
    textio,
)

SF = "/root/testdata/sf0.001"


def test_read_seed_list_validates_like_the_reference(tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text(
        "# comment\n"
        "\n"
        "example.com/a\n"            # scheme defaulted to https
        "http://host00.test/\n"      # kept as-is
        "https:///nohost\n"          # no host -> dropped
        "  http://pad.test/x  \n"    # whitespace stripped
    )
    seeds = textio.read_seed_list(str(p))
    assert seeds == [
        "https://example.com/a",
        "http://host00.test/",
        "http://pad.test/x",
    ]


@pytest.mark.usefixtures("ray_session")
def test_jsonl_roundtrip_documents(tmp_path):
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    out = str(tmp_path / "docs_jsonl")
    import ray.data as rd

    textio.write_jsonl(rd.from_pandas(docs), out)
    files = os.listdir(out)
    assert files and all(f.endswith(".json") for f in files)

    back = (
        textio.read_jsonl(out, columns=list(docs.columns))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        back, docs.sort_values("doc_id").reset_index(drop=True),
        check_dtype=True,
    )


@pytest.mark.usefixtures("ray_session")
def test_jsonl_source_feeds_a_pipeline(tmp_path):
    """A documents pipeline runs identically from parquet and JSONL."""
    import ray.data as rd

    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines import (
        text,
    )

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    out = str(tmp_path / "docs_jsonl")
    textio.write_jsonl(rd.from_pandas(docs), out)

    # token_counts reads {sf_dir}/documents.parquet — mirror its kernel
    # over the JSONL source and compare with the parquet-driven query
    from_parquet = text.token_counts(SF)
    ds = textio.read_jsonl(out, columns=["doc_id", "text"])
    from_jsonl = (
        ds.map_batches(text._token_count_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        from_jsonl, from_parquet.sort_values("doc_id").reset_index(drop=True),
        check_dtype=True,
    )


@pytest.mark.usefixtures("ray_session")
def test_csv_roundtrip_documents(tmp_path):
    import ray.data as rd

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    out = str(tmp_path / "docs_csv")
    textio.write_csv(rd.from_pandas(docs), out)
    files = os.listdir(out)
    assert files and all(f.endswith(".csv") for f in files)
    back = (
        textio.read_csv_table(out, columns=list(docs.columns))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        back, docs.sort_values("doc_id").reset_index(drop=True),
        check_dtype=True,
    )
