"""Planted-document test for the corpus_curation gate cascade: one doc
per reject reason plus a kept doc and an exact duplicate, checking both
the reason precedence and the keep flags. (The SQL mirror test covers the
hash gate at sf0.01; this pins the semantics on hand-built docs.)"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def curation_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("curation")
    kept = (
        "words like these flow gently into the night and the quiet "
        "house is still while the lamps burn for hours in that hall"
    )  # en stopword hits, ~24 tokens, mean token len inside [380, 520]
    docs = [
        kept,                                    # 0: kept
        kept,                                    # 1: duplicate of 0
        "just five short words here",            # 2: too_short (< 20 tokens)
        " ".join(["words"] * 24) + " the and of to a in",  # 3: repetitive
        " ".join(
            ["zorp", "blix", "quux", "fimble", "drang"] * 5
        ),                                       # 4: language (pred 'und')
        " ".join(["supercalifragilistic"] * 25),  # 5: token_length (too long)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["src"] * len(docs), pa.string()),
            "n_chars": pa.array([len(x) for x in docs], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_curation_gate_cascade(curation_dir):
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines.text import (
        corpus_curation,
    )

    out = corpus_curation(curation_dir)
    reasons = dict(zip(out["doc_id"], out["reason"]))
    assert reasons[0] == "kept"
    assert reasons[1] == "duplicate"   # same md5, higher doc_id loses
    assert reasons[2] == "too_short"
    assert reasons[3] == "repetitive"  # top-word frac fires before language
    assert reasons[4] == "language"    # no stopword hits -> 'und'
    assert reasons[5] == "token_length"
    keep = dict(zip(out["doc_id"], out["keep"]))
    assert keep[0] and not any(keep[i] for i in range(1, 6))
    # signal columns are int64 (dtype-sensitive driver hash)
    for c in ("n_tokens", "mean_tok_len_c", "top_word_frac_bp"):
        assert str(out[c].dtype) == "int64"


@pytest.mark.usefixtures("ray_session")
def test_write_curated_partitioned_output(curation_dir, tmp_path):
    import pyarrow.dataset as pads

    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines.text import (
        write_curated,
    )

    out = str(tmp_path / "curated")
    res = write_curated(curation_dir, out)
    assert res["kept"] == 1 and res["rejected"] == 5
    got = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    assert list(got["doc_id"]) == [0]
    assert "text" in got.columns and "lang" in got.columns
    assert os.path.isdir(os.path.join(out, "lang=en"))  # hive layout
