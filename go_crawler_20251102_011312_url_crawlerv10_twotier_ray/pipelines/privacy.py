"""Privacy / contamination ops for a training-data pipeline:

- ``events_scrub_ids``: pattern-based redaction of event logs (the PII-
  scrub shape: email + numeric-identifier patterns replaced by tokens,
  per-row redaction counts). Pure RE2 on both sides — pyarrow.compute
  and DuckDB share the regex engine, so the oracle is plain SQL.
- ``decontaminate``: benchmark-overlap decontamination (the GPT-3 appendix
  C shape: drop training docs sharing any word n-gram with an evaluation
  set). The "benchmark" here is the deterministic doc_id slice
  ``doc_id % DECONTAM_BENCH_MOD == 0`` — a stand-in for a held-out eval
  suite. Oracle: a pinned naive Python mint of the (doc_id, gram) table,
  joined relationally in DuckDB (the dedup_winnow_pairs pattern).

Scale notes (100 TB): the benchmark gram set is the SMALL side by
construction (eval suites are a few thousand documents) — it is collected
once, broadcast via ``ray.put`` as a SORTED int64 array of 64-bit gram
hashes (plasma zero-copy numpy; pickling a large Python set per actor is
the slow broadcast), and membership-checked with ``np.searchsorted``
inside ``map_batches`` — the heavy_hitters candidate-membership pattern
(relational.py). The training corpus streams and never shuffles. Hashing
both sides with the same 64-bit blake2b keeps counts identical to raw
string membership up to a ~n_bench·n_doc_grams/2^64 collision probability
(≈1e-5 even at sf0.1 scale) — the oracle hash gate measures this at 0.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

# --------------------------------------------------------------------------
# events_scrub_ids
# --------------------------------------------------------------------------

# RE2-compatible and semantically identical in DuckDB's regexp_replace
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
ID_PAT = r"[0-9]+"


def events_scrub_ids(sf_dir: str) -> pd.DataFrame:
    """Redact emails then numeric identifiers from the events props
    column (sequentially — id counting runs on the email-scrubbed text so
    digits inside an address are never double-counted). Vectorized RE2
    kernels straight off the Arrow buffers; the whole op is a single
    streaming map, no shuffle."""
    from ._schema import read_parquet_bounded

    ds = read_parquet_bounded(
        f"{sf_dir}/events.parquet", columns=["event_id", "props"])

    def scrub(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        props = t["props"]
        n_emails = pc.cast(
            pc.count_substring_regex(props, EMAIL_PAT), pa.int64())
        step1 = pc.replace_substring_regex(props, EMAIL_PAT, "<EMAIL>")
        n_ids = pc.cast(pc.count_substring_regex(step1, ID_PAT), pa.int64())
        scrubbed = pc.replace_substring_regex(step1, ID_PAT, "<ID>")
        return pa.table(
            {
                "event_id": t["event_id"],
                "props_scrubbed": scrubbed,
                "n_emails": n_emails,
                "n_ids": n_ids,
            }
        )

    return (
        ds.map_batches(scrub, batch_format="pyarrow")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


EVENTS_SCRUB_SQL = f"""
SELECT event_id,
       regexp_replace(regexp_replace(props, '{EMAIL_PAT}', '<EMAIL>', 'g'),
                      '{ID_PAT}', '<ID>', 'g') AS props_scrubbed,
       CAST(len(regexp_extract_all(props, '{EMAIL_PAT}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(
           regexp_replace(props, '{EMAIL_PAT}', '<EMAIL>', 'g'),
           '{ID_PAT}')) AS BIGINT) AS n_ids
FROM events
ORDER BY event_id
"""

# --------------------------------------------------------------------------
# decontaminate
# --------------------------------------------------------------------------

DECONTAM_N = 5            # word n-gram length (GPT-3 used 13; the tiny
                          # synthetic vocab needs 5 to stay non-vacuous)
DECONTAM_BENCH_MOD = 17   # doc_id % MOD == 0 -> "benchmark" doc
DECONTAM_ORACLE_VERSION = "v1"  # bump when N / MOD / tokenization changes


def _doc_grams(text: str) -> set[str]:
    """Pinned reference gram set: whitespace-split words, space-joined
    N-grams, distinct per doc. Shared spec between the engine kernel and
    the minted oracle (both sides MUST track this function)."""
    ws = text.split()
    n = DECONTAM_N
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def mint_decontam_oracle(
        sf_dir: str, base: str = "/tmp/graft_decontam_oracle") -> str:
    """Naive per-doc Python mint of the distinct (doc_id, gram) table —
    independent of the engine's vectorized kernel, pinned by
    DECONTAM_ORACLE_VERSION (the textops minting pattern). _SUCCESS-last."""
    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(base, f"{tag}-{DECONTAM_ORACLE_VERSION}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids, grams = [], []
    for d, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for g in sorted(_doc_grams(tx or "")):
            ids.append(d)
            grams.append(g)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "gram": pa.array(grams, pa.string())}),
        os.path.join(out, "ngrams.parquet"),
    )
    open(os.path.join(out, "_SUCCESS"), "w").close()
    return out


def _gram_hash64(g: str) -> int:
    """Stable 64-bit gram hash (blake2b-8, signed little-endian int64) —
    process/session-stable, shared by the benchmark and corpus sides."""
    return int.from_bytes(
        hashlib.blake2b(g.encode(), digest_size=8).digest(),
        "little", signed=True)


def _batch_gram_hash_arrays(t: pa.Table) -> list[np.ndarray]:
    """Per-doc DISTINCT gram-hash arrays for one batch (the broadcast
    membership form of _batch_gram_sets — same pinned gram spec)."""
    return [
        np.fromiter((_gram_hash64(g) for g in s), dtype=np.int64,
                    count=len(s))
        for s in _batch_gram_sets(t)
    ]


def _batch_gram_sets(t: pa.Table) -> list[set[str]]:
    """Engine-side per-doc gram sets for one batch: words via Arrow
    whitespace split (empty tokens dropped — Python str.split semantics),
    gram assembly over the flattened word array. The md5-free raw-string
    variant keeps the oracle comparison exact; see module docstring for
    the 64-bit-hash scale variant."""
    import numpy as np
    import pyarrow.compute as pc

    words = pc.utf8_split_whitespace(t["text"])
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "")
    keepnp = keep.to_numpy(zero_copy_only=False)
    wl = flat.filter(keep).to_pylist()
    parent = parent[keepnp]
    n = DECONTAM_N
    out: list[set[str]] = [set() for _ in range(len(t))]
    # per-doc slices over the flat word list (one pass; the join+set work
    # is inherently per-gram Python, like the md5 loops elsewhere)
    bounds = np.flatnonzero(np.diff(parent, prepend=-1, append=-2))
    for j in range(len(bounds) - 1):
        lo, hi = bounds[j], bounds[j + 1]
        if hi - lo < n:
            continue
        doc = int(parent[lo])
        ws = wl[lo:hi]
        out[doc] = {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}
    return out


def decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark-overlap decontamination over documents: mark every
    non-benchmark doc sharing ≥1 word N-gram with the benchmark slice.
    Benchmark grams are collected once (small side) and broadcast; the
    corpus streams through a single membership-check map — no shuffle."""
    from ._schema import read_parquet_bounded

    docs = read_parquet_bounded(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"])
    if docs.count() == 0:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "is_benchmark": pd.Series(dtype="bool"),
            "n_shared": pd.Series(dtype="int64"),
            "contaminated": pd.Series(dtype="bool"),
        })

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % DECONTAM_BENCH_MOD == 0))
        arrs = _batch_gram_hash_arrays(sub)
        flat = (np.unique(np.concatenate(arrs)) if arrs
                else np.zeros(0, np.int64))
        return pa.table({"gh": pa.array(flat, pa.int64())})

    # SMALL side: eval suites are tiny by construction — distinct gram
    # hashes collect to the driver once and broadcast as ONE sorted int64
    # array (plasma zero-copy; searchsorted membership in the hot map)
    bench_tbl = (
        docs.map_batches(bench_grams, batch_format="pyarrow").to_pandas()
    )
    bench_arr = np.unique(bench_tbl["gh"].to_numpy(dtype=np.int64))
    bench_ref = ray.put(bench_arr)

    def check(t: pa.Table) -> pa.Table:
        a = ray.get(bench_ref)  # sorted int64 hash array (zero-copy)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        is_bench = (ids % DECONTAM_BENCH_MOD) == 0
        arrs = _batch_gram_hash_arrays(t)
        lens = np.fromiter((len(x) for x in arrs), np.int64,
                           count=len(arrs))
        flat = (np.concatenate(arrs) if len(arrs)
                else np.zeros(0, np.int64))
        doc_idx = np.repeat(np.arange(len(arrs)), lens)
        if len(a) and len(flat):
            pos = np.searchsorted(a, flat)
            pos[pos >= len(a)] = 0
            hit = a[pos] == flat
        else:
            hit = np.zeros(len(flat), bool)
        n_shared = np.bincount(doc_idx[hit], minlength=len(ids)).astype(
            np.int64)
        n_shared[is_bench] = 0
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "is_benchmark": pa.array(is_bench, pa.bool_()),
                "n_shared": pa.array(n_shared, pa.int64()),
                "contaminated": pa.array(
                    (~is_bench) & (n_shared > 0), pa.bool_()),
            }
        )

    return (
        docs.map_batches(check, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def decontam_sql(oracle_dir: str) -> str:
    """DuckDB oracle: derive the contamination decisions relationally
    from the MINTED naive (doc_id, gram) table (engine-independent)."""
    path = os.path.join(oracle_dir, "ngrams.parquet")
    return f"""
WITH grams AS (SELECT doc_id, gram FROM read_parquet('{path}')),
bench AS (SELECT DISTINCT gram FROM grams
          WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
shared AS (SELECT g.doc_id, count(DISTINCT g.gram) AS cnt
           FROM grams g JOIN bench b USING (gram)
           WHERE g.doc_id % {DECONTAM_BENCH_MOD} <> 0
           GROUP BY g.doc_id)
SELECT d.doc_id,
       d.doc_id % {DECONTAM_BENCH_MOD} = 0 AS is_benchmark,
       CAST(coalesce(s.cnt, 0) AS BIGINT) AS n_shared,
       (d.doc_id % {DECONTAM_BENCH_MOD} <> 0
        AND coalesce(s.cnt, 0) > 0) AS contaminated
FROM documents d LEFT JOIN shared s USING (doc_id)
ORDER BY d.doc_id
"""
