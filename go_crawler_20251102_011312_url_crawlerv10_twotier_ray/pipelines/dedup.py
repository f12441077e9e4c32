"""Deduplication pipelines over the ``documents`` table — the training-data
operators a 100 TB text pipeline needs.

Patterns (scale-first):
- exact dedup: content-hash in a vectorized map_batches, PARTIAL combine per
  batch (hash → min id, count), then a small groupby over partials — the
  pre-aggregation pattern that keeps the shuffle tiny;
- MinHash+LSH near-dup: shingle → signature per batch → explode to
  (band_key, doc_id) rows → groupby(band_key) buckets → candidate pairs →
  exact Jaccard verify. Only band-collision rows shuffle, never the text;
- SimHash: 64-bit signatures, banded into 4×16-bit tables for ≤3-bit
  Hamming candidates, verified exactly;
- embedding near-dup: cosine ≥ threshold pairs via blocked numpy matmul
  against a broadcast matrix (O(n²) inside the block, no Python loops).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# exact dedup — hash + partial combine + groupby (SQL-checkable)
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """One row per distinct text: keeper doc_id (min) + duplicate count.
    Grouping key is md5(text) — exact, and shuffles 16 bytes/row instead of
    the text."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "h": [hashlib.md5(x.encode()).hexdigest()
                      for x in t["text"].to_pylist()],
                "doc_id": t["doc_id"].to_pylist(),
            }
        )
        g = df.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "min"), n=("doc_id", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"), Sum("n", alias_name="n_dupes"))
        .to_pandas()
        .rename(columns={"h": "text_md5"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out[["doc_id", "text_md5", "n_dupes"]]


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, md5(text) AS text_md5, count(*) AS n_dupes
FROM documents GROUP BY md5(text) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

N_PERM = 128
N_BANDS = 32  # 32 bands × 4 rows: catches Jaccard ≳ 0.5
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5
MINHASH_SEED = 12345


class MinHashSignatures:
    """Per-batch shingle+minhash (permutation params built once per actor)."""

    def __init__(self):
        from ..functions.hashing import _perm_params

        self.a, self.b = _perm_params(N_PERM, MINHASH_SEED)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.hashing import band_keys, minhash_signature, shingles

        ids, bands = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = minhash_signature(shingles(text, SHINGLE_K), self.a, self.b)
            for bk in band_keys(sig, N_BANDS):
                ids.append(doc_id)
                bands.append(bk)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "band": pa.array(bands, pa.string())}
        )


def dedup_minhash_lsh(sf_dir: str) -> pd.DataFrame:
    """Candidate near-dup pairs from LSH band buckets, verified with exact
    shingle Jaccard. Returns (doc_a, doc_b, jaccard_pct) with doc_a < doc_b.
    Not SQL-expressible → rows-only driver check; pytest covers semantics on
    planted near-duplicates."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(MinHashSignatures, batch_format="pyarrow",
                          batch_size=256, concurrency=(2, 8)).materialize()
    # (materialized: both the count shuffle and the collision filter below
    # consume it — without this the signature stage would run twice)

    # Bands are overwhelmingly singletons: a map_groups over every band
    # would pay one Python call per band. Instead: C-speed count shuffle →
    # broadcast the (small) hot-band set → filter sig rows to collisions →
    # pairs from the collision rows only (≪ corpus size).
    from ray.data.aggregate import Count

    counts = sigs.groupby("band").aggregate(Count(alias_name="n")).to_pandas()
    hot = set(counts[counts["n"] > 1]["band"])
    if not hot:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard_pct": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard_pct": "int64"}
        )
    hot_ref = ray.put(hot)

    def keep_hot(t: pa.Table) -> pa.Table:
        from ..stages.fetch import cached_broadcast

        hs = cached_broadcast(hot_ref)
        mask = pa.array([b in hs for b in t["band"].to_pylist()])
        return t.filter(mask)

    coll = sigs.map_batches(keep_hot, batch_format="pyarrow").to_pandas()
    pairs = []
    for _, g in coll.groupby("band"):
        ids = sorted(set(g["doc_id"]))
        if len(ids) < 2 or len(ids) > 200:  # skip degenerate giant buckets
            continue
        pairs.extend(
            (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
        )
    cand = pd.DataFrame(pairs, columns=["doc_a", "doc_b"]).drop_duplicates()
    if not len(cand):
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard_pct": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard_pct": "int64"}
        )

    # verify: fetch the texts of candidate docs (small set) and compute
    # exact shingle Jaccard
    need = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    need_set = set(need)

    def keep_needed(t: pa.Table) -> pa.Table:
        mask = pa.array([i in need_set for i in t["doc_id"].to_pylist()])
        return t.filter(mask)

    texts_df = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(keep_needed, batch_format="pyarrow")
        .to_pandas()
    )
    texts = dict(zip(texts_df["doc_id"], texts_df["text"]))
    from ..functions.hashing import jaccard, shingles

    sh = {i: shingles(texts[i], SHINGLE_K) for i in need}
    rows = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        j = jaccard(sh[a], sh[b])
        if j >= JACCARD_THRESHOLD:
            rows.append((int(a), int(b), int(round(j * 100))))
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_pct"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard_pct": "int64"}
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.3) -> pd.DataFrame:
    """All-pairs word-shingle Jaccard WITHIN each ``source`` group (bounded
    blocking key → no quadratic blowup across the corpus; the unblocked
    scale path is dedup_minhash_lsh). Returns pairs with Jaccard ≥
    threshold. Rows-only check; exactness covered by the planted-duplicate
    tests."""
    from ..functions.hashing import jaccard, shingles

    ds = _docs(sf_dir, ["doc_id", "text", "source"])

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        sh = [shingles(t, SHINGLE_K) for t in g["text"]]
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = jaccard(sh[i], sh[j])
                if jac >= threshold:
                    rows.append((int(ids[i]), int(ids[j]), int(round(jac * 100))))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_pct"])

    out = (
        ds.groupby("source")
        .map_groups(per_group, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard_pct": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard_pct": "int64"}
        )
    return out.astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard_pct": "int64"}
    ).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

SIMHASH_MAX_HAMMING = 3


def dedup_simhash(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3 over 64-bit signatures).
    Bands of 16 bits → a pair within Hamming 3 collides on ≥1 of 4 bands
    (pigeonhole); candidates verified exactly. Rows-only check."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def sigs(t: pa.Table) -> pa.Table:
        from ..functions.hashing import simhash64

        ids = t["doc_id"].to_pylist()
        hs = [simhash64(x) for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "sig": pa.array(hs, pa.uint64())}
        )

    sig_df = ds.map_batches(sigs, batch_format="pyarrow").to_pandas()
    sig_map = dict(zip(sig_df["doc_id"], sig_df["sig"]))

    # band explode driver-side is fine here (4 rows per doc); at scale this
    # is the same explode→groupby pattern as MinHash-LSH
    rows = []
    for doc_id, s in sig_map.items():
        for b in range(4):
            rows.append(((b, (int(s) >> (16 * b)) & 0xFFFF), doc_id))
    buckets: dict = {}
    for key, doc_id in rows:
        buckets.setdefault(key, []).append(doc_id)
    from ..functions.hashing import hamming64

    seen_pairs = set()
    out = []
    for ids in buckets.values():
        if len(ids) < 2:
            continue
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if (a, b) in seen_pairs:
                    continue
                seen_pairs.add((a, b))
                d = hamming64(int(sig_map[a]), int(sig_map[b]))
                if d <= SIMHASH_MAX_HAMMING:
                    out.append((int(a), int(b), d))
    return (
        pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])
        .astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

EMB_DUP_THRESHOLD = 0.95


def dedup_embedding_cosine(sf_dir: str) -> pd.DataFrame:
    """Pairs with cosine ≥ 0.95 over the embeddings table. Each batch is
    compared against the full broadcast matrix with one float64 matmul
    (the brute-force scale path is blocked matmul; an LSH-bucketed variant
    lives in pipelines/ann.py). Rows-only check (float pair set)."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    full = ds.to_pandas()
    ids = full["vec_id"].to_numpy()
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids, matn))

    class Block:
        def __init__(self, r):
            self.ids, self.matn = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            bids = np.asarray(t["vec_id"].to_pylist())
            bm = np.stack([np.asarray(v, dtype=np.float64)
                           for v in t["embedding"].to_pylist()])
            bn = np.linalg.norm(bm, axis=1)
            bn[bn == 0] = 1.0
            sims = (bm / bn[:, None]) @ self.matn.T
            ai, bj = np.nonzero(sims >= EMB_DUP_THRESHOLD)
            a = bids[ai]
            b = self.ids[bj]
            keep = a < b
            return pa.table(
                {
                    "vec_a": pa.array(a[keep].astype(np.int64)),
                    "vec_b": pa.array(b[keep].astype(np.int64)),
                    "cos_pct": pa.array(
                        np.rint(sims[ai, bj][keep] * 1000).astype(np.int64)
                    ),
                }
            )

    out = ds.map_batches(
        Block, fn_constructor_args=(ref,), batch_format="pyarrow",
        batch_size=256, concurrency=2,
    ).to_pandas()
    if not len(out):
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_pct": []}).astype(
            {"vec_a": "int64", "vec_b": "int64", "cos_pct": "int64"}
        )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
