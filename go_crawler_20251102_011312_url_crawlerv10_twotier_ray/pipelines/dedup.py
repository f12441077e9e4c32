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
    from ._schema import read_parquet_bounded

    return read_parquet_bounded(f"{sf_dir}/documents.parquet",
                                columns=columns)


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
    """Whole-batch shingle+minhash+banding — every step vectorized
    (functions/hashing.py: memoized word hashes, one affine matrix +
    segment minima for the signatures, int64 band keys)."""

    def __init__(self):
        from ..functions.hashing import _perm_params

        self.a, self.b = _perm_params(N_PERM, MINHASH_SEED)

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.hashing import (
            band_keys_matrix,
            minhash_matrix,
            shingles,
        )

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        shs = [shingles(x, SHINGLE_K) for x in t["text"].to_pylist()]
        sig = minhash_matrix(shs, self.a, self.b)
        bands = band_keys_matrix(sig, N_BANDS)  # (n_docs, N_BANDS) int64
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, N_BANDS), pa.int64()),
                "band": pa.array(bands.reshape(-1), pa.int64()),
            }
        )


_EMPTY_PAIRS = {"doc_a": "int64", "doc_b": "int64", "jaccard_pct": "int64"}


_PAIR_BUCKET_CAP = 200  # skip degenerate giant buckets (boilerplate bands)


def _pairs_in_partition(g: pd.DataFrame, key: str, id_col: str,
                        out_a: str, out_b: str, cap: int) -> pd.DataFrame:
    """All (a < b) within-bucket pairs for EVERY bucket in one hash
    partition, fully vectorized (no per-bucket Python — the sessionize
    co-partition pattern, relational.py; called per PARTITION from
    groupby(part).map_groups after a hash(key)-mod part column is stamped
    in map_batches). CLAUDE.md: never map_groups per key at scale — with
    millions of hot buckets this is one numpy pass instead of one
    interpreter call per bucket."""
    empty = pd.DataFrame({out_a: [], out_b: []}).astype(
        {out_a: "int64", out_b: "int64"})
    g = g[[key, id_col]].drop_duplicates().sort_values(
        [key, id_col], kind="mergesort")
    sizes = g.groupby(key, sort=False)[id_col].transform("size")
    g = g[(sizes > 1) & (sizes <= cap)]
    if not len(g):
        return empty
    band = g[key].to_numpy()
    ids = g[id_col].to_numpy(dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, band[1:] != band[:-1]])
    counts = np.diff(np.r_[starts, len(band)])
    pos = np.arange(len(band)) - np.repeat(starts, counts)
    n_after = np.repeat(counts, counts) - pos - 1
    a_idx = np.repeat(np.arange(len(band)), n_after)
    cum = np.concatenate([[0], np.cumsum(n_after)])
    offset = np.arange(cum[-1]) - np.repeat(cum[:-1], n_after) + 1
    b_idx = a_idx + offset
    return pd.DataFrame({out_a: ids[a_idx], out_b: ids[b_idx]})


def _emit_pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
    return _pairs_in_partition(g, "band", "doc_id", "doc_a", "doc_b",
                               _PAIR_BUCKET_CAP)


def _emit_vec_pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
    return _pairs_in_partition(g, "bucket", "vec_id", "vec_a", "vec_b",
                               _EMB_BUCKET_CAP)


from ._schema import n_parts as _n_parts  # noqa: E402 — shared sizing rule


def _emit_pairs_dedup(g: pd.DataFrame) -> pa.Table:
    # within-partition pair dedup (one pair can collide in several keys of
    # the same partition); cross-partition duplicates are the consumer's.
    # Arrow return: map_groups' pandas blocks lose schema when empty and
    # degrade downstream Projects/joins/aggregates — Arrow blocks don't.
    return pa.Table.from_pandas(
        _emit_pairs_partition(g).drop_duplicates(), preserve_index=False)


def _emit_vec_pairs_dedup(g: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(
        _emit_vec_pairs_partition(g).drop_duplicates(), preserve_index=False)


def _stamp_pair_part(n_part: int, a_col: str, b_col: str):
    """map_batches fn adding ``part = mix(a, b) % n_part`` — the
    co-partition key for per-PAIR merges (cross-partition dedup /
    partial-count sums)."""

    def stamp(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (
            b * np.uint64(0xC2B2AE3D27D4EB4F))
        part = (mix >> np.uint64(33)) % np.uint64(n_part)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    return stamp


def _dedup_pairs_coparted(cand: "rd.Dataset", a_col: str,
                          b_col: str) -> "rd.Dataset":
    """Collapse cross-partition duplicate pairs: hash(pair) co-partition +
    one vectorized drop_duplicates per partition. Ray's native multi-key
    ``groupby([a, b]).aggregate`` is NOT usable here: fed the
    pandas-format, empty-block-laced output of a groupby().map_groups
    stage it degrades ~20× (measured 45 s for a 70k-row pair table vs
    0.24 s for this shape; clean Arrow blocks take 2.7 s — still 10×)."""
    n_part = _n_parts(cand.count())

    def drop_dup(g: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            g[[a_col, b_col]].drop_duplicates(), preserve_index=False)

    return (
        cand.map_batches(_stamp_pair_part(n_part, a_col, b_col),
                         batch_format="pyarrow")
        .groupby("part").map_groups(drop_dup, batch_format="pandas")
        .materialize()
    )


def _unique_ids_collect(cand: "rd.Dataset", a_col: str,
                        b_col: str) -> np.ndarray:
    """Distinct ids over a pair Dataset's two columns WITHOUT collecting
    the pair table: per-block unique inside one map (each block's output
    is bounded by its distinct ids), then a driver np.unique over the
    per-block results — ids-only ever reach the driver, and the Dataset
    union+unique exchange this replaces is gone."""

    def block_ids(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate(
            [t[a_col].to_numpy(zero_copy_only=False).astype(np.int64),
             t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)]))
        return pa.table({"id": pa.array(u, pa.int64())})

    ids = cand.map_batches(block_ids, batch_format="pyarrow").to_pandas()
    if "id" not in ids.columns:  # all-empty Dataset → zero-column frame
        return np.array([], dtype=np.int64)
    return np.unique(ids["id"].to_numpy(np.int64))


def _coparted_pairs(sig_ds: "rd.Dataset", key_col: str, emit_fn,
                    n_rows: int) -> "rd.Dataset":
    """Candidate pairs in ONE all-to-all: stamp ``part = hash(key)`` and
    run the vectorized pair-gen once per partition. Hash co-location puts
    EVERY row of a key in one partition, so partition-local collision
    detection (and the bucket cap) is already GLOBAL — the hot-key count
    shuffle + filter pass this tail paid through r4 was a second
    all-to-all over the same rows for nothing (measured 2.4 s of the
    minhash_dist row's 6.8 s at sf0.1). The kernel dedups pairs within its
    partition; cross-partition duplicates (one pair colliding in keys that
    hash apart — at most bands-per-doc of them) are collapsed by the
    consumer's _dedup_pairs_coparted pass before any verify work."""
    n_part = _n_parts(n_rows)
    return (
        sig_ds.map_batches(_stamp_band_part(n_part, col=key_col),
                           batch_format="pyarrow")
        .groupby("part").map_groups(emit_fn, batch_format="pandas")
        .materialize()
    )


def _stamp_band_part(n_part: int, col: str = "band"):
    """map_batches fn adding ``part = mix(key) % n_part`` — the
    co-partition key for the vectorized pair-gen (splitmix-style odd
    multiplier so low-entropy band values still spread)."""

    def stamp(t: pa.Table) -> pa.Table:
        band = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((band * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(n_part)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    return stamp


def _pairs_from_collisions(coll: pd.DataFrame) -> pd.DataFrame:
    """Unique candidate (doc_a, doc_b) pairs from collision rows (driver
    tail) — the same vectorized kernel the distributed partitions run."""
    return _emit_pairs_partition(coll).drop_duplicates().reset_index(
        drop=True)


def _packed_shingles_ds(sf_dir: str, need_ref) -> "rd.Dataset":
    """(doc_id, byte-packed unique shingle set) for the broadcast id set —
    computed where the texts live; texts never leave the workers."""
    import pyarrow.compute as pc

    def doc_shingles(t: pa.Table) -> pa.Table:
        from ..functions.hashing import shingles
        from ..stages.fetch import cached_broadcast

        t = t.filter(
            pc.is_in(t["doc_id"], value_set=cached_broadcast(need_ref))
        )
        shs = [shingles(x, SHINGLE_K) for x in t["text"].to_pylist()]
        # byte-packed uint64 sets: hash joins don't take list payloads
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sh": pa.array(
                    [np.unique(s).tobytes() for s in shs], pa.binary()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        doc_shingles, batch_format="pyarrow"
    )


def _verify_pairs_table(t: pa.Table) -> pa.Table:
    """(doc_a, doc_b, sh_a, sh_b) rows -> verified pairs ≥ threshold."""
    rows = []
    for a, b, sa, sb in zip(
        t["doc_a"].to_pylist(), t["doc_b"].to_pylist(),
        t["sh_a"].to_pylist(), t["sh_b"].to_pylist(),
    ):
        sa = np.frombuffer(sa, dtype=np.uint64)
        sb = np.frombuffer(sb, dtype=np.uint64)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        jac = (inter / union) if union else 1.0
        if jac >= JACCARD_THRESHOLD:
            rows.append((a, b, int(round(jac * 100))))
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard_pct": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# below this many (doc, band) rows the whole LSH tail runs on the driver:
# Ray's hash-shuffle floor (~2 s/op on this box) dwarfs 0.03 s of pandas.
# 5M rows ≈ 80 MB — comfortably driver-sized; past it, every step stays
# distributed (count shuffle → map_groups pair-gen → join verify).
MINHASH_SMALL_LIMIT = 5_000_000
# distributed tail: the verify side broadcasts the packed-shingle table
# (index_in gather in one map) instead of two hash-join exchanges when BOTH
# the candidate-doc count and the table's actual BYTES are small; above
# either bound the join twin runs (equality-tested by forcing the limit to
# 0 in tests). The byte bound is the binding one — broadcast cost is the
# shingle payload (driver concat + ray.put + one plasma copy), not the doc
# count, and 500k docs × a few KB of shingles each is multi-GB.
MINHASH_VERIFY_BROADCAST_LIMIT = 500_000
MINHASH_VERIFY_BROADCAST_BYTES = 256 * 1024 * 1024


def dedup_minhash_lsh(sf_dir: str, mode: str = "auto") -> pd.DataFrame:
    """Candidate near-dup pairs from LSH band buckets, verified with exact
    shingle Jaccard. Returns (doc_a, doc_b, jaccard_pct) with doc_a < doc_b.

    Size-adaptive after the (always distributed, always vectorized)
    signature stage, keyed on the band-table row count — ``mode`` forces
    ``"driver"`` or ``"distributed"`` (tests cover both):

    - driver tail (small inputs): band table (16 B/row) → value_counts →
      pair-gen → verify against worker-computed packed shingle sets.
    - distributed tail (the 100 TB path): ONE hash(band) co-partition
      exchange feeding the vectorized pair-gen (partition-local collisions
      are global under co-location — no separate hot-band count shuffle),
      then exact-Jaccard verify: broadcast index_in gather below the size
      gates, Dataset.join against a (doc_id, packed shingles) candidate
      table above (pairs deduped ahead of the joins).
    Not SQL-expressible → rows-only driver check; pytest covers semantics
    on planted near-duplicates for BOTH modes."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    from ._schema import auto_pool

    sigs = ds.map_batches(MinHashSignatures, batch_format="pyarrow",
                          batch_size=256,
                          concurrency=auto_pool()).materialize()
    # (materialized: the size probe and whichever tail runs both reuse it)

    distributed = mode == "distributed" or (
        mode == "auto" and sigs.count() > MINHASH_SMALL_LIMIT
    )

    if not distributed:
        df = sigs.to_pandas()
        vc = df["band"].value_counts()
        coll = df[df["band"].isin(vc[vc > 1].index)]
        cand = _pairs_from_collisions(coll)
        if not len(cand):
            return pd.DataFrame(columns=list(_EMPTY_PAIRS)).astype(_EMPTY_PAIRS)
        need = np.unique(np.concatenate([cand["doc_a"], cand["doc_b"]]))
        need_ref = ray.put(pa.array(need, pa.int64()))
        sh_df = _packed_shingles_ds(sf_dir, need_ref).to_pandas()
        sh = dict(zip(sh_df["doc_id"], sh_df["sh"]))
        verified = _verify_pairs_table(
            pa.table(
                {
                    "doc_a": pa.array(cand["doc_a"], pa.int64()),
                    "doc_b": pa.array(cand["doc_b"], pa.int64()),
                    "sh_a": pa.array([sh[a] for a in cand["doc_a"]], pa.binary()),
                    "sh_b": pa.array([sh[b] for b in cand["doc_b"]], pa.binary()),
                }
            )
        )
        out = verified.to_pandas()
        if not len(out):
            return pd.DataFrame(columns=list(_EMPTY_PAIRS)).astype(_EMPTY_PAIRS)
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    # ---- distributed tail ----
    # exchange 1: hash(band) co-partition + per-partition vectorized
    # pair-gen (partition-local collisions ARE global under co-location;
    # see _coparted_pairs). exchange 2: hash(pair) co-partitioned dedup of
    # the cross-partition duplicates — ≤ N_BANDS per pair, but precisely
    # the TRUE near-dups collide in many bands, so a dup-inflated verify
    # would repeat the shingle work for every winner.
    cand = _coparted_pairs(sigs, "band", _emit_pairs_dedup, sigs.count())
    if cand.count() == 0:
        return pd.DataFrame(columns=list(_EMPTY_PAIRS)).astype(_EMPTY_PAIRS)
    cand = _dedup_pairs_coparted(cand, "doc_a", "doc_b")

    # verify: shingle sets for candidate docs only (ids-only reach the
    # driver via per-block unique — the pair table never collects; the
    # TEXTS never leave the workers)
    need_ids = _unique_ids_collect(cand, "doc_a", "doc_b")
    need_ref = ray.put(pa.array(need_ids, pa.int64()))
    # shingle sets for the candidate ids — computed where the texts live,
    # materialized ONCE and consumed by whichever verify twin runs (the
    # materialized size is also what the broadcast gate must bound: the
    # cost of the broadcast is shingle BYTES, not candidate-doc count)
    sh_ds = _packed_shingles_ds(sf_dir, need_ref).materialize()
    if (len(need_ids) <= MINHASH_VERIFY_BROADCAST_LIMIT
            and sh_ds.size_bytes() <= MINHASH_VERIFY_BROADCAST_BYTES):
        # candidate-doc shingle table fits a broadcast: attach sh_a/sh_b
        # by index_in gather inside ONE distributed map over the pair
        # Dataset — replaces two hash-join exchanges whose fixed cost
        # (~2.8 s at sf0.1) dwarfs a few hundred pairs. Above the limit
        # the join twin below is the shape that scales (equality-tested).
        sh_tbl = pa.concat_tables(
            [t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
             for t in ray.get(sh_ds.to_arrow_refs())]
        ).combine_chunks()
        sh_ref = ray.put(sh_tbl)

        def attach_and_verify(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc2

            from ..stages.fetch import cached_broadcast

            sh = cached_broadcast(sh_ref)
            ia = pc2.index_in(t["doc_a"], value_set=sh["doc_id"])
            ib = pc2.index_in(t["doc_b"], value_set=sh["doc_id"])
            t = t.append_column("sh_a", sh["sh"].take(ia))
            t = t.append_column("sh_b", sh["sh"].take(ib))
            return _verify_pairs_table(t)

        out = cand.map_batches(
            attach_and_verify, batch_format="pyarrow").to_pandas()
    else:
        n_part = _n_parts(cand.count())
        j1 = cand.join(
            sh_ds.rename_columns({"doc_id": "doc_a", "sh": "sh_a"}),
            join_type="inner", num_partitions=n_part, on=("doc_a",),
        )
        j2 = j1.join(
            sh_ds.rename_columns({"doc_id": "doc_b", "sh": "sh_b"}),
            join_type="inner", num_partitions=n_part, on=("doc_b",),
        )
        out = j2.map_batches(
            _verify_pairs_table, batch_format="pyarrow").to_pandas()
    if not len(out):
        return pd.DataFrame(columns=list(_EMPTY_PAIRS)).astype(_EMPTY_PAIRS)
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
SIMHASH_BANDS = 4  # 16-bit bands: Hamming ≤ 3 collides on ≥1 band (pigeonhole)

_EMPTY_SIMHASH = {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}


class SimHashSignatures:
    """Whole-batch SimHash signatures (functions/hashing.simhash_matrix:
    memoized word hashes + one reduceat; bit-identical to the per-doc
    simhash64 reference)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.hashing import simhash_matrix

        sig = simhash_matrix(t["text"].to_pylist())
        return pa.table(
            {"doc_id": t["doc_id"],
             "sig": pa.array(sig, pa.uint64())}
        )


def _simhash_bands(t: pa.Table) -> pa.Table:
    """Explode each 64-bit signature into SIMHASH_BANDS (band | value)
    int64 keys — the same explode→groupby(band) shape as MinHash-LSH."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    s = t["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
    bands = np.arange(SIMHASH_BANDS, dtype=np.uint64)
    vals = (s[:, None] >> (bands * np.uint64(16))[None, :]) & np.uint64(0xFFFF)
    keys = (vals | (bands[None, :] << np.uint64(48))).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, SIMHASH_BANDS), pa.int64()),
            "band": pa.array(keys.reshape(-1), pa.int64()),
        }
    )


def _simhash_verify(t: pa.Table) -> pa.Table:
    """(doc_a, doc_b, sig_a, sig_b) → pairs with Hamming ≤ max (vectorized
    XOR popcount)."""
    from ..functions.hashing import hamming64_array

    a = t["doc_a"].to_numpy(zero_copy_only=False)
    b = t["doc_b"].to_numpy(zero_copy_only=False)
    d = hamming64_array(
        t["sig_a"].to_numpy(zero_copy_only=False),
        t["sig_b"].to_numpy(zero_copy_only=False),
    )
    keep = d <= SIMHASH_MAX_HAMMING
    return pa.table(
        {
            "doc_a": pa.array(a[keep].astype(np.int64)),
            "doc_b": pa.array(b[keep].astype(np.int64)),
            "hamming": pa.array(d[keep]),
        }
    )


def dedup_simhash(sf_dir: str, mode: str = "auto") -> pd.DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3 over 64-bit signatures),
    16-bit-banded for candidates, verified exactly. Rows-only check.

    Same size-adaptive tail as dedup_minhash_lsh, keyed on the
    (doc, band) row count: driver tail below MINHASH_SMALL_LIMIT (the band
    table is 16 B/row and the sig table 16 B/doc), distributed tail above
    (ONE hash(band) co-partition exchange feeding the vectorized pair-gen
    → pair-dedup groupby → verify via two signature joins — signatures,
    never texts, move)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    from ._schema import auto_pool

    sigs = ds.map_batches(SimHashSignatures, batch_format="pyarrow",
                          batch_size=256,
                          concurrency=auto_pool()).materialize()
    band_ds = sigs.map_batches(_simhash_bands, batch_format="pyarrow")

    distributed = mode == "distributed" or (
        mode == "auto"
        and sigs.count() * SIMHASH_BANDS > MINHASH_SMALL_LIMIT
    )

    if not distributed:
        band_df = band_ds.to_pandas()
        vc = band_df["band"].value_counts()
        coll = band_df[band_df["band"].isin(vc[vc > 1].index)]
        cand = _pairs_from_collisions(coll)
        if not len(cand):
            return pd.DataFrame(columns=list(_EMPTY_SIMHASH)).astype(_EMPTY_SIMHASH)
        sig_df = sigs.to_pandas()
        sig_map = dict(zip(sig_df["doc_id"], sig_df["sig"]))
        out = _simhash_verify(
            pa.table(
                {
                    "doc_a": pa.array(cand["doc_a"], pa.int64()),
                    "doc_b": pa.array(cand["doc_b"], pa.int64()),
                    "sig_a": pa.array(
                        [sig_map[a] for a in cand["doc_a"]], pa.uint64()),
                    "sig_b": pa.array(
                        [sig_map[b] for b in cand["doc_b"]], pa.uint64()),
                }
            )
        ).to_pandas()
        if not len(out):
            return pd.DataFrame(columns=list(_EMPTY_SIMHASH)).astype(_EMPTY_SIMHASH)
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    # ---- distributed tail ----
    # ONE co-partition exchange for pair-gen (see _coparted_pairs), then a
    # pair-hash co-partitioned dedup collapsing cross-partition duplicates
    # ahead of the signature joins (dup rows would multiply through both)
    cand = _coparted_pairs(band_ds, "band", _emit_pairs_dedup,
                           sigs.count() * SIMHASH_BANDS)
    if cand.count() == 0:
        return pd.DataFrame(columns=list(_EMPTY_SIMHASH)).astype(_EMPTY_SIMHASH)
    cand = _dedup_pairs_coparted(cand, "doc_a", "doc_b")

    n_part = _n_parts(cand.count())
    j1 = cand.join(
        sigs.rename_columns({"doc_id": "doc_a", "sig": "sig_a"}),
        join_type="inner", num_partitions=n_part, on=("doc_a",),
    )
    j2 = j1.join(
        sigs.rename_columns({"doc_id": "doc_b", "sig": "sig_b"}),
        join_type="inner", num_partitions=n_part, on=("doc_b",),
    )
    out = j2.map_batches(_simhash_verify, batch_format="pyarrow").to_pandas()
    if not len(out):
        return pd.DataFrame(columns=list(_EMPTY_SIMHASH)).astype(_EMPTY_SIMHASH)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

EMB_DUP_THRESHOLD = 0.95
# exact mode broadcasts the reference matrix in chunks of this many rows —
# bounds per-node plasma footprint at any corpus size (the exact all-pairs
# compare is inherently O(n²) work; LSH mode below is the near-dup path)
EMB_CHUNK_ROWS = 500_000
_EMB_BANDS = 12   # bands per signature
_EMB_PLANES = 12  # hyperplanes per band: recall ≈ 0.98 at cos ≥ 0.95

_EMPTY_EMB = {"vec_a": "int64", "vec_b": "int64", "cos_pct": "int64"}


def _emb_ds(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _norm_rows(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    from .ann import _emb_rows

    ids, m = _emb_rows(t)
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return ids, m / n[:, None]


def dedup_embedding_cosine(
    sf_dir: str, threshold: float = EMB_DUP_THRESHOLD, method: str = "auto",
    mode: str = "auto",
) -> pd.DataFrame:
    """(vec_a, vec_b, cos_pct) pairs with cosine ≥ threshold, vec_a < vec_b.

    - ``exact``: blocked matmul — the reference side is broadcast in
      ≤EMB_CHUNK_ROWS chunks (never the whole matrix at once), each batch
      does one float64 matmul per chunk. Exact → SQL-checkable against a
      DuckDB self-join; the all-pairs work is inherent to exactness.
    - ``lsh``: banded random-hyperplane buckets (the MinHash-LSH shape:
      explode → bucket groupby → candidate pairs → exact verify); only
      bucket collisions are compared. Right for the ≥0.9 near-dup regime
      (recall ≈ 0.98 at cos ≥ 0.95 with 12 bands × 12 planes).
    - ``auto``: lsh when threshold ≥ 0.9 else exact.

    ``mode`` picks the LSH tail (same size-adaptive twin pattern as
    dedup_minhash_lsh): ``driver`` below MINHASH_SMALL_LIMIT bucket rows,
    ``distributed`` above (equality-tested against each other).
    """
    if method == "auto":
        method = "lsh" if threshold >= 0.9 else "exact"
    ds = _emb_ds(sf_dir)
    if method == "exact":
        return _emb_cosine_exact(ds, threshold)
    return _emb_cosine_lsh(ds, threshold, mode=mode)


def _emb_cosine_exact(ds: rd.Dataset, threshold: float) -> pd.DataFrame:
    full = ds.materialize()
    outs = []
    # driver loop over reference chunks: each iteration broadcasts ONE
    # bounded chunk (streamed out via iter_batches — the whole matrix is
    # never resident at once); at sf scales this is a single iteration
    chunks = []
    buf = []
    buf_rows = 0
    for b in full.iter_batches(batch_size=8192, batch_format="pyarrow"):
        buf.append(b)
        buf_rows += b.num_rows
        if buf_rows >= EMB_CHUNK_ROWS:
            chunks.append(pa.concat_tables(buf))
            buf, buf_rows = [], 0
    if buf:
        chunks.append(pa.concat_tables(buf))

    for chunk in chunks:
        cids, cmat = _norm_rows(chunk)
        ref = ray.put((cids, cmat))

        def against_chunk(t: pa.Table, _ref=ref) -> pa.Table:
            from ..stages.fetch import cached_broadcast

            rids, rmat = cached_broadcast(_ref)
            bids, bm = _norm_rows(t)
            sims = bm @ rmat.T
            ai, bj = np.nonzero(sims >= threshold)
            a, b = bids[ai], rids[bj]
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

        outs.append(
            full.map_batches(against_chunk, batch_format="pyarrow",
                             batch_size=1024).to_pandas()
        )
    out = pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()
    if not len(out):
        return pd.DataFrame(columns=list(_EMPTY_EMB)).astype(_EMPTY_EMB)
    return (
        out.drop_duplicates(["vec_a", "vec_b"])
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    )


_EMB_BUCKET_CAP = 500  # skip degenerate giant buckets (both tails)


def _emb_bucket_rows(t: pa.Table) -> pa.Table:
    """(vec_id, band|bucket int64 key) rows — the banded-hyperplane explode.
    Planes are deterministic per (seed, dim), recomputed in each kernel
    call (a (dim × bands·planes) matrix is cheaper to recompute than to
    broadcast)."""
    n_bands, n_planes = _EMB_BANDS, _EMB_PLANES
    ids, m = _norm_rows(t)
    dim = m.shape[1]
    local_rng = np.random.RandomState(424242)
    planes = local_rng.standard_normal((dim, n_bands * n_planes))
    bits = (m @ planes > 0).astype(np.uint64)
    bits = bits.reshape(len(ids), n_bands, n_planes)
    weights = (1 << np.arange(n_planes, dtype=np.uint64))
    buckets = (bits * weights).sum(axis=2)  # (n, n_bands)
    band_idx = np.arange(n_bands, dtype=np.uint64) << np.uint64(32)
    keys = (buckets | band_idx[None, :]).astype(np.int64)
    return pa.table(
        {
            "vec_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
            "bucket": pa.array(keys.reshape(-1), pa.int64()),
        }
    )


def _packed_vecs_ds(ds: rd.Dataset, need_ref) -> rd.Dataset:
    """(vec_id, byte-packed normalized float64 vector) for the broadcast id
    set — packed because hash joins don't take list payloads; computed
    where the vectors live."""
    import pyarrow.compute as pc

    def pack(t: pa.Table) -> pa.Table:
        from ..stages.fetch import cached_broadcast

        t = t.filter(
            pc.is_in(t["vec_id"], value_set=cached_broadcast(need_ref))
        )
        ids, m = _norm_rows(t)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "vb": pa.array([row.tobytes() for row in m], pa.binary()),
            }
        )

    return ds.map_batches(pack, batch_format="pyarrow")


def _verify_vec_pairs_table(t: pa.Table, threshold: float) -> pa.Table:
    """(vec_a, vec_b, vb_a, vb_b) rows → pairs with cosine ≥ threshold
    (one vectorized row-wise dot over the unpacked float64 matrices)."""
    n = t.num_rows
    if n == 0:
        return pa.table(
            {"vec_a": pa.array([], pa.int64()),
             "vec_b": pa.array([], pa.int64()),
             "cos_pct": pa.array([], pa.int64())}
        )
    ma = np.frombuffer(b"".join(t["vb_a"].to_pylist()), np.float64).reshape(n, -1)
    mb = np.frombuffer(b"".join(t["vb_b"].to_pylist()), np.float64).reshape(n, -1)
    sims = np.einsum("ij,ij->i", ma, mb)
    keep = sims >= threshold
    a = t["vec_a"].to_numpy(zero_copy_only=False)[keep]
    b = t["vec_b"].to_numpy(zero_copy_only=False)[keep]
    return pa.table(
        {
            "vec_a": pa.array(a.astype(np.int64)),
            "vec_b": pa.array(b.astype(np.int64)),
            "cos_pct": pa.array(np.rint(sims[keep] * 1000).astype(np.int64)),
        }
    )


def _emb_cosine_lsh(ds: rd.Dataset, threshold: float,
                    mode: str = "auto") -> pd.DataFrame:
    """Banded-hyperplane candidate generation + exact verify (same
    explode→hot-bucket→pairs shape as dedup_minhash_lsh), with the same
    size-adaptive tail keyed on the (vec, bucket) row count:

    - driver tail (small inputs): bucket table → value_counts → pair-gen
      → verify against a driver-fetched candidate matrix;
    - distributed tail (the 100 TB path): ONE hash(bucket) co-partition
      exchange feeding the vectorized pair-gen → pair-dedup groupby →
      exact cosine verify via two ``Dataset.join``s against a (vec_id,
      packed normalized vector) table — the full bucket table and the
      candidate vectors never land on the driver.
    Both tails are equality-tested against each other."""
    import pyarrow.compute as pc

    sigs = ds.map_batches(_emb_bucket_rows, batch_format="pyarrow",
                          batch_size=1024).materialize()

    distributed = mode == "distributed" or (
        mode == "auto" and sigs.count() > MINHASH_SMALL_LIMIT
    )

    if not distributed:
        sdf = sigs.to_pandas()
        vc = sdf["bucket"].value_counts()
        coll = sdf[sdf["bucket"].isin(vc[vc > 1].index)]
        cand = _emit_vec_pairs_partition(coll).drop_duplicates()
        if not len(cand):
            return pd.DataFrame(columns=list(_EMPTY_EMB)).astype(_EMPTY_EMB)

        # exact verify: fetch candidate vectors (small set), vectorized dot
        need = np.unique(np.concatenate([cand["vec_a"], cand["vec_b"]]))
        need_ref = ray.put(pa.array(need, pa.int64()))

        def keep_needed(t: pa.Table) -> pa.Table:
            from ..stages.fetch import cached_broadcast

            return t.filter(
                pc.is_in(t["vec_id"], value_set=cached_broadcast(need_ref))
            )

        sub = ds.map_batches(keep_needed, batch_format="pyarrow").to_pandas()
        ids, m = _norm_rows(pa.Table.from_pandas(sub, preserve_index=False))
        pos = {v: i for i, v in enumerate(ids)}
        a_idx = np.array([pos[v] for v in cand["vec_a"]])
        b_idx = np.array([pos[v] for v in cand["vec_b"]])
        sims = np.einsum("ij,ij->i", m[a_idx], m[b_idx])
        keep = sims >= threshold
        out = pd.DataFrame(
            {
                "vec_a": cand["vec_a"].to_numpy()[keep].astype("int64"),
                "vec_b": cand["vec_b"].to_numpy()[keep].astype("int64"),
                "cos_pct": np.rint(sims[keep] * 1000).astype("int64"),
            }
        )
        if not len(out):
            return pd.DataFrame(columns=list(_EMPTY_EMB)).astype(_EMPTY_EMB)
        return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

    # ---- distributed tail (MinHash-shaped) ----
    # ONE co-partition exchange for pair-gen (see _coparted_pairs), then a
    # pair-hash co-partitioned dedup collapsing cross-partition duplicates
    # ahead of the vector joins
    cand_ds = _coparted_pairs(sigs, "bucket", _emit_vec_pairs_dedup,
                              sigs.count())
    if cand_ds.count() == 0:
        return pd.DataFrame(columns=list(_EMPTY_EMB)).astype(_EMPTY_EMB)
    cand_ds = _dedup_pairs_coparted(cand_ds, "vec_a", "vec_b")

    # candidate ids: per-block unique then a driver np.unique — ids-only
    # reach the driver, no union+unique exchange (the minhash-twin shape)
    need_ids = _unique_ids_collect(cand_ds, "vec_a", "vec_b")
    need_ref = ray.put(pa.array(need_ids, pa.int64()))
    vb_ds = _packed_vecs_ds(ds, need_ref).materialize()  # used by 2 joins
    n_part = _n_parts(cand_ds.count())
    j1 = cand_ds.join(
        vb_ds.rename_columns({"vec_id": "vec_a", "vb": "vb_a"}),
        join_type="inner", num_partitions=n_part, on=("vec_a",),
    )
    j2 = j1.join(
        vb_ds.rename_columns({"vec_id": "vec_b", "vb": "vb_b"}),
        join_type="inner", num_partitions=n_part, on=("vec_b",),
    )
    out = j2.map_batches(
        lambda t: _verify_vec_pairs_table(t, threshold),
        batch_format="pyarrow",
    ).to_pandas()
    if not len(out):
        return pd.DataFrame(columns=list(_EMPTY_EMB)).astype(_EMPTY_EMB)
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


# driver-checkable variant: τ=0.45 has real matches in the all-distinct
# synthetic embeddings (the 0.95 default is the dedup semantic, but random
# vectors have no such pairs — a 0-row check would be vacuous)
EMB_QUERY_THRESHOLD = 0.45


def dedup_embedding_cosine_query(sf_dir: str) -> pd.DataFrame:
    return dedup_embedding_cosine(sf_dir, threshold=EMB_QUERY_THRESHOLD,
                                  method="exact")


DEDUP_EMB_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(round(list_cosine_similarity(a.embedding, b.embedding) * 1000)
            AS BIGINT) AS cos_pct
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {EMB_QUERY_THRESHOLD}
ORDER BY vec_a, vec_b
"""


# ---------------------------------------------------------------------------
# winnowing-fingerprint near-dup pairs (deterministic; oracle-checkable via
# the minted oracle_winnowing parquet — unlike MinHash there is no
# randomness, so the full value hash holds)
# ---------------------------------------------------------------------------

WINNOW_PAIR_MAX_FREQ = 20   # drop fps shared by more docs (boilerplate)
WINNOW_PAIR_MIN_SHARED = 3  # pair threshold: shared fingerprints
_WINNOW_SMALL_LIMIT = 2_000_000  # fp rows below which the driver tail wins


def dedup_winnow_pairs(
    sf_dir: str,
    max_fp_freq: int = WINNOW_PAIR_MAX_FREQ,
    min_shared: int = WINNOW_PAIR_MIN_SHARED,
    mode: str = "auto",
) -> pd.DataFrame:
    """Near-dup pairs sharing ≥ ``min_shared`` winnowing fingerprints,
    ignoring fps present in > ``max_fp_freq`` docs (boilerplate/hot-key
    guard — the same reason MinHash drops nothing but SimHash bands cap
    candidates: a corpus-wide fp would emit O(n²) pairs). Returns
    (doc_a, doc_b, shared_fps), doc_a < doc_b.

    Size-adaptive like dedup_minhash_lsh:
    - driver tail (small): (doc_id, fp) pandas merge on fp;
    - distributed tail (100 TB path): hash(fp) co-partition → per-partition
      frequency cap + merge (partial pair counts) → pair groupby-sum →
      min_shared filter. Texts never shuffle — only 16 B/row
      (doc_id, fp) pairs.
    """
    from .text import winnow_rows_batch

    from ._schema import heal_blocks

    out_cols = {"doc_a": "int64", "doc_b": "int64", "shared_fps": "int64"}
    fps = heal_blocks(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(winnow_rows_batch, batch_format="pyarrow",
                     batch_size=256)
    )
    if fps is None:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    fps = fps.materialize()

    distributed = mode == "distributed" or (
        mode == "auto" and fps.count() > _WINNOW_SMALL_LIMIT
    )

    if not distributed:
        df = fps.to_pandas()
        vc = df["fp"].value_counts()
        ok = vc[(vc >= 2) & (vc <= max_fp_freq)].index
        df = df[df["fp"].isin(ok)]
        j = df.merge(df, on="fp", suffixes=("_l", "_r"))
        j = j[j["doc_id_l"] < j["doc_id_r"]]
        pairs = (
            j.groupby(["doc_id_l", "doc_id_r"], sort=False).size()
            .reset_index(name="shared_fps")
        )
        pairs = pairs[pairs["shared_fps"] >= min_shared]
        pairs.columns = ["doc_a", "doc_b", "shared_fps"]
        if not len(pairs):
            return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
        return (
            pairs.astype(out_cols)
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    # ---- distributed tail ----
    pairs_ds = _winnow_pairs_ds(fps, max_fp_freq, min_shared)
    if pairs_ds is None:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    pairs = pairs_ds.to_pandas()
    if not len(pairs):
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return (
        pairs[list(out_cols)].astype(out_cols)
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def _winnow_pairs_ds(
    fps: rd.Dataset, max_fp_freq: int, min_shared: int
) -> rd.Dataset | None:
    """Fully distributed winnow pair-gen over a materialized (doc_id, fp)
    Dataset in TWO all-to-alls: hash(fp) co-partition → per-partition
    frequency cap + merge emitting PARTIAL pair counts (partition-local fp
    frequencies are global under co-location, so the eligible-fp filter
    needs no separate count shuffle — the _coparted_pairs argument) → one
    pair groupby-sum re-establishing the global shared_fps before the
    min_shared filter (a pair's shared fps hash across partitions, so the
    per-partition counts are partials, not finals). Returns a
    (doc_a, doc_b, shared_fps) Dataset, or None when no fp is shared.
    Texts never shuffle — only 16 B/row fp pairs."""
    from ._schema import heal_blocks

    n_part = _n_parts(fps.count())

    def emit_partial(g: pd.DataFrame) -> pa.Table:
        vc = g["fp"].value_counts()
        ok = vc[(vc >= 2) & (vc <= max_fp_freq)].index
        df = g[g["fp"].isin(ok)]
        j = df.merge(df, on="fp", suffixes=("_l", "_r"))
        j = j[j["doc_id_l"] < j["doc_id_r"]]
        out = (
            j.groupby(["doc_id_l", "doc_id_r"], sort=False).size()
            .reset_index(name="shared_fps")
        )
        out.columns = ["doc_a", "doc_b", "shared_fps"]
        return pa.Table.from_pandas(
            out.astype({"doc_a": "int64", "doc_b": "int64",
                        "shared_fps": "int64"}),
            preserve_index=False)

    # target_blocks=n_part: heal_blocks' 200-block default would hand the
    # pair groupby 200 near-empty blocks — the tiny-block groupby
    # pathology (measured 13 s on a 137-pair result)
    partial = heal_blocks(
        fps.map_batches(_stamp_band_part(n_part, col="fp"),
                        batch_format="pyarrow")
        .groupby("part").map_groups(emit_partial, batch_format="pandas"),
        target_blocks=n_part,
    )
    if partial is None:
        return None

    # per-pair merge: hash(pair) co-partition + one vectorized pandas
    # groupby-sum per partition (NOT the native two-key aggregate — see
    # _dedup_pairs_coparted for the measured 20× degradation)
    def sum_partition(g: pd.DataFrame) -> pa.Table:
        out = g.groupby(["doc_a", "doc_b"], as_index=False)[
            "shared_fps"].sum()
        return pa.Table.from_pandas(
            out[out["shared_fps"] >= min_shared], preserve_index=False)

    n_pair_part = _n_parts(partial.count())
    return (
        partial.map_batches(_stamp_pair_part(n_pair_part, "doc_a", "doc_b"),
                            batch_format="pyarrow")
        .groupby("part").map_groups(sum_partition, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# connected-component dedup clusters (deterministic: exact-md5 star edges +
# winnow near-dup pairs → min-id components; the "keep one per cluster"
# primitive a training-data pipeline runs after pair generation)
# ---------------------------------------------------------------------------

CLUSTER_SMALL_LIMIT = 5_000_000  # document rows below which union-find wins
_CLUSTER_MAX_ITERS = 64          # label-prop bound (clusters are star-ish)


def _md5_rows(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "h": pa.array(
                [hashlib.md5(x.encode()).hexdigest()
                 for x in t["text"].to_pylist()],
                pa.string(),
            ),
        }
    )


def dedup_clusters(
    sf_dir: str,
    max_fp_freq: int = WINNOW_PAIR_MAX_FREQ,
    min_shared: int = WINNOW_PAIR_MIN_SHARED,
    mode: str = "auto",
) -> pd.DataFrame:
    """Near-duplicate CLUSTERS: connected components over the union of
    exact-dup star edges (doc → min doc_id of its md5 group) and winnowing
    near-dup pairs (dedup_winnow_pairs semantics). One row per document:
    (doc_id, cluster_id = min doc_id in component, cluster_size, keep =
    doc_id == cluster_id). Deterministic → full SQL value-hash oracle via
    a DuckDB recursive CTE (oracle/textops.py).

    Size-adaptive on document count:
    - driver tail: union-find with path compression over the (tiny) edge
      list; edges came from distributed stages, texts never collected.
    - distributed tail (100 TB path): iterative min-label propagation —
      labels ⋈ edges → groupby(doc).min — which converges in O(component
      diameter) rounds (star edges keep exact-dup components at diameter
      ≤ 2). Each round shuffles only (doc_id, label) int64 pairs.
    """
    from ray.data.aggregate import Count, Min

    from .text import winnow_rows_batch

    from ._schema import heal_blocks

    docs = _docs(sf_dir, ["doc_id", "text"])
    # heal: empty read splits produce schema-less blocks that poison the
    # hashes⋈roots and fps self-joins below (pipelines/_schema.py)
    hashes = heal_blocks(docs.map_batches(_md5_rows,
                                          batch_format="pyarrow"))
    if hashes is None:
        # empty corpus: an all-empty materialized Dataset loses its schema
        # (zero-column blocks crash joins) — return the typed frame early
        return pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in
             [("doc_id", "int64"), ("cluster_id", "int64"),
              ("cluster_size", "int64"), ("keep", "bool")]}
        )
    hashes = hashes.materialize()
    n_docs = hashes.count()

    distributed = mode == "distributed" or (
        mode == "auto" and n_docs > CLUSTER_SMALL_LIMIT
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("cluster_id")["doc_id"].transform("size")
        df = df.assign(cluster_size=sizes.astype("int64"),
                       keep=(df["doc_id"] == df["cluster_id"]))
        return (
            df[["doc_id", "cluster_id", "cluster_size", "keep"]]
            .astype({"doc_id": "int64", "cluster_id": "int64",
                     "cluster_size": "int64", "keep": "bool"})
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    if not distributed:
        ids = hashes.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy()
        pairs = dedup_winnow_pairs(sf_dir, max_fp_freq, min_shared,
                                   mode="driver")
        hdf = hashes.to_pandas()
        root_of_h = hdf.groupby("h")["doc_id"].transform("min")
        star = hdf[root_of_h < hdf["doc_id"]]
        edges = list(zip(star["doc_id"], root_of_h[star.index])) + list(
            zip(pairs["doc_a"], pairs["doc_b"])
        )
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in edges:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        df = pd.DataFrame({"doc_id": ids})
        df["cluster_id"] = [find(int(i)) for i in ids]
        return _finish(df)

    # ---- distributed tail: min-label propagation ----
    # (the driver tail gets its pairs from dedup_winnow_pairs, which
    # builds its own healed fps — only the distributed tail needs them)
    fps = heal_blocks(docs.map_batches(winnow_rows_batch,
                                       batch_format="pyarrow",
                                       batch_size=256))
    fps = fps.materialize() if fps is not None else None
    n_part = _n_parts(n_docs)
    roots = heal_blocks(
        hashes.groupby("h").aggregate(Min("doc_id", alias_name="root")),
        target_blocks=n_part,
    )
    exact_edges = (
        hashes.join(roots, join_type="inner", num_partitions=n_part,
                    on=("h",))
        .filter(expr="root < doc_id")
        .map_batches(
            lambda t: pa.table({"a": t["doc_id"], "b": t["root"]}),
            batch_format="pyarrow",
        )
    )
    wp = (_winnow_pairs_ds(fps, max_fp_freq, min_shared)
          if fps is not None else None)
    edges = exact_edges
    if wp is not None:
        edges = edges.union(
            wp.map_batches(
                lambda t: pa.table({"a": t["doc_a"], "b": t["doc_b"]}),
                batch_format="pyarrow",
            )
        )
    bidir = (
        edges.map_batches(
            lambda t: pa.table({"src": t["a"], "dst": t["b"]}),
            batch_format="pyarrow",
        )
        .union(edges.map_batches(
            lambda t: pa.table({"src": t["b"], "dst": t["a"]}),
            batch_format="pyarrow",
        ))
        .materialize()
    )
    labels = hashes.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "label": t["doc_id"]}),
        batch_format="pyarrow",
    ).materialize()
    if bidir.count() > 0:
        converged = False
        prev = labels.sum("label")
        for _ in range(_CLUSTER_MAX_ITERS):
            msg = (
                bidir.join(
                    labels.rename_columns({"doc_id": "src"}),
                    join_type="inner", num_partitions=n_part, on=("src",),
                )
                .map_batches(
                    lambda t: pa.table(
                        {"doc_id": t["dst"], "label": t["label"]}
                    ),
                    batch_format="pyarrow",
                )
            )
            labels = heal_blocks(
                labels.union(msg)
                .groupby("doc_id")
                .aggregate(Min("label", alias_name="label")),
                target_blocks=n_part,
            ).materialize()
            cur = labels.sum("label")
            if cur == prev:  # labels only decrease ⇒ fixpoint reached
                converged = True
                break
            prev = cur
        if not converged:
            # label-prop needs O(component diameter) rounds; exceeding the
            # bound means labels are NOT yet minimal — fail loudly rather
            # than return silently-wrong clusters
            raise RuntimeError(
                f"dedup_clusters: min-label propagation did not converge "
                f"in {_CLUSTER_MAX_ITERS} rounds — a component's diameter "
                "exceeds the bound; raise _CLUSTER_MAX_ITERS"
            )
    sizes = heal_blocks(
        labels.groupby("label").aggregate(Count(alias_name="cluster_size")),
        target_blocks=n_part,
    )
    out = (
        labels.join(sizes, join_type="inner", num_partitions=n_part,
                    on=("label",))
        .rename_columns({"label": "cluster_id"})
        .to_pandas()
    )
    out["keep"] = out["doc_id"] == out["cluster_id"]
    return (
        out[["doc_id", "cluster_id", "cluster_size", "keep"]]
        .astype({"doc_id": "int64", "cluster_id": "int64",
                 "cluster_size": "int64", "keep": "bool"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def dedup_keep_best(
    sf_dir: str,
    max_fp_freq: int = WINNOW_PAIR_MAX_FREQ,
    min_shared: int = WINNOW_PAIR_MIN_SHARED,
) -> pd.DataFrame:
    """Canonical-document selection per near-dup cluster — the "keep the
    best copy, drop the rest" step a training-data pipeline runs after
    clustering. Winner per cluster = max n_tokens, ties broken by min
    doc_id: both keys are exact integers, so the ranking is deterministic
    and SQL-value-hash-checkable (a float quality score would not be
    bit-stable across engines — quantize first if one is ever used here).
    Returns one row per document: (doc_id, cluster_id, n_tokens, keep).

    Composes the distributed cluster labeling (dedup_clusters) with the
    distributed token-count kernel (text.token_counts); the winner pick
    itself is one vectorized sort + groupby-first over the per-doc label
    frame both already return driver-side. At 100 TB the same selection
    runs as a hash(cluster_id) co-partition + per-partition kernel (the
    _stamp_pair_part pattern) over the label Dataset instead."""
    cl = dedup_clusters(sf_dir, max_fp_freq, min_shared)
    cols = {"doc_id": "int64", "cluster_id": "int64",
            "n_tokens": "int64", "keep": "bool"}
    if not len(cl):
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    from .text import token_counts

    tc = token_counts(sf_dir)[["doc_id", "n_tokens"]]
    df = cl[["doc_id", "cluster_id"]].merge(tc, on="doc_id", how="left")
    df["n_tokens"] = df["n_tokens"].fillna(0).astype("int64")
    df = df.sort_values(["cluster_id", "n_tokens", "doc_id"],
                        ascending=[True, False, True], kind="mergesort")
    winner = df.groupby("cluster_id", sort=False)["doc_id"].transform(
        "first")
    df["keep"] = df["doc_id"].to_numpy() == winner.to_numpy()
    return (
        df[list(cols)].astype(cols)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# exact duplicated-substring coverage (the Lee-et-al.-2022 span-dedup shape:
# which token ranges of each document also occur verbatim in OTHER docs)
# ---------------------------------------------------------------------------

SUBSTR_K = 8                      # word n-gram length ("substring" unit)
SUBSTR_DRIVER_LIMIT = 5_000_000   # dup-hash rows: broadcast below, join above
SUBSTR_ROWS_PER_PARTITION = 500_000
SUBSTR_ORACLE_VERSION = "v1"      # bump when K / hash / tokenization changes


def _substr_hash(gram: str) -> int:
    """Pinned 48-bit gram identity: md5 of the space-joined words — the
    shared spec between the engine kernel and the naive minted oracle.
    Identity only has to be consistent within one run, so a 100 TB
    deployment would swap this for a vectorized 64-bit rolling hash;
    md5 keeps the oracle trivially reproducible here."""
    return int(hashlib.md5(gram.encode()).hexdigest()[:12], 16)


def _substr_words(t: pa.Table):
    """Whitespace words per doc with Python ``str.split`` semantics (empty
    tokens dropped), off the Arrow buffers: returns (flat word list,
    per-word parent doc index, batch row count)."""
    import pyarrow.compute as pc

    words = pc.utf8_split_whitespace(t["text"])
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "")
    keepnp = keep.to_numpy(zero_copy_only=False)
    return flat.filter(keep).to_pylist(), parent[keepnp], len(t)


def _substr_gram_rows(t: pa.Table) -> pa.Table:
    """Exploded (doc_id, pos, gh) rows — one per word K-gram position —
    PLUS one stat row per doc encoded as (doc_id, pos=-1, gh=n_tokens), so
    the doc-length table rides the same single tokenizing pass over the
    corpus instead of a second full read (the crawl loop's offers_sent
    stat-row pattern). The md5-per-gram loop is the same inherently-Python
    hash loop the other dedup kernels pay; everything around it is
    vectorized."""
    wl, parent, n = _substr_words(t)
    did = t["doc_id"].to_numpy(zero_copy_only=False)
    n_tokens = (np.bincount(parent, minlength=n) if len(parent)
                else np.zeros(n, dtype=np.int64))
    ids = [int(d) for d in did]
    poss = [-1] * n
    ghs = [int(x) for x in n_tokens]
    bounds = np.flatnonzero(np.diff(parent, prepend=-1, append=-2))
    k = SUBSTR_K
    for j in range(len(bounds) - 1):
        lo, hi = bounds[j], bounds[j + 1]
        if hi - lo < k:
            continue
        d = int(did[parent[lo]])
        ws = wl[lo:hi]
        for i in range(hi - lo - k + 1):
            ids.append(d)
            poss.append(i)
            ghs.append(_substr_hash(" ".join(ws[i:i + k])))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "pos": pa.array(poss, pa.int64()),
        "gh": pa.array(ghs, pa.int64()),
    })


def _substr_cov_partition(g: pd.DataFrame) -> pd.DataFrame:
    """One vectorized pass per hash(doc) partition: sort (doc, pos), merge
    overlapping-or-touching [pos, pos+K) intervals (gaps-and-islands), sum
    span lengths and position counts per doc. Never one Python call per
    doc — the sessionize co-partition pattern."""
    g = g.sort_values(["doc_id", "pos"], kind="mergesort")
    did = g["doc_id"].to_numpy()
    pos = g["pos"].to_numpy()
    brk = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        brk[1:] = (did[1:] != did[:-1]) | (pos[1:] > pos[:-1] + SUBSTR_K)
    isl = np.cumsum(brk)
    spans = (
        pd.DataFrame({"doc_id": did, "isl": isl, "pos": pos})
        .groupby(["doc_id", "isl"], sort=False)
        .agg(lo=("pos", "min"), hi=("pos", "max"), cnt=("pos", "size"))
        .reset_index()
    )
    spans["span"] = spans["hi"] - spans["lo"] + SUBSTR_K
    out = (
        spans.groupby("doc_id", sort=False)
        .agg(n_dup_grams=("cnt", "sum"), dup_tokens=("span", "sum"))
        .reset_index()
    )
    return out.astype({"doc_id": "int64", "n_dup_grams": "int64",
                       "dup_tokens": "int64"})


def dedup_substring(sf_dir: str, mode: str = "auto") -> pd.DataFrame:
    """Per-doc exact duplicated-passage coverage: a word K-gram is
    "duplicated" iff it occurs in ≥2 DISTINCT docs (within-doc repeats are
    repetition_scores' business); per doc we report the duplicated-gram
    position count and the union token coverage of their [pos, pos+K)
    intervals, as integer basis points of doc length.

    Scale shape: ONE tokenizing pass over the corpus emits gram rows of
    24 bytes (doc, pos, 48-bit hash) — never text — plus per-doc stat
    rows (pos=-1) carrying doc length; the row stream is materialized
    once and reused. Doc-frequency is a per-batch distinct partial that
    is NOT assumed globally distinct — Ray splits oversized map outputs
    at arbitrary row boundaries, so a within-doc repeat can straddle a
    block split and the same (gh, doc) pair can surface from two batches;
    global distinctness is re-established in the merge (driver
    drop_duplicates / hash(gh)-co-partitioned distinct+count — the
    straddle regression test pins this). Below SUBSTR_DRIVER_LIMIT gram
    rows the per-batch distinct partials merge on the driver and the
    duplicated-hash set broadcasts (sorted-array searchsorted membership,
    coverage islands merged in one driver numpy pass — Ray's all-to-all
    fixed cost dwarfs these tiny tables). Above it: ONE hash(gh)
    co-partition pass fusing doc-frequency + dup-row filtering (partition
    = global per gh under co-location), then the sessionize-style
    hash(doc_id) co-partitioned island merge
    (mode="driver"/"distributed" force either; equality-tested)."""
    import pyarrow.compute as pc

    from ._schema import heal_blocks

    empty = pd.DataFrame({
        "doc_id": pd.Series(dtype="int64"),
        "n_tokens": pd.Series(dtype="int64"),
        "n_grams": pd.Series(dtype="int64"),
        "n_dup_grams": pd.Series(dtype="int64"),
        "dup_tokens": pd.Series(dtype="int64"),
        "dup_bp": pd.Series(dtype="int64"),
    })
    ds = _docs(sf_dir, ["doc_id", "text"])
    if ds.count() == 0:
        return empty

    rows = ds.map_batches(
        _substr_gram_rows, batch_format="pyarrow").materialize()
    n_gram_rows = rows.count()  # stat rows included; fine for sizing
    if mode == "auto":
        mode = ("driver" if n_gram_rows <= SUBSTR_DRIVER_LIMIT
                else "distributed")

    stats = (
        rows.map_batches(
            lambda t: t.filter(pc.equal(t["pos"], -1))
            .select(["doc_id", "gh"])
            .rename_columns(["doc_id", "n_tokens"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )

    empty_cov = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "n_dup_grams": pd.Series(dtype="int64"),
                              "dup_tokens": pd.Series(dtype="int64")})
    if mode == "driver":
        def partial_df(t: pa.Table) -> pa.Table:
            # per-batch distinct (gh, doc_id) PAIRS — a volume reducer
            # only. Batch boundaries are NOT doc boundaries (Ray splits
            # map outputs at target_max_block_size at arbitrary rows), so
            # a within-doc repeated gram can straddle batches and the same
            # pair can come out of two batches; global distinctness is
            # re-established in the driver merge before any doc counting.
            t = t.filter(pc.greater_equal(t["pos"], 0))
            df = (
                pd.DataFrame({
                    "gh": t["gh"].to_numpy(zero_copy_only=False),
                    "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                })
                .drop_duplicates()
            )
            return pa.Table.from_pandas(df, preserve_index=False)

        partials = rows.map_batches(partial_df, batch_format="pyarrow")
        # tiny-table path: partial pairs merge on the driver (global
        # distinct re-established here), dup hashes broadcast, matching
        # (doc, pos) rows come back small enough for one vectorized
        # island merge — zero all-to-all exchanges
        pdf = partials.to_pandas().drop_duplicates()
        agg = pdf.groupby("gh", as_index=False).size().rename(
            columns={"size": "n_docs"})
        arr = np.sort(
            agg.loc[agg["n_docs"] >= 2, "gh"].to_numpy(dtype=np.int64))
        if len(arr) == 0:
            cov = empty_cov
        else:
            ref = ray.put(arr)

            def keep_dup(t: pa.Table, _ref=ref) -> pa.Table:
                a = ray.get(_ref)
                t = t.filter(pc.greater_equal(t["pos"], 0))
                gh = t["gh"].to_numpy(zero_copy_only=False)
                idx = np.searchsorted(a, gh)
                idx[idx >= len(a)] = 0
                m = a[idx] == gh
                return t.filter(pa.array(m)).select(["doc_id", "pos"])

            cov = _substr_cov_partition(
                rows.map_batches(keep_dup, batch_format="pyarrow")
                .to_pandas()
            )
    else:
        # ONE hash(gh) co-partition of the raw gram rows: every copy of a
        # (gh, doc) pair lands in the same partition, so the per-partition
        # distinct + count IS the global count(DISTINCT doc_id) per gh
        # (boundary-proof by construction), and the duplicated (doc, pos)
        # rows are emitted by the same kernel — the r4 shape's
        # partial-pair exchange + left_semi join (measured 3.2 s of the
        # 6 s dist row at sf0.1) collapse into this single pass.
        n_part_df = max(8, min(1024,
                               n_gram_rows // SUBSTR_ROWS_PER_PARTITION
                               + 1))

        def add_gh_part(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater_equal(t["pos"], 0))
            gh = t["gh"].to_numpy(zero_copy_only=False)
            return t.append_column(
                "part", pa.array((gh % n_part_df).astype(np.int64)))

        def dup_rows_partition(g: pd.DataFrame) -> pa.Table:
            sz = (
                g[["gh", "doc_id"]].drop_duplicates()
                .groupby("gh", as_index=False).size()
            )
            dup = np.sort(
                sz.loc[sz["size"] >= 2, "gh"].to_numpy(dtype=np.int64))
            gh = g["gh"].to_numpy(dtype=np.int64)
            if len(dup) == 0:
                m = np.zeros(len(gh), dtype=bool)
            else:
                idx = np.searchsorted(dup, gh)
                idx[idx >= len(dup)] = 0
                m = dup[idx] == gh
            return pa.Table.from_pandas(
                g.loc[m, ["doc_id", "pos"]], preserve_index=False)

        dup_rows = heal_blocks(
            rows.map_batches(add_gh_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(dup_rows_partition, batch_format="pandas"),
            target_blocks=n_part_df,
        )
        if dup_rows is None:
            cov = empty_cov
        else:
            n_part = max(8, min(1024,
                                dup_rows.count()
                                // SUBSTR_ROWS_PER_PARTITION + 1))

            def add_part(t: pa.Table) -> pa.Table:
                d = t["doc_id"].to_numpy(zero_copy_only=False)
                return t.append_column(
                    "part", pa.array((d % n_part).astype(np.int64)))

            cov = (
                dup_rows.map_batches(add_part, batch_format="pyarrow")
                .groupby("part")
                .map_groups(_substr_cov_partition,
                            batch_format="pandas")
                .to_pandas()
            )

    out = stats.merge(cov[["doc_id", "n_dup_grams", "dup_tokens"]],
                      on="doc_id", how="left")
    out["n_dup_grams"] = out["n_dup_grams"].fillna(0).astype("int64")
    out["dup_tokens"] = out["dup_tokens"].fillna(0).astype("int64")
    out["n_grams"] = np.maximum(out["n_tokens"] - SUBSTR_K + 1, 0)
    nt = out["n_tokens"].to_numpy()
    out["dup_bp"] = np.where(
        nt > 0, out["dup_tokens"].to_numpy() * 10000 // np.maximum(nt, 1),
        0).astype("int64")
    return (
        out[["doc_id", "n_tokens", "n_grams", "n_dup_grams",
             "dup_tokens", "dup_bp"]]
        .astype({"doc_id": "int64", "n_tokens": "int64", "n_grams": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def mint_substr_oracle(
        sf_dir: str, base: str = "/tmp/graft_substr_oracle") -> str:
    """Naive per-doc Python mint of the (doc_id, pos, gh) gram table and
    the (doc_id, n_tokens) stats table — independent of the engine's
    Arrow/partial kernels, pinned by SUBSTR_ORACLE_VERSION (the
    decontaminate minting pattern). _SUCCESS-last."""
    import os

    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(base, f"{tag}-{SUBSTR_ORACLE_VERSION}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids, poss, ghs = [], [], []
    sids, ntoks = [], []
    k = SUBSTR_K
    for d, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = (tx or "").split()
        sids.append(d)
        ntoks.append(len(ws))
        for i in range(len(ws) - k + 1):
            ids.append(d)
            poss.append(i)
            ghs.append(_substr_hash(" ".join(ws[i:i + k])))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "pos": pa.array(poss, pa.int64()),
                  "gh": pa.array(ghs, pa.int64())}),
        os.path.join(out, "grams.parquet"),
    )
    pq.write_table(
        pa.table({"doc_id": pa.array(sids, pa.int64()),
                  "n_tokens": pa.array(ntoks, pa.int64())}),
        os.path.join(out, "doc_stats.parquet"),
    )
    open(os.path.join(out, "_SUCCESS"), "w").close()
    return out


def substr_sql(oracle_dir: str) -> str:
    """DuckDB oracle: doc-frequency, duplicated positions, and the interval
    union via gaps-and-islands window math — all derived relationally from
    the MINTED naive gram table."""
    import os

    g = os.path.join(oracle_dir, "grams.parquet")
    s = os.path.join(oracle_dir, "doc_stats.parquet")
    k = SUBSTR_K
    return f"""
WITH g AS (SELECT * FROM read_parquet('{g}')),
df AS (SELECT gh FROM (SELECT gh, count(DISTINCT doc_id) AS c
                       FROM g GROUP BY gh) WHERE c >= 2),
dup AS (SELECT doc_id, pos FROM g JOIN df USING (gh)),
w AS (SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER win IS NULL
                  OR pos > lag(pos) OVER win + {k}
                  THEN 1 ELSE 0 END AS brk
      FROM dup WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
isl AS (SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM w),
spans AS (SELECT doc_id, island, max(pos) - min(pos) + {k} AS span,
                 count(*) AS cnt
          FROM isl GROUP BY doc_id, island),
cov AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_dup_grams,
               CAST(sum(span) AS BIGINT) AS dup_tokens
        FROM spans GROUP BY doc_id)
SELECT s.doc_id,
       CAST(s.n_tokens AS BIGINT) AS n_tokens,
       CAST(greatest(s.n_tokens - {k} + 1, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(CASE WHEN s.n_tokens > 0
                 THEN coalesce(c.dup_tokens, 0) * 10000 // s.n_tokens
                 ELSE 0 END AS BIGINT) AS dup_bp
FROM read_parquet('{s}') s LEFT JOIN cov c USING (doc_id)
ORDER BY s.doc_id
"""
