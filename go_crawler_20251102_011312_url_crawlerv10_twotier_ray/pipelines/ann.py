"""Similarity search over the ``embeddings`` table (list<float> column).

- ``ann_bruteforce_topk``: exact cosine top-k — the query matrix is
  broadcast once (``ray.put``), every batch does ONE float64 matmul against
  it (no Python loops), partial top-k per batch, final top-k merge on the
  tiny partials. SQL-checkable against DuckDB ``list_cosine_similarity``.
- ``ann_lsh_topk``: a scale path — random-hyperplane LSH buckets
  (signed projections → bucket id), candidates only from matching buckets
  (multi-probe over all query buckets), re-rank of candidates. Since r4
  the WHOLE pipeline runs on the pinned integer-quantized spec below, so
  the output is bit-deterministic and value-hash-checked against the
  naive reference in ``oracle/annops.py``; quality (recall vs brute
  force) is still pytest-gated.
- ``ann_ivf_topk``: the other standard scale path — IVF coarse
  quantization: deterministic spherical k-means centroids trained on a
  BOUNDED sample (never the full corpus), every vector assigned to its
  nearest centroid inside ``map_batches``, queries probe only their
  ``nprobe`` nearest cells, re-rank on the probed cells. Same pinned
  integer spec → hash-checked + recall-gated.

Pinned quantization spec (shared with oracle/annops.py — transcribed
there in plain Python; float ranks are never bit-stable, so every ranked
quantity here is an exact integer, CLAUDE.md "quantize first"):
  q_i  = floor(float64(x_i) * 1e4 + 0.5)          (exact int)
  n    = Σ q_i²                                   (exact int)
  qn_i = floor(q_i * 1e6 / sqrt(n) + 0.5)         (IEEE sqrt/div — two
         correctly-rounded elementwise ops, deterministic on any IEEE-754
         platform; n == 0 → qn = 0)
  score(a, b) = Σ qn_a,i·qn_b,i  — |qn| ≤ ~1e6, dim 64 → |score| ≤
         ~6.4e13 < 2^53, so float64 (BLAS) matmul IS exact int arithmetic.
- ``knn_classify``: exact all-vectors k-NN majority-vote classification
  over QUANTIZED-INTEGER squared-L2 distances — unlike cosine ranks,
  every comparison is exact int64 arithmetic, so the result is bit-stable
  against a fully relational DuckDB oracle (value-hash-checked).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
# multi-table multi-probe LSH: L tables × b planes, probing each query's
# bucket plus its b Hamming-1 neighbors per table. The synthetic
# embeddings are near-isotropic random vectors — LSH's worst case: the
# best neighbors sit near cos≈0.45-0.5 (P(bit agree) only ≈ 0.65/bit), so
# hitting recall@5 ≥ 0.6 needs 6×6-plane tables with Hamming-1 probes
# (~40% of the corpus re-ranked; measured recall ≈ 0.66 at sf0.01).
# Clustered real embeddings reach far higher recall on far fewer probes.
LSH_TABLES = 6
LSH_PLANES = 6
LSH_SEED = 777

# pinned quantization constants (see module docstring; transcribed in
# oracle/annops.py — bump ANN_ORACLE_VERSION there when these change)
QNT_COMP_SCALE = 10_000
QNT_NORM_SCALE = 1_000_000
PLANE_SCALE = 1_000_000


def quantize_unit(m: np.ndarray) -> np.ndarray:
    """Two-stage integer quantization of an (n, dim) float64 matrix per
    the pinned spec: component quantize → exact integer norm → normalized
    re-quantize. Returns integer-VALUED float64 (so downstream matmuls
    stay in BLAS); every value and every downstream dot product is exact
    (guarded)."""
    q = np.floor(m * QNT_COMP_SCALE + 0.5)
    _check_exact(q)
    n = (q * q).sum(axis=1)  # every partial sum < 2^53 → exact any order
    s = np.sqrt(n)
    s[s == 0] = 1.0
    qn = np.floor(q * QNT_NORM_SCALE / s[:, None] + 0.5)
    _check_exact(qn)
    return qn


def _emb_rows(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, float64 matrix) from a batch — the fixed-dim list<float>
    column flattens to its contiguous values buffer (zero-copy from the
    object store), no per-row Python."""
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    col = t["embedding"].combine_chunks()
    m = col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), -1)
    return ids, m.astype(np.float64)

def _emb(sf_dir: str) -> rd.Dataset:
    from ._schema import read_parquet_bounded

    return read_parquet_bounded(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    q = (
        _emb(sf_dir)
        .filter(expr=f"vec_id < {N_QUERIES}")  # Arrow-expression pushdown —
        # a filter(lambda) here scans the whole table through Python rows
        .to_pandas()
        .sort_values("vec_id")
    )
    ids = q["vec_id"].to_numpy()
    mat = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return ids, mat / n[:, None]


class _BatchTopK:
    """Per-batch cosine vs the broadcast query matrix → per-query partial
    top-k rows (query_id, vec_id, sim)."""

    def __init__(self, ref, k: int):
        self.ref = ref
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..stages.fetch import cached_broadcast

        qids, qmat = cached_broadcast(self.ref)
        ids, m = _emb_rows(t)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m / norms[:, None]) @ qmat.T  # (batch, n_queries)

        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qids):
            col = sims[:, j]
            mask = ids != qid  # exclude self
            cand_ids = ids[mask]
            cand_sims = col[mask]
            if len(cand_ids) == 0:
                continue
            k = min(self.k, len(cand_ids))
            # partial top-k with deterministic (−sim, vec_id) order
            order = np.lexsort((cand_ids, -cand_sims))[:k]
            out_q.extend([qid] * k)
            out_v.extend(cand_ids[order].tolist())
            out_s.extend(cand_sims[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _final_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    partials = partials.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    out = partials.groupby("query_id", as_index=False).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "vec_id", "rank"]].reset_index(drop=True)


_TOPK_INT_COLS = {"query_id": "int64", "vec_id": "int64",
                  "rank": "int64", "iscore": "int64"}


def _final_topk_int(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Merge integer-scored partials: global (query, -iscore, vec_id)
    order → head k → rank. All comparisons are exact ints, so the result
    is identical however the batches were split."""
    if not len(partials):
        return pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in _TOPK_INT_COLS.items()})
    partials = partials.sort_values(
        ["query_id", "iscore", "vec_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    out = partials.groupby("query_id", as_index=False).head(k).copy()
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype("int64")
    return out[list(_TOPK_INT_COLS)].reset_index(drop=True)


def ann_bruteforce_topk(sf_dir: str) -> pd.DataFrame:
    """Exact top-5 cosine neighbors for each query vector (vec_id < 10).
    Returns (query_id, vec_id, rank) — ranks only, so the value-hash
    comparison with the SQL oracle is float-order-free except for genuine
    near-ties (broken by vec_id on both sides)."""
    ids, qmat = _query_matrix(sf_dir)
    ref = ray.put((ids, qmat))
    partials = (
        _emb(sf_dir)
        .map_batches(_BatchTopK(ref, TOP_K), batch_format="pyarrow",
                     batch_size=512)
        .to_pandas()
    )
    return _final_topk(partials, TOP_K)


ANN_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id
         ) AS rank
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, rank FROM scored WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _lsh_tables(dim: int) -> np.ndarray:
    """(L, dim, b) deterministic hyperplane tables, QUANTIZED to integers
    (floor(g·1e6 + 0.5)) so the signed projections against quantized
    vectors are exact int comparisons — the bucket structure becomes a
    pure function of (seed, dim), reproducible by the naive oracle."""
    rng = np.random.RandomState(LSH_SEED)
    g = rng.standard_normal((LSH_TABLES, dim, LSH_PLANES))
    return np.floor(g * PLANE_SCALE + 0.5)


def _bucket_ids(qn: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, L) bucket id per quantized vector per table: bit = (qn·h > 0).
    |qn·h| ≤ dim · 1e6 · ~5e6 ≈ 3.4e14 < 2^53 → the matmul is exact, the
    sign test is an integer comparison."""
    L, _, b = planes.shape
    weights = 1 << np.arange(b, dtype=np.uint32)
    out = np.empty((qn.shape[0], L), dtype=np.uint32)
    for li in range(L):
        sig = (qn @ planes[li] > 0).astype(np.uint32)
        out[:, li] = sig @ weights
    return out


def _query_qn(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(query ids, quantized query matrix) per the pinned spec."""
    q = (
        _emb(sf_dir)
        .filter(expr=f"vec_id < {N_QUERIES}")
        .to_pandas()
        .sort_values("vec_id")
    )
    ids = q["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    return ids, quantize_unit(mat)


def ann_lsh_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH with Hamming-1
    multi-probe. Candidates = vectors sharing a bucket (or a 1-bit
    neighbor bucket) with the query in ANY table; re-rank on the
    candidates only by the exact integer score (ties → smaller vec_id).
    Returns (query_id, vec_id, rank, iscore) — bit-deterministic, so the
    driver value-hash-checks it against oracle/annops.py's naive
    reimplementation; recall@5-vs-bruteforce stays pytest-gated."""
    ids, qqn = _query_qn(sf_dir)
    dim = qqn.shape[1]
    planes = _lsh_tables(dim)
    qb = _bucket_ids(qqn, planes)  # (n_q, L)
    # probe sets: own bucket + every Hamming-1 neighbor, per table
    flips = 1 << np.arange(LSH_PLANES, dtype=np.uint32)
    # (n_q, L, b+1)
    probes = np.concatenate(
        [qb[:, :, None], qb[:, :, None] ^ flips[None, None, :]], axis=2
    )
    ref = ray.put((ids, qqn, planes, probes))

    class BucketMatch:
        def __init__(self, r):
            self.ref = r

        def __call__(self, t: pa.Table) -> pa.Table:
            from ..stages.fetch import cached_broadcast

            qids, qq, pl, prb = cached_broadcast(self.ref)
            vids, m = _emb_rows(t)
            qn = quantize_unit(m)
            buckets = _bucket_ids(qn, pl)  # (n, L)
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(qids):
                hit = np.zeros(len(vids), dtype=bool)
                for li in range(pl.shape[0]):
                    hit |= np.isin(buckets[:, li], prb[j, li])
                hit &= vids != qid
                if not hit.any():
                    continue
                iscores = qn[hit] @ qq[j]  # exact integers
                cids = vids[hit]
                order = np.lexsort((cids, -iscores))[: TOP_K]
                out_q.extend([qid] * len(order))
                out_v.extend(cids[order].tolist())
                out_s.extend(iscores[order].astype(np.int64).tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "iscore": pa.array(out_s, pa.int64()),
                }
            )

    partials = (
        _emb(sf_dir)
        .map_batches(BucketMatch(ref), batch_format="pyarrow", batch_size=512)
        .to_pandas()
    )
    return _final_topk_int(partials, TOP_K)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

IVF_NLIST = 16       # number of coarse cells
IVF_NPROBE = 6       # cells probed per query (~37% of a uniform corpus;
                     # near-isotropic random embeddings are IVF's worst
                     # case — clustered real embeddings need far fewer)
IVF_SEED = 4242
IVF_KMEANS_ITERS = 10
IVF_TRAIN_SAMPLE = 100_000  # centroid training reads at most this many rows


def _train_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic INTEGER spherical k-means on a BOUNDED sample — at
    100 TB the training set stays IVF_TRAIN_SAMPLE rows (pinned as
    ``vec_id < IVF_TRAIN_SAMPLE`` so the sample is read-order-free); only
    the (nlist × dim) centroid matrix is ever broadcast.

    Every step is on the pinned spec (oracle/annops.py transcribes it):
    train rows are quantized (ordered by vec_id), assignment is argmax of
    exact integer dots (ties → lowest cell), the cell mean is re-quantized
    via Σ(members)·1e6/sqrt(Σs²) with Σs² an exact Python int (it can
    exceed 2^53) — so the centroids are integer-valued and bit-stable."""
    import math

    sample = (
        _emb(sf_dir)
        .filter(expr=f"vec_id < {IVF_TRAIN_SAMPLE}")
        .to_pandas()
        .sort_values("vec_id")
    )
    qn = quantize_unit(
        np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(IVF_SEED)
    k = min(IVF_NLIST, len(qn))
    cent = qn[rng.choice(len(qn), size=k, replace=False)].copy()
    for _ in range(IVF_KMEANS_ITERS):
        assign = (qn @ cent.T).argmax(axis=1)  # exact; first max on ties
        for c in range(k):
            mask = assign == c
            if not mask.any():
                continue  # empty cell keeps its previous centroid
            s = qn[mask].sum(axis=0)  # exact: ≤ 1e6·1e5 rows < 2^53
            n2 = sum(int(v) ** 2 for v in s)  # may exceed 2^53 → python int
            if n2 == 0:
                continue
            sq = math.sqrt(n2)  # float(n2) correctly rounded → IEEE sqrt
            cent[c] = np.floor(s * QNT_NORM_SCALE / sq + 0.5)
    return cent


def ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate top-k via IVF: assign every vector to its nearest
    centroid inside map_batches (one matmul per batch against the broadcast
    (nlist × dim) centroids), keep only vectors whose cell is among a
    query's nprobe nearest cells, re-rank by exact integer score. Returns
    (query_id, vec_id, rank, iscore) — bit-deterministic on the pinned
    quantization spec, value-hash-checked vs oracle/annops.py; recall is
    pytest-gated."""
    ids, qqn = _query_qn(sf_dir)
    cent = _train_centroids(sf_dir)
    nprobe = min(IVF_NPROBE, len(cent))
    # (n_q, nprobe) cell ids per query: highest integer dot, ties → lower
    # cell id (stable argsort of the negated exact scores)
    qcells = np.argsort(-(qqn @ cent.T), axis=1, kind="stable")[:, :nprobe]
    ref = ray.put((ids, qqn, cent, qcells))

    class CellMatch:
        def __init__(self, r):
            self.ref = r

        def __call__(self, t: pa.Table) -> pa.Table:
            from ..stages.fetch import cached_broadcast

            qids, qq, ct, qc = cached_broadcast(self.ref)
            vids, m = _emb_rows(t)
            qn = quantize_unit(m)
            cells = (qn @ ct.T).argmax(axis=1)  # exact; first max on ties
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(qids):
                hit = np.isin(cells, qc[j]) & (vids != qid)
                if not hit.any():
                    continue
                iscores = qn[hit] @ qq[j]  # exact integers
                cids = vids[hit]
                order = np.lexsort((cids, -iscores))[:TOP_K]
                out_q.extend([qid] * len(order))
                out_v.extend(cids[order].tolist())
                out_s.extend(iscores[order].astype(np.int64).tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "iscore": pa.array(out_s, pa.int64()),
                }
            )

    partials = (
        _emb(sf_dir)
        .map_batches(CellMatch(ref), batch_format="pyarrow", batch_size=512)
        .to_pandas()
    )
    return _final_topk_int(partials, TOP_K)


# ---------------------------------------------------------------------------
# exact kNN majority-vote classification (quantized-integer distances)
# ---------------------------------------------------------------------------

KNN_K = 5
KNN_QSCALE = 10_000
KNN_CHUNK_ROWS = 65_536          # query vectors broadcast per round
KNN_MERGE_ROWS_PER_PART = 250_000


def _quantize64(m: np.ndarray) -> np.ndarray:
    """floor(float64(x)*QSCALE + 0.5) — the bit-exact spec shared with the
    SQL oracle. The oracle spells the SAME IEEE expression with an explicit
    ``CAST(x AS DOUBLE)``: DuckDB evaluates FLOAT-list arithmetic in
    float32, which lands on .5 ties the float64 path avoids (measured:
    0.242249995f*10000 → 2422.5f → 2423 vs the correct 2422).

    The result stays in float64 — every quantized value is an integer, and
    the guard below proves all downstream products/sums stay < 2^53, so
    float64 matmul (BLAS) IS exact integer arithmetic here."""
    return np.floor(m * KNN_QSCALE + 0.5)


def _check_exact(q: np.ndarray) -> None:
    dim = q.shape[1] if q.ndim == 2 else 1
    worst = 4.0 * float(np.abs(q).max(initial=0.0)) ** 2 * dim
    if worst >= 2.0**53:
        raise ValueError(
            "quantized embeddings too large for exact float64 integer "
            "matmul — lower KNN_QSCALE or switch to an int64 (object) "
            f"matmul path (worst-case sum {worst:.3g} ≥ 2^53)"
        )


class _KnnPartial:
    """Per-batch partial top-k per broadcast query: ONE stable argsort of
    the (batch × n_queries) integer distance matrix — rows are pre-sorted
    by vec_id, so kind='stable' ties break by neighbor vec_id exactly as
    the oracle's ``ORDER BY d2, nid``."""

    def __init__(self, ref, k: int):
        self.ref = ref
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..stages.fetch import cached_broadcast

        qids, qmat, qnorm = cached_broadcast(self.ref)
        idx0 = pa.compute.sort_indices(t["vec_id"])
        t = t.take(idx0)
        vids, m = _emb_rows(t)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = _quantize64(m)
        _check_exact(b)
        bnorm = (b * b).sum(axis=1)
        d2 = bnorm[:, None] + qnorm[None, :] - 2.0 * (b @ qmat.T)
        d2[vids[:, None] == qids[None, :]] = np.inf  # exclude self
        k = min(self.k, d2.shape[0])
        sel = np.argsort(d2, axis=0, kind="stable")[:k, :]  # (k, n_q)
        top_d2 = np.take_along_axis(d2, sel, axis=0)
        finite = np.isfinite(top_d2.T.ravel())  # drop selected self rows
        nid = vids[sel].T.ravel()[finite]
        nlabel = labels[sel].T.ravel()[finite]
        qcol = np.repeat(qids, k)[finite]
        return pa.table(
            {
                "vec_id": pa.array(qcol, pa.int64()),
                "nid": pa.array(nid, pa.int64()),
                "nlabel": pa.array(nlabel, pa.int64()),
                "d2": pa.array(top_d2.T.ravel()[finite].astype(np.int64)),
            }
        )


def _knn_vote_part(g: pd.DataFrame) -> pd.DataFrame:
    """One vectorized pass per HASH PARTITION (never per query): global
    top-k per query across batch partials, then majority vote with the
    deterministic (votes DESC, label ASC) tie-break the oracle mirrors."""
    g = g.sort_values(["vec_id", "d2", "nid"], kind="mergesort")
    top = g.groupby("vec_id", sort=False).head(KNN_K)
    votes = (
        top.groupby(["vec_id", "nlabel"], sort=False)
        .size()
        .reset_index(name="votes")
    )
    votes = votes.sort_values(
        ["vec_id", "votes", "nlabel"], ascending=[True, False, True],
        kind="mergesort",
    )
    pred = votes.groupby("vec_id", sort=False).head(1)
    return pd.DataFrame(
        {
            "vec_id": pred["vec_id"].astype("int64"),
            "pred_label": pred["nlabel"].astype("int64"),
            "votes": pred["votes"].astype("int64"),
        }
    )


def knn_classify(sf_dir: str) -> pd.DataFrame:
    """Exact leave-one-out k-NN classification of EVERY vector: quantize
    each component to an integer (shared spec with the SQL oracle), rank
    neighbors by exact int64 squared-L2 (ties → smaller vec_id), majority
    label among the top ``KNN_K`` (ties → smaller label).

    Scale shape: the query side is broadcast in ≤KNN_CHUNK_ROWS chunks
    (driver holds one chunk at a time); each corpus batch does one float64
    matmul + one stable argsort per chunk and emits only k rows per query;
    the merge is hash-co-partitioned by query id with ONE vectorized pass
    per partition. All-pairs compute is inherent to exactness — the
    approximate regime is ``ann_lsh_topk`` / ``ann_ivf_topk``."""
    from ._schema import heal_blocks, read_parquet_bounded

    empty = pd.DataFrame(
        {"vec_id": [], "pred_label": [], "votes": []}
    ).astype({"vec_id": "int64", "pred_label": "int64", "votes": "int64"})

    full = read_parquet_bounded(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    ).materialize()
    n_rows = full.count()
    if n_rows < 2:
        return empty  # no neighbors to vote with (self is excluded)

    partials = []
    buf, buf_rows = [], 0
    chunks = []
    for b in full.iter_batches(batch_size=8192, batch_format="pyarrow"):
        buf.append(b)
        buf_rows += b.num_rows
        if buf_rows >= KNN_CHUNK_ROWS:
            chunks.append(pa.concat_tables(buf))
            buf, buf_rows = [], 0
    if buf:
        chunks.append(pa.concat_tables(buf))

    for chunk in chunks:
        qids, qm = _emb_rows(chunk)
        qmat = _quantize64(qm)
        _check_exact(qmat)
        qnorm = (qmat * qmat).sum(axis=1)
        ref = ray.put((qids, qmat, qnorm))
        partials.append(
            full.map_batches(
                _KnnPartial(ref, KNN_K), batch_format="pyarrow",
                batch_size=1024,
            )
        )
    cand = partials[0] if len(partials) == 1 else partials[0].union(*partials[1:])
    cand = heal_blocks(cand) or cand  # map over tiny blocks → typed schema

    n_part = max(8, min(1024, n_rows * KNN_K // KNN_MERGE_ROWS_PER_PART + 1))

    def add_part(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "part", pa.array((vid % n_part).astype(np.int64)))

    out = (
        cand.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_knn_vote_part, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return empty
    return (
        out[["vec_id", "pred_label", "votes"]]
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


KNN_CLASSIFY_SQL = f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE)*{KNN_QSCALE} + 0.5) AS BIGINT)
         ) AS qe
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid, b.label AS nlabel,
         CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
              p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
  FROM q a JOIN q b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT vid, nid, nlabel, d2,
         row_number() OVER (PARTITION BY vid ORDER BY d2, nid) AS rn
  FROM pairs
), votes AS (
  SELECT vid, nlabel, count(*) AS votes
  FROM ranked WHERE rn <= {KNN_K} GROUP BY vid, nlabel
), pred AS (
  SELECT vid, nlabel, votes,
         row_number() OVER (PARTITION BY vid ORDER BY votes DESC, nlabel) AS pr
  FROM votes
)
SELECT vid AS vec_id, CAST(nlabel AS BIGINT) AS pred_label,
       CAST(votes AS BIGINT) AS votes
FROM pred WHERE pr = 1 ORDER BY vec_id
"""
