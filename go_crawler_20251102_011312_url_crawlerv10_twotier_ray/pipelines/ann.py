"""Similarity search over the ``embeddings`` table (list<float> column).

- ``ann_bruteforce_topk``: exact cosine top-k — the query matrix is
  broadcast once (``ray.put``), every batch does ONE float64 matmul against
  it (no Python loops), partial top-k per batch, final top-k merge on the
  tiny partials. SQL-checkable against DuckDB ``list_cosine_similarity``.
- ``ann_lsh_topk``: a scale path — random-hyperplane LSH buckets
  (signed projections → bucket id), candidates only from matching buckets
  (multi-probe over all query buckets), exact re-rank of candidates.
  Approximate by construction → rows-only check + recall test in pytest.
- ``ann_ivf_topk``: the other standard scale path — IVF coarse
  quantization: deterministic spherical k-means centroids trained on a
  BOUNDED sample (never the full corpus), every vector assigned to its
  nearest centroid inside ``map_batches``, queries probe only their
  ``nprobe`` nearest cells, exact re-rank on the probed cells. Approximate
  → rows-only check + recall test in pytest.
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
    """(L, dim, b) deterministic hyperplane tables."""
    rng = np.random.RandomState(LSH_SEED)
    return rng.standard_normal((LSH_TABLES, dim, LSH_PLANES))


def _bucket_ids(mn: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, L) bucket id per vector per table."""
    L, _, b = planes.shape
    weights = 1 << np.arange(b, dtype=np.uint32)
    out = np.empty((mn.shape[0], L), dtype=np.uint32)
    for li in range(L):
        sig = (mn @ planes[li] > 0).astype(np.uint32)
        out[:, li] = sig @ weights
    return out


def ann_lsh_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH with Hamming-1
    multi-probe. Candidates = vectors sharing a bucket (or a 1-bit
    neighbor bucket) with the query in ANY table; exact re-rank on the
    candidates only. Returns the same (query_id, vec_id, rank) shape as
    the brute-force baseline; recall@5-vs-bruteforce is pytest-gated."""
    ids, qmat = _query_matrix(sf_dir)
    dim = qmat.shape[1]
    planes = _lsh_tables(dim)
    qb = _bucket_ids(qmat, planes)  # (n_q, L)
    # probe sets: own bucket + every Hamming-1 neighbor, per table
    flips = 1 << np.arange(LSH_PLANES, dtype=np.uint32)
    # (n_q, L, b+1)
    probes = np.concatenate(
        [qb[:, :, None], qb[:, :, None] ^ flips[None, None, :]], axis=2
    )
    ref = ray.put((ids, qmat, planes, probes))

    class BucketMatch:
        def __init__(self, r):
            self.ref = r

        def __call__(self, t: pa.Table) -> pa.Table:
            from ..stages.fetch import cached_broadcast

            qids, qm, pl, prb = cached_broadcast(self.ref)
            vids, m = _emb_rows(t)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            mn = m / norms[:, None]
            buckets = _bucket_ids(mn, pl)  # (n, L)
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(qids):
                hit = np.zeros(len(vids), dtype=bool)
                for li in range(pl.shape[0]):
                    hit |= np.isin(buckets[:, li], prb[j, li])
                hit &= vids != qid
                if not hit.any():
                    continue
                sims = mn[hit] @ qm[j]
                cids = vids[hit]
                order = np.lexsort((cids, -sims))[: TOP_K]
                out_q.extend([qid] * len(order))
                out_v.extend(cids[order].tolist())
                out_s.extend(sims[order].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = (
        _emb(sf_dir)
        .map_batches(BucketMatch(ref), batch_format="pyarrow", batch_size=512)
        .to_pandas()
    )
    if not len(partials):
        return pd.DataFrame(
            {"query_id": [], "vec_id": [], "rank": []}
        ).astype({"query_id": "int64", "vec_id": "int64", "rank": "int64"})
    return _final_topk(partials, TOP_K)


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


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def _train_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic spherical k-means on a BOUNDED sample — at 100 TB the
    training set stays IVF_TRAIN_SAMPLE rows; only the (nlist × dim)
    centroid matrix is ever broadcast."""
    sample = _emb(sf_dir).limit(IVF_TRAIN_SAMPLE).to_pandas()
    mn = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(IVF_SEED)
    k = min(IVF_NLIST, len(mn))
    cent = mn[rng.choice(len(mn), size=k, replace=False)].copy()
    for _ in range(IVF_KMEANS_ITERS):
        assign = (mn @ cent.T).argmax(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                v = mn[mask].sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate top-k via IVF: assign every vector to its nearest
    centroid inside map_batches (one matmul per batch against the broadcast
    (nlist × dim) centroids), keep only vectors whose cell is among a
    query's nprobe nearest cells, exact re-rank. Same (query_id, vec_id,
    rank) shape as the brute-force baseline; recall is pytest-gated."""
    ids, qmat = _query_matrix(sf_dir)
    cent = _train_centroids(sf_dir)
    nprobe = min(IVF_NPROBE, len(cent))
    # (n_q, nprobe) cell ids per query
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    ref = ray.put((ids, qmat, cent, qcells))

    class CellMatch:
        def __init__(self, r):
            self.ref = r

        def __call__(self, t: pa.Table) -> pa.Table:
            from ..stages.fetch import cached_broadcast

            qids, qm, ct, qc = cached_broadcast(self.ref)
            vids, m = _emb_rows(t)
            mn = _normalize(m)
            cells = (mn @ ct.T).argmax(axis=1)  # (n,)
            out_q, out_v, out_s = [], [], []
            for j, qid in enumerate(qids):
                hit = np.isin(cells, qc[j]) & (vids != qid)
                if not hit.any():
                    continue
                sims = mn[hit] @ qm[j]
                cids = vids[hit]
                order = np.lexsort((cids, -sims))[:TOP_K]
                out_q.extend([qid] * len(order))
                out_v.extend(cids[order].tolist())
                out_s.extend(sims[order].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = (
        _emb(sf_dir)
        .map_batches(CellMatch(ref), batch_format="pyarrow", batch_size=512)
        .to_pandas()
    )
    if not len(partials):
        return pd.DataFrame(
            {"query_id": [], "vec_id": [], "rank": []}
        ).astype({"query_id": "int64", "vec_id": "int64", "rank": "int64"})
    return _final_topk(partials, TOP_K)


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
