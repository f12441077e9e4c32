"""Pinned naive reference for the quantized ANN queries
(``ann_lsh_topk``, ``ann_ivf_topk``) + a minting step that writes their
expected outputs as parquet for the driver's read_parquet hash check —
the textops pattern (oracle/textops.py).

The engine (pipelines/ann.py) ranks by EXACT INTEGERS on a pinned
quantization spec, so its output is a deterministic function of
(embeddings table, spec constants) — this module recomputes it with
plain per-row Python loops and exact Python-int arithmetic (no batching,
no broadcast, no BLAS): same mathematical definition, different code
path. A divergence is a bug, not drift — do not "sync" mechanically.

The ONLY float operations are the two the spec pins (both single
correctly-rounded IEEE-754 ops, identical on every platform):
  qn_i = floor(q_i * 1e6 / sqrt(n) + 0.5)      per-component normalize
  c_i  = floor(s_i * 1e6 / sqrt(n2) + 0.5)     centroid re-quantize
plus the frozen RandomState streams for the hyperplanes / k-means init
(transcribed constants, like the minhash spec in textops).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# frozen copies of the engine constants (pipelines/ann.py) — the oracle
# must not move when the engine is edited
_N_QUERIES = 10
_TOP_K = 5
_LSH_TABLES = 6
_LSH_PLANES = 6
_LSH_SEED = 777
_QNT_COMP_SCALE = 10_000
_QNT_NORM_SCALE = 1_000_000
_PLANE_SCALE = 1_000_000
_IVF_NLIST = 16
_IVF_NPROBE = 6
_IVF_SEED = 4242
_IVF_KMEANS_ITERS = 10
_IVF_TRAIN_SAMPLE = 100_000

ANN_ORACLE_VERSION = "v1"  # bump when any pinned constant above changes


def _quantize_row(xs: list[float]) -> list[int]:
    """One row of the pinned spec, plain Python ints."""
    q = [math.floor(float(x) * _QNT_COMP_SCALE + 0.5) for x in xs]
    n = sum(v * v for v in q)  # exact python int
    if n == 0:
        return [0] * len(q)
    s = math.sqrt(n)
    return [math.floor(v * _QNT_NORM_SCALE / s + 0.5) for v in q]


def _load_qn(sf_dir: str) -> tuple[list[int], list[list[int]]]:
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = t["vec_id"].to_pylist()
    rows = [_quantize_row(e) for e in t["embedding"].to_pylist()]
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    return [ids[i] for i in order], [rows[i] for i in order]


def _dot(a: list[int], b) -> int:
    return sum(x * int(y) for x, y in zip(a, b))


def _topk_rows(qid: int, cand: list[tuple[int, int]]) -> list[tuple]:
    """cand = [(vec_id, iscore)] → [(query_id, vec_id, rank, iscore)]."""
    cand.sort(key=lambda p: (-p[1], p[0]))
    return [
        (qid, vid, r + 1, sc) for r, (vid, sc) in enumerate(cand[:_TOP_K])
    ]


def expected_ann_lsh(sf_dir: str) -> pa.Table:
    ids, qn = _load_qn(sf_dir)
    dim = len(qn[0]) if qn else 0
    rng = np.random.RandomState(_LSH_SEED)
    planes = np.floor(
        rng.standard_normal((_LSH_TABLES, dim, _LSH_PLANES)) * _PLANE_SCALE
        + 0.5
    ).astype(np.int64)

    def buckets(row: list[int]) -> list[int]:
        out = []
        for li in range(_LSH_TABLES):
            b = 0
            for bi in range(_LSH_PLANES):
                d = sum(
                    row[d_] * int(planes[li, d_, bi]) for d_ in range(dim)
                )
                if d > 0:
                    b |= 1 << bi
            out.append(b)
        return out

    all_buckets = [buckets(r) for r in qn]
    queries = [(i, ids[i]) for i in range(len(ids)) if ids[i] < _N_QUERIES]
    rows = []
    for qi, qid in queries:
        probe_sets = []
        for li in range(_LSH_TABLES):
            own = all_buckets[qi][li]
            probe_sets.append(
                {own} | {own ^ (1 << bi) for bi in range(_LSH_PLANES)}
            )
        cand = []
        for vi, vid in enumerate(ids):
            if vid == qid:
                continue
            if any(
                all_buckets[vi][li] in probe_sets[li]
                for li in range(_LSH_TABLES)
            ):
                cand.append((vid, _dot(qn[qi], qn[vi])))
        rows.extend(_topk_rows(qid, cand))
    return _rows_table(rows)


def expected_ann_ivf(sf_dir: str) -> pa.Table:
    ids, qn = _load_qn(sf_dir)
    train = [qn[i] for i in range(len(ids)) if ids[i] < _IVF_TRAIN_SAMPLE]
    rng = np.random.RandomState(_IVF_SEED)
    k = min(_IVF_NLIST, len(train))
    cent = [list(train[i]) for i in rng.choice(len(train), size=k,
                                               replace=False)]
    for _ in range(_IVF_KMEANS_ITERS):
        assign = [_argmax_cell(r, cent) for r in train]
        for c in range(k):
            members = [train[i] for i in range(len(train)) if assign[i] == c]
            if not members:
                continue  # empty cell keeps its previous centroid
            s = [sum(col) for col in zip(*members)]  # exact python ints
            n2 = sum(v * v for v in s)
            if n2 == 0:
                continue
            sq = math.sqrt(n2)
            # the engine multiplies THEN divides in float64 — same order
            cent[c] = [
                math.floor(float(v) * _QNT_NORM_SCALE / sq + 0.5) for v in s
            ]
    nprobe = min(_IVF_NPROBE, k)
    cells = [_argmax_cell(r, cent) for r in qn]
    rows = []
    for qi in range(len(ids)):
        qid = ids[qi]
        if qid >= _N_QUERIES:
            continue
        scores = [_dot(qn[qi], c) for c in cent]
        probed = set(
            sorted(range(k), key=lambda c: (-scores[c], c))[:nprobe]
        )
        cand = [
            (ids[vi], _dot(qn[qi], qn[vi]))
            for vi in range(len(ids))
            if ids[vi] != qid and cells[vi] in probed
        ]
        rows.extend(_topk_rows(qid, cand))
    return _rows_table(rows)


def _argmax_cell(row: list[int], cent: list[list[int]]) -> int:
    """Highest exact-int dot; ties → lowest cell id (strict >)."""
    best, best_c = None, 0
    for c, cv in enumerate(cent):
        d = _dot(row, cv)
        if best is None or d > best:
            best, best_c = d, c
    return best_c


def _rows_table(rows: list[tuple]) -> pa.Table:
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "vec_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
            "iscore": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


_TABLES = {
    "oracle_ann_lsh": expected_ann_lsh,
    "oracle_ann_ivf": expected_ann_ivf,
}


def mint_ann_oracles(sf_dir: str, base: str = "/tmp/graft_annoracle") -> str:
    """Compute + cache the expected-output parquet for one sf dir. Pure
    Python (no Ray) so oracle_sql() can call it. Returns the cache dir."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(base, f"{sf_name}-{ANN_ORACLE_VERSION}")
    stamp = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(stamp):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in _TABLES.items():
        pq.write_table(fn(sf_dir), os.path.join(out_dir, f"{name}.parquet"))
    with open(stamp, "w") as f:
        f.write(ANN_ORACLE_VERSION)
    return out_dir


def oracle_sqls(sf_dir: str) -> dict[str, str]:
    """Mint (cached) and return the read_parquet oracle SQL per query key."""
    d = mint_ann_oracles(sf_dir)
    return {
        "ann_lsh_topk": (
            f"SELECT * FROM read_parquet('{d}/oracle_ann_lsh.parquet') "
            "ORDER BY query_id, rank"
        ),
        "ann_ivf_topk": (
            f"SELECT * FROM read_parquet('{d}/oracle_ann_ivf.parquet') "
            "ORDER BY query_id, rank"
        ),
    }
