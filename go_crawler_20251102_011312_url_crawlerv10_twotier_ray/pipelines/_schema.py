"""Block-schema stabilization for Dataset pipelines feeding joins.

Two related Ray Data failure modes on small/skewed inputs (measured, see
tests/test_text_edge_cases.py):

1. ``read_parquet`` splits a tiny file into more blocks than rows.
2. ``map_batches`` SKIPS the UDF on zero-row input blocks and emits
   zero-ROW zero-COLUMN (schema-less) blocks instead — so a map-based
   "repair the schema" stage can never run on exactly the blocks that
   need it.

A zero-column block anywhere upstream of a ``Dataset.join`` poisons it:
the join partition that receives only schema-less chunks raises
``ArrowInvalid: No match ... for key field reference`` inside Acero.
(The all-empty-Dataset variant of this is the `_scan_misses_dataset`
lesson from round 2.)

Fixes here:
- ``read_parquet_bounded``: never create more read blocks than rows.
- ``heal_blocks``: materialize + repartition — repartition CONCATENATES
  blocks, and a concat of typed + schema-less empties keeps the typed
  schema, so the output has only non-empty typed blocks. Apply on any
  aggregate → join edge (aggregates emit zero-column blocks for empty
  hash partitions).
"""

from __future__ import annotations

import ray
import ray.data as rd


def read_parquet_bounded(path: str, columns=None, factor: int = 3,
                         cap: int = 200) -> rd.Dataset:
    """``read_parquet`` with ``override_num_blocks`` bounded by the file's
    ROW COUNT (metadata-only). Also keeps a one-file read from fusing
    serially with downstream stages (the round-1 lesson
    sources/pages.read_pages guards against)."""
    import pyarrow.dataset as pads

    n_rows = pads.dataset(path).count_rows()
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    target = max(8, min(cap, factor * cpus))
    return rd.read_parquet(
        path, columns=columns,
        override_num_blocks=max(1, min(target, n_rows or 1)),
    )


def n_parts(n_rows: int, floor: int = 4) -> int:
    """Co-partition count from row volume — ~250k rows/partition, capped
    at 1024 (each all-to-all partition costs ~0.1 s fixed on this box;
    CLAUDE.md 'sized by ROW COUNT'). The ONE definition of the sizing
    rule — dedup/text co-partition stages all import it."""
    return max(floor, min(1024, n_rows // 250_000 + 1))


def stamp_str_part(col: str, n_part: int):
    """map_batches fn adding ``part = hash(string col) % n_part`` — the
    co-partition key for per-key merges over STRING keys (terms, n-grams);
    the int-key twins are dedup._stamp_band_part / _stamp_pair_part."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def stamp(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t[col].to_pandas(), index=False).to_numpy()
        return t.append_column(
            "part", pa.array((h % np.uint64(n_part)).astype(np.int64)))

    return stamp


def auto_pool(lo: int = 2, frac: float = 0.5,
              cap: int = 32) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized off the session CPU count.
    Model-bearing stages must never pin a fixed tiny pool — the reference
    scales its bottleneck tier 100→800 workers on queue pressure
    (monitor.go:57-107); the Ray analogue is ``concurrency=(lo, hi)``
    so the pool grows with the cluster instead of starving at 2 actors."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    hi = max(lo + 2, min(cap, int(cpus * frac)))
    return (lo, hi)


def heal_blocks(ds: rd.Dataset, target_blocks: int = 200) -> rd.Dataset | None:
    """Make every block non-empty and typed so the Dataset can safely
    feed a join: materialize, then repartition to ≤ row-count blocks ONLY
    if an empty block actually exists (per-block row counts are metadata
    on a materialized Dataset — the common healthy case pays nothing
    beyond the materialize). Returns None for an all-empty Dataset — its
    schema is unrecoverable; callers early-return a typed empty frame."""
    m = ds.materialize()
    try:
        rows = m._block_num_rows()
        n = sum(rows)
        has_empty = any(r == 0 for r in rows)
    except Exception:  # private API fallback: assume the worst
        n = m.count()
        has_empty = True
    if n == 0:
        return None
    if not has_empty:
        return m
    return m.repartition(max(1, min(target_blocks, n)))
