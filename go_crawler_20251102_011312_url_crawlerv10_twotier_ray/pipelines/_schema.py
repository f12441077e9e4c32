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
