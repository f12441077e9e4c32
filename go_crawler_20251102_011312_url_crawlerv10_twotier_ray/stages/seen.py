"""Sharded URL-seen filter — the engine's central stateful stage.

The reference's three dedup structures are mutex-guarded in-process maps:

- normalized-URL seen map (T1, crawler/crawler_twotier.go:23-24, 223-245),
- colly's internal raw-URL revisit storage (T2, crawler_twotier.go:200),
- downloaded∪pending document map (T3, downloader.go:41-44, 280-293).

Here all three become ONE pool of ``SeenShard`` actors, hash-partitioned on
the key (stable blake2b hash — not Python's salted ``hash``), each holding a
Bloom front + exact set per key kind. ``check_and_add`` is atomic per shard
(actor mailbox serializes calls), giving exactly-once accept semantics.
Batches from any ``map_batches`` task route their keys to shards with
:func:`check_and_add_batch`; the driver never funnels the key stream.

Determinism: callers must deduplicate keys *within* an epoch before calling
(pipelines/crawl.py does a groupby(url_norm) dedup with a deterministic
tie-break first), so cross-batch call order cannot change which row wins.

Scale notes: shard count is a config knob (cfg.seen_shards); at 10^10 URLs
shards spread across the cluster (Ray places actors), the Bloom front keeps
the hot path cheap and the exact sets are snapshot to per-shard Parquet at
every epoch checkpoint (state/checkpoint.py) for resume.
"""

from __future__ import annotations

import numpy as np
import ray

from ..state.bloom import BloomFilter, stable_hash64

KINDS = ("norm", "raw", "doc")


class SeenShard:
    """One shard of the seen state. Instantiated via ray.remote."""

    def __init__(self, shard_id: int, bloom_capacity: int = 1_000_000):
        self.shard_id = shard_id
        self.exact: dict[str, set[str]] = {k: set() for k in KINDS}
        self.bloom: dict[str, BloomFilter] = {
            k: BloomFilter(bloom_capacity) for k in KINDS
        }
        self.epoch_buf: dict[str, dict[str, str]] = {}
        # lifetime count of offer ENTRIES processed, per kind — the driver
        # fences an epoch by waiting until sum(received) catches up with the
        # entries the (fire-and-forget) fetch tasks reported sending
        self.received: dict[str, int] = {k: 0 for k in KINDS}

    def check_and_add(self, kind: str, keys: list[str]) -> list[bool]:
        """For each key: True if newly added (was not seen), else False.
        Atomic for the whole call (actor model)."""
        s = self.exact[kind]
        bf = self.bloom[kind]
        out = []
        for k in keys:
            if bf.might_contain(k) and k in s:
                out.append(False)
            else:
                s.add(k)
                bf.add(k)
                out.append(True)
        return out

    def offer_min(self, kind: str, norms: list[str], keys: list[str]) -> int:
        """Within-epoch candidate dedup fused into the shard: buffer the MIN
        key per unseen norm (min is order-independent ⇒ deterministic no
        matter how batches race). The buffered set becomes visible to the
        seen set only at drain_epoch — all offers within an epoch observe
        the pre-epoch state, exactly like the oracle's epoch-batch
        semantics. Replaces a full groupby(url_norm) shuffle per epoch."""
        s = self.exact[kind]
        buf = self.epoch_buf.setdefault(kind, {})
        self.received[kind] += len(norms)
        n = 0
        for norm, key in zip(norms, keys):
            if norm in s:
                continue
            cur = buf.get(norm)
            if cur is None or key < cur:
                buf[norm] = key
                n += 1
        return n

    def offers_received(self, kind: str) -> int:
        return self.received[kind]

    def drain_epoch_table(self, kind: str):
        """drain_epoch, returned as one Arrow table — the dataset-frontier
        path builds the next epoch's frontier with
        ``ray.data.from_arrow_refs`` over these per-shard refs, so the
        accepted candidates NEVER pass through the driver."""
        import pyarrow as pa

        norms, keys = self.drain_epoch(kind)
        return pa.table({"url_norm": norms, "key": keys})

    def drain_epoch(self, kind: str):
        """Commit the epoch buffer into the seen set; return accepted
        (norm, min_key) pairs as two Arrow arrays (zero-copy transfer).
        Pairs are returned UNSORTED — the driver-side assemble sorts the
        merged result anyway, so a per-shard sort would be pure waste."""
        import os
        import time

        import pyarrow as pa

        t0 = time.perf_counter()
        buf = self.epoch_buf.pop(kind, {})
        s = self.exact[kind]
        s.update(buf.keys())
        self.bloom[kind].add_many(list(buf.keys()))
        out = (
            pa.array(list(buf.keys()), pa.string()),
            pa.array(list(buf.values()), pa.string()),
        )
        if os.environ.get("GRAFT_CRAWL_DEBUG"):
            import sys

            print(
                f"[shard {self.shard_id}] drain {len(buf)} keys "
                f"in {time.perf_counter()-t0:.3f}s at {time.time():.3f}",
                file=sys.stderr, flush=True,
            )
        return out

    def contains(self, kind: str, keys: list[str]) -> list[bool]:
        s = self.exact[kind]
        return [k in s for k in keys]

    def add(self, kind: str, keys: list[str]) -> None:
        s = self.exact[kind]
        new = [k for k in keys if k not in s]
        s.update(new)
        self.bloom[kind].add_many(new)

    def size(self, kind: str) -> int:
        return len(self.exact[kind])

    def dump_keys(self, kind: str) -> list[str]:
        """Exact keys of ONE kind (dataset-mode checkpoint uses this for
        the tiny 'raw' seed-dispatch set only; norm/doc state is rebuilt
        from the per-epoch parquet instead of being dumped)."""
        return sorted(self.exact[kind])

    def snapshot(self) -> dict:
        """Checkpoint payload: exact keys per kind + bloom digest."""
        return {
            "shard_id": self.shard_id,
            "exact": {k: sorted(v) for k, v in self.exact.items()},
            "bloom_bytes": {k: self.bloom[k].to_bytes() for k in KINDS},
            "bloom_added": {k: self.bloom[k].n_added for k in KINDS},
        }

    def restore(self, snap: dict) -> None:
        for k in KINDS:
            self.exact[k] = set(snap["exact"].get(k, []))
            cap = self.bloom[k].capacity
            self.bloom[k] = BloomFilter.from_bytes(
                snap["bloom_bytes"][k], cap, self.bloom[k].fp_rate,
                snap["bloom_added"][k],
            ) if k in snap.get("bloom_bytes", {}) else self.bloom[k]


class ShardedSeen:
    """Driver-side handle bundle for the shard pool."""

    def __init__(self, n_shards: int, bloom_capacity: int = 1_000_000):
        self.n_shards = n_shards
        actor_cls = ray.remote(num_cpus=0.05)(SeenShard)
        self.shards = [
            actor_cls.remote(i, bloom_capacity) for i in range(n_shards)
        ]

    def handles(self) -> list:
        return self.shards

    def check_and_add(self, kind: str, keys: list[str]) -> np.ndarray:
        return check_and_add_batch(self.shards, kind, keys)

    def total(self, kind: str) -> int:
        return sum(ray.get([s.size.remote(kind) for s in self.shards]))

    def keys(self, kind: str) -> list[str]:
        out: list[str] = []
        for part in ray.get([s.dump_keys.remote(kind) for s in self.shards]):
            out.extend(part)
        return sorted(out)

    def drain(self, kind: str):
        """Merged accepted (norm, key) pairs from all shards, norm-sorted,
        as a pyarrow Table."""
        return assemble_drain(
            ray.get([s.drain_epoch.remote(kind) for s in self.shards])
        )

    def snapshots(self) -> list[dict]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list[dict]) -> None:
        ray.get(
            [self.shards[s["shard_id"]].restore.remote(s) for s in snaps]
        )

    def kill(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def assemble_drain(parts):
    """Merge per-shard (norms, keys) arrow arrays into one norm-sorted table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    norms = pa.concat_arrays([p[0] for p in parts])
    keys = pa.concat_arrays([p[1] for p in parts])
    if len(norms) == 0:
        return pa.table({"url_norm": norms, "key": keys})
    idx = pc.sort_indices(norms)
    return pa.table(
        {"url_norm": pc.take(norms, idx), "key": pc.take(keys, idx)}
    )


def shard_of(key: str, n_shards: int) -> int:
    return stable_hash64(key) % n_shards


def offer_min_batch(shard_handles: list, kind: str, norms, keys) -> int:
    """Route (norm, key) offers to their shards (callable from map_batches
    tasks). FIRE-AND-FORGET: no blocking round-trip in the fetch hot path —
    the driver fences the epoch by polling ``offers_received`` until it
    catches up with the sent-entry count the tasks report in their output
    (pipelines/crawl.py). Returns the number of entries submitted."""
    n = len(shard_handles)
    per_shard: dict[int, tuple[list[str], list[str]]] = {}
    for norm, key in zip(norms, keys):
        sl = per_shard.setdefault(shard_of(norm, n), ([], []))
        sl[0].append(norm)
        sl[1].append(key)
    for sid, (ns, ks) in per_shard.items():
        shard_handles[sid].offer_min.remote(kind, ns, ks)
    return len(norms)


def wait_offers_received(shard_handles: list, kind: str, expected: int,
                         timeout: float = 120.0) -> int:
    """Block until the shard pool has processed ≥ ``expected`` offer
    entries (fire-and-forget sends are reliable but async; a task retry can
    only overshoot, so ``>=`` is the right fence). ``timeout`` is a STALL
    timeout — it resets whenever the received count grows, so a huge but
    draining backlog never false-aborts; only zero progress for the full
    window raises."""
    import time

    last = -1
    deadline = time.monotonic() + timeout
    while True:
        got = sum(
            ray.get([s.offers_received.remote(kind) for s in shard_handles])
        )
        if got >= expected:
            return got
        if got > last:
            last = got
            deadline = time.monotonic() + timeout
        elif time.monotonic() > deadline:
            raise TimeoutError(
                f"seen shards received {got}/{expected} offers with no "
                f"progress for {timeout}s — a fetch worker likely died "
                "mid-send"
            )
        time.sleep(0.005)


def check_and_add_batch(shard_handles: list, kind: str, keys) -> np.ndarray:
    """Route keys to their shards, check-and-add, reassemble the mask in
    input order. Callable from inside map_batches tasks (actor handles are
    serializable) — the hot-path seen probe never goes through the driver."""
    keys = list(keys)
    n = len(shard_handles)
    per_shard: dict[int, list[int]] = {}
    for idx, k in enumerate(keys):
        per_shard.setdefault(shard_of(k, n), []).append(idx)
    mask = np.zeros(len(keys), dtype=bool)
    refs = []
    order = []
    for sid, idxs in per_shard.items():
        refs.append(
            shard_handles[sid].check_and_add.remote(kind, [keys[i] for i in idxs])
        )
        order.append(idxs)
    for idxs, res in zip(order, ray.get(refs)):
        for i, ok in zip(idxs, res):
            mask[i] = ok
    return mask
