import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (per repo instructions)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_corpus_dir(tmp_path_factory):
    """Small deterministic corpus with every quirk case (FIXTURES.md smoke tier)."""
    from go_crawler_20251102_011312_url_crawlerv10_twotier_ray.corpus import (
        write_corpus,
    )

    d = str(tmp_path_factory.mktemp("corpus") / "smoke")
    return write_corpus(d, n_pages=120, n_hosts=6, seed=42)
