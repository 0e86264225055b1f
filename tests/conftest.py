import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (repo guideline)."""
    import ray

    if not ray.is_initialized():
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
def pages_small():
    """Deterministic 800-doc fixture corpus as one Arrow table."""
    from txiac_qc_ray.sources.pages import pages_batch

    return pages_batch(42, 0, 800)


@pytest.fixture(scope="session")
def pages_small_dir(tmp_path_factory, pages_small):
    """Same corpus written as parquet shards (4 files x 200 rows)."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("pages_small")
    for k in range(4):
        pq.write_table(pages_small.slice(k * 200, 200), str(d / f"part-{k:05d}.parquet"))
    return str(d)


@pytest.fixture(scope="session")
def golden_small(pages_small):
    """Oracle labels for the 800-doc corpus (frozen single-process path)."""
    from txiac_qc_ray.oracle import oracle_label

    return oracle_label(pages_small)
