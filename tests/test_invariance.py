"""Property tests: pipeline output must be invariant to physical layout
(file count, batch size) — SURVEY.md §5.4."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from txiac_qc_ray.config import PipelineConfig
from txiac_qc_ray.pipelines.qc import qc_pipeline_from_parquet


@pytest.fixture(scope="module")
def pages_onefile_dir(tmp_path_factory, pages_small):
    d = tmp_path_factory.mktemp("pages_onefile")
    pq.write_table(pages_small, str(d / "all.parquet"))
    return str(d)


def test_file_layout_invariance(ray_session, pages_small_dir, pages_onefile_dir):
    """4 shards vs 1 shard, different batch sizes -> identical labels."""
    a = qc_pipeline_from_parquet(
        pages_small_dir, PipelineConfig(batch_size=93)
    ).to_pandas().sort_values("url", ignore_index=True)
    b = qc_pipeline_from_parquet(
        pages_onefile_dir, PipelineConfig(batch_size=777)
    ).to_pandas().sort_values("url", ignore_index=True)
    assert list(a["url"]) == list(b["url"])
    for c in ("keep", "drop_reason", "scrubbed_text", "ppl", "frac_top_3gram"):
        x, y = a[c], b[c]
        if x.dtype == object:
            assert x.where(x.notna(), None).tolist() == y.where(y.notna(), None).tolist(), c
        else:
            np.testing.assert_array_equal(x.to_numpy(), y.to_numpy(), err_msg=c)


def test_counters_invariant_to_layout(ray_session, pages_small_dir, pages_onefile_dir):
    from txiac_qc_ray.pipelines.counters import compute_counters

    dims = ("lang_pred", "drop_reason")
    a = compute_counters(qc_pipeline_from_parquet(pages_small_dir, PipelineConfig()), dims)
    b = compute_counters(qc_pipeline_from_parquet(pages_onefile_dir, PipelineConfig()), dims)
    assert a.to_dict("records") == b.to_dict("records")
