"""The fused tasks-mode pipeline and the composed actors-mode pipeline
must produce identical outputs (same kernels, one shared tokenization)."""

import numpy as np
import pytest

from txiac_qc_ray.config import PipelineConfig
from txiac_qc_ray.pipelines.qc import qc_pipeline_from_parquet


@pytest.mark.parametrize("cols", [["keep", "drop_reason", "scrubbed_text",
                                   "lang_pred", "ppl", "frac_top_3gram"]])
def test_tasks_vs_actors_identical(ray_session, pages_small_dir, cols):
    tasks = qc_pipeline_from_parquet(
        pages_small_dir, PipelineConfig(batch_size=171, stage_mode="tasks")
    ).to_pandas().sort_values("url", ignore_index=True)
    actors = qc_pipeline_from_parquet(
        pages_small_dir,
        PipelineConfig(batch_size=222, stage_mode="actors",
                       langid_concurrency=(1, 2), ppl_concurrency=(1, 2),
                       scrub_concurrency=(1, 2)),
    ).to_pandas().sort_values("url", ignore_index=True)
    assert list(tasks["url"]) == list(actors["url"])
    for c in cols:
        a, b = tasks[c], actors[c]
        if a.dtype == object:
            assert a.where(a.notna(), None).tolist() == b.where(b.notna(), None).tolist(), c
        else:
            np.testing.assert_array_equal(a.to_numpy(), b.to_numpy(), err_msg=c)
