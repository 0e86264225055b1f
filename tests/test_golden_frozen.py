"""Parity against the FROZEN golden artifact (tests/golden/*.parquet).

The in-memory oracle (oracle.py) shares kernels with the pipeline, so a
kernel regression would shift both silently; this file pins today's
semantics to a committed parquet — byte-identical text, identical
keep/drop/drop_reason/scrub, bit-identical feature values. If a kernel
is deliberately changed, regenerate the artifact (see module main) and
say so in the commit.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from txiac_qc_ray.config import PipelineConfig
from txiac_qc_ray.pipelines.qc import qc_pipeline_from_parquet

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_800.parquet")


@pytest.fixture(scope="module")
def golden_frozen():
    return pq.read_table(GOLDEN).to_pandas().sort_values("url", ignore_index=True)


@pytest.fixture(scope="module")
def pipeline_out(ray_session, pages_small_dir):
    return qc_pipeline_from_parquet(
        pages_small_dir, PipelineConfig(batch_size=251)
    ).to_pandas().sort_values("url", ignore_index=True)


def test_frozen_keep_drop(pipeline_out, golden_frozen):
    assert pipeline_out["keep"].tolist() == golden_frozen["keep"].tolist()
    a = pipeline_out["drop_reason"].where(pipeline_out["drop_reason"].notna(), None)
    b = golden_frozen["drop_reason"].where(golden_frozen["drop_reason"].notna(), None)
    assert a.tolist() == b.tolist()


def test_frozen_text_and_scrub(pipeline_out, golden_frozen):
    for col in ("text", "scrubbed_text"):
        a = pipeline_out[col].where(pipeline_out[col].notna(), None)
        b = golden_frozen[col].where(golden_frozen[col].notna(), None)
        assert a.tolist() == b.tolist(), col


def test_frozen_features_bitwise(pipeline_out, golden_frozen):
    for col in ("lang_score", "ppl", "n_words", "stopword_ratio",
                "symbol_word_ratio", "frac_top_3gram", "dup_para_frac",
                "mean_word_len"):
        np.testing.assert_array_equal(
            pipeline_out[col].to_numpy(dtype=np.float64),
            golden_frozen[col].to_numpy(dtype=np.float64), err_msg=col)


def test_frozen_rule_flags(pipeline_out, golden_frozen):
    a = [list(x) for x in pipeline_out["rule_flags"]]
    b = [list(x) for x in golden_frozen["rule_flags"]]
    assert a == b


if __name__ == "__main__":  # regenerate the artifact (deliberate changes only)
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import pyarrow.parquet as _pq

    from txiac_qc_ray.oracle import oracle_label
    from txiac_qc_ray.sources.pages import pages_batch

    gold = oracle_label(pages_batch(42, 0, 800)).select(
        ["url", "text", "keep", "drop_reason", "rule_flags", "scrubbed_text",
         "lang_pred", "lang_score", "ppl", "n_words", "stopword_ratio",
         "symbol_word_ratio", "frac_top_3gram", "dup_para_frac",
         "mean_word_len", "host"])
    _pq.write_table(gold, GOLDEN, compression="zstd")
    print("regenerated", GOLDEN)
