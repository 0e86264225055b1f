"""Golden-fixture parity: the distributed Ray pipeline must reproduce the
frozen single-process oracle exactly — byte-identical text per url,
identical keep/drop labels and drop_reasons, identical scrubbed text,
identical counters — regardless of batching or actor-pool parallelism
(SURVEY.md §5.1, BASELINE.md F1 targets)."""

import numpy as np
import pandas as pd
import pytest

from txiac_qc_ray.config import PipelineConfig
from txiac_qc_ray.oracle import oracle_counters
from txiac_qc_ray.pipelines.counters import compute_counters
from txiac_qc_ray.pipelines.qc import qc_pipeline_from_parquet


@pytest.fixture(scope="module")
def labeled_ray(ray_session, pages_small_dir):
    cfg = PipelineConfig(batch_size=137, langid_concurrency=(1, 2),
                         ppl_concurrency=(1, 2), scrub_concurrency=(1, 2))
    ds = qc_pipeline_from_parquet(pages_small_dir, cfg)
    df = ds.to_pandas()
    return df.sort_values("url", ignore_index=True)


def test_row_count_and_schema(labeled_ray, golden_small):
    assert len(labeled_ray) == golden_small.num_rows
    for col in ("url", "text", "keep", "drop_reason", "scrubbed_text",
                "lang_pred", "ppl", "n_words", "host"):
        assert col in labeled_ray.columns, col


def test_extracted_text_byte_identical(labeled_ray, golden_small):
    gold = golden_small.column("text").to_pylist()
    got = labeled_ray["text"].where(labeled_ray["text"].notna(), None).tolist()
    assert got == gold


def test_keep_drop_exact_match(labeled_ray, golden_small):
    gold_keep = golden_small.column("keep").to_pylist()
    got_keep = labeled_ray["keep"].tolist()
    assert got_keep == gold_keep  # F1 == 1.0 at fixture scale
    gold_reason = golden_small.column("drop_reason").to_pylist()
    got_reason = labeled_ray["drop_reason"].where(
        labeled_ray["drop_reason"].notna(), None).tolist()
    assert got_reason == gold_reason


def test_keep_drop_f1(labeled_ray, golden_small):
    """The formal BASELINE criterion (F1 >= 0.99) — trivially satisfied by
    the exact-match test, asserted explicitly for the record."""
    gold = np.array(golden_small.column("keep").to_pylist(), dtype=bool)
    got = labeled_ray["keep"].to_numpy(dtype=bool)
    tp = (gold & got).sum()
    prec = tp / max(got.sum(), 1)
    rec = tp / max(gold.sum(), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    assert f1 >= 0.99


def test_scrubbed_text_byte_identical(labeled_ray, golden_small):
    gold = golden_small.column("scrubbed_text").to_pylist()
    got = labeled_ray["scrubbed_text"].where(
        labeled_ray["scrubbed_text"].notna(), None).tolist()
    assert got == gold


def test_feature_values_match(labeled_ray, golden_small):
    for col in ("n_words", "stopword_ratio", "symbol_word_ratio",
                "frac_top_3gram", "dup_para_frac", "ppl", "lang_score"):
        gold = np.asarray(golden_small.column(col).to_pylist(), dtype=np.float64)
        got = labeled_ray[col].to_numpy(dtype=np.float64)
        np.testing.assert_array_equal(got, gold, err_msg=col)


def test_counters_match_oracle(ray_session, pages_small_dir, golden_small):
    dims = ("lang_pred", "drop_reason", "host")
    ds = qc_pipeline_from_parquet(pages_small_dir, PipelineConfig(batch_size=100))
    got = compute_counters(ds, dims)
    gold = oracle_counters(golden_small, dims)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), gold.reset_index(drop=True), check_dtype=False
    )


def test_counters_sum_to_rowcount(ray_session, pages_small_dir, golden_small):
    ds = qc_pipeline_from_parquet(pages_small_dir, PipelineConfig())
    got = compute_counters(ds, ("lang_pred",))
    assert got["count_all"].sum() == golden_small.num_rows


def test_rule_counters_match_golden(ray_session, pages_small_dir, golden_small):
    from txiac_qc_ray.pipelines.counters import rule_counters

    ds = qc_pipeline_from_parquet(pages_small_dir, PipelineConfig())
    rc = rule_counters(ds).set_index("rule")
    gold = golden_small
    total = rc.loc["_total"]
    assert total["fired"] == gold.num_rows
    assert total["kept"] == sum(1 for k in gold.column("keep").to_pylist() if k)
    assert total["scrubbed"] == sum(1 for s in gold.column("scrubbed").to_pylist() if s)
    import collections
    fired = collections.Counter()
    for flags in gold.column("rule_flags").to_pylist():
        for f in flags:
            fired[f] += 1
    for rule, cnt in fired.items():
        assert rc.loc[rule, "fired"] == cnt, rule
