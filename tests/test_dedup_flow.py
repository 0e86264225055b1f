"""The --dedup launch flow: cross-document exact dedup over extracted
text, wired into the flagship as pass 0 (loser url-hash scan) + an
ordinary appended RuleSpec (config.DEDUP_RULE) evaluated by the rules
stage. Duplicated pages (identical html under a different url) must
drop with drop_reason=exact_duplicate in BOTH stage modes, the min-url
copy must win, and a dedup-off run must be byte-identical to before.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from txiac_qc_ray.config import DEDUP_RULE, PipelineConfig


@pytest.fixture(scope="module")
def dup_pages_dir(tmp_path_factory):
    """120 base pages + exact copies of the first 30 under urls that
    sort AFTER their originals, split over two shard files."""
    from txiac_qc_ray.sources.pages import pages_batch

    base = pages_batch(7, 0, 120)
    dup = base.slice(0, 30)
    dup_urls = pa.array([u + "?copy=1" for u in dup["url"].to_pylist()])
    dup = dup.set_column(dup.schema.get_field_index("url"), "url", dup_urls)
    d = tmp_path_factory.mktemp("dup_pages")
    pq.write_table(base, str(d / "part-00000.parquet"))
    pq.write_table(dup, str(d / "part-00001.parquet"))
    return str(d), base["url"].to_pylist(), dup_urls.to_pylist()


def test_loser_scan_finds_exact_copies(ray_session, dup_pages_dir):
    from txiac_qc_ray.functions.urls import fnv1a64
    from txiac_qc_ray.pipelines.qc import exact_dup_loser_urlhashes

    d, base_urls, dup_urls = dup_pages_dir
    losers = exact_dup_loser_urlhashes(d)
    # "url?copy=1" sorts after "url": every copy loses, no original does
    exp = np.sort(fnv1a64(pa.array(dup_urls)))
    assert losers.dtype == np.uint64
    np.testing.assert_array_equal(losers, exp)


@pytest.mark.parametrize("mode", ["tasks", "actors"])
def test_dedup_rule_drops_copies(ray_session, dup_pages_dir, mode):
    import ray

    from txiac_qc_ray.pipelines.qc import (build_qc_pipeline,
                                           exact_dup_loser_urlhashes,
                                           read_pages)

    d, base_urls, dup_urls = dup_pages_dir
    cfg = PipelineConfig(stage_mode=mode)
    cfg.dup_urlhashes_ref = ray.put(exact_dup_loser_urlhashes(d, cfg))
    cfg.rules = cfg.rules + (DEDUP_RULE,)
    out = build_qc_pipeline(read_pages(d), cfg).to_pandas().set_index("url")

    copies = out.loc[dup_urls]
    assert not copies["keep"].any()
    # dup rule is appended LAST: a copy that also fails an earlier rule
    # keeps that rule's reason; otherwise the reason is exact_duplicate
    assert copies["rule_exact_duplicate"].all()
    originals = out.loc[base_urls]
    assert not originals["rule_exact_duplicate"].any()

    # the baseline pipeline (dedup off) is unaffected on the originals
    plain = (build_qc_pipeline(read_pages(d), PipelineConfig(stage_mode=mode))
             .to_pandas().set_index("url"))
    assert (plain.loc[base_urls, "keep"] == originals["keep"]).all()
    assert (plain.loc[base_urls, "drop_reason"].fillna("")
            == originals["drop_reason"].fillna("")).all()
    # copies that only the dedup rule catches carry its reason
    pure_dups = copies[plain.loc[dup_urls, "keep"].to_numpy()]
    assert len(pure_dups) > 0
    assert (pure_dups["drop_reason"] == "exact_duplicate").all()
