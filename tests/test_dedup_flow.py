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
    import os

    from txiac_qc_ray.pipelines.qc import (exact_dup_loser_rowkeys,
                                           page_row_keys)

    d, base_urls, dup_urls = dup_pages_dir
    losers = exact_dup_loser_rowkeys(d)
    # "url?copy=1" sorts after "url": every copy loses, no original does
    dup_tab = pq.read_table(os.path.join(d, "part-00001.parquet"))
    exp = np.unique(page_row_keys(dup_tab["url"], dup_tab["warc_ts"]))
    assert losers.dtype == np.uint64
    np.testing.assert_array_equal(losers, exp)


def test_same_url_duplicate_rows_survive(ray_session, tmp_path):
    """Two rows IDENTICAL in url, warc_ts and html (re-ingested
    snapshot): their row keys coincide, so dropping by key would
    annihilate both copies. The loser scan must exclude them — both
    rows keep is_dup_loser=0 and the document survives (under-drop,
    never zero copies). Distinct-url copies in the same corpus still
    drop."""
    import ray

    from txiac_qc_ray.pipelines.qc import (build_qc_pipeline,
                                           exact_dup_loser_rowkeys,
                                           read_pages)
    from txiac_qc_ray.sources.pages import pages_batch

    base = pages_batch(11, 0, 40)
    clone = base.slice(0, 10)  # same url+ts+html: indistinguishable rows
    distinct = base.slice(10, 10)
    distinct = distinct.set_column(
        distinct.schema.get_field_index("url"), "url",
        pa.array([u + "?v=2" for u in distinct["url"].to_pylist()]))
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(base, str(d / "part-00000.parquet"))
    pq.write_table(clone, str(d / "part-00001.parquet"))
    pq.write_table(distinct, str(d / "part-00002.parquet"))

    cfg = PipelineConfig()
    cfg.dup_rowkeys_ref = ray.put(exact_dup_loser_rowkeys(str(d), cfg))
    cfg.rules = cfg.rules + (DEDUP_RULE,)
    out = build_qc_pipeline(read_pages(str(d)), cfg).to_pandas()

    cloned_urls = set(clone["url"].to_pylist())
    cloned = out[out["url"].isin(cloned_urls)]
    assert len(cloned) == 20  # both copies of each row present
    assert not cloned["rule_exact_duplicate"].any()  # never annihilated
    distinct_rows = out[out["url"].str.endswith("?v=2")]
    assert distinct_rows["rule_exact_duplicate"].all()  # still deduped


@pytest.mark.parametrize("mode", ["tasks", "actors"])
def test_dedup_rule_drops_copies(ray_session, dup_pages_dir, mode):
    import ray

    from txiac_qc_ray.pipelines.qc import (build_qc_pipeline,
                                           exact_dup_loser_rowkeys,
                                           read_pages)

    d, base_urls, dup_urls = dup_pages_dir
    cfg = PipelineConfig(stage_mode=mode)
    cfg.dup_rowkeys_ref = ray.put(exact_dup_loser_rowkeys(d, cfg))
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


def test_dedup_index_path_matches_broadcast(ray_session, dup_pages_dir):
    """The high-dup-rate drop-set form (sharded-actor DropIndex, the
    driver never holds the keys — VERDICT r4 item 1) must label exactly
    the rows the broadcast sorted-array form labels."""
    import ray

    from txiac_qc_ray.pipelines.qc import (build_qc_pipeline,
                                           exact_dup_loser_index,
                                           exact_dup_loser_rowkeys,
                                           read_pages)

    d, base_urls, dup_urls = dup_pages_dir
    cfg_bc = PipelineConfig()
    cfg_bc.dup_rowkeys_ref = ray.put(exact_dup_loser_rowkeys(d, cfg_bc))
    cfg_bc.rules = cfg_bc.rules + (DEDUP_RULE,)
    bc = (build_qc_pipeline(read_pages(d), cfg_bc).to_pandas()
          .sort_values("url", ignore_index=True))

    cfg_ix = PipelineConfig()
    cfg_ix.dup_rowkeys_ref = exact_dup_loser_index(d, cfg_ix, n_shards=3)
    cfg_ix.rules = cfg_ix.rules + (DEDUP_RULE,)
    ix = (build_qc_pipeline(read_pages(d), cfg_ix).to_pandas()
          .sort_values("url", ignore_index=True))

    assert (bc["rule_exact_duplicate"] == ix["rule_exact_duplicate"]).all()
    assert (bc["keep"] == ix["keep"]).all()
    assert (bc["drop_reason"].fillna("") == ix["drop_reason"].fillna("")).all()
