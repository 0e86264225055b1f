"""The --neardup launch flow: cross-document NEAR-dup dedup over
extracted page text (MinHash-LSH + exact-Jaccard verify + connected
components), wired into the flagship as pass 0 (loser row-key scan) +
an ordinary appended RuleSpec (config.NEARDUP_RULE). A perturbed copy
of a page (a few words appended — NOT byte-identical, so --dedup would
miss it) must put exactly one of the pair in the drop set; the
flagship's rule_near_duplicate column must equal drop-set membership
in BOTH stage modes and for BOTH drop-set forms (broadcast array /
sharded DropIndex)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from txiac_qc_ray.config import NEARDUP_RULE, PipelineConfig


@pytest.fixture(scope="module")
def neardup_pages_dir(tmp_path_factory):
    """80 base pages + NEAR-copies of the first 15 CLEAN ones (url
    differs, text gains a trailing sentence -> word-trigram Jaccard
    well above 0.8 for these ~200+-word docs but not 1.0), split over
    two shard files."""
    from txiac_qc_ray.sources.pages import (_render_html, pages_batch,
                                            PAGES_SCHEMA)

    base = pages_batch(13, 0, 80)
    texts = base["text"].to_pylist()
    langs = base["lang"].to_pylist()
    # clean long English rows only: the perturbation must keep the pair
    # above the verify threshold, and short/garbage rows are owned by
    # other rules anyway
    clean = [i for i, (t, l) in enumerate(zip(texts, langs))
             if t is not None and l == "en" and len(t.split()) >= 120][:15]
    assert len(clean) == 15
    rows = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    for i in clean:
        new_text = texts[i] + "\n\nMirrored syndication copy of the page."
        rows["url"].append(base["url"][i].as_py() + "?mirror=1")
        rows["warc_ts"].append(base["warc_ts"][i].as_py())
        rows["html"].append(_render_html(new_text, i).encode("utf-8"))
        rows["text"].append(new_text)
        rows["lang"].append(langs[i])
    mirrors = pa.table(rows, schema=PAGES_SCHEMA)
    d = tmp_path_factory.mktemp("neardup_pages")
    pq.write_table(base, str(d / "part-00000.parquet"))
    pq.write_table(mirrors, str(d / "part-00001.parquet"))
    return str(d), base, mirrors, clean


def _pair_keys(base, mirrors, clean):
    from txiac_qc_ray.pipelines.qc import page_row_keys

    base_keys = page_row_keys(base["url"], base["warc_ts"])
    mirror_keys = page_row_keys(mirrors["url"], mirrors["warc_ts"])
    return [(base_keys[i], mirror_keys[j]) for j, i in enumerate(clean)]


def test_neardup_scan_drops_one_of_each_pair(ray_session, neardup_pages_dir):
    from txiac_qc_ray.pipelines.qc import neardup_loser_rowkeys

    d, base, mirrors, clean = neardup_pages_dir
    losers = set(neardup_loser_rowkeys(d).tolist())
    for bk, mk in _pair_keys(base, mirrors, clean):
        # exactly one of (original, mirror) loses; content always survives
        assert (int(bk) in losers) != (int(mk) in losers)


def test_neardup_scan_clean_corpus_is_empty(ray_session, tmp_path):
    """A corpus with no near-dups (distinct zipf prose) produces an
    EMPTY drop set — and the empty Dataset keeps its `key` column."""
    from txiac_qc_ray.pipelines.qc import (neardup_loser_rowkeys,
                                           neardup_loser_rowkeys_ds)
    from txiac_qc_ray.sources.pages import pages_batch

    d = tmp_path / "clean"
    d.mkdir()
    tab = pages_batch(29, 0, 40)
    # drop the repetition rows: two high-repetition pages can
    # legitimately share enough trigrams to near-dup each other
    keep = [i for i, t in enumerate(tab["text"].to_pylist())
            if t is None or "repeat" not in (t or "")]
    pq.write_table(tab.take(keep), str(d / "part-00000.parquet"))
    assert neardup_loser_rowkeys(str(d)).size == 0
    assert "key" in neardup_loser_rowkeys_ds(str(d)).schema().names


@pytest.mark.parametrize("mode", ["tasks", "actors"])
def test_neardup_rule_matches_drop_set(ray_session, neardup_pages_dir, mode):
    import ray

    from txiac_qc_ray.pipelines.qc import (build_qc_pipeline,
                                           neardup_loser_rowkeys,
                                           page_row_keys, read_pages)

    d, base, mirrors, clean = neardup_pages_dir
    losers = neardup_loser_rowkeys(d)
    cfg = PipelineConfig(stage_mode=mode)
    cfg.neardup_rowkeys_ref = ray.put(losers)
    cfg.rules = cfg.rules + (NEARDUP_RULE,)
    out = build_qc_pipeline(read_pages(d), cfg).to_pandas()

    keys = page_row_keys(pa.array(out["url"].tolist()),
                         pa.array(out["warc_ts"].tolist(),
                                  type=pa.timestamp("us")))
    in_set = np.isin(keys, losers)
    np.testing.assert_array_equal(
        out["rule_near_duplicate"].to_numpy().astype(bool), in_set)
    # the drop reason surfaces for losers no earlier rule caught
    flagged = out[in_set]
    pure = flagged[flagged["drop_reason"] == "near_duplicate"]
    assert len(pure) > 0
    assert not flagged["keep"].any()


def test_neardup_dropindex_equals_broadcast(ray_session, neardup_pages_dir):
    import ray

    from txiac_qc_ray.pipelines.qc import (build_qc_pipeline,
                                           neardup_loser_index,
                                           neardup_loser_rowkeys, read_pages)

    d, *_ = neardup_pages_dir
    cfg_a = PipelineConfig()
    cfg_a.neardup_rowkeys_ref = ray.put(neardup_loser_rowkeys(d))
    cfg_a.rules = cfg_a.rules + (NEARDUP_RULE,)
    a = (build_qc_pipeline(read_pages(d), cfg_a).to_pandas()
         .sort_values("url", ignore_index=True))

    cfg_b = PipelineConfig()
    cfg_b.neardup_rowkeys_ref = neardup_loser_index(d)
    cfg_b.rules = cfg_b.rules + (NEARDUP_RULE,)
    b = (build_qc_pipeline(read_pages(d), cfg_b).to_pandas()
         .sort_values("url", ignore_index=True))

    np.testing.assert_array_equal(a["rule_near_duplicate"].to_numpy(),
                                  b["rule_near_duplicate"].to_numpy())
    np.testing.assert_array_equal(a["keep"].to_numpy(), b["keep"].to_numpy())
