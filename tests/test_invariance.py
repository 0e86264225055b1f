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


@pytest.fixture(scope="module")
def resharded_sf(tmp_path_factory):
    """sf0.001 with documents re-split into 7 uneven shards and
    embeddings into 3 — physical layout must not change any answer."""
    import os

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("resharded")
    docs = pq.read_table(os.path.join(src, "documents.parquet"))
    bounds = [0, 41, 99, 160, 260, 333, 420, docs.num_rows]
    os.mkdir(d / "documents.parquet")
    for i in range(len(bounds) - 1):
        pq.write_table(docs.slice(bounds[i], bounds[i + 1] - bounds[i]),
                       str(d / "documents.parquet" / f"p{i}.parquet"))
    emb = pq.read_table(os.path.join(src, "embeddings.parquet"))
    os.mkdir(d / "embeddings.parquet")
    for i, (s, e) in enumerate(((0, 170), (170, 340), (340, emb.num_rows))):
        pq.write_table(emb.slice(s, e - s),
                       str(d / "embeddings.parquet" / f"p{i}.parquet"))
    return str(d)


def test_docs_ops_invariant_to_sharding(ray_session, resharded_sf):
    """Every dedup/ANN/text op must return identical values over the
    7-shard layout and the original single file."""
    import pandas as pd

    from txiac_qc_ray.pipelines import docs as D

    src = "/root/testdata/sf0.001"
    def pdf(res):
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
            res = res.sort_values(list(res.columns), ignore_index=True)
        return res.reset_index(drop=True)

    for name, fn in [
        ("minhash", D.minhash_lsh_candidates),
        ("exact_dedup_rows", D.exact_dedup_rows),
        ("simhash_pairs", D.simhash_neardup_pairs),
        ("ann_lsh", D.ann_topk_lsh),
        ("ann_ivf", D.ann_topk_ivf),
        ("neardup_lsh", D.embedding_neardup_pairs_lsh),
        ("vocab_topk", D.vocab_topk),
    ]:
        a, b = pdf(fn(src)), pdf(fn(resharded_sf))
        pd.testing.assert_frame_equal(a, b, obj=name)
    for name, fn in [("dedup_adjacent", D.dedup_adjacent_tokens),
                     ("decontaminate", D.decontaminate_against)]:
        a = fn(src).to_pandas().sort_values("doc_id", ignore_index=True)
        b = fn(resharded_sf).to_pandas().sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b, obj=name)


def test_docs_ops_invariant_to_shard_count(ray_session):
    """The bounded-shard shuffles must give identical answers at ANY
    shard count (VERDICT r2 item 4: the count is now sized from Parquet
    metadata, so outputs may never depend on it)."""
    import pandas as pd

    from txiac_qc_ray.pipelines import docs as D

    src = "/root/testdata/sf0.001"
    def pdf(res):
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
            res = res.sort_values(list(res.columns), ignore_index=True)
        return res.reset_index(drop=True)

    for fn in (D.exact_dedup_rows, D.minhash_lsh_candidates,
               D.ngram_jaccard_pairs):
        a, b = pdf(fn(src, n_shards=3)), pdf(fn(src, n_shards=17))
        pd.testing.assert_frame_equal(a, b, obj=fn.__name__)
    # metadata sizing: floor of 64 at fixture scale; grows with bytes
    assert D._shard_count(src, "documents") == 64
    assert D._shard_count(src, "documents", target_bytes=1024) > 64
