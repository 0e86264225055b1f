"""Round-5 session-5 ops: calibration parity, fraction consistency,
sink round trip.

The DuckDB twins (scripts/check_oracle.py) value-check each op's full
result; these tests pin the properties the twins can't see — the
histogram-quantile shortcut against numpy's expanded-array percentile,
the fraction op's consistency with its absolute-count sibling, and the
export's on-disk format contract.
"""

import glob
import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def test_calibrated_fences_match_numpy_percentile(ray_session):
    """The O(distinct) histogram quantile must equal np.percentile over
    the EXPANDED per-doc values bit-for-bit (both are the 'linear'
    interpolation; all intermediates are dyadic so there is no rounding
    to hide behind)."""
    from txiac_qc_ray.pipelines.webtext import calibrated_outlier_flags
    from txiac_qc_ray.sources.pages import default_pages_dir

    out = calibrated_outlier_flags(default_pages_dir(2000)).to_pandas()
    assert len(out) and set(out.columns) == {
        "url", "lang", "n_words", "lo", "hi", "is_outlier"}
    key = out["lang"].fillna("").to_numpy(dtype=object)
    for lang in np.unique(key):
        sub = out[key == lang]
        vals = sub["n_words"].to_numpy(dtype=np.float64)
        lo, hi = np.percentile(vals, [100.0 / 16.0, 1500.0 / 16.0])
        assert (sub["lo"].to_numpy() == lo).all(), lang
        assert (sub["hi"].to_numpy() == hi).all(), lang
        exp = (vals < lo) | (vals > hi)
        assert (sub["is_outlier"].to_numpy() == exp).all(), lang
    # calibration actually discriminates on the fixture: some of each
    assert out["is_outlier"].any() and not out["is_outlier"].all()


def test_contamination_fraction_consistent_with_absolute(ray_session):
    """Same eval set, same membership core: n_overlap must agree with
    decontaminate_against row for row, frac must be the int/int
    division, and the label must be the integer cross-multiply."""
    from txiac_qc_ray.pipelines.docs import (contamination_fraction,
                                             decontaminate_against)

    frac = contamination_fraction(SF).to_pandas().set_index("doc_id")
    absolute = decontaminate_against(SF).to_pandas().set_index("doc_id")
    assert sorted(frac.index) == sorted(absolute.index)
    joined = frac.join(absolute, rsuffix="_abs")
    assert (joined["n_overlap"] == joined["n_overlap_abs"]).all()
    ns = frac["n_shingles"].to_numpy()
    no = frac["n_overlap"].to_numpy()
    assert (no <= ns).all() and (ns >= 0).all()
    exp_frac = np.where(ns > 0, no / np.maximum(ns, 1), 0.0)
    assert (frac["frac"].to_numpy() == exp_frac).all()
    assert (frac["contaminated"].to_numpy()
            == ((100 * no >= 10 * ns) & (ns > 0))).all()


def test_export_chunks_jsonl_round_trip(ray_session, tmp_path):
    """Sink -> .jsonl.gz bytes -> source must be value-invisible, the
    shards must be genuinely gzipped with the codec-detectable suffix,
    and a rerun into the same directory must be a clean overwrite."""
    from txiac_qc_ray.pipelines.docs import (chunk_for_training,
                                             export_chunks_jsonl)

    out_dir = str(tmp_path / "export")
    back = export_chunks_jsonl(SF, out_dir=out_dir).to_pandas()
    direct = chunk_for_training(SF).to_pandas()
    cols = ["doc_id", "chunk_id", "tok_start", "tok_end"]
    a = back[cols].sort_values(cols, ignore_index=True)
    b = direct[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(a, b)

    shards = glob.glob(os.path.join(out_dir, "*.jsonl.gz"))
    assert shards, "no shards written"
    with open(shards[0], "rb") as f:
        assert f.read(2) == b"\x1f\x8b", "shard is not gzip"

    # rerun: same directory, same content, no stale-file accretion
    n_before = len(shards)
    back2 = export_chunks_jsonl(SF, out_dir=out_dir).to_pandas()
    assert len(glob.glob(os.path.join(out_dir, "*.jsonl.gz"))) == n_before
    a2 = back2[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(a2, b)


def test_exact_budget_sample_hits_allocation_exactly(ray_session):
    """Row counts must equal the largest-remainder allocation computed
    independently here, per source and in total — exactly, not in
    expectation."""
    import duckdb

    from txiac_qc_ray.pipelines.docs import exact_budget_sample

    pct = 17
    out = exact_budget_sample(SF, pct=pct).to_pandas()
    n_s = duckdb.sql(
        f"SELECT source, count(*) AS n FROM '{SF}/documents.parquet' "
        "GROUP BY source ORDER BY source").df()
    total = int(n_s["n"].sum())
    k0 = (n_s["n"] * pct // 100).to_numpy()
    rem = (n_s["n"] * pct % 100).to_numpy()
    R = total * pct // 100 - k0.sum()
    order = np.lexsort((n_s["source"].to_numpy(dtype=object), -rem))
    k = k0.copy()
    k[order[:R]] += 1
    assert len(out) == total * pct // 100
    got = out.groupby("source").size()
    for src, kk in zip(n_s["source"], k):
        assert got.get(src, 0) == kk, src
    # replayability: a second run keeps the same doc ids
    out2 = exact_budget_sample(SF, pct=pct).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_exact_budget_sample_degenerate_pcts(ray_session):
    from txiac_qc_ray.pipelines.docs import exact_budget_sample

    assert len(exact_budget_sample(SF, pct=0).to_pandas()) == 0
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert len(exact_budget_sample(SF, pct=100).to_pandas()) == n


def test_canonical_url_dedup_shard_invariance_and_semantics(ray_session):
    """The shard count must not change the answer; every decorated
    recapture must merge back to its base (n_captures == 2 exactly for
    fnv%3 urls) and the kept capture must be the ORIGINAL (earliest)."""
    from txiac_qc_ray.functions.urls import fnv1a64
    from txiac_qc_ray.pipelines.webtext import DECOR_MOD, canonical_url_dedup
    from txiac_qc_ray.sources.pages import default_pages_dir

    import pyarrow as pa

    d = default_pages_dir(2000)
    a = canonical_url_dedup(d, n_shards=3).to_pandas()
    b = canonical_url_dedup(d, n_shards=8).to_pandas()
    cols = list(a.columns)
    pd.testing.assert_frame_equal(
        a.sort_values(cols, ignore_index=True),
        b.sort_values(cols, ignore_index=True))
    # canonical urls == the raw crawl's urls, each exactly once
    import glob as g

    import pyarrow.parquet as pq

    raw = pa.concat_tables([pq.read_table(f, columns=["url", "warc_ts"])
                            for f in sorted(g.glob(d + "/*.parquet"))])
    urls = raw["url"].to_pandas()
    assert sorted(a["url"]) == sorted(urls)
    h = fnv1a64(pa.array(urls))
    expected_n = np.where(h % np.uint64(DECOR_MOD) == 0, 2, 1)
    m = a.set_index("url")
    assert (m.loc[urls, "n_captures"].to_numpy() == expected_n).all()
    # earliest capture wins: first_ts is always the raw crawl's ts
    assert (m.loc[urls, "first_ts"].to_numpy()
            == raw["warc_ts"].to_pandas().to_numpy()).all()


def test_ngram_fluency_discriminates_and_is_split_exact(ray_session):
    """The trigram gate must actually split the held-out population
    (bigrams saturate — that's WHY n=3), every training doc must be
    absent from the output, and a doc made of never-seen tokens must
    score 0.0 known fraction when appended via a tiny synthetic run."""
    from txiac_qc_ray.pipelines.docs import ngram_fluency

    out = ngram_fluency(SF).to_pandas()
    assert (out["doc_id"] % 2 != 0).all()
    assert out["fluent"].any() and not out["fluent"].all()
    assert ((out["frac"] >= 0) & (out["frac"] <= 1)).all()
    # occurrences, not types: n_known never exceeds position count
    assert (out["n_known"] <= out["n_ngrams"]).all()


def test_top_dup_windows_shard_invariance_and_order(ray_session):
    """The shard count must not change the report; the k-boundary order
    is total (n_occurrences DESC, n_docs DESC, wtext ASC); every row is
    genuinely shared (n_docs >= 2, n_occurrences >= n_docs)."""
    from txiac_qc_ray.pipelines.docs import top_dup_windows

    a = top_dup_windows(SF, k=10, n_shards=32)
    b = top_dup_windows(SF, k=10, n_shards=128)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_docs"] >= 2).all()
    assert (a["n_occurrences"] >= a["n_docs"]).all()
    key = list(zip(-a["n_occurrences"], -a["n_docs"], a["wtext"]))
    assert key == sorted(key)
