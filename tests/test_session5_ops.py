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
