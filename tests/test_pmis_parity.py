"""PMIS reference-parity: the Ray pipeline (Dataset.join + band filter +
diff + flag + summaries) must match an independent single-process pandas
mirror of the reference algorithm (Home.py:109-273) on the two-cycle
sections fixture, including the strict <0.05 band boundary and NaN
propagation."""

import numpy as np
import pandas as pd
import pytest

from txiac_qc_ray.sources.sections import MEASURES, sections_tables


@pytest.fixture(scope="module")
def cycles():
    return sections_tables(seed=42, n=1000)


def pandas_reference(a, b, suffixes=("_a", "_b")):
    """Single-process mirror of data_merge semantics (Home.py:109-140):
    semi-join on county, equi-join on (hwy_id, county), strict band,
    diff columns. Written independently with pandas merge."""
    pa_, pb = a.to_pandas(), b.to_pandas()
    pa_ = pa_[pa_["county"].isin(set(pb["county"]))]
    m = pa_.merge(pb, on=["hwy_id", "county"], how="inner", suffixes=suffixes)
    sa, sb = suffixes
    band = (np.abs(m[f"begin_dfo{sa}"] - m[f"begin_dfo{sb}"]) < 0.05) & (
        np.abs(m[f"end_dfo{sa}"] - m[f"end_dfo{sb}"]) < 0.05
    )
    m = m[band].copy()
    for meas in MEASURES:
        m[f"diff_{meas}"] = m[f"{meas}{sa}"] - m[f"{meas}{sb}"]
    return m


@pytest.fixture(scope="module")
def ray_merged(ray_session, cycles):
    import ray.data

    from txiac_qc_ray.pipelines.pmis import data_merge

    a, b = cycles
    ds = data_merge(ray.data.from_arrow(a), ray.data.from_arrow(b), num_partitions=4)
    return ds.to_pandas()


SORT_KEYS = ["hwy_id", "county", "begin_dfo_a", "begin_dfo_b", "start_time_a", "start_time_b"]


def canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(SORT_KEYS, ignore_index=True)


def test_merge_matches_pandas_reference(ray_merged, cycles):
    a, b = cycles
    exp = pandas_reference(a, b)
    got, exp = canon(ray_merged), canon(exp)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        if got[c].dtype == object:
            assert got[c].tolist() == exp[c].tolist(), c
        else:
            np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(), err_msg=c)


def test_band_boundary_strict(ray_merged):
    """Offsets of exactly ±0.05 / ±0.051 must be excluded; ±0.049 kept
    (strict <, Home.py:132). Float repr of the offsets keeps deltas
    slightly off-exact, so assert the numeric bound instead."""
    d = np.abs(ray_merged["begin_dfo_a"] - ray_merged["begin_dfo_b"])
    assert (d < 0.05).all()
    assert len(ray_merged) > 0


def test_nan_diffs_propagate(ray_merged):
    assert ray_merged["diff_measure_iri"].isna().sum() > 0


def test_thre_filter_parity(ray_session, cycles):
    import ray.data

    from txiac_qc_ray.pipelines.pmis import audit_default_thresholds, data_merge, thre_filter

    a, b = cycles
    merged = data_merge(ray.data.from_arrow(a), ray.data.from_arrow(b), num_partitions=4)
    thresholds = audit_default_thresholds(merged, MEASURES)
    flagged = thre_filter(merged, thresholds, qctype="Audit").to_pandas()

    exp = pandas_reference(a, b)
    flag = np.zeros(len(exp), dtype=bool)
    for m, (lo, hi) in thresholds.items():
        with np.errstate(invalid="ignore"):
            flag |= np.abs(exp[f"diff_{m}"].to_numpy()) >= hi
    assert len(flagged) == int(flag.sum())
    # same flagged row identity set
    key = ["hwy_id", "county", "begin_dfo_a", "begin_dfo_b"]
    got_keys = set(map(tuple, flagged[key].itertuples(index=False)))
    exp_keys = set(map(tuple, exp[flag][key].itertuples(index=False)))
    assert got_keys == exp_keys


def test_thre_filter_two_sided(ray_session, cycles):
    import ray.data

    from txiac_qc_ray.pipelines.pmis import data_merge, thre_filter

    a, b = cycles
    merged = data_merge(ray.data.from_arrow(a), ray.data.from_arrow(b), num_partitions=4)
    thr = {"measure_iri": (-5.0, 5.0)}
    got = thre_filter(merged, thr, qctype="Year by year").to_pandas()
    exp = pandas_reference(a, b)
    d = exp["diff_measure_iri"].to_numpy()
    with np.errstate(invalid="ignore"):
        m = (d >= 5.0) | (d <= -5.0)
    assert len(got) == int(m.sum())


def test_county_summary_parity(ray_session, cycles):
    import ray.data

    from txiac_qc_ray.pipelines.pmis import county_summary, data_merge
    from txiac_qc_ray.sources.sections import derive_section_length

    a, b = cycles
    merged = data_merge(
        ray.data.from_arrow(derive_section_length(a)),
        ray.data.from_arrow(derive_section_length(b)), num_partitions=4)
    got = county_summary(merged)
    exp_m = pandas_reference(a, b)
    # independent mirror: per-cycle county means (NaN-skipping) + count
    for s in ("_a", "_b"):
        side = got[got["cycle"] == s[1:]]
        piv = exp_m.groupby("county")[[f"{m}{s}" for m in MEASURES]].mean()
        for m in MEASURES:
            np.testing.assert_allclose(
                side.set_index("county")[m].to_numpy(),
                piv[f"{m}{s}"].to_numpy(), rtol=1e-12, err_msg=f"{m}{s}")
    cnt = exp_m.groupby("county").size()
    np.testing.assert_array_equal(
        got[got["cycle"] == "a"].set_index("county")["n_match"].to_numpy(),
        cnt.to_numpy())
