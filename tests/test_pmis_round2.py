"""Round-2 PMIS parity additions: CSV ingestion (S1/S2/S3), the YbY
district summary (Home.py:263-270), the IRI traffic-level pivot fused
into county_summary (Home.py:226-254), and two-sided YbY calibration
(Home.py:340) — each against an independent pandas mirror, plus the
frozen-fixture byte identity that the driver's SQL oracles rely on."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from txiac_qc_ray.sources.sections import MEASURES, sections_tables

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PMIS_DIR = os.path.join(REPO, "tests", "data", "pmis")


def test_frozen_fixture_matches_generator():
    """The committed parquet bytes must equal sections_tables(42, 1000) —
    if the generator changes, scripts/freeze_pmis_fixture.py must be
    rerun deliberately (the SQL oracles read the frozen files)."""
    a, b = sections_tables(seed=42, n=1000)
    fa = pq.read_table(os.path.join(PMIS_DIR, "cycle_a.parquet"))
    fb = pq.read_table(os.path.join(PMIS_DIR, "cycle_b.parquet"))
    for frozen, gen in ((fa, a), (fb, b)):
        assert frozen.schema == gen.schema
        for c in gen.column_names:
            x, y = frozen[c].to_pandas().to_numpy(), gen[c].to_pandas().to_numpy()
            if x.dtype.kind == "f":
                assert ((x == y) | (np.isnan(x) & np.isnan(y))).all(), c
            else:
                assert (x == y).all(), c


def test_csv_parquet_path_parity(ray_session):
    """read_sections_csv == read_sections_parquet value-for-value
    (timestamp parse, NaN normalization, load-derive)."""
    from txiac_qc_ray.sources.sections import read_sections_csv, read_sections_parquet

    key = ["hwy_id", "county", "begin_dfo", "start_time"]
    dfc = (read_sections_csv(os.path.join(PMIS_DIR, "cycle_a.csv"))
           .to_pandas().sort_values(key, ignore_index=True))
    dfp = (read_sections_parquet(os.path.join(PMIS_DIR, "cycle_a.parquet"))
           .to_pandas().sort_values(key, ignore_index=True))
    assert set(dfc.columns) == set(dfp.columns)
    dfc = dfc[dfp.columns.tolist()]
    for c in dfp.columns:
        a, e = dfc[c].to_numpy(), dfp[c].to_numpy()
        if a.dtype.kind == "f":
            same = (a == e) | (np.isnan(a) & np.isnan(e))
            assert same.all(), c
        else:
            assert (a == e).all(), c


@pytest.fixture(scope="module")
def merged(ray_session):
    from txiac_qc_ray.pipelines.pmis import data_merge
    from txiac_qc_ray.sources.sections import read_sections_parquet

    a = read_sections_parquet(os.path.join(PMIS_DIR, "cycle_a.parquet"))
    b = read_sections_parquet(os.path.join(PMIS_DIR, "cycle_b.parquet"))
    return data_merge(a, b, num_partitions=4)


@pytest.fixture(scope="module")
def merged_pd(merged):
    return merged.to_pandas()


def test_district_summary_mirror(merged, merged_pd):
    from txiac_qc_ray.pipelines.pmis import UTIL_MEASURES, district_summary

    got = district_summary(merged)
    for s in ("_a", "_b"):
        row = got[got["cycle"] == s[1:]]
        assert len(row) == 1
        for m in UTIL_MEASURES:
            exp = np.nanmean(merged_pd[f"{m}{s}"].to_numpy())
            np.testing.assert_allclose(row[m].iloc[0], exp, rtol=1e-12)
        assert row["rating_cycle"].iloc[0] == merged_pd[f"fiscal_year{s}"].iloc[0]


def test_county_summary_iri_pivot_mirror(merged, merged_pd):
    from txiac_qc_ray.pipelines.pmis import county_summary

    got = county_summary(merged)
    for s in ("_a", "_b"):
        side = got[got["cycle"] == s[1:]].set_index("county")
        piv = (merged_pd.groupby(["county", f"traffic_level{s}"])
               [f"section_length{s}"].sum().unstack(fill_value=0.0))
        for lvl in ("LOW", "MEDIUM", "HIGH"):
            exp = piv[lvl] if lvl in piv.columns else pd.Series(0.0, index=piv.index)
            np.testing.assert_allclose(
                side[f"len_{lvl.lower()}"].to_numpy(),
                exp.reindex(side.index, fill_value=0.0).to_numpy(),
                rtol=1e-9, err_msg=f"{lvl}{s}")


def test_yby_thresholds_and_flow(merged, merged_pd):
    from txiac_qc_ray.pipelines.pmis import (FILTER_MEASURES, thre_filter,
                                             yby_default_thresholds)

    thr = yby_default_thresholds(merged)
    assert set(thr) == set(FILTER_MEASURES)
    flag = np.zeros(len(merged_pd), dtype=bool)
    for m in FILTER_MEASURES:
        d = merged_pd[f"diff_{m}"].to_numpy()
        lo, hi = np.nanpercentile(d, [2.5, 97.5])
        assert thr[m] == pytest.approx((lo, hi), abs=0)
        with np.errstate(invalid="ignore"):
            flag |= (d >= hi) | (d <= lo)
    got = thre_filter(merged, thr, qctype="Year by year").to_pandas()
    assert len(got) == int(flag.sum())


def test_audit_thresholds_exclude_util(merged):
    from txiac_qc_ray.pipelines.pmis import audit_default_thresholds

    thr = audit_default_thresholds(merged)
    # reference excludes "UTIL"-substring measures from filtering
    assert all("util" not in m for m in thr)
    assert set(thr) == {m for m in MEASURES if "util" not in m}


def test_pmis_outlier_counters_mirror(merged, merged_pd):
    """Counters vs an independent pandas mirror for two dimensions
    (county and lane pair) under a fixed threshold set."""
    from txiac_qc_ray.pipelines.pmis import pmis_outlier_counters

    thr = {"measure_iri": (0.0, 50.0)}
    got = pmis_outlier_counters(merged, thr, qctype="Audit")
    d = merged_pd["diff_measure_iri"].to_numpy()
    with np.errstate(invalid="ignore"):
        flag = np.abs(d) >= 50.0
    mp = merged_pd.assign(flag=flag)
    # county dim
    side = got[got["dim"] == "county"].set_index("key")
    exp_all = mp.groupby("county").size()
    exp_out = mp.groupby("county")["flag"].sum()
    np.testing.assert_array_equal(side["count_all"].to_numpy(),
                                  exp_all.reindex(side.index).to_numpy())
    np.testing.assert_array_equal(side["count_out"].to_numpy(),
                                  exp_out.reindex(side.index).to_numpy())
    exp_len = mp.groupby("county").apply(
        lambda g: np.round(g["section_length_a"] * 1000).sum() / 1000.0)
    np.testing.assert_allclose(side["len_all"].to_numpy(),
                               exp_len.reindex(side.index).to_numpy(), rtol=0)
    # lane pair dim
    lp = (mp["lane_number_a"].astype(str) + "-" + mp["lane_number_b"].astype(str))
    side = got[got["dim"] == "lane_pair"].set_index("key")
    exp_all = mp.groupby(lp).size()
    np.testing.assert_array_equal(side["count_all"].to_numpy(),
                                  exp_all.reindex(side.index).to_numpy())
    # counters sum to row counts per dim
    for dim, g in got.groupby("dim"):
        assert g["count_all"].sum() == len(mp), dim
        assert g["count_out"].sum() == int(flag.sum()), dim
