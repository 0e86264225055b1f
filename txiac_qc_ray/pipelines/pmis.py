"""Reference-parity PMIS QC pipeline: the reference app's core flow
(data_merge -> thre_filter -> diff_summary, Home.py:109-273) re-expressed
Ray-Data-first over the two-cycle sections fixture.

Semantics pinned to the reference:
  - align cycles by equi-join on (hwy_id, county) with STRICT band
    predicate abs(d_begin)<tol AND abs(d_end)<tol, tol=0.05, many-to-many
    preserved (Home.py:128-136);
  - rows of cycle A whose county is absent from cycle B are dropped
    before the join (semi-join, Home.py:124);
  - diff_<m> = m_a - m_b, NaN-propagating (Home.py:138-139);
  - Audit flag: abs(diff) >= hi; Year-by-year flag: diff >= hi or
    diff <= lo; flagged rows are SELECTED (Home.py:176-183);
  - county summary: per-cycle county means of the measures + match count
    (Home.py:215-260).

Ray shape: `Dataset.join` (hash-partitioned equi join on the natural
key) -> stateless band-filter + diff `map_batches`. The equi key is the
partition key for every downstream wide op — one partitioning reused
across stages (SURVEY.md 'pick ONE partitioning key').
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.sections import MEASURES

TOL = 0.05
EQUI_KEYS = ("hwy_id", "county")


def data_merge(
    ds_a: ray.data.Dataset,
    ds_b: ray.data.Dataset,
    suffixes: tuple[str, str] = ("_a", "_b"),
    measures: tuple[str, ...] = MEASURES,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Tolerance join of two rating cycles + diff columns (Home.py:109-140)."""
    sa, sb = suffixes
    # semi-join: drop cycle-A rows whose county is absent from B (H:124);
    # the county set is tiny -> broadcast, no shuffle
    counties_b = set(ds_b.unique("county"))
    b_set = pa.array(sorted(counties_b), type=pa.string())
    ds_a = ds_a.map_batches(
        lambda t: t.filter(pc.is_in(t["county"], value_set=b_set)),
        batch_format="pyarrow",
    )

    def suffix_cols(suffix: str):
        def _s(t: pa.Table) -> pa.Table:
            return t.rename_columns([c if c in EQUI_KEYS else c + suffix
                                     for c in t.column_names])
        return _s

    a = ds_a.map_batches(suffix_cols(sa), batch_format="pyarrow")
    b = ds_b.map_batches(suffix_cols(sb), batch_format="pyarrow")
    joined = a.join(b, join_type="inner", on=list(EQUI_KEYS),
                    num_partitions=num_partitions)

    def band_and_diff(t: pa.Table) -> pa.Table:
        db = pc.abs(pc.subtract(t[f"begin_dfo{sa}"], t[f"begin_dfo{sb}"]))
        de = pc.abs(pc.subtract(t[f"end_dfo{sa}"], t[f"end_dfo{sb}"]))
        t = t.filter(pc.and_(pc.less(db, pa.scalar(TOL)), pc.less(de, pa.scalar(TOL))))
        for m in measures:
            t = t.append_column(f"diff_{m}", pc.subtract(t[f"{m}{sa}"], t[f"{m}{sb}"]))
        return t

    return joined.map_batches(band_and_diff, batch_format="pyarrow")


def thre_filter(
    ds: ray.data.Dataset,
    thresholds: dict[str, tuple[float, float]],
    qctype: str = "Audit",
) -> ray.data.Dataset:
    """Flag + select (Home.py:161-184): Audit = abs(diff)>=hi;
    Year-by-year = diff>=hi OR diff<=lo. NaN never flags."""

    def stage(t: pa.Table) -> pa.Table:
        n = t.num_rows
        flag = np.zeros(n, dtype=bool)
        for key, (lo, hi) in thresholds.items():
            d = np.asarray(t[f"diff_{key}"], dtype=np.float64)
            with np.errstate(invalid="ignore"):
                if qctype == "Audit":
                    flag |= np.abs(d) >= hi
                else:
                    flag |= (d >= hi) | (d <= lo)
        t = t.append_column("flag", pa.array(flag.astype(np.int64)))
        return t.filter(pa.array(flag))

    return ds.map_batches(stage, batch_format="pyarrow")


def county_summary(
    ds: ray.data.Dataset,
    suffixes: tuple[str, str] = ("_a", "_b"),
    measures: tuple[str, ...] = MEASURES,
) -> pd.DataFrame:
    """Per-cycle county means + match count (Home.py:215-260).

    Computed as per-batch partial (sum, valid-count) rows merged on the
    driver — NOT `ds.groupby().aggregate()`: in Ray 2.49 a groupby
    applied directly to `Dataset.join` output can silently aggregate only
    a subset of partitions (observed: Sum over a 24-row group returned
    one shuffle partition's partial). Partial-aggregation is also the
    at-scale shape: one tiny row per (batch, county) crosses to the
    driver, never the matched rows themselves. NaN is skipped like
    pandas/np.nanmean (reference pivot_table 'mean' semantics, H:215)."""
    def partials(t: pa.Table) -> pa.Table:
        county = np.asarray(t["county"], dtype=object)
        uniq, inv = np.unique(county, return_inverse=True)
        cols: dict[str, object] = {"county": pa.array(uniq.tolist(), type=pa.string()),
                                   "n_match": np.bincount(inv, minlength=len(uniq)).astype(np.int64)}
        for s in suffixes:
            for m in measures:
                v = np.asarray(t[f"{m}{s}"], dtype=np.float64)
                ok = ~np.isnan(v)
                cols[f"sum_{m}{s}"] = np.bincount(inv, weights=np.where(ok, v, 0.0), minlength=len(uniq))
                cols[f"cnt_{m}{s}"] = np.bincount(inv, weights=ok, minlength=len(uniq)).astype(np.int64)
        return pa.table(cols)

    part = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    g = part.groupby("county", sort=True).sum()
    frames = []
    for s in suffixes:
        f = pd.DataFrame({"county": g.index})
        f["cycle"] = s[1:]
        for m in measures:
            f[m] = (g[f"sum_{m}{s}"] / g[f"cnt_{m}{s}"]).to_numpy()
        f["n_match"] = g["n_match"].to_numpy()
        frames.append(f)
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["county", "cycle"], ignore_index=True)


def audit_default_thresholds(
    ds: ray.data.Dataset, measures: tuple[str, ...], percentile: float = 95.0
) -> dict[str, tuple[float, float]]:
    """Audit-mode defaults: p95 of abs(diff) per measure (Home.py:356),
    computed in one streaming pass over the diff columns."""
    from .calibrate import _column_values

    out = {}
    for m in measures:
        v = _column_values(ds, f"diff_{m}")
        out[m] = (0.0, float(np.nanpercentile(np.abs(v), percentile)))
    return out
