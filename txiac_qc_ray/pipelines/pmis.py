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
from .relational import round_half_away

TOL = 0.05
EQUI_KEYS = ("hwy_id", "county")
# the reference excludes "UTIL"-substring measures from FILTERING
# (Home.py:331,354-355) while still summarizing them; our typed analog:
FILTER_MEASURES = tuple(m for m in MEASURES if "util" not in m)
UTIL_MEASURES = tuple(m for m in MEASURES if "util" in m)
TRAFFIC_LEVELS = ("LOW", "MEDIUM", "HIGH")


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
    decimal_scales: tuple[int, int] | None = None,
) -> pd.DataFrame:
    """Per-cycle county means + match count (Home.py:215-260).

    Computed as per-batch partial (sum, valid-count) rows merged on the
    driver — NOT `ds.groupby().aggregate()`: in Ray 2.49 a groupby
    applied directly to `Dataset.join` output can silently aggregate only
    a subset of partitions (observed: Sum over a 24-row group returned
    one shuffle partition's partial). Partial-aggregation is also the
    at-scale shape: one tiny row per (batch, county) crosses to the
    driver, never the matched rows themselves. NaN is skipped like
    pandas/np.nanmean (reference pivot_table 'mean' semantics, H:215).

    The IRI traffic-level pivot (Home.py:226-254) is fused into the same
    partials: per-cycle sums of the load-derived `section_length` by
    (county, traffic level), pivoted wide as len_low/len_medium/len_high.
    A (county, level) with no matched rows reports 0.0 miles — a
    deliberate improvement over the reference's NaN-filled pivot cells
    (absent sections have zero miles), mirrored in the SQL oracle.

    decimal_scales=(measure_scale, length_scale): when the input values
    are exact decimals (the fixture: 2-decimal measures, 3-decimal
    lengths), summing `round(v * scale)` integers makes every aggregate
    EXACT and summation-order-independent — the same integer-units trick
    as rolling_sum_cents — so the result is bit-identical to any other
    engine's (a float mean of decimal data lands exactly ON rounding
    boundaries, where engine summation order would otherwise split)."""
    ms, ls = decimal_scales if decimal_scales else (None, None)

    def partials(t: pa.Table) -> pa.Table:
        county = np.asarray(t["county"], dtype=object)
        uniq, inv = np.unique(county, return_inverse=True)
        cols: dict[str, object] = {"county": pa.array(uniq.tolist(), type=pa.string()),
                                   "n_match": np.bincount(inv, minlength=len(uniq)).astype(np.int64)}
        for s in suffixes:
            for m in measures:
                v = np.asarray(t[f"{m}{s}"], dtype=np.float64)
                ok = ~np.isnan(v)
                if ms:  # integer-exact units (see docstring)
                    v = round_half_away(v * ms, 0)
                cols[f"sum_{m}{s}"] = np.bincount(inv, weights=np.where(ok, v, 0.0), minlength=len(uniq))
                cols[f"cnt_{m}{s}"] = np.bincount(inv, weights=ok, minlength=len(uniq)).astype(np.int64)
            sec = np.asarray(t[f"section_length{s}"], dtype=np.float64)
            if ls:
                sec = round_half_away(sec * ls, 0)
            lvl = np.asarray(t[f"traffic_level{s}"], dtype=object)
            for level in TRAFFIC_LEVELS:
                cols[f"len_{level.lower()}{s}"] = np.bincount(
                    inv, weights=sec * (lvl == level), minlength=len(uniq))
        return pa.table(cols)

    part = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    g = part.groupby("county", sort=True).sum()
    frames = []
    for s in suffixes:
        f = pd.DataFrame({"county": g.index})
        f["cycle"] = s[1:]
        for m in measures:
            if ms:
                f[m] = (g[f"sum_{m}{s}"] / (ms * g[f"cnt_{m}{s}"])).to_numpy()
            else:
                f[m] = (g[f"sum_{m}{s}"] / g[f"cnt_{m}{s}"]).to_numpy()
        for level in TRAFFIC_LEVELS:
            v = g[f"len_{level.lower()}{s}"].to_numpy()
            f[f"len_{level.lower()}"] = v / ls if ls else v
        f["n_match"] = g["n_match"].to_numpy()
        frames.append(f)
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["county", "cycle"], ignore_index=True)


def district_summary(
    ds: ray.data.Dataset,
    suffixes: tuple[str, str] = ("_a", "_b"),
    util_measures: tuple[str, ...] = UTIL_MEASURES,
    measure_scale: int | None = None,
) -> pd.DataFrame:
    """Year-by-year district summary (Home.py:263-270): NaN-skipping mean
    of the UTIL measures per fiscal year (one row per rating cycle),
    sorted by cycle code. Same partial-aggregation shape as
    county_summary — one tiny row per (batch, year) reaches the driver;
    `measure_scale` enables the same integer-exact decimal units."""
    def partials(t: pa.Table) -> pa.Table:
        cols: dict[str, object] = {}
        rows_y, rows_s, rows_m = [], [], {m: [] for m in util_measures}
        for s in suffixes:
            yr = np.asarray(t[f"fiscal_year{s}"])
            uniq, inv = np.unique(yr, return_inverse=True)
            rows_y.append(uniq.astype(np.int64))
            rows_s.append(np.full(len(uniq), s[1:], dtype=object))
            for m in util_measures:
                v = np.asarray(t[f"{m}{s}"], dtype=np.float64)
                ok = ~np.isnan(v)
                if measure_scale:
                    v = round_half_away(v * measure_scale, 0)
                rows_m[m].append(np.stack([
                    np.bincount(inv, weights=np.where(ok, v, 0.0), minlength=len(uniq)),
                    np.bincount(inv, weights=ok, minlength=len(uniq)),
                ], axis=1))
        cols["rating_cycle"] = np.concatenate(rows_y)
        cols["cycle"] = pa.array(np.concatenate(rows_s).tolist(), type=pa.string())
        for m in util_measures:
            st = np.concatenate(rows_m[m])
            cols[f"sum_{m}"] = st[:, 0]
            cols[f"cnt_{m}"] = st[:, 1]
        return pa.table(cols)

    part = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    g = part.groupby(["rating_cycle", "cycle"], sort=True).sum()
    out = pd.DataFrame({"rating_cycle": [k[0] for k in g.index],
                        "cycle": [k[1] for k in g.index]})
    for m in util_measures:
        if measure_scale:
            out[m] = (g[f"sum_{m}"] / (measure_scale * g[f"cnt_{m}"])).to_numpy()
        else:
            out[m] = (g[f"sum_{m}"] / g[f"cnt_{m}"]).to_numpy()
    return out.sort_values(["rating_cycle", "cycle"], ignore_index=True)


# speed bins (Home.py:623-624 shape: explicit edges with +-inf ends) and
# speed-diff bins (Home.py:713-721); time_diff reduced to FLOORED days
# (pandas .dt.days semantics, Home.py:713-714)
SPEED_EDGES = (30.0, 40.0, 50.0, 60.0, 70.0)
SPEED_DIFF_EDGES = (-20.0, -10.0, -2.0, 2.0, 10.0, 20.0)


def _bin_labels(edges: tuple[float, ...]) -> list[str]:
    return [f"b{i}" for i in range(len(edges) + 1)]


def pmis_outlier_counters(
    merged: ray.data.Dataset,
    thresholds: dict[str, tuple[float, float]],
    qctype: str = "Audit",
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> pd.DataFrame:
    """The reference's per-dimension outlier-distribution blocks composed
    INTO the PMIS flow (VERDICT r1 'missing' item 4; Home.py:444-904):
    for each dimension, counts and section-length miles of flagged vs all
    matched rows + pct, all dims in ONE pass of per-batch partials (the
    fused counters.py shape — no join of out-vs-all frames, no second
    scan per dimension).

    Dimensions are DELIBERATE TYPED ANALOGS of the reference blocks, not
    byte-twins (ADVICE r2; reference block cited in parens): county
    (H:456); lane PAIR indicator "a-b" (H:520-521); direction (H:557),
    vehicle id (H:591) and comment (H:750) keyed on the a-side single
    value where the reference keys those three on the paired "a-b"
    concat; speed (H:623-630) and speed-diff (H:657-660) binned with
    this engine's left-closed digitize bins with ±inf end bins where the
    reference uses right-closed pd.cut over 0-90 that silently DROPS
    out-of-range rows; time_diff grouped on floored whole days where the
    reference groups the exact timedelta and renders .dt.days
    (H:713-721). The declarative analog keeps every row accounted for
    and each key a single typed column; the value-check twin is the SQL
    oracle (oracles.pmis_counters_sql), which mirrors THESE semantics.

    -> (dim, key, count_all, len_all, count_out, len_out, pct_out)."""
    sa, sb = suffixes
    thr = dict(thresholds)

    def partials(t: pa.Table) -> pa.Table:
        n = t.num_rows
        flag = np.zeros(n, dtype=bool)
        for key, (lo, hi) in thr.items():
            d = np.asarray(t[f"diff_{key}"], dtype=np.float64)
            with np.errstate(invalid="ignore"):
                if qctype == "Audit":
                    flag |= np.abs(d) >= hi
                else:
                    flag |= (d >= hi) | (d <= lo)
        # integer milli-miles: section lengths are exact 3-decimals, so
        # scaled-integer sums are order-independent and bit-identical to
        # the SQL oracle's (the county_summary decimal-units trick)
        sec = round_half_away(np.asarray(t[f"section_length{sa}"], dtype=np.float64) * 1000, 0)

        lane_a = np.asarray(t[f"lane_number{sa}"]).astype(str)
        lane_b = np.asarray(t[f"lane_number{sb}"]).astype(str)
        speed = np.asarray(t[f"avg_speed{sa}"], dtype=np.float64)
        speed_d = speed - np.asarray(t[f"avg_speed{sb}"], dtype=np.float64)
        ts_a = np.asarray(t[f"start_time{sa}"]).astype("datetime64[us]").astype(np.int64)
        ts_b = np.asarray(t[f"start_time{sb}"]).astype("datetime64[us]").astype(np.int64)
        days = (ts_a - ts_b) // np.int64(86_400_000_000)  # floored days

        sp_lab = np.array(_bin_labels(SPEED_EDGES), dtype=object)
        sd_lab = np.array(_bin_labels(SPEED_DIFF_EDGES), dtype=object)
        dims: dict[str, np.ndarray] = {
            "county": np.asarray(t["county"], dtype=object),
            "lane_pair": np.char.add(np.char.add(lane_a, "-"), lane_b).astype(object),
            "direction": np.asarray(t[f"direction{sa}"], dtype=object),
            "vehicle_id": np.asarray(t[f"vehicle_id{sa}"], dtype=object),
            "speed_bin": sp_lab[np.digitize(speed, SPEED_EDGES)],
            "speed_diff_bin": sd_lab[np.digitize(speed_d, SPEED_DIFF_EDGES)],
            "time_diff_days": days.astype(str).astype(object),
            "comment_code": np.asarray(t[f"comment_code{sa}"], dtype=object),
        }
        out_d, out_k, c_all, l_all, c_out, l_out = [], [], [], [], [], []
        for dim, keys in dims.items():
            uniq, inv = np.unique(keys, return_inverse=True)
            out_d.append(np.full(len(uniq), dim, dtype=object))
            out_k.append(uniq)
            c_all.append(np.bincount(inv, minlength=len(uniq)).astype(np.int64))
            l_all.append(np.bincount(inv, weights=sec, minlength=len(uniq)))
            c_out.append(np.bincount(inv, weights=flag, minlength=len(uniq)).astype(np.int64))
            l_out.append(np.bincount(inv, weights=sec * flag, minlength=len(uniq)))
        return pa.table({
            "dim": pa.array(np.concatenate(out_d).tolist(), type=pa.string()),
            "key": pa.array(np.concatenate(out_k).tolist(), type=pa.string()),
            "count_all": np.concatenate(c_all),
            "len_all": np.concatenate(l_all),
            "count_out": np.concatenate(c_out),
            "len_out": np.concatenate(l_out),
        })

    part = merged.map_batches(partials, batch_format="pyarrow").to_pandas()
    g = part.groupby(["dim", "key"], sort=True).sum().reset_index()
    g["len_all"] = g["len_all"] / 1000.0  # back to miles (exact int sums)
    g["len_out"] = g["len_out"] / 1000.0
    g["pct_out"] = np.where(g["count_all"] > 0,
                            100.0 * g["count_out"] / g["count_all"], 0.0)
    return g.sort_values(["dim", "key"], ignore_index=True)


# IRI-diff histogram edges (Home.py:418-419 shape: fixed edges, +-inf
# end bins, NaN diffs excluded like plotly's histogram)
DIFF_HIST_EDGES = tuple(float(x) for x in range(-80, 81, 10))


def pmis_diff_histogram(
    merged: ray.data.Dataset, measure: str = "measure_iri",
    edges: tuple[float, ...] = DIFF_HIST_EDGES,
) -> pd.DataFrame:
    """Distribution of a diff column over fixed bins incl. +-inf ends
    (the reference's diff histograms, Home.py:408,417-421). Per-batch
    bincount partials -> tiny groupby; NaN diffs are excluded (a NaN
    never lands in any plotly bin). -> (bin, lo, hi, cnt), empty bins
    kept with cnt=0 so the bin axis is stable."""
    e = np.asarray(edges, dtype=np.float64)
    labels = [f"b{i:02d}" for i in range(len(e) + 1)]

    def partials(t: pa.Table) -> pa.Table:
        d = np.asarray(t[f"diff_{measure}"], dtype=np.float64)
        d = d[~np.isnan(d)]
        b = np.digitize(d, e)
        cnt = np.bincount(b, minlength=len(e) + 1)
        return pa.table({"bin": pa.array(labels, type=pa.string()),
                         "cnt": cnt.astype(np.int64)})

    from ray.data.aggregate import Sum as _Sum

    agg = (merged.map_batches(partials, batch_format="pyarrow")
           .groupby("bin").aggregate(_Sum("cnt", alias_name="cnt")).to_pandas())
    agg = agg.set_index("bin").reindex(labels, fill_value=0)
    lo = np.concatenate([[-np.inf], e])
    hi = np.concatenate([e, [np.inf]])
    return pd.DataFrame({"bin": labels, "lo": lo, "hi": hi,
                         "cnt": agg["cnt"].to_numpy().astype(np.int64)})


def audit_default_thresholds(
    ds: ray.data.Dataset, measures: tuple[str, ...] = FILTER_MEASURES,
    percentile: float = 95.0,
) -> dict[str, tuple[float, float]]:
    """Audit-mode defaults: p95 of abs(diff) per measure (Home.py:356),
    for ALL measures in ONE streaming pass (VERDICT r1 item 7: no
    per-measure re-execution of the upstream join pipeline)."""
    from .calibrate import _columns_values

    vals = _columns_values(ds, [f"diff_{m}" for m in measures])
    return {m: (0.0, float(np.nanpercentile(np.abs(vals[f"diff_{m}"]), percentile)))
            for m in measures}


def yby_default_thresholds(
    ds: ray.data.Dataset, measures: tuple[str, ...] = FILTER_MEASURES,
    percentiles: tuple[float, float] = (2.5, 97.5),
) -> dict[str, tuple[float, float]]:
    """Year-by-year defaults: [p2.5, p97.5] of the SIGNED diff per
    measure (Home.py:340 — two-sided, not absolute), one streaming pass
    for all measures."""
    from .calibrate import _columns_values

    vals = _columns_values(ds, [f"diff_{m}" for m in measures])
    out = {}
    for m in measures:
        lo, hi = np.nanpercentile(vals[f"diff_{m}"], list(percentiles))
        out[m] = (float(lo), float(hi))
    return out
