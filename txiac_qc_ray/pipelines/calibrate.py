"""Threshold calibration aggregates (SURVEY.md §2.5 A1; reference
Home.py:337-365) — "data-calibrated rules":

  percentile mode : [p2.5, p97.5] of a feature (two-sided rules)  H:340
  audit mode      : p95 of abs(feature)                            H:356
  tukey (box) mode: [q1 - 1.5*IQR, q3 + 1.5*IQR]                   H:346-348

Two execution paths:
  - exact: distributed partial-sort-free two-pass — per-block value
    collection of ONE column via map_batches, quantiles on the driver
    with numpy `linear` interpolation incl. NaN skipping (nanpercentile
    semantics, pinned for golden parity). Materializes a single float64
    column; fine up to ~1e9 rows, the fixture/correctness path.
  - sketch: mergeable t-digest (state/tdigest.py), one partial per block,
    merged driver-side — the 10^12-document path; accuracy ~1/compression.

The calibrated thresholds are plain floats broadcast into the rules stage
(pass 2) — exactly the reference's E2 flow (widget defaults -> thre_filter).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import RuleSpec
from ..state.tdigest import TDigest


def _column_values(ds: ray.data.Dataset, col: str) -> np.ndarray:
    """Materialize ONE float64 column (the exact path's only collect)."""
    parts = []
    for batch in ds.select_columns([col]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        parts.append(np.asarray(batch.column(col).to_numpy(zero_copy_only=False), dtype=np.float64))
    if not parts:
        return np.empty(0, dtype=np.float64)
    return np.concatenate(parts)


def percentile_thresholds(
    ds: ray.data.Dataset, col: str, percentiles: tuple[float, float] = (2.5, 97.5)
) -> tuple[float, float]:
    """Exact [lo, hi] percentiles with np.nanpercentile linear
    interpolation (Home.py:340 semantics)."""
    v = _column_values(ds, col)
    lo, hi = np.nanpercentile(v, list(percentiles))
    return float(lo), float(hi)


def audit_threshold(ds: ray.data.Dataset, col: str, percentile: float = 95.0) -> float:
    """p95 of abs(value) — the Audit-mode default (Home.py:356)."""
    v = _column_values(ds, col)
    return float(np.nanpercentile(np.abs(v), percentile))


def tukey_fences(ds: ray.data.Dataset, col: str) -> tuple[float, float]:
    """Box-plot fences exactly as the reference computes them
    (Home.py:346-348: fences from q1/q3 with IQR = q3 - q1)."""
    v = _column_values(ds, col)
    q1, q3 = np.nanpercentile(v, [25.0, 75.0])
    iqr = q3 - q1
    return float(q1 - 1.5 * iqr), float(q3 + 1.5 * iqr)


# ---- sketch path ---------------------------------------------------------


def sketch_quantiles(
    ds: ray.data.Dataset, col: str, qs: tuple[float, ...], compression: int = 256
) -> tuple[float, ...]:
    """Approximate quantiles via mergeable t-digest partials: one sketch
    per block (map_batches), centroids shipped as tiny Arrow rows, merged
    on the driver. Never materializes the column."""

    def partial(batch: pa.Table) -> pa.Table:
        td = TDigest(compression).add_values(
            np.asarray(batch.column(col).to_numpy(zero_copy_only=False), dtype=np.float64)
        )
        m, w = td.to_arrays()
        return pa.table({
            "means": pa.array([m.tolist()], type=pa.list_(pa.float64())),
            "weights": pa.array([w.tolist()], type=pa.list_(pa.float64())),
        })

    merged = TDigest(compression)
    for b in ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).iter_batches(batch_size=1024, batch_format="pyarrow"):
        for m, w in zip(b.column("means").to_pylist(), b.column("weights").to_pylist()):
            merged.merge(TDigest.from_arrays(np.array(m), np.array(w), compression))
    return tuple(merged.quantile(q) for q in qs)


def calibrate_rules(
    ds: ray.data.Dataset, rules: tuple[RuleSpec, ...], exact: bool = True
) -> tuple[RuleSpec, ...]:
    """Pass 1 of the two-pass flow: recompute lo/hi for rules whose
    `calibration` is percentile/tukey from the data itself, returning a
    new frozen rule tuple to broadcast into the flag stage (pass 2)."""
    out = []
    for r in rules:
        if r.calibration == "percentile":
            if exact:
                lo, hi = percentile_thresholds(ds, r.feature)
            else:
                lo, hi = sketch_quantiles(ds, r.feature, (0.025, 0.975))
            out.append(RuleSpec(r.name, r.feature, r.kind, lo=lo, hi=hi,
                                value=r.value, calibration=r.calibration))
        elif r.calibration == "tukey":
            if exact:
                lo, hi = tukey_fences(ds, r.feature)
            else:
                q1, q3 = sketch_quantiles(ds, r.feature, (0.25, 0.75))
                iqr = q3 - q1
                lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
            out.append(RuleSpec(r.name, r.feature, r.kind, lo=lo, hi=hi,
                                value=r.value, calibration=r.calibration))
        else:
            out.append(r)
    return tuple(out)
