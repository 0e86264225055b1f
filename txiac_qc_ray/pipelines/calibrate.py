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


def _columns_values(ds: ray.data.Dataset, cols: list[str]) -> dict[str, np.ndarray]:
    """Materialize the requested float64 columns in ONE streamed pass
    (the exact path's only collect). One execution of the upstream
    pipeline no matter how many rules calibrate from it (VERDICT r1
    item 7)."""
    parts: dict[str, list[np.ndarray]] = {c: [] for c in cols}
    for batch in ds.select_columns(list(cols)).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for c in cols:
            parts[c].append(np.asarray(
                batch.column(c).to_numpy(zero_copy_only=False), dtype=np.float64))
    return {c: (np.concatenate(p) if p else np.empty(0, dtype=np.float64))
            for c, p in parts.items()}


def _column_values(ds: ray.data.Dataset, col: str) -> np.ndarray:
    """Single-column convenience wrapper over _columns_values."""
    return _columns_values(ds, [col])[col]


def percentile_thresholds(
    ds: ray.data.Dataset, col: str, percentiles: tuple[float, float] = (2.5, 97.5)
) -> tuple[float, float]:
    """Exact [lo, hi] percentiles with np.nanpercentile linear
    interpolation (Home.py:340 semantics)."""
    v = _column_values(ds, col)
    if v.size == 0:  # np.nanpercentile collapses to a SCALAR nan on empty
        return float("nan"), float("nan")
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
    if v.size == 0:  # np.nanpercentile collapses to a SCALAR nan on empty
        return float("nan"), float("nan")
    q1, q3 = np.nanpercentile(v, [25.0, 75.0])
    iqr = q3 - q1
    return float(q1 - 1.5 * iqr), float(q3 + 1.5 * iqr)


# ---- sketch path ---------------------------------------------------------


def sketch_digests(
    ds: ray.data.Dataset, cols: list[str], compression: int = 256
) -> dict[str, TDigest]:
    """Mergeable t-digests for ALL requested columns in ONE streamed
    pass: each block emits one (col, centroids) row per column, the
    driver merges per column. Never materializes any column, and never
    re-executes the upstream pipeline per rule (VERDICT r1 item 7)."""

    def partial(batch: pa.Table) -> pa.Table:
        names, means, weights = [], [], []
        for c in cols:
            td = TDigest(compression).add_values(
                np.asarray(batch.column(c).to_numpy(zero_copy_only=False), dtype=np.float64)
            )
            m, w = td.to_arrays()
            names.append(c)
            means.append(m.tolist())
            weights.append(w.tolist())
        return pa.table({
            "col": pa.array(names, type=pa.string()),
            "means": pa.array(means, type=pa.list_(pa.float64())),
            "weights": pa.array(weights, type=pa.list_(pa.float64())),
        })

    merged = {c: TDigest(compression) for c in cols}
    for b in ds.select_columns(list(cols)).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).iter_batches(batch_size=1024, batch_format="pyarrow"):
        for c, m, w in zip(b.column("col").to_pylist(),
                           b.column("means").to_pylist(),
                           b.column("weights").to_pylist()):
            merged[c].merge(TDigest.from_arrays(np.array(m), np.array(w), compression))
    return merged


def sketch_quantiles(
    ds: ray.data.Dataset, col: str, qs: tuple[float, ...], compression: int = 256
) -> tuple[float, ...]:
    """Single-column convenience wrapper over sketch_digests."""
    td = sketch_digests(ds, [col], compression)[col]
    return tuple(td.quantile(q) for q in qs)


def grouped_sketch_digests(
    ds: ray.data.Dataset, key: str, col: str, compression: int = 256
) -> dict[str, TDigest]:
    """Per-KEY mergeable t-digests in one streamed pass — the scale path
    for per-language/per-host threshold calibration (grouped_quantiles
    materializes each group; this never does). Each block emits one
    (key, centroids) row per key present in the block; the driver merges
    per key (#keys x compression centroids, independent of row count)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(key), dtype=object)
        vals = np.asarray(batch.column(col).to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        uniq, inv = np.unique(keys, return_inverse=True)
        names, means, weights = [], [], []
        for i, k in enumerate(uniq):
            td = TDigest(compression).add_values(vals[inv == i])
            m, w = td.to_arrays()
            names.append(str(k))
            means.append(m.tolist())
            weights.append(w.tolist())
        return pa.table({
            "key": pa.array(names, type=pa.string()),
            "means": pa.array(means, type=pa.list_(pa.float64())),
            "weights": pa.array(weights, type=pa.list_(pa.float64())),
        })

    merged: dict[str, TDigest] = {}
    for b in ds.select_columns([key, col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).iter_batches(batch_size=1024, batch_format="pyarrow"):
        for k, m, w in zip(b.column("key").to_pylist(),
                           b.column("means").to_pylist(),
                           b.column("weights").to_pylist()):
            merged.setdefault(k, TDigest(compression)).merge(
                TDigest.from_arrays(np.array(m), np.array(w), compression))
    return merged


def calibrate_rules(
    ds: ray.data.Dataset, rules: tuple[RuleSpec, ...], exact: bool = True
) -> tuple[RuleSpec, ...]:
    """Pass 1 of the two-pass flow: recompute lo/hi for rules whose
    `calibration` is percentile/tukey from the data itself, returning a
    new frozen rule tuple to broadcast into the flag stage (pass 2).

    ONE streamed execution of `ds` regardless of rule count: all
    calibratable feature columns are collected (exact) or sketched
    (t-digest) together, then each rule's thresholds are derived from
    the shared pass (VERDICT r1 item 7)."""
    feats = sorted({r.feature for r in rules
                    if r.calibration in ("percentile", "tukey")})
    if not feats:
        return tuple(rules)
    if exact:
        vals = _columns_values(ds, feats)
        quantiles = exact_quantiles_fn(vals)
    else:
        digests = sketch_digests(ds, feats)

        def quantiles(f: str, qs: tuple[float, ...]) -> tuple[float, ...]:
            return tuple(digests[f].quantile(q) for q in qs)

    return derive_rule_thresholds(rules, quantiles)


def exact_quantiles_fn(values_by_col: dict[str, np.ndarray]):
    """The ONE exact-quantile evaluation (np.nanpercentile, linear
    interpolation) shared by the Ray calibration pass and the
    single-process golden twin — a second copy of this closure is how
    the two sides would drift."""

    def quantiles(f: str, qs: tuple[float, ...]) -> tuple[float, ...]:
        v = values_by_col[f]
        if v.size == 0:  # nanpercentile collapses to a SCALAR nan on empty
            return tuple(float("nan") for _ in qs)
        return tuple(float(x) for x in
                     np.nanpercentile(v, [100 * q for q in qs]))

    return quantiles


def derive_rule_thresholds(rules: tuple[RuleSpec, ...],
                           quantiles) -> tuple[RuleSpec, ...]:
    """Pure threshold derivation shared by the Ray calibration pass and
    the single-process golden twin (ONE copy of the percentile/Tukey
    formulas, so the two can't drift). `quantiles(feature, qs)` returns
    the requested quantiles of that feature column."""
    out = []
    for r in rules:
        if r.calibration == "percentile":
            lo, hi = quantiles(r.feature, (0.025, 0.975))
            out.append(RuleSpec(r.name, r.feature, r.kind, lo=lo, hi=hi,
                                value=r.value, calibration=r.calibration))
        elif r.calibration == "tukey":
            q1, q3 = quantiles(r.feature, (0.25, 0.75))
            iqr = q3 - q1
            out.append(RuleSpec(r.name, r.feature, r.kind,
                                lo=q1 - 1.5 * iqr, hi=q3 + 1.5 * iqr,
                                value=r.value, calibration=r.calibration))
        else:
            out.append(r)
    return tuple(out)
