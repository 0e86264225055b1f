"""Calibration aggregates: exact percentile/Tukey semantics (Home.py:337-365)
and t-digest sketch accuracy."""

import numpy as np
import pyarrow as pa
import pytest

from txiac_qc_ray.config import RuleSpec
from txiac_qc_ray.state.tdigest import TDigest


@pytest.fixture(scope="module")
def feature_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    vals = rng.normal(10.0, 3.0, 20_000)
    vals[::97] = np.nan  # NaN skipping must match np.nanpercentile
    return ray.data.from_arrow(pa.table({"f": vals})), vals


def test_percentile_thresholds_exact(feature_ds):
    from txiac_qc_ray.pipelines.calibrate import percentile_thresholds

    ds, vals = feature_ds
    lo, hi = percentile_thresholds(ds, "f")
    explo, exphi = np.nanpercentile(vals, [2.5, 97.5])
    assert lo == pytest.approx(explo, abs=0)
    assert hi == pytest.approx(exphi, abs=0)


def test_tukey_fences_formula(feature_ds):
    from txiac_qc_ray.pipelines.calibrate import tukey_fences

    ds, vals = feature_ds
    lo, hi = tukey_fences(ds, "f")
    q1, q3 = np.nanpercentile(vals, [25, 75])
    iqr = q3 - q1
    assert lo == pytest.approx(q1 - 1.5 * iqr)
    assert hi == pytest.approx(q3 + 1.5 * iqr)


def test_audit_threshold(feature_ds):
    from txiac_qc_ray.pipelines.calibrate import audit_threshold

    ds, vals = feature_ds
    assert audit_threshold(ds, "f") == pytest.approx(
        np.nanpercentile(np.abs(vals), 95), abs=0
    )


def test_sketch_quantiles_close(feature_ds):
    from txiac_qc_ray.pipelines.calibrate import sketch_quantiles

    ds, vals = feature_ds
    (q025, q975) = sketch_quantiles(ds, "f", (0.025, 0.975))
    exact = np.nanpercentile(vals, [2.5, 97.5])
    spread = exact[1] - exact[0]
    assert abs(q025 - exact[0]) / spread < 0.02
    assert abs(q975 - exact[1]) / spread < 0.02


def test_calibrate_rules_two_pass(feature_ds):
    from txiac_qc_ray.pipelines.calibrate import calibrate_rules

    ds, vals = feature_ds
    rules = (
        RuleSpec("fixed", "f", "gt", hi=1.0),
        RuleSpec("cal", "f", "two_sided", lo=0.0, hi=0.0, calibration="percentile"),
    )
    out = calibrate_rules(ds, rules)
    assert out[0] == rules[0]
    explo, exphi = np.nanpercentile(vals, [2.5, 97.5])
    assert out[1].lo == pytest.approx(explo) and out[1].hi == pytest.approx(exphi)


def test_calibrate_rules_single_pass(ray_session, tmp_path):
    """Calibrating N rules must execute the upstream pipeline ONCE
    (VERDICT r1 item 7): a tracer stage drops one marker file per batch
    invocation; with 3 calibratable rules over 2 features the marker
    count equals the single-pass batch count, not 3x."""
    import os
    import uuid

    import ray.data

    from txiac_qc_ray.pipelines.calibrate import calibrate_rules

    marker_dir = str(tmp_path)
    rng = np.random.default_rng(5)
    t = pa.table({"f1": rng.normal(size=4096), "f2": rng.normal(size=4096)})

    def tracer(batch: pa.Table) -> pa.Table:
        with open(os.path.join(marker_dir, uuid.uuid4().hex), "w"):
            pass
        return batch

    ds = ray.data.from_arrow(t).map_batches(
        tracer, batch_format="pyarrow", batch_size=1024)
    rules = (
        RuleSpec("c1", "f1", "two_sided", lo=0, hi=0, calibration="percentile"),
        RuleSpec("c2", "f1", "two_sided", lo=0, hi=0, calibration="tukey"),
        RuleSpec("c3", "f2", "two_sided", lo=0, hi=0, calibration="percentile"),
    )
    calibrate_rules(ds, rules, exact=True)
    n_exact = len(os.listdir(marker_dir))
    for f in os.listdir(marker_dir):
        os.unlink(os.path.join(marker_dir, f))
    calibrate_rules(ds, rules, exact=False)
    n_sketch = len(os.listdir(marker_dir))
    # one streamed execution -> at most ceil(4096/1024)=4 tracer batches
    # (+1 tolerance for block splitting), NOT one execution per rule
    assert n_exact <= 5, n_exact
    assert n_sketch <= 5, n_sketch


def test_tdigest_merge_associative():
    rng = np.random.default_rng(3)
    a, b, c = rng.exponential(2.0, 5000), rng.normal(5, 1, 5000), rng.uniform(0, 20, 5000)
    allv = np.concatenate([a, b, c])
    merged = TDigest().add_values(a).merge(TDigest().add_values(b)).merge(TDigest().add_values(c))
    for q in (0.025, 0.25, 0.5, 0.75, 0.975):
        exact = np.quantile(allv, q)
        assert abs(merged.quantile(q) - exact) < 0.05 * (allv.max() - allv.min())
    assert merged.total_weight == len(allv)


def test_tdigest_nan_and_empty():
    td = TDigest().add_values(np.array([np.nan, np.nan]))
    assert np.isnan(td.quantile(0.5))
    td.add_values(np.array([1.0, np.nan, 3.0]))
    assert td.total_weight == 2.0


def test_grouped_sketch_digests_accuracy(ray_session):
    """Per-key digests vs exact per-key quantiles (<=2% of spread), and
    total weights must account for every row exactly."""
    import ray.data

    from txiac_qc_ray.pipelines.calibrate import grouped_sketch_digests

    rng = np.random.default_rng(77)
    keys = rng.choice(["en", "fr", "de"], 30_000, p=[0.6, 0.3, 0.1])
    vals = np.where(keys == "en", rng.normal(0, 1, 30_000),
                    np.where(keys == "fr", rng.normal(5, 2, 30_000),
                             rng.exponential(3, 30_000)))
    ds = ray.data.from_arrow(pa.table({"lang": keys, "f": vals}))
    digs = grouped_sketch_digests(ds, "lang", "f")
    assert set(digs) == {"en", "fr", "de"}
    total = 0.0
    for k in digs:
        sel = vals[keys == k]
        total += digs[k].total_weight
        spread = np.quantile(sel, 0.975) - np.quantile(sel, 0.025)
        for q in (0.025, 0.5, 0.975):
            assert abs(digs[k].quantile(q) - np.quantile(sel, q)) < 0.02 * spread, (k, q)
    assert total == len(vals)


def test_qc_label_documents_sketch_calibration(ray_session):
    """calibration_mode='sketch' routes pass 1 through the t-digest path
    (the beyond-driver-RAM option): the flagship completes and its
    keep/drop split stays close to the exact path's (sketch quantiles
    are ~1/compression accurate, so a handful of boundary docs may
    flip)."""
    from txiac_qc_ray.config import PipelineConfig
    from txiac_qc_ray.pipelines.qc import qc_label_documents

    sf = "/root/testdata/sf0.001"
    exact = qc_label_documents(sf).to_pandas()
    sk = qc_label_documents(
        sf, PipelineConfig(calibration_mode="sketch")).to_pandas()
    assert len(sk) == len(exact)
    agree = (exact.sort_values("doc_id")["keep"].to_numpy()
             == sk.sort_values("doc_id")["keep"].to_numpy()).mean()
    assert agree >= 0.98
