"""Rule-flagger truth tables incl. NaN propagation and the reference's
exact comparison boundaries (Home.py:176-183 semantics)."""

import math

import numpy as np
import pyarrow as pa

from txiac_qc_ray.config import RuleSpec
from txiac_qc_ray.stages.rules import apply_rules


def tbl(**cols):
    return pa.table(cols)


def test_abs_ge_audit_shape():
    # Audit: flag where abs(diff) >= hi  (H:178, inclusive >=)
    t = tbl(diff=pa.array([-2.0, -1.0, 0.0, 0.999, 1.0, 1.5, None, float("nan")]))
    out = apply_rules(t, (RuleSpec("r", "diff", "abs_ge", hi=1.0),))
    assert out.column("rule_r").to_pylist() == [True, True, False, False, True, True, False, False]


def test_two_sided_yby_shape():
    # YbY: flag where diff >= hi OR diff <= lo (H:181, inclusive both)
    t = tbl(diff=pa.array([-1.1, -1.0, 0.0, 2.0, 2.1, None]))
    out = apply_rules(t, (RuleSpec("r", "diff", "two_sided", lo=-1.0, hi=2.0),))
    assert out.column("rule_r").to_pylist() == [True, True, False, True, True, False]


def test_nan_never_fires_numeric_rules():
    t = tbl(f=pa.array([float("nan"), None, 1.0]))
    for kind, kw in [("lt", dict(lo=5.0)), ("gt", dict(hi=0.5)),
                     ("outside", dict(lo=2.0, hi=3.0)), ("abs_ge", dict(hi=0.1)),
                     ("two_sided", dict(lo=0.0, hi=0.5))]:
        out = apply_rules(t, (RuleSpec("r", "f", kind, **kw),))
        fired = out.column("rule_r").to_pylist()
        assert fired[0] is False and fired[1] is False, (kind, fired)
        assert fired[2] is True


def test_is_null_and_ne_str():
    t = tbl(text=pa.array([None, "x"]), lang=pa.array(["de", None]))
    out = apply_rules(t, (
        RuleSpec("null_text", "text", "is_null"),
        RuleSpec("non_en", "lang", "ne_str", value="en"),
    ))
    assert out.column("rule_null_text").to_pylist() == [True, False]
    # null categorical does not fire ne_str
    assert out.column("rule_non_en").to_pylist() == [True, False]


def test_keep_drop_reason_and_flags():
    rules = (
        RuleSpec("a", "x", "gt", hi=1.0),
        RuleSpec("b", "y", "gt", hi=1.0),
    )
    t = tbl(x=pa.array([2.0, 0.0, 2.0]), y=pa.array([2.0, 0.0, 0.0]))
    out = apply_rules(t, rules)
    assert out.column("keep").to_pylist() == [False, True, False]
    assert out.column("drop_reason").to_pylist() == ["a", None, "a"]
    assert out.column("rule_flags").to_pylist() == [["a", "b"], [], ["a"]]


def test_keep_union_drop_partitions_input():
    rng = np.random.default_rng(7)
    t = tbl(x=pa.array(rng.normal(size=1000)))
    out = apply_rules(t, (RuleSpec("r", "x", "abs_ge", hi=1.0),))
    keep = out.column("keep").to_pylist()
    flag = out.column("rule_r").to_pylist()
    assert all(k != f for k, f in zip(keep, flag))
    assert math.isclose(sum(keep) + sum(flag), 1000)
