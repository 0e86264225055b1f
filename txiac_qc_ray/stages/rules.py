"""Declarative threshold rule flagger — the keep/drop kernel.

Reference semantics (thre_filter, Home.py:161-184), re-expressed as a
vectorized stateless `map_batches` stage over Arrow batches:

  - Audit shape      `abs(diff) >= hi`            -> kind="abs_ge"  (H:178)
  - Year-by-year     `diff >= hi or diff <= lo`   -> kind="two_sided" (H:181)
  - plus lt / gt / outside / is_null / ne_str for the web-text rules.

NaN never fires a rule (pandas `.loc` comparison semantics with NaN
diffs, H:178) — EXCEPT the explicit `is_null` kind, which exists to flag
null text deliberately.

The reference sets a single 0/1 `flag` and *keeps* flagged rows (H:183);
here every rule gets its own bool column `rule_<name>` (per-rule lineage),
`keep = NOT any(rule fired)`, `drop_reason` = first firing rule in frozen
config order, and `rule_flags` is the list of all firing rule names
(FIXTURES.md F2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_RULES, RuleSpec


def _as_float(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = np.asarray(pc.cast(pc.fill_null(col, np.nan), pa.float64()))
    return arr


def _rule_fire(batch: pa.Table, rule: RuleSpec) -> np.ndarray:
    col = batch.column(rule.feature)
    if rule.kind == "is_null":
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return np.asarray(col.is_null())
    if rule.kind == "ne_str":
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # null categorical does NOT fire ne_str (its own is_null rule should)
        return np.asarray(pc.fill_null(pc.not_equal(col, rule.value), False))
    f = _as_float(col)
    with np.errstate(invalid="ignore"):
        if rule.kind == "lt":
            return f < rule.lo
        if rule.kind == "gt":
            return f > rule.hi
        if rule.kind == "outside":
            return (f < rule.lo) | (f > rule.hi)
        if rule.kind == "abs_ge":  # Audit shape, H:178
            return np.abs(f) >= rule.hi
        if rule.kind == "two_sided":  # Year-by-year shape, H:181
            return (f >= rule.hi) | (f <= rule.lo)
    raise ValueError(f"unknown rule kind: {rule.kind}")


def apply_rules(batch: pa.Table, rules: tuple[RuleSpec, ...] = DEFAULT_RULES) -> pa.Table:
    """Stateless map_batches stage fn. Adds rule_<name> bool columns,
    keep: bool, drop_reason: string (null if kept), rule_flags: list<string>."""
    n = batch.num_rows
    flags = np.zeros((len(rules), n), dtype=bool)
    for k, rule in enumerate(rules):
        flags[k] = _rule_fire(batch, rule)
        batch = batch.append_column(f"rule_{rule.name}", pa.array(flags[k]))
    any_fired = flags.any(axis=0)
    keep = ~any_fired
    batch = batch.append_column("keep", pa.array(keep))

    names = np.array([r.name for r in rules], dtype=object)
    # drop_reason = FIRST firing rule (frozen order)
    first_idx = np.where(any_fired, flags.argmax(axis=0), -1)
    reasons = np.where(first_idx >= 0, names[np.clip(first_idx, 0, None)], None)
    batch = batch.append_column("drop_reason", pa.array(reasons, type=pa.string()))

    # rule_flags: list<string> of all firing rules, vectorized assembly
    rows, rcols = np.nonzero(flags.T)  # row-major: sorted by row, then rule order
    values = pa.array(names[rcols], type=pa.string())
    offsets = np.searchsorted(rows, np.arange(n + 1)).astype(np.int32)
    list_arr = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)
    return batch.append_column("rule_flags", list_arr)


def make_rules_stage(rules: tuple[RuleSpec, ...] = DEFAULT_RULES):
    def _stage(batch: pa.Table) -> pa.Table:
        return apply_rules(batch, rules)

    return _stage
