"""Per-dimension QC counters — the reference's 12-block outlier
distribution (groupby dim on flagged rows AND on all rows, then left
merge + pct, Home.py:444-904 / SURVEY.md §2.5 A6, §2.4 J4) fused into a
single pass with pre-aggregation:

  map_batches(partials)     # per batch: a few (dim, key) partial rows
    -> groupby(dim, key).sum  # tiny all-to-all over partials only

This computes the flagged-side and all-side counters together, so the
reference's 14 separate merge-joins collapse into one small aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

NULL_KEY = "(null)"


def counter_partials(batch: pa.Table, dims: tuple[str, ...]) -> pa.Table:
    """Per-batch partial counters: one row per (dim, key) present."""
    keep = np.asarray(pc.fill_null(batch.column("keep").combine_chunks()
                                   if isinstance(batch.column("keep"), pa.ChunkedArray)
                                   else batch.column("keep"), False))
    scrubbed = np.asarray(pc.fill_null(batch.column("scrubbed").combine_chunks()
                                       if isinstance(batch.column("scrubbed"), pa.ChunkedArray)
                                       else batch.column("scrubbed"), False))
    dropped = (~keep).astype(np.int64)
    scr = scrubbed.astype(np.int64)
    out_dim: list[str] = []
    out_key: list[str] = []
    out_all: list[int] = []
    out_drop: list[int] = []
    out_scr: list[int] = []
    for dim in dims:
        col = batch.column(dim)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys = np.asarray(pc.fill_null(pc.cast(col, pa.string()), NULL_KEY), dtype=object)
        uniq, inv = np.unique(keys, return_inverse=True)
        out_dim.extend([dim] * len(uniq))
        out_key.extend(uniq.tolist())
        out_all.extend(np.bincount(inv, minlength=len(uniq)).tolist())
        out_drop.extend(np.bincount(inv, weights=dropped, minlength=len(uniq)).astype(np.int64).tolist())
        out_scr.extend(np.bincount(inv, weights=scr, minlength=len(uniq)).astype(np.int64).tolist())
    return pa.table(
        {
            "dim": pa.array(out_dim, type=pa.string()),
            "key": pa.array(out_key, type=pa.string()),
            "count_all": pa.array(out_all, type=pa.int64()),
            "count_dropped": pa.array(out_drop, type=pa.int64()),
            "count_scrubbed": pa.array(out_scr, type=pa.int64()),
        }
    )


def rule_counters(labeled: ray.data.Dataset) -> pd.DataFrame:
    """Global per-rule counters (north_rule: 'counters kept/dropped/
    scrubbed per rule'): for every rule_<name> column, how many rows fired
    it, plus overall kept/dropped/scrubbed totals. One tiny partial row
    per batch -> driver sum; no shuffle."""

    def partials(batch: pa.Table) -> pa.Table:
        cols: dict[str, list[int]] = {}
        for c in batch.column_names:
            if (c.startswith("rule_") and c != "rule_flags") or c in ("keep", "scrubbed"):
                col = batch.column(c)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                cols[c] = [int(np.asarray(pc.fill_null(col, False)).sum())]
        cols["rows"] = [batch.num_rows]
        return pa.table(cols)

    part = labeled.map_batches(partials, batch_format="pyarrow").to_pandas().sum()
    rows = int(part["rows"])
    recs = [{"rule": "_total", "fired": rows, "kept": int(part.get("keep", 0)),
             "scrubbed": int(part.get("scrubbed", 0))}]
    for c in sorted(part.index):
        if c.startswith("rule_"):
            recs.append({"rule": c[len("rule_"):], "fired": int(part[c]),
                         "kept": 0, "scrubbed": 0})
    return pd.DataFrame(recs)


def compute_counters(labeled: ray.data.Dataset, dims: tuple[str, ...]) -> pd.DataFrame:
    """Counters over a labeled dataset; returns a small sorted DataFrame."""
    partials = labeled.map_batches(
        lambda b: counter_partials(b, dims), batch_format="pyarrow"
    )
    agg = partials.groupby(["dim", "key"]).aggregate(
        Sum("count_all", alias_name="count_all"),
        Sum("count_dropped", alias_name="count_dropped"),
        Sum("count_scrubbed", alias_name="count_scrubbed"),
    )
    df = agg.to_pandas()
    return df.sort_values(["dim", "key"], ignore_index=True)
