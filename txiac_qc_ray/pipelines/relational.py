"""Relational operator suite over the driver's TPC-H-ish testdata tables.

One function per operator family from SURVEY.md §2, implemented
Ray-Data-first; every function here has a matching ANSI-SQL oracle in
`__ray_entry__.oracle_sql()` and is checked row/schema/value-wise by the
driver at sf=0.01. Reference file:line citations mark which reference
behavior each operator re-expresses.

Conventions:
  - column names of computed/aggregate outputs are chosen once and used
    verbatim in the SQL oracle (driver hashes by sorted column name);
  - float aggregate outputs are rounded with `round_half_away` (DuckDB
    `round` semantics) on BOTH sides to absorb summation-order jitter;
  - results are small (aggregates / flagged subsets); full-table maps
    return the mapped rows themselves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def round_half_away(x: np.ndarray | float, digits: int) -> np.ndarray | float:
    """DuckDB-compatible ROUND (half away from zero; numpy rounds half
    to even, which would disagree with the SQL oracle on exact halves)."""
    s = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def typed_empty(spec: dict) -> pd.DataFrame:
    """Typed zero-row frame. Empty-partition contract: empty in ->
    typed empty out. Ray collects the result of a groupby/aggregate or
    map_batches chain over a zero-row Dataset as a ZERO-COLUMN frame
    (no batch function ever ran to establish the schema), which would
    KeyError any downstream column selection."""
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in spec.items()})


def ensure_columns(df: pd.DataFrame, spec: dict) -> pd.DataFrame:
    """Restore the declared schema on a zero-column empty collect (see
    typed_empty); non-empty frames pass through untouched."""
    if len(df) == 0 and any(c not in df.columns for c in spec):
        return typed_empty(spec)
    return df


# ---- S3/S4: projection + derived column (data_load, Home.py:95-105) ------

def project_derive(sf_dir: str) -> ray.data.Dataset:
    """SECTION LENGTH analog: abs-difference derived column + projection."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"])

    def stage(t: pa.Table) -> pa.Table:
        deriv = pc.abs(pc.subtract(pc.multiply(t["l_extendedprice"], t["l_discount"]),
                                   pc.multiply(t["l_tax"], pa.scalar(100.0))))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "deriv": deriv,  # unrounded: same IEEE ops as the SQL oracle -> bitwise equal
        })

    return ds.map_batches(stage, batch_format="pyarrow")


# ---- S2/M8: timestamp arithmetic (Home.py:99,713-721) --------------------

def timestamp_days(sf_dir: str) -> ray.data.Dataset:
    """Days since epoch base per event (time_diff -> .dt.days analog)."""
    ds = _read(sf_dir, "events", ["event_id", "ts"])
    base = pa.scalar(np.datetime64("2024-01-01T00:00:00", "us"), type=pa.timestamp("us"))

    def stage(t: pa.Table) -> pa.Table:
        days = pc.days_between(base, t["ts"])
        return pa.table({"event_id": t["event_id"],
                         "days_since": pc.cast(days, pa.int64())})

    return ds.map_batches(stage, batch_format="pyarrow")


# ---- M2: categorical isin filter (pav_filter, Home.py:143-158) -----------

def filter_isin(sf_dir: str) -> ray.data.Dataset:
    """M2 isin filter PUSHED INTO THE READ (r4): the predicate is a
    pyarrow.dataset expression handed to read_parquet, so row-group
    statistics prune non-matching groups before bytes leave storage and
    surviving rows are filtered inside the scan task — only matching
    rows ever enter the object store ('prune at the read')."""
    import pyarrow.dataset as pads

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
        filter=pads.field("lang").isin(["en", "fr"]))


# ---- M3: semi-join via broadcast key set (Home.py:124) -------------------

def semi_join_agg(sf_dir: str) -> pd.DataFrame:
    """Keep lineitems whose suppkey belongs to nation 3's suppliers
    (broadcast small-side key set; no shuffle), then aggregate."""
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sdf = ensure_columns(supp.map_batches(
        lambda t: t.filter(pc.equal(t["s_nationkey"], pa.scalar(3, pa.int32()))).select(["s_suppkey"]),
        batch_format="pyarrow",
    ).to_pandas(), {"s_suppkey": "int64"})
    key_set = pa.array(np.sort(sdf["s_suppkey"].to_numpy()), type=pa.int64())  # broadcast (tiny)

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_quantity"])
    flt = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["l_suppkey"], value_set=key_set)),
        batch_format="pyarrow",
    )
    agg = flt.aggregate(Count(alias_name="cnt"), Sum("l_quantity", alias_name="sum_qty"))
    if not agg or "cnt" not in agg or agg.get("sum_qty") is None:
        # empty (or fully-filtered) input: Sum over zero rows is None
        return pd.DataFrame({"cnt": [0], "sum_qty": [np.nan]})  # SQL: (0, NULL)
    return pd.DataFrame({"cnt": [int(agg["cnt"])], "sum_qty": [float(agg["sum_qty"])]})


# ---- J1: tolerance (band) join — the centerpiece (Home.py:128-132) -------

def tolerance_join(sf_dir: str) -> pd.DataFrame:
    """Equi-join customer x supplier on nationkey + band predicate
    abs(c_acctbal - s_acctbal) < 500 (strict <, mirroring the reference's
    strict <0.05 DFO band, Home.py:132). Small side broadcast into a
    map_batches hash-lookup — the at-scale pattern for dimension joins."""
    supp = ensure_columns(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"]).to_pandas(),
        {"s_suppkey": "int64", "s_nationkey": "int64", "s_acctbal": "float64"})
    supp_by_nation = {k: g[["s_suppkey", "s_acctbal"]].to_numpy()
                      for k, g in supp.groupby("s_nationkey")}

    def stage(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["c_custkey"])
        cn = np.asarray(t["c_nationkey"])
        cb = np.asarray(t["c_acctbal"])
        out_c, out_s, out_cb, out_sb = [], [], [], []
        for nation, rows in supp_by_nation.items():
            m = cn == nation
            if not m.any():
                continue
            # band predicate vectorized over the candidate cross block
            diffs = np.abs(cb[m][:, None] - rows[:, 1][None, :])
            ci, si = np.nonzero(diffs < 500.0)
            out_c.append(ck[m][ci])
            out_s.append(rows[:, 0][si].astype(np.int64))
            out_cb.append(cb[m][ci])
            out_sb.append(rows[:, 1][si])
        if not out_c:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "s_suppkey": pa.array([], pa.int64()),
                             "c_acctbal": pa.array([], pa.float64()),
                             "s_acctbal": pa.array([], pa.float64())})
        return pa.table({
            "c_custkey": np.concatenate(out_c),
            "s_suppkey": np.concatenate(out_s),
            "c_acctbal": np.concatenate(out_cb),
            "s_acctbal": np.concatenate(out_sb),
        })

    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    df = ensure_columns(
        ds.map_batches(stage, batch_format="pyarrow").to_pandas(),
        {"c_custkey": "int64", "s_suppkey": "int64",
         "c_acctbal": "float64", "s_acctbal": "float64"})
    return df.sort_values(["c_custkey", "s_suppkey"], ignore_index=True)


# ---- M4: threshold flaggers (thre_filter, Home.py:161-184) ---------------

def threshold_flag_audit(sf_dir: str) -> ray.data.Dataset:
    """Audit shape: keep rows where abs(diff) >= hi (H:178; the reference
    SELECTS the flagged rows, H:183 — so do we)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])

    def stage(t: pa.Table) -> pa.Table:
        diff = pc.subtract(t["l_quantity"], pa.scalar(25.0))
        fired = pc.greater_equal(pc.abs(diff), pa.scalar(20.0))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "diff_qty": diff,
        }).filter(fired)

    return ds.map_batches(stage, batch_format="pyarrow")


def threshold_flag_two_sided(sf_dir: str) -> ray.data.Dataset:
    """Year-by-year shape: keep rows where diff >= hi OR diff <= lo (H:181)."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])

    def stage(t: pa.Table) -> pa.Table:
        diff = pc.multiply(t["l_extendedprice"], t["l_discount"])
        fired = pc.or_(pc.greater_equal(diff, pa.scalar(3000.0)),
                       pc.less_equal(diff, pa.scalar(100.0)))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "diff_disc": diff,  # unrounded: bitwise-equal to the SQL expression
        }).filter(fired)

    return ds.map_batches(stage, batch_format="pyarrow")


# ---- A6/J4/M9: grouped outlier counters in ONE pass (Home.py:444-904) ----

def grouped_counters(sf_dir: str) -> pd.DataFrame:
    """The reference's per-dimension outlier blocks: groupby(dim) over
    flagged AND all rows + merge + pct (H:456-462) — computed in a single
    groupby with pre-aggregated per-batch partials (no join at all)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partials(t: pa.Table) -> pa.Table:
        qty = np.asarray(t["l_quantity"])
        flag = np.abs(qty - 25.0) >= 20.0
        keys = np.asarray(t["l_returnflag"], dtype=object)
        uniq, inv = np.unique(keys, return_inverse=True)
        return pa.table({
            "l_returnflag": pa.array(uniq.tolist(), type=pa.string()),
            "count_all": np.bincount(inv, minlength=len(uniq)).astype(np.int64),
            "sum_qty": np.bincount(inv, weights=qty, minlength=len(uniq)),
            "count_out": np.bincount(inv, weights=flag, minlength=len(uniq)).astype(np.int64),
            "sum_qty_out": np.bincount(inv, weights=qty * flag, minlength=len(uniq)),
        })

    agg = ds.map_batches(partials, batch_format="pyarrow").groupby("l_returnflag").aggregate(
        Sum("count_all", alias_name="count_all"),
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("count_out", alias_name="count_out"),
        Sum("sum_qty_out", alias_name="sum_qty_out"),
    )
    df = ensure_columns(agg.to_pandas(),
                        {"l_returnflag": "object", "count_all": "int64",
                         "sum_qty": "float64", "count_out": "int64",
                         "sum_qty_out": "float64"})
    df["pct_out"] = round_half_away(100.0 * df["count_out"] / df["count_all"], 4)
    df["sum_qty"] = round_half_away(df["sum_qty"], 4)
    df["sum_qty_out"] = round_half_away(df["sum_qty_out"], 4)
    return df.sort_values("l_returnflag", ignore_index=True)


# ---- A2: grouped mean (county summary, Home.py:215-222) ------------------

def grouped_mean(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])
    agg = ds.groupby("c_mktsegment").aggregate(
        Mean("c_acctbal", alias_name="avg_bal"),
        Count(alias_name="cnt"),
    )
    df = ensure_columns(agg.to_pandas(),
                        {"c_mktsegment": "object", "avg_bal": "float64", "cnt": "int64"})
    df["avg_bal"] = round_half_away(df["avg_bal"], 4)
    return df.sort_values("c_mktsegment", ignore_index=True)


# ---- A4: group size (Home.py:256-260) ------------------------------------

def group_size(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderstatus"])
    df = ensure_columns(
        ds.groupby("o_orderstatus").aggregate(Count(alias_name="cnt")).to_pandas(),
        {"o_orderstatus": "object", "cnt": "int64"})
    return df.sort_values("o_orderstatus", ignore_index=True)


# ---- A3: grouped sum pivoted wide (Home.py:226-254) ----------------------

def pivot_sum_wide(sf_dir: str) -> pd.DataFrame:
    """Sum `value` by event_type, pivoted into three user-bucket columns
    (LOW/MEDIUM/HIGH traffic analog) — partial per batch, tiny groupby."""
    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def partials(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"], dtype=object)
        bucket = np.asarray(t["user_id"]) % 3
        val = np.asarray(t["value"])
        uniq, inv = np.unique(et, return_inverse=True)
        cols = {"event_type": pa.array(uniq.tolist(), type=pa.string())}
        for b, name in enumerate(("bucket0", "bucket1", "bucket2")):
            cols[name] = np.bincount(inv, weights=val * (bucket == b), minlength=len(uniq))
        return pa.table(cols)

    agg = ds.map_batches(partials, batch_format="pyarrow").groupby("event_type").aggregate(
        Sum("bucket0", alias_name="bucket0"),
        Sum("bucket1", alias_name="bucket1"),
        Sum("bucket2", alias_name="bucket2"),
    )
    df = ensure_columns(agg.to_pandas(),
                        {"event_type": "object", "bucket0": "float64",
                         "bucket1": "float64", "bucket2": "float64"})
    for c in ("bucket0", "bucket1", "bucket2"):
        df[c] = round_half_away(df[c], 4)
    return df.sort_values("event_type", ignore_index=True)


# ---- A1: quantile calibration (Home.py:337-365) --------------------------

def quantile_thresholds_q(sf_dir: str) -> pd.DataFrame:
    from .calibrate import percentile_thresholds

    ds = _read(sf_dir, "lineitem", ["l_quantity"])
    lo, hi = percentile_thresholds(ds, "l_quantity", (2.5, 97.5))
    return pd.DataFrame({"lo": [round_half_away(lo, 4)], "hi": [round_half_away(hi, 4)]})


def tukey_fences_q(sf_dir: str) -> pd.DataFrame:
    from .calibrate import tukey_fences

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    lo, hi = tukey_fences(ds, "l_extendedprice")
    return pd.DataFrame({"lo": [round_half_away(lo, 4)], "hi": [round_half_away(hi, 4)]})


# ---- M6/A7: binning + histogram (Home.py:417-421,623-630) ----------------

_BIN_EDGES = np.array([1000.0, 5000.0, 20000.0, 50000.0])  # implicit ±inf ends
_BIN_LABELS = np.array(["b0", "b1", "b2", "b3", "b4"], dtype=object)


def binned_histogram(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def partials(t: pa.Table) -> pa.Table:
        v = np.asarray(t["l_extendedprice"])
        b = np.digitize(v, _BIN_EDGES)  # edges are right-open: v < e -> bin
        cnt = np.bincount(b, minlength=5)
        return pa.table({"bin": pa.array(_BIN_LABELS.tolist(), type=pa.string()),
                         "cnt": cnt.astype(np.int64)})

    df = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow")
          .groupby("bin").aggregate(Sum("cnt", alias_name="cnt")).to_pandas(),
        {"bin": "object", "cnt": "int64"})
    df = df[df["cnt"] > 0]
    return df.sort_values("bin", ignore_index=True)


# ---- M7: pair-indicator concat (Home.py:520-521) -------------------------

def pair_concat(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partials(t: pa.Table) -> pa.Table:
        pair = pc.binary_join_element_wise(
            t["event_type"],
            pc.cast(pc.subtract(t["user_id"], pc.multiply(pc.divide(t["user_id"], pa.scalar(5)), pa.scalar(5))), pa.string()),
            "-",
        )
        uniq, inv = np.unique(np.asarray(pair, dtype=object), return_inverse=True)
        return pa.table({"pair": pa.array(uniq.tolist(), type=pa.string()),
                         "cnt": np.bincount(inv, minlength=len(uniq)).astype(np.int64)})

    df = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow")
          .groupby("pair").aggregate(Sum("cnt", alias_name="cnt")).to_pandas(),
        {"pair": "object", "cnt": "int64"})
    return df.sort_values("pair", ignore_index=True)


# ---- O1/O2 + limit: sort / top-k (Home.py:461 etc.) ----------------------

def sort_desc_topk(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(20)
    return top.to_pandas()


# ---- O3: union-all of per-side summaries (Home.py:222,249,269) -----------

def union_all_summaries(sf_dir: str) -> pd.DataFrame:
    cust = _read(sf_dir, "customer", ["c_nationkey"]).groupby("c_nationkey").aggregate(
        Count(alias_name="cnt"))
    supp = _read(sf_dir, "supplier", ["s_nationkey"]).groupby("s_nationkey").aggregate(
        Count(alias_name="cnt"))

    def tag(side):
        def _t(t: pa.Table) -> pa.Table:
            key = t.column(0).cast(pa.int64())
            return pa.table({
                "side": pa.array([side] * t.num_rows, type=pa.string()),
                "nationkey": key,
                "cnt": t["cnt"],
            })
        return _t

    un = cust.map_batches(tag("customer"), batch_format="pyarrow").union(
        supp.map_batches(tag("supplier"), batch_format="pyarrow"))
    df = ensure_columns(un.to_pandas(),
                        {"side": "object", "nationkey": "int64", "cnt": "int64"})
    return df.sort_values(["side", "nationkey"], ignore_index=True)


# ---- A9: distinct (Home.py:116) ------------------------------------------

def distinct_vals(sf_dir: str) -> pd.DataFrame:
    vals = _read(sf_dir, "lineitem", ["l_returnflag"]).unique("l_returnflag")
    return pd.DataFrame({"v": pd.Series(sorted(vals or []), dtype="object")})


# ---- O4: row count (Home.py:435) -----------------------------------------

def row_count(sf_dir: str) -> pd.DataFrame:
    n = _read(sf_dir, "documents", ["doc_id"]).count()
    return pd.DataFrame({"n": [n]})


# ---- A5-analog: grouped mean over a second dimension (Home.py:263-270) ---

def grouped_mean_by_priority(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    df = ensure_columns(ds.groupby("o_orderpriority").aggregate(
        Mean("o_totalprice", alias_name="avg_price"),
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price"),
    ).to_pandas(), {"o_orderpriority": "object", "avg_price": "float64",
                    "min_price": "float64", "max_price": "float64"})
    for c in ("avg_price", "min_price", "max_price"):
        df[c] = round_half_away(df[c], 4)
    return df.sort_values("o_orderpriority", ignore_index=True)


# ---- streaming analog: tumbling window aggregate (SURVEY.md §2.8) --------

_NULL_KEY = "\x1enull\x1e"  # string-key stand-in for a NULL group key;
# restored to None after the final groupby so null-keyed rows aggregate
# like SQL's NULL group instead of crashing the object-key np.unique.
# NUL-free on purpose: pandas 2.2's object-string hashtable (groupby /
# drop_duplicates / merge) compares keys C-string-style, so any two
# composite keys sharing a prefix up to an embedded "\x00" MERGE —
# pinned by tests/test_nul_sentinel.py; Ray's Arrow hash shuffle and
# numpy sort/searchsorted are unaffected, but a sentinel no pandas op
# can ever mis-hash removes the whole hazard class

_NULL_USER = np.iinfo(np.int64).min  # int64 stand-in for a NULL user_id
# in distinct_count_users: keeps the row's event_type group alive while
# contributing 0 to the distinct count (SQL COUNT(DISTINCT) semantics;
# a real user with this exact id would be miscounted — documented bound)


def tumbling_window(sf_dir: str) -> pd.DataFrame:
    """1-hour tumbling windows over the events stream; partial per batch
    then tiny groupby — the Ray Data shape for windowed aggregates."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partials(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t["ts"], unit="hour")
        key = pc.binary_join_element_wise(
            pc.fill_null(t["event_type"], _NULL_KEY),
            pc.cast(pc.cast(win, pa.int64()), pa.string()), "|")
        val = np.asarray(t["value"])
        uniq, inv = np.unique(np.asarray(key, dtype=object), return_inverse=True)
        return pa.table({
            "k": pa.array(uniq.tolist(), type=pa.string()),
            "cnt": np.bincount(inv, minlength=len(uniq)).astype(np.int64),
            "sum_val": np.bincount(inv, weights=val, minlength=len(uniq)),
        })

    agg = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("k").aggregate(Sum("cnt", alias_name="cnt"),
                                     Sum("sum_val", alias_name="sum_val")).to_pandas())
    if len(agg) == 0:  # empty input (str.rsplit expand needs >=1 row)
        return typed_empty({"event_type": "object", "win": "datetime64[ns]",
                            "cnt": "int64", "sum_val": "float64"})
    # rsplit(n=1): the window suffix never contains '|', an event_type
    # value legally might
    parts = agg["k"].str.rsplit("|", n=1, expand=True)
    out = pd.DataFrame({
        "event_type": parts[0].where(parts[0] != _NULL_KEY, None),
        "win": pd.to_datetime(parts[1].astype(np.int64), unit="us"),
        "cnt": agg["cnt"],
        "sum_val": round_half_away(agg["sum_val"], 4),
    })
    return out.sort_values(["event_type", "win"], ignore_index=True)


# ---- A8: ECDF (Home.py:409-410) ------------------------------------------

def ecdf_quantity(sf_dir: str) -> pd.DataFrame:
    """ECDF of l_quantity: distinct value -> cumulative fraction of rows
    <= value. Grouped count (shuffle over ~50 partials) + driver-side
    cumsum over the tiny distinct-value table — the px.ecdf analog."""
    ds = _read(sf_dir, "lineitem", ["l_quantity"])

    def partials(t: pa.Table) -> pa.Table:
        v = np.asarray(t["l_quantity"])
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": uniq, "cnt": cnt.astype(np.int64)})

    agg = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow")
          .groupby("v").aggregate(Sum("cnt", alias_name="cnt")).to_pandas(),
        {"v": "float64", "cnt": "int64"})
    agg = agg.sort_values("v", ignore_index=True)
    total = max(int(agg["cnt"].sum()), 1)  # empty input: avoid 0/0
    agg["ecdf"] = agg["cnt"].cumsum() / total
    return agg[["v", "cnt", "ecdf"]]


# ---- M3-complement: anti-join via broadcast key set ----------------------

def anti_join_agg(sf_dir: str) -> pd.DataFrame:
    """Aggregate lineitems whose suppkey does NOT belong to nation 3's
    suppliers — the anti-join complement of semi_join_agg, same broadcast
    key-set shape (no shuffle; SURVEY.md §2.4)."""
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sdf = ensure_columns(supp.map_batches(
        lambda t: t.filter(pc.equal(t["s_nationkey"], pa.scalar(3, pa.int32()))).select(["s_suppkey"]),
        batch_format="pyarrow",
    ).to_pandas(), {"s_suppkey": "int64"})
    key_set = pa.array(np.sort(sdf["s_suppkey"].to_numpy()), type=pa.int64())

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_quantity"])
    flt = ds.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t["l_suppkey"], value_set=key_set))),
        batch_format="pyarrow",
    )
    agg = flt.aggregate(Count(alias_name="cnt"), Sum("l_quantity", alias_name="sum_qty"))
    if not agg or "cnt" not in agg or agg.get("sum_qty") is None:
        # empty (or fully-filtered) input: Sum over zero rows is None
        return pd.DataFrame({"cnt": [0], "sum_qty": [np.nan]})  # SQL: (0, NULL)
    return pd.DataFrame({"cnt": [int(agg["cnt"])], "sum_qty": [float(agg["sum_qty"])]})


# ---- A1-by-group: grouped quantiles (per-key calibration) ----------------

def grouped_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-group exact quantiles (p25/p50/p75 of l_quantity by
    returnflag) — the per-key analog of the global calibration aggregate
    (a data-calibrated threshold PER LANGUAGE/HOST at the webtext scale).
    groupby(key).map_groups with numpy linear interpolation; the
    partitioning assumption (one key's values fit a worker) matches the
    other keyed custom operators."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        q25, q50, q75 = np.percentile(g["l_quantity"].to_numpy(), [25.0, 50.0, 75.0])
        return pd.DataFrame({"l_returnflag": [g["l_returnflag"].iloc[0]],
                             "q25": [q25], "q50": [q50], "q75": [q75]})

    df = ensure_columns(
        ds.groupby("l_returnflag").map_groups(per_key, batch_format="pandas").to_pandas(),
        {"l_returnflag": "object", "q25": "float64", "q50": "float64", "q75": "float64"})
    for c in ("q25", "q50", "q75"):
        df[c] = round_half_away(df[c].to_numpy(), 4)
    return df.sort_values("l_returnflag", ignore_index=True)


# ---- J-family completion: left-outer join --------------------------------

def left_outer_join(sf_dir: str) -> pd.DataFrame:
    """Customers LEFT OUTER JOIN their order counts: every customer row
    survives, customers without orders carry n_orders = 0. Exercises
    `Dataset.join(join_type='left_outer')` — the hash-shuffle outer join
    (pre-aggregating the orders side first keeps the shuffled payload at
    one row per custkey, not one per order)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    spec = {"c_custkey": "int64", "c_mktsegment": "object", "n_orders": "int64"}
    # Empty-side guards: Ray's hash-shuffle join crashes on a schema-less
    # empty side (ArrowInvalid in HashShuffleAggregator.finalize), so
    # resolve the degenerate shapes from parquet metadata counts first.
    if cust.count() == 0:
        return typed_empty(spec)
    orders_raw = _read(sf_dir, "orders", ["o_custkey"])
    if orders_raw.count() == 0:  # left-outer with empty right: all zeros
        df = cust.to_pandas()
        df["n_orders"] = np.int64(0)
        return df.sort_values("c_custkey", ignore_index=True)[list(spec)]
    orders = orders_raw.groupby("o_custkey").aggregate(Count(alias_name="n_orders"))

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["c_custkey" if c == "o_custkey" else c
                                 for c in t.column_names])

    joined = cust.join(orders.map_batches(rename, batch_format="pyarrow"),
                       join_type="left_outer", on=["c_custkey"],
                       num_partitions=8)
    df = joined.to_pandas()
    df["n_orders"] = df["n_orders"].fillna(0).astype(np.int64)
    return df.sort_values("c_custkey", ignore_index=True)[
        ["c_custkey", "c_mktsegment", "n_orders"]]


# ---- A-family: grouped variance/stddev (integer-exact decimals) ----------

def grouped_variance(sf_dir: str) -> pd.DataFrame:
    """Per-group sample variance/stddev of l_quantity — the spread
    statistic behind z-score-style QC rules. Integer-cents partials
    (sum, sum-of-squares, count are EXACT int64s, order-independent);
    the driver evaluates the numerator n*s2 - s1*s1 in arbitrary-
    precision Python ints (ADVICE r2: s1*s1 in int64 silently wraps
    once a group's scaled sum exceeds ~3e9, i.e. ~1.2M rows), converts
    it to double ONCE (correctly rounded, exactly like the SQL twin's
    HUGEINT->DOUBLE cast), and divides by the exact double n*(n-1) —
    the same single-rounding expression shape as the oracle."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partials(t: pa.Table) -> pa.Table:
        cents = round_half_away(np.asarray(t["l_quantity"], dtype=np.float64) * 100, 0)
        keys = np.asarray(t["l_returnflag"], dtype=object)
        uniq, inv = np.unique(keys, return_inverse=True)
        return pa.table({
            "l_returnflag": pa.array(uniq.tolist(), type=pa.string()),
            "n": np.bincount(inv, minlength=len(uniq)).astype(np.int64),
            "s1": np.bincount(inv, weights=cents, minlength=len(uniq)).astype(np.int64),
            "s2": np.bincount(inv, weights=cents * cents, minlength=len(uniq)).astype(np.int64),
        })

    agg = ensure_columns(
        ds.map_batches(partials, batch_format="pyarrow")
          .groupby("l_returnflag").aggregate(
              Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
              Sum("s2", alias_name="s2")).to_pandas(),
        {"l_returnflag": "object", "n": "int64", "s1": "int64", "s2": "int64"})
    n = agg["n"].to_numpy().astype(np.int64)
    s1 = agg["s1"].to_numpy().astype(np.int64)
    s2 = agg["s2"].to_numpy().astype(np.int64)
    # exact big-int numerator on the tiny driver frame; one rounding only
    num = np.array([float(int(a) * int(b) - int(c) * int(c))
                    for a, b, c in zip(n, s2, s1)])
    var_cents2 = num / (n.astype(np.float64) * (n - 1))
    out = pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "n": n,
        "var_qty": round_half_away(var_cents2 / 10000.0, 4),
        "std_qty": round_half_away(np.sqrt(var_cents2) / 100.0, 4),
    })
    return out.sort_values("l_returnflag", ignore_index=True)


# ---- §2.8: hopping (overlapping) window aggregate ------------------------

def hopping_window(sf_dir: str) -> pd.DataFrame:
    """1-hour windows hopping every 30 minutes (each event lands in two
    windows). Same partial-aggregation shape as tumbling_window: the
    per-batch partial emits one row per (window, type) — events are
    DUPLICATED only into tiny partials, never re-shuffled themselves."""
    hop_us = 30 * 60 * 1_000_000
    win_us = 2 * hop_us
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partials(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        val = np.asarray(t["value"])
        rows_k, rows_c, rows_s = [], [], []
        for k in range(2):  # window starts at floor(ts/hop)*hop - k*hop
            start = (ts // hop_us - k) * hop_us
            ok = (ts >= start) & (ts < start + win_us)
            # Arrow join kernel (same idiom as tumbling_window) — the
            # np.char.add pair this replaced was ~5x slower per batch
            key = np.asarray(pc.binary_join_element_wise(
                pc.fill_null(t["event_type"], _NULL_KEY),
                pc.cast(pa.array(start), pa.string()), "|"), dtype=object)
            uniq, inv = np.unique(key[ok], return_inverse=True)
            rows_k.append(uniq)
            rows_c.append(np.bincount(inv, minlength=len(uniq)).astype(np.int64))
            rows_s.append(np.bincount(inv, weights=val[ok], minlength=len(uniq)))
        return pa.table({"k": pa.array(np.concatenate(rows_k).tolist(), type=pa.string()),
                         "cnt": np.concatenate(rows_c),
                         "sum_val": np.concatenate(rows_s)})

    agg = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("k").aggregate(Sum("cnt", alias_name="cnt"),
                                     Sum("sum_val", alias_name="sum_val")).to_pandas())
    if len(agg) == 0:  # empty input (str.rsplit expand needs >=1 row)
        return typed_empty({"event_type": "object", "win": "datetime64[ns]",
                            "cnt": "int64", "sum_val": "float64"})
    parts = agg["k"].str.rsplit("|", n=1, expand=True)
    out = pd.DataFrame({
        "event_type": parts[0].where(parts[0] != _NULL_KEY, None),
        "win": pd.to_datetime(parts[1].astype(np.int64), unit="us"),
        "cnt": agg["cnt"],
        "sum_val": round_half_away(agg["sum_val"].to_numpy(), 4),
    })
    return out.sort_values(["event_type", "win"], ignore_index=True)


# ---- stratified deterministic sampling (corpus balancing) ----------------

_STRATA_RATES = {"en": 4, "fr": 2, "de": 2, "es": 1, "zh": 1}  # keep 1/k per lang


def stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic per-stratum downsampling — the corpus-balancing
    primitive (e.g. cap the dominant language): keep doc_id % k_lang == 0
    with a per-language modulus. Replayable across engines/runs (a seeded
    random sample is not), no shuffle, pure filter."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    rates = dict(_STRATA_RATES)

    def stage(t: pa.Table) -> pa.Table:
        vid = np.asarray(t["doc_id"])
        lang = np.asarray(t["lang"], dtype=object)
        k = np.array([rates.get(x, 1) for x in lang], dtype=np.int64)
        return t.filter(pa.array(vid % k == 0))

    return ds.map_batches(stage, batch_format="pyarrow")


# ---- deterministic hash/modulo sampling (training-data op) ---------------

def hash_sample(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Deterministic 1/k sample of documents via doc_id % k == 0 —
    the reproducible-sampling primitive (a seeded random_sample cannot be
    replayed across engines; a key-hash/modulo sample can)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(
            pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], pa.scalar(k)), pa.scalar(k))),
            pa.scalar(0))),
        batch_format="pyarrow",
    )


# ---- multi-way join with pre-aggregation + broadcast dim (r3) ------------

def multiway_join_agg(sf_dir: str) -> pd.DataFrame:
    """Order volume and revenue per NATION NAME — the three-table join
    shape (fact -> dim -> tiny dim) done the way a 100 TB engine must:
    the fact table (orders) is PRE-AGGREGATED to per-customer partials
    before any join (the shuffle then carries customers, not orders),
    the customer join is a hash join on the pre-aggregated small sides,
    and the 25-row nation table is a BROADCAST lookup inside map_batches
    (never a shuffle). -> (n_name, n_orders, revenue)."""
    out_spec = {"n_name": "object", "n_orders": "int64", "revenue": "float64"}
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    # Empty-side guard: the inner-join result is empty, and Ray's hash-
    # shuffle join crashes on a schema-less empty side — resolve from
    # parquet metadata counts first.
    if orders.count() == 0 or cust.count() == 0:
        return typed_empty(out_spec)

    def order_partials(t: pa.Table) -> pa.Table:
        k = np.asarray(t["o_custkey"])
        # integer cents: partial sums become order-independent exact
        # int64s (2dp prices), so no summation-order rounding flake can
        # split the Ray partial-agg chain from DuckDB's sum
        v = round_half_away(np.asarray(t["o_totalprice"], dtype=np.float64) * 100, 0)
        uniq, inv = np.unique(k, return_inverse=True)
        return pa.table({
            "o_custkey": uniq,
            "n": np.bincount(inv, minlength=len(uniq)).astype(np.int64),
            "rev": np.bincount(inv, weights=v, minlength=len(uniq)).astype(np.int64),
        })

    per_cust = (orders.map_batches(order_partials, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("n", alias_name="n"), Sum("rev", alias_name="rev")))

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["c_custkey" if c == "o_custkey" else c
                                 for c in t.column_names])

    joined = cust.join(per_cust.map_batches(rename, batch_format="pyarrow"),
                       join_type="inner", on=["c_custkey"], num_partitions=8)

    # nation is O(25) rows: broadcast once, look up per batch
    nat = ensure_columns(
        _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas(),
        {"n_nationkey": "int64", "n_name": "object"})
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    ref = ray.put(name_of)

    def nation_partials(t: pa.Table) -> pa.Table:
        lut = ray.get(ref)  # once per batch, not per row
        keys = np.asarray(t["c_nationkey"])
        uk, kinv = np.unique(keys, return_inverse=True)
        # inner-join semantics: drop rows whose nationkey has no nation
        # row — membership tested on the O(25) unique keys, not per row
        uk_hit = np.array([int(k) in lut for k in uk], dtype=bool)
        hit = uk_hit[kinv] if len(uk) else np.zeros(0, dtype=bool)
        if not hit.any():
            return pa.table({"n_name": pa.array([], pa.string()),
                             "n_orders": pa.array([], pa.int64()),
                             "rev_cents": pa.array([], pa.int64())})
        uk_names = np.array([lut[int(k)] if h else "" for k, h in zip(uk, uk_hit)],
                            dtype=object)
        names = uk_names[kinv][hit]
        uniq, inv = np.unique(names, return_inverse=True)
        return pa.table({
            "n_name": pa.array(uniq.tolist(), type=pa.string()),
            "n_orders": np.bincount(inv, weights=np.asarray(t["n"])[hit]).astype(np.int64),
            "rev_cents": np.bincount(inv, weights=np.asarray(t["rev"])[hit]).astype(np.int64),
        })

    agg = ensure_columns(
        joined.map_batches(nation_partials, batch_format="pyarrow")
              .groupby("n_name").aggregate(Sum("n_orders", alias_name="n_orders"),
                                           Sum("rev_cents", alias_name="rev_cents"))
              .to_pandas(),
        {"n_name": "object", "n_orders": "int64", "rev_cents": "int64"})
    agg["n_orders"] = agg["n_orders"].astype(np.int64)
    agg["revenue"] = round_half_away(
        agg["rev_cents"].to_numpy().astype(np.float64) / 100.0, 4)
    return agg.sort_values("n_name", ignore_index=True)[
        ["n_name", "n_orders", "revenue"]]


# ---- exact distinct count via pair dedup + partials (r3) -----------------

def distinct_count_users(sf_dir: str) -> pd.DataFrame:
    """EXACT distinct users per event_type. The scale shape: batches
    pre-dedup their local (type, user) pairs, the one shuffle carries
    only distinct pairs (groupby dedup), and a second pass of per-batch
    partial counts collapses to one row per type. (An approximate twin
    would swap stage 2 for an HLL sketch; the driver compare demands
    exactness, and exact stays cheap while distinct pairs << events.)
    -> (event_type, n_users)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def pair_partials(t: pa.Table) -> pa.Table:
        # null keys ride as the sentinel (an object-array lexsort cannot
        # order None) and are restored after the final groupby, so a
        # null event_type counts as its own group like SQL's NULL.
        # A null USER however must not count as a distinct value — SQL's
        # count(DISTINCT user_id) ignores NULLs (ADVICE r3) — so null
        # users ride as the int64-min sentinel (keeping their
        # event_type group alive, n_users contribution 0) and are
        # excluded from the count in count_partials.
        et = np.asarray(pc.fill_null(t["event_type"], _NULL_KEY), dtype=object)
        u = np.asarray(pc.fill_null(t["user_id"], _NULL_USER))
        order = np.lexsort((u, et))
        et2, u2 = et[order], u[order]
        firsts = np.ones(len(et2), dtype=bool)
        firsts[1:] = (et2[1:] != et2[:-1]) | (u2[1:] != u2[:-1])
        return pa.table({"event_type": pa.array(et2[firsts].tolist(), type=pa.string()),
                         "user_id": u2[firsts]})

    pairs = (ds.map_batches(pair_partials, batch_format="pyarrow")
             .groupby(["event_type", "user_id"]).aggregate(Count(alias_name="c")))

    def count_partials(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"], dtype=object)
        real = (np.asarray(t["user_id"]) != _NULL_USER).astype(np.float64)
        uniq, inv = np.unique(et, return_inverse=True)
        return pa.table({"event_type": pa.array(uniq.tolist(), type=pa.string()),
                         "n_users": np.bincount(inv, weights=real,
                                                minlength=len(uniq)).astype(np.int64)})

    out = (pairs.map_batches(count_partials, batch_format="pyarrow")
           .groupby("event_type").aggregate(Sum("n_users", alias_name="n_users"))
           .to_pandas())
    if "n_users" not in out.columns:  # empty input: no groups ran
        return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             "n_users": pd.Series([], dtype="int64")})
    out["n_users"] = out["n_users"].astype(np.int64)
    out["event_type"] = out["event_type"].where(out["event_type"] != _NULL_KEY, None)
    return out.sort_values("event_type", ignore_index=True)


def distinct_count_users_hll(sf_dir: str, p_bits: int = 12) -> pd.DataFrame:
    """APPROXIMATE distinct users per event_type — the scale twin of
    `distinct_count_users` for the regime where even the distinct-pair
    shuffle is too wide (billions of users x many groups). Classic
    HyperLogLog (Flajolet et al. 2007, public algorithm): per batch,
    each (group, register) keeps the max leading-zero rank of the
    hashed user ids; partials merge by elementwise MAX (a tiny
    groupby(event_type, register) — 2^p_bits rows per group, CONSTANT
    in the corpus); the estimator runs on the driver over m registers
    per group. Deterministic (mix64 hash, no RNG). NULL users are
    ignored, like the exact op. Not SQL-value-checkable (approximate),
    so it ships pytest-pinned against the exact op (<2% error at
    p_bits=12) instead of a queries() row — the exact op keeps the
    driver-checked row. -> (event_type, n_users_approx)."""
    from .docs import _mix64  # frozen shared 64-bit mixer

    m = 1 << p_bits
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def register_partials(t: pa.Table) -> pa.Table:
        et = np.asarray(pc.fill_null(t["event_type"], _NULL_KEY), dtype=object)
        valid = np.asarray(pc.is_valid(t["user_id"]))
        u = np.asarray(pc.fill_null(t["user_id"], 0)).astype(np.uint64)
        h = _mix64(u)
        reg = (h >> np.uint64(64 - p_bits)).astype(np.int64)
        rest = h << np.uint64(p_bits)  # low p_bits zero-filled
        # rank = leading zeros of the suffix + 1, via the float64
        # exponent (frexp): rest = frac * 2^e -> floor(log2) = e - 1.
        # rest != 0 implies rest >= 2^p_bits, so e is always >= p_bits+1;
        # the worst rounding case is off-by-one on a ~2^-52 sliver of
        # hashes — noise far below the sketch's own error.
        e = np.frexp(rest.astype(np.float64))[1].astype(np.int64)
        rank = np.where(rest == 0, 64 - p_bits + 1, 64 - e + 1).astype(np.int64)
        rank[~valid] = 0  # null users contribute nothing (SQL DISTINCT)
        # per-batch register max, keyed (event_type, register) as ints
        uniq_et, et_inv = np.unique(et, return_inverse=True)
        key = et_inv.astype(np.int64) * m + reg
        uniq_key, inv = np.unique(key, return_inverse=True)
        best = np.zeros(len(uniq_key), dtype=np.int64)
        np.maximum.at(best, inv, rank)
        keep = best > 0
        return pa.table({
            "event_type": pa.array(uniq_et[uniq_key[keep] // m].tolist(),
                                   type=pa.string()),
            "register": uniq_key[keep] % m,
            "rank": best[keep]})

    regs = (ds.map_batches(register_partials, batch_format="pyarrow")
            .groupby(["event_type", "register"])
            .aggregate(Max("rank", alias_name="rank"))
            .to_pandas())  # <= groups * 2^p_bits rows: constant in corpus
    if "event_type" not in regs.columns:  # empty input: no groups ran
        return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             "n_users_approx": pd.Series([], dtype="int64")})

    alpha = 0.7213 / (1 + 1.079 / m)
    out_et, out_n = [], []
    for et, g in regs.groupby("event_type", sort=True):
        M = np.zeros(m, dtype=np.float64)
        M[g["register"].to_numpy()] = g["rank"].to_numpy()
        est = alpha * m * m / np.sum(2.0 ** -M)
        zeros = int((M == 0).sum())
        if est <= 2.5 * m and zeros:  # small-range correction
            est = m * np.log(m / zeros)
        out_et.append(None if et == _NULL_KEY else et)
        out_n.append(int(round(est)))
    return pd.DataFrame({"event_type": out_et,
                         "n_users_approx": np.array(out_n, dtype=np.int64)})


def stream_reduce_counts(partials: "ray.data.Dataset", key_cols: list[str],
                         sum_cols: list[str]) -> pd.DataFrame:
    """Driver-side STREAMING merge of a metadata-sized partial-count
    Dataset: iterate Arrow batches, fold into an O(distinct-keys) dict.
    Replaces `groupby().aggregate()` for tiny partial tables — Ray's
    hash shuffle costs seconds of pure task scheduling when the
    upstream is hundreds of small blocks (measured at the 400k-page
    bench: the train_val_split finish carried 3k partial rows through
    an all-to-all that cost ~5.7 s of its 6.2 s wall). The fold never
    holds more than O(distinct) rows on the driver, exactly the size
    of the result the caller was about to collect anyway; keep using a
    real groupby when the DISTINCT key count itself is data-sized
    (vocab_topk's token table, ngram shards)."""
    acc: dict[tuple, list] = {}
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        key_arrs = [b[c].to_pylist() for c in key_cols]
        sum_arrs = [b[c].to_pylist() for c in sum_cols]
        for i in range(len(b)):
            k = tuple(a[i] for a in key_arrs)
            cur = acc.get(k)
            if cur is None:
                acc[k] = [a[i] for a in sum_arrs]
            else:
                for j, a in enumerate(sum_arrs):
                    cur[j] += a[i]
    cols: dict[str, list] = {c: [] for c in key_cols + sum_cols}
    for k, v in acc.items():
        for c, kv in zip(key_cols, k):
            cols[c].append(kv)
        for c, sv in zip(sum_cols, v):
            cols[c].append(sv)
    return pd.DataFrame(cols)


def tumbling_distinct_users(sf_dir: str) -> pd.DataFrame:
    """EXACT distinct users per (event_type, 1-hour tumbling window) —
    the windowed form of distinct_count_users (unique visitors per
    hour, the classic streaming-analytics report). Same scale shape:
    batches pre-dedup their local (type, window, user) triples, ONE
    shuffle carries only distinct triples (groupby dedup), and
    per-batch partial counts collapse to one row per (type, window).
    Null users don't count (SQL COUNT(DISTINCT)); a null event_type is
    its own group. -> (event_type, win, n_users)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id", "ts"])

    def triple_partials(t: pa.Table) -> pa.Table:
        win = pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64())
        key = pc.binary_join_element_wise(
            pc.fill_null(t["event_type"], _NULL_KEY),
            pc.cast(win, pa.string()), "|")
        k = np.asarray(key, dtype=object)
        u = np.asarray(pc.fill_null(t["user_id"], _NULL_USER))
        order = np.lexsort((u, k))
        k2, u2 = k[order], u[order]
        firsts = np.ones(len(k2), dtype=bool)
        firsts[1:] = (k2[1:] != k2[:-1]) | (u2[1:] != u2[:-1])
        return pa.table({"k": pa.array(k2[firsts].tolist(), pa.string()),
                         "user_id": u2[firsts]})

    triples = (ds.map_batches(triple_partials, batch_format="pyarrow")
               .groupby(["k", "user_id"]).aggregate(Count(alias_name="c")))

    def count_partials(t: pa.Table) -> pa.Table:
        k = np.asarray(t["k"], dtype=object)
        real = (np.asarray(t["user_id"]) != _NULL_USER).astype(np.float64)
        uniq, inv = np.unique(k, return_inverse=True)
        return pa.table({
            "k": pa.array(uniq.tolist(), pa.string()),
            "n_users": np.bincount(inv, weights=real,
                                   minlength=len(uniq)).astype(np.int64)})

    agg = (triples.map_batches(count_partials, batch_format="pyarrow")
           .groupby("k").aggregate(Sum("n_users", alias_name="n_users"))
           .to_pandas())
    if "n_users" not in agg.columns or len(agg) == 0:
        return typed_empty({"event_type": "object",
                            "win": "datetime64[ns]", "n_users": "int64"})
    parts = agg["k"].str.rsplit("|", n=1, expand=True)
    out = pd.DataFrame({
        "event_type": parts[0].where(parts[0] != _NULL_KEY, None),
        "win": pd.to_datetime(parts[1].astype(np.int64), unit="us"),
        "n_users": agg["n_users"].astype(np.int64)})
    return out.sort_values(["event_type", "win"], ignore_index=True)


def grouped_rollup(sf_dir: str) -> pd.DataFrame:
    """SQL `GROUP BY ROLLUP(source, lang)` parity over documents — the
    hierarchical aggregation every reporting layer wants (leaf totals,
    per-source subtotals, grand total) computed in ONE streamed pass:
    each batch emits partials for ALL THREE levels (the rolled levels
    are just coarser bincounts of the same batch), and one
    level+key-cardinality groupby finishes. At 100 TB the alternative
    (three separate scans, one per level) pays the read thrice for no
    reason. grouping_id follows SQL semantics (GROUPING(source)*2 +
    GROUPING(lang): 0 = leaf, 1 = per-source, 3 = grand total), and
    rolled-up key columns are NULL; real NULL key values are kept
    distinct from rolled positions by the level column, exactly as
    GROUPING() disambiguates in SQL.
    -> (grouping_id, source, lang, n_docs, sum_chars)."""
    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars"])
    _ROLL = "\x1eroll\x1e"  # rolled-up position (distinct from _NULL_KEY)

    def partial(t: pa.Table) -> pa.Table:
        src = np.asarray(pc.fill_null(t["source"], _NULL_KEY), dtype=object)
        lng = np.asarray(pc.fill_null(t["lang"], _NULL_KEY), dtype=object)
        nch = np.asarray(pc.fill_null(pc.cast(t["n_chars"], pa.int64()), 0))
        out_g, out_s, out_l, out_n, out_c = [], [], [], [], []
        for gid, keys in ((0, np.char.add(np.char.add(
                              src.astype(str), "\x1f"), lng.astype(str))),
                          (1, src.astype(str)),
                          (3, np.zeros(len(src), dtype="U1"))):
            uniq, inv = np.unique(keys, return_inverse=True)
            n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
            c = np.bincount(inv, weights=nch,
                            minlength=len(uniq)).astype(np.int64)
            for k, key in enumerate(uniq):
                if gid == 0:
                    s, l = key.split("\x1f", 1)
                elif gid == 1:
                    s, l = key, _ROLL
                else:
                    s, l = _ROLL, _ROLL
                out_g.append(gid); out_s.append(s); out_l.append(l)
                out_n.append(int(n[k])); out_c.append(int(c[k]))
        return pa.table({
            "grouping_id": pa.array(out_g, pa.int64()),
            "src_key": pa.array(out_s, pa.string()),
            "lang_key": pa.array(out_l, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
            "sum_chars": pa.array(out_c, pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["grouping_id", "src_key", "lang_key"])
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("sum_chars", alias_name="sum_chars")))
    df = ensure_columns(agg.to_pandas(),
                        {"grouping_id": "int64", "src_key": "object",
                         "lang_key": "object", "n_docs": "int64",
                         "sum_chars": "int64"})
    if len(df) == 0:
        # SQL ROLLUP of an empty input still yields the grand-total row
        df = pd.DataFrame({"grouping_id": [3], "src_key": [_ROLL],
                           "lang_key": [_ROLL], "n_docs": [0],
                           "sum_chars": [0]})

    def unkey(col):
        return [None if v in (_ROLL, _NULL_KEY) else v for v in col]

    out = pd.DataFrame({
        "grouping_id": df["grouping_id"].astype("int64"),
        "source": unkey(df["src_key"]),
        "lang": unkey(df["lang_key"]),
        "n_docs": df["n_docs"].astype("int64"),
        "sum_chars": df["sum_chars"].astype("int64"),
    })
    return out.sort_values(["grouping_id", "source", "lang"],
                           ignore_index=True)


def column_profile(sf_dir: str, top_k: int = 5) -> pd.DataFrame:
    """Table-profiling op — the data-quality report every ingestion run
    opens with: for each categorical column of documents (lang,
    source), the top-k values by count with their rank (count DESC,
    value ASC, NULLs last — SQL NULLS LAST semantics). One streamed
    pass emits per-batch value-count partials for BOTH columns (the
    corpus is read once, not once per column); a (column x value)-
    cardinality groupby finishes and the driver folds top-k over the
    tiny result. -> (col, value, n_docs, rank)."""
    ds = _read(sf_dir, "documents", ["lang", "source"])
    cols = ("lang", "source")

    def partial(t: pa.Table) -> pa.Table:
        out_c, out_v, out_n = [], [], []
        for c in cols:
            v = np.asarray(pc.fill_null(t[c], _NULL_KEY), dtype=object)
            uniq, cnt = np.unique(v, return_counts=True)
            out_c.extend([c] * len(uniq))
            out_v.extend(uniq.tolist())
            out_n.extend(cnt.astype(np.int64).tolist())
        return pa.table({"col": pa.array(out_c, pa.string()),
                         "val_key": pa.array(out_v, pa.string()),
                         "n_docs": pa.array(out_n, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["col", "val_key"])
             .aggregate(Sum("n_docs", alias_name="n_docs")))
    df = ensure_columns(agg.to_pandas(),
                        {"col": "object", "val_key": "object",
                         "n_docs": "int64"})
    frames = []
    for c in cols:
        sub = df[df["col"] == c].copy()
        if len(sub) == 0:
            continue
        is_null = sub["val_key"] == _NULL_KEY
        sub["_null"] = is_null
        sub = sub.sort_values(["n_docs", "_null", "val_key"],
                              ascending=[False, True, True],
                              ignore_index=True)
        sub["rank"] = np.arange(1, len(sub) + 1, dtype=np.int64)
        sub = sub[sub["rank"] <= top_k]
        frames.append(pd.DataFrame({
            "col": sub["col"],
            "value": [None if v == _NULL_KEY else v
                      for v in sub["val_key"]],
            "n_docs": sub["n_docs"].astype("int64"),
            "rank": sub["rank"],
        }))
    if not frames:
        return pd.DataFrame({"col": pd.Series([], dtype="object"),
                             "value": pd.Series([], dtype="object"),
                             "n_docs": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64")})
    return pd.concat(frames, ignore_index=True)
