"""Stream-shaped operators over the `events` log: as-of join, session
windows, per-group top-k, rolling aggregates (SURVEY.md §2.8 + the
'custom operators' list — as-of join / windowed aggregate).

Ray Data has no event-time windowing, so these follow the ray_guide
pattern: treat events as a partitioned log — `groupby(user_id)` co-locates
a key's history, `map_groups` applies the ordered-window logic with
pandas over the sorted group. PARTITIONING ASSUMPTION (documented per the
custom-operator rule): all rows of one key fit one worker's memory; for
keys too hot for that, split by time range and stitch boundaries —
IMPLEMENTED for time windows in `rolling_time_sum_cents` ((key, bucket)
shuffle key + one-bucket context duplication; exact because a time
window's reach is bounded, unlike a count window's over sparse keys).

All outputs carry deterministic orderings and oracle SQL twins
(DuckDB ASOF JOIN / window functions) in `__ray_entry__.py`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import _read, round_half_away


def asof_join_clicks_errors(sf_dir: str) -> pd.DataFrame:
    """For every 'click' event: the latest strictly-earlier 'error' event
    of the same user (as-of backward join). Rows with no prior error are
    dropped (inner as-of). -> (click_id, error_id, gap_sec).

    Tie-break is EXPLICIT on both sides (ADVICE r1): errors sharing one
    (user_id, ts) are deduped to the max event_id BEFORE the as-of join,
    and the SQL oracle applies the same dedup, so neither engine's
    unspecified equal-ts choice can leak into the result."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        errors = (g[g["event_type"] == "error"].sort_values(["ts", "event_id"])
                  .drop_duplicates(subset=["ts"], keep="last"))
        if clicks.empty or errors.empty:
            return pd.DataFrame({"click_id": pd.Series([], dtype="int64"),
                                 "error_id": pd.Series([], dtype="int64"),
                                 "gap_sec": pd.Series([], dtype="double")})
        m = pd.merge_asof(
            clicks[["event_id", "ts"]].rename(columns={"event_id": "click_id"}),
            errors[["event_id", "ts"]].rename(columns={"event_id": "error_id"}),
            on="ts", direction="backward", allow_exact_matches=False,
            suffixes=("", "_err"),
        )
        # merge_asof keeps the click ts; recover the matched error ts for gap
        err_ts = errors.set_index("event_id")["ts"]
        m = m[m["error_id"].notna()].copy()
        m["error_id"] = m["error_id"].astype("int64")
        m["gap_sec"] = (m["ts"] - m["error_id"].map(err_ts)).dt.total_seconds()
        return m[["click_id", "error_id", "gap_sec"]]

    df = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    df["gap_sec"] = round_half_away(df["gap_sec"].to_numpy(), 6) if len(df) else df["gap_sec"]
    return df.sort_values("click_id", ignore_index=True)


def session_windows(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    time since the previous event exceeds `gap_minutes`. ->
    (user_id, session_start, n_events, sum_val)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", ignore_index=True)
        new_sess = g["ts"].diff() > gap
        sess_id = new_sess.cumsum()
        out = g.groupby(sess_id).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("ts", "size"),
            sum_val=("value", "sum"),
        ).reset_index(drop=True)
        return out

    df = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    df["sum_val"] = round_half_away(df["sum_val"].to_numpy(), 4)
    df["n_events"] = df["n_events"].astype("int64")
    return df.sort_values(["user_id", "session_start"], ignore_index=True)


def topk_per_group(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k events by value per event_type (deterministic tie-break on
    event_id). Per-batch partial top-k -> tiny driver merge: no global
    sort, no full shuffle."""
    import pyarrow as pa

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        top = (df.sort_values(["event_type", "value", "event_id"],
                              ascending=[True, False, True])
                 .groupby("event_type", sort=False).head(k))
        return pa.Table.from_pandas(top, preserve_index=False)

    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = (parts.sort_values(["event_type", "value", "event_id"],
                             ascending=[True, False, True])
                .groupby("event_type", sort=True).head(k))
    return out.reset_index(drop=True)[["event_type", "event_id", "value"]]


def lag_diff(sf_dir: str) -> pd.DataFrame:
    """Per-user lag-1 difference of `value` ordered by (ts, event_id) —
    the lead/lag window-derive family (a user's first event has a null
    diff, mirroring SQL LAG — surfaced as float64 NaN, exactly how a
    SQL NULL over an integer lands in pandas). Integer cents keep the
    subtraction itself exact. -> (event_id, user_id, diff_cents)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], ignore_index=True)
        cents = round_half_away(g["value"].to_numpy() * 100.0, 0).astype(np.int64)
        diff = np.full(len(g), np.nan)
        diff[1:] = (cents[1:] - cents[:-1]).astype(np.float64)
        return pd.DataFrame({"event_id": g["event_id"], "user_id": g["user_id"],
                             "diff_cents": diff})

    df = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    return df.sort_values("event_id", ignore_index=True)


def rolling_sum_cents(sf_dir: str, window: int = 3) -> pd.DataFrame:
    """Per-user rolling sum of `value` (in integer cents) over the last
    `window` events ordered by (ts, event_id) — the moving-window
    aggregate. Cents keep the rolling arithmetic exactly integral, so the
    result is bit-identical to the SQL window-function oracle regardless
    of either engine's internal sliding-sum algorithm."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], ignore_index=True)
        cents = round_half_away(g["value"].to_numpy() * 100.0, 0).astype(np.int64)
        g["roll_sum_cents"] = (
            pd.Series(cents).rolling(window, min_periods=1).sum().astype(np.int64)
        )
        return g[["event_id", "user_id", "roll_sum_cents"]]

    df = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    return df.sort_values("event_id", ignore_index=True)


def rolling_time_sum_cents(sf_dir: str, window_hours: int = 6,
                           bucket_hours: int = 24) -> pd.DataFrame:
    """HOT-KEY-SAFE TIME-based rolling sum — the 'split by time range and
    stitch boundaries' strategy the module docstring promises,
    implemented: the shuffle key is (user_id, time_bucket), so one user's
    history never has to fit one worker. Each row is also sent to the
    NEXT bucket as context; a trailing TIME window (sum of cents over
    [ts - W, ts], all equal-ts peers included — SQL RANGE semantics) is
    exact as long as W <= bucket span, because anything older than one
    bucket is outside the window by construction. (A COUNT-based window
    cannot be bucketed this way: its reach over sparse keys is unbounded
    — which is why streaming systems window by time.)

    -> (event_id, user_id, roll_sum_cents), identical to the DuckDB
    RANGE-frame window oracle."""
    import pyarrow as pa

    assert window_hours <= bucket_hours
    bucket_us = bucket_hours * 3_600_000_000
    window_us = window_hours * 3_600_000_000
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def explode(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        b = ts // bucket_us
        n = t.num_rows
        own = t.append_column("bucket", pa.array(b)).append_column(
            "is_ctx", pa.array(np.zeros(n, dtype=bool)))
        ctx = t.append_column("bucket", pa.array(b + 1)).append_column(
            "is_ctx", pa.array(np.ones(n, dtype=bool)))
        return pa.concat_tables([own, ctx])

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], ignore_index=True)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = round_half_away(g["value"].to_numpy() * 100.0, 0).astype(np.int64)
        prefix = np.concatenate([[0], np.cumsum(cents)])
        lo = np.searchsorted(ts, ts - window_us, side="left")
        hi = np.searchsorted(ts, ts, side="right")  # all equal-ts peers
        roll = prefix[hi] - prefix[lo]
        own = ~g["is_ctx"].to_numpy()
        # context rows (previous bucket) only seed the window; their own
        # outputs were emitted by their home bucket's group
        return pd.DataFrame({"event_id": g["event_id"].to_numpy()[own],
                             "user_id": g["user_id"].to_numpy()[own],
                             "roll_sum_cents": roll[own].astype(np.int64)})

    df = (ds.map_batches(explode, batch_format="pyarrow")
          .groupby(["user_id", "bucket"])
          .map_groups(per_group, batch_format="pandas")
          .to_pandas())
    return df.sort_values("event_id", ignore_index=True)
