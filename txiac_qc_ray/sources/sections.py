"""Deterministic two-cycle PMIS-shaped sections fixture (FIXTURES.md F3).

Exercises the reference's tolerance-join + diff + threshold semantics
verbatim (Home.py:109-184): both cycles describe the SAME physical
sections; cycle B offsets its mileposts by values drawn from
{0, ±0.049, ±0.05, ±0.051} to pin the strict `<0.05` band boundary
(Home.py:132), cycle B is missing 2 counties (semi-join behavior,
Home.py:124), and ~5% of measures are NaN (NaN propagation through
diffs, Home.py:139). Many-to-many fan-out arises naturally from repeated
(hwy, county) keys with nearby mileposts — preserved, not deduped
(Home.py:128-136 behavior).
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa

MEASURES = ("measure_iri", "measure_rut", "util_score")
_OFFSETS = np.array([0.0, 0.049, -0.049, 0.05, -0.05, 0.051, -0.051])


def sections_tables(seed: int = 42, n: int = 1000) -> tuple[pa.Table, pa.Table]:
    """-> (cycle_a, cycle_b) Arrow tables with the F3 schema; same physical
    sections in both cycles (cycle B milepost-offset + 2 counties missing)."""
    rng = np.random.default_rng([seed, 777])
    counties = [f"C{c:02d}" for c in range(20)]
    hwys = [f"H{h:02d}-{r}" for h in range(40) for r in ("K", "A")]

    county = rng.choice(counties, n)
    hwy = rng.choice(hwys, n)
    begin = np.round(rng.uniform(0, 50, n), 3)
    length = np.round(rng.uniform(0.4, 0.6, n), 3)
    end = begin + length

    def cycle(year: int, drop_counties: tuple[str, ...], offset: bool) -> pa.Table:
        if offset:
            off = _OFFSETS[rng.integers(0, len(_OFFSETS), n)]
        else:
            off = np.zeros(n)
        base = datetime.datetime(year, 3, 1)
        start_time = [base + datetime.timedelta(seconds=int(s))
                      for s in rng.integers(0, 5_000_000, n)]
        cols = {
            "fiscal_year": np.full(n, year, dtype=np.int64),
            "hwy_id": hwy,
            "county": county,
            "begin_dfo": begin + off,
            "end_dfo": end + off,
            "start_time": pa.array(start_time, type=pa.timestamp("us")),
            "lane_number": rng.integers(1, 4, n).astype(np.int32),
            "direction": rng.choice(["N", "S", "E", "W"], n),
            "vehicle_id": rng.choice([f"V{v}" for v in range(6)], n),
            "comment_code": rng.choice(["", "A", "B", "C"], n),
            "avg_speed": np.round(rng.uniform(20, 75, n), 1),
        }
        for m in MEASURES:
            v = np.round(rng.uniform(50, 300, n), 2)
            v[rng.random(n) < 0.05] = np.nan
            cols[m] = v
        # RIDE SCORE TRAFFIC LEVEL analog (Home.py:226-254 IRI pivot);
        # drawn LAST so earlier fixture values are unchanged across rounds
        cols["traffic_level"] = rng.choice(["LOW", "MEDIUM", "HIGH"], n)
        t = pa.table(cols)
        keep = ~np.isin(np.asarray(t["county"]), list(drop_counties))
        return t.filter(pa.array(keep))

    a = cycle(2024, (), offset=False)
    b = cycle(2023, ("C18", "C19"), offset=True)
    return a, b


# ---- loaders: the reference's data_load re-expressed (Home.py:92-106) ----

TS_FMT = "%Y%m%d%H%M%S"  # START TIME format (Home.py:99,102)


def derive_section_length(t: pa.Table) -> pa.Table:
    """S3 load-derive: section_length = abs(begin_dfo - end_dfo)
    (Home.py:100,103). Stateless, runs inside map_batches."""
    import pyarrow.compute as pc

    return t.append_column(
        "section_length", pc.abs(pc.subtract(t["begin_dfo"], t["end_dfo"])))


def read_sections_parquet(path: str):
    """Parquet cycle file -> Dataset with the load-derived column."""
    import ray.data

    return ray.data.read_parquet(path).map_batches(
        derive_section_length, batch_format="pyarrow")


def read_sections_csv(path: str):
    """CSV cycle file -> Dataset: S1 CSV ingestion parity (Home.py:98,101)
    with the S2 `%Y%m%d%H%M%S` timestamp parse and the S3 derive, all as
    stateless map_batches stages over `ray.data.read_csv` blocks.

    `start_time` arrives as the reference's compact integer-like string;
    measures with empty cells arrive as nulls (CSV has no NaN literal) —
    normalized to NaN so the diff/rule semantics are byte-identical to
    the parquet path (pinned by test_pmis_parity CSV roundtrip)."""
    import pyarrow.compute as pc
    import pyarrow.csv as pacsv

    import ray.data

    ds = ray.data.read_csv(
        path,
        convert_options=pacsv.ConvertOptions(
            column_types={"start_time": pa.string(),
                          "comment_code": pa.string()}),
    )

    def parse(t: pa.Table) -> pa.Table:
        ts = pc.strptime(t["start_time"], format=TS_FMT, unit="us")
        t = t.set_column(t.column_names.index("start_time"),
                         "start_time", ts)
        for m in MEASURES:
            # CSV nulls -> NaN (parquet parity: missing measures are NaN)
            col = pc.cast(t[m], pa.float64())
            col = pc.if_else(pc.is_null(col), pa.scalar(float("nan")), col)
            t = t.set_column(t.column_names.index(m), m, col)
        cc = pc.fill_null(t["comment_code"], "")  # empty string round-trip
        t = t.set_column(t.column_names.index("comment_code"), "comment_code", cc)
        return derive_section_length(t)

    return ds.map_batches(parse, batch_format="pyarrow")
