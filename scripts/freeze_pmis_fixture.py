"""Freeze the deterministic two-cycle PMIS sections fixture to disk so
the driver's DuckDB oracle can read the EXACT same bytes the Ray queries
read (tests/data/pmis/cycle_{a,b}.parquet + .csv).

Rerun only on a deliberate fixture change:  python scripts/freeze_pmis_fixture.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from txiac_qc_ray.sources.sections import TS_FMT, sections_tables  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "pmis")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    a, b = sections_tables(seed=42, n=1000)
    for name, t in (("cycle_a", a), ("cycle_b", b)):
        pq.write_table(t, os.path.join(OUT, f"{name}.parquet"))
        df = t.to_pandas()
        # CSV mirrors the reference's raw survey file: START TIME as the
        # compact %Y%m%d%H%M%S string, missing measures as empty cells
        df["start_time"] = df["start_time"].dt.strftime(TS_FMT)
        df.to_csv(os.path.join(OUT, f"{name}.csv"), index=False,
                  float_format="%.17g")
        print(name, len(df), "rows ->", OUT)
    # sanity: floats round-trip bit-exactly through %.17g for the
    # correctly-rounded parsers that actually consume the CSV (Arrow CSV
    # in ray.data.read_csv, DuckDB read_csv; pandas' fast parser is NOT
    # correctly rounded and is not used anywhere on this path)
    import pyarrow.csv as pacsv

    for name, t in (("cycle_a", a), ("cycle_b", b)):
        back = pacsv.read_csv(os.path.join(OUT, f"{name}.csv"))
        for c in t.column_names:
            orig = t[c].to_pandas()
            if orig.dtype == np.float64:
                got = back[c].to_pandas().to_numpy(dtype=np.float64)
                same = (got == orig.to_numpy()) | (np.isnan(got) & np.isnan(orig.to_numpy()))
                assert same.all(), f"{name}.{c} csv round-trip drift"
    print("csv float round-trip exact")


if __name__ == "__main__":
    main()
