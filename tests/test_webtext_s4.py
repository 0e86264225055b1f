"""Round-5 session-4 webtext ops: partitioning invariance.

The DuckDB twins (scripts/check_oracle.py) value-check semantics at the
default shard count; these tests pin that the result does NOT depend on
the shard count — the partitioning knob a real run sizes from input
bytes must never change the answer.
"""

import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def test_remove_boilerplate_lines_shard_invariance(ray_session):
    from txiac_qc_ray.pipelines.webtext import remove_boilerplate_lines
    from txiac_qc_ray.sources.pages import default_pages_dir

    corpus = default_pages_dir(500)
    a = _norm(remove_boilerplate_lines(corpus, n_shards=3).to_pandas())
    b = _norm(remove_boilerplate_lines(corpus, n_shards=8).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    # the gate discriminates on this corpus: some chrome removed, some
    # kept (small hosts below the distinct-page threshold)
    assert (a["n_removed"] > 0).any() and (a["n_removed"] == 0).any()
    # and chrome-free prose is untouched: removal never exceeds the
    # 2 injected lines plus the corpus's own duplicated lines
    assert int(a["n_removed"].max()) <= 10


def test_url_snapshot_changes_shard_invariance(ray_session):
    from txiac_qc_ray.pipelines.webtext import url_snapshot_changes
    from txiac_qc_ray.sources.pages import default_pages_dir

    corpus = default_pages_dir(500)
    a = _norm(url_snapshot_changes(corpus, n_shards=3).to_pandas())
    b = _norm(url_snapshot_changes(corpus, n_shards=8).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    # every url present exactly once; changed only ever on recrawls
    assert len(a) == 500
    chg = a[a["changed"] == "True"] if a["changed"].dtype == object else a[a["changed"]]
    n_snap = a["n_snapshots"].to_numpy()
    assert set(np.unique(n_snap)) == {1, 2}
    assert (chg["n_snapshots"] == 2).all()
