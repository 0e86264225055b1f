"""Pin the pandas NUL-string hashing trap and the engine's defense.

pandas 2.2's object-string hashtable compares keys C-string-style:
`groupby` (and every hash-based op — drop_duplicates, merge, nunique)
MERGES two distinct keys that share a prefix up to an embedded NUL
byte. The engine's null-group sentinel used to be "\x00null\x00"; any
composite key built from it ("\x00null\x00\x1ftrain" vs
"\x00null\x00\x1fval") would silently collapse to one group the moment
it crossed a pandas hash op — found live while benching
train_val_split variants. The sentinel is now NUL-free ("\x1enull\x1e")
so the hazard class cannot fire no matter which engine-side op a
future change routes a key through.

These tests (1) document the upstream behavior so a pandas upgrade
that fixes it is visible, and (2) fail if anyone reintroduces a NUL
into the sentinels.
"""

import pandas as pd


def test_pandas_merges_distinct_keys_at_embedded_nul():
    """Upstream behavior pin (pandas 2.2.2): if this starts FAILING,
    pandas fixed NUL hashing and the sentinel comment should note the
    trap is version-bound."""
    df = pd.DataFrame({"k": ["\x00a\x1ftrain", "\x00a\x1fval"],
                       "n": [1, 2]})
    g = df.groupby("k")["n"].sum()
    assert len(g) == 1 and int(g.iloc[0]) == 3  # the trap, pinned


def test_sentinels_are_nul_free():
    from txiac_qc_ray.pipelines.docs import _NULL_KEY as dk
    from txiac_qc_ray.pipelines.relational import _NULL_KEY as rk

    assert "\x00" not in dk and "\x00" not in rk
    # composite keys built from the sentinel survive a pandas groupby
    df = pd.DataFrame({"k": [dk + "\x1ftrain", dk + "\x1fval"],
                       "n": [1, 2]})
    assert len(df.groupby("k")["n"].sum()) == 2
