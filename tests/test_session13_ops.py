"""Semantic pins for the session-13 ops (beyond the SQL value checks):
curriculum_order's permutation laws, dup_cluster_sizes' conservation
against the cluster table, neardup_threshold_curve's monotonicity and
its t=0.5 anchor equality with the pair op it folds."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_curriculum_order_is_bucketed_permutation(ray_session):
    from txiac_qc_ray.pipelines.docs import _mix64, curriculum_order

    out = (curriculum_order(SF).to_pandas()
           .sort_values("order_idx", ignore_index=True))
    n = len(out)
    assert n > 0
    # rank column is a 0..n-1 permutation
    assert out["order_idx"].tolist() == list(range(n))
    assert out["doc_id"].is_unique
    # buckets are non-decreasing along the curriculum (easy -> hard)
    b = out["bucket"].to_numpy()
    assert (np.diff(b) >= 0).all()
    # within a bucket the order is the replayable mix64 shuffle
    mk = _mix64(out["doc_id"].to_numpy().astype(np.uint64)) >> np.uint64(3)
    for bucket in np.unique(b):
        m = b == bucket
        keys = list(zip(mk[m].tolist(), out["doc_id"].to_numpy()[m].tolist()))
        assert keys == sorted(keys)


def test_dup_cluster_sizes_conserves_label_table(ray_session):
    from txiac_qc_ray.pipelines.docs import (dup_cluster_sizes,
                                             neardup_clusters_distributed)

    hist = dup_cluster_sizes(SF)
    labels = neardup_clusters_distributed(SF)
    assert (hist["cluster_size"] >= 2).all()  # singletons have no edges
    assert hist["n_docs"].sum() == len(labels)
    assert (hist["n_docs"] == hist["cluster_size"] * hist["n_clusters"]).all()


def test_threshold_curve_monotone_and_anchored(ray_session):
    from txiac_qc_ray.pipelines.docs import (minhash_lsh_candidates,
                                             neardup_threshold_curve)

    curve = neardup_threshold_curve(SF).sort_values(
        "threshold", ignore_index=True)
    assert (np.diff(curve["n_pairs"].to_numpy()) <= 0).all()
    assert (np.diff(curve["n_docs"].to_numpy()) <= 0).all()
    pairs = minhash_lsh_candidates(SF, 0.5)
    anchor = curve[curve["threshold"] == 0.5].iloc[0]
    assert anchor["n_pairs"] == len(pairs)
    assert anchor["n_docs"] == len(
        np.unique(np.concatenate([pairs["id_a"], pairs["id_b"]])))


def test_mixture_epoch_plan_identities(ray_session):
    from txiac_qc_ray.pipelines.docs import mixture_epoch_plan

    plan = mixture_epoch_plan(SF)
    assert len(plan) > 0
    total = int(plan["n_tokens"].sum())
    planned = total // len(plan)
    assert (plan["planned_tokens"] == planned).all()
    # epochs * available == planned share (one division, so exact here)
    nz = plan[plan["n_tokens"] > 0]
    assert np.allclose(nz["epochs"] * nz["n_tokens"], planned)
    # small sources repeat (epochs > 1) iff below the uniform share
    assert ((nz["epochs"] > 1) == (nz["n_tokens"] < planned)).all()


def test_eval_contamination_report_bounds(ray_session):
    from txiac_qc_ray.pipelines.docs import eval_contamination_report

    rep = eval_contamination_report(SF)
    assert len(rep) > 0
    assert (rep["doc_id"] % 50 == 0).all()
    assert (rep["n_leaked"] <= rep["n_shingles"]).all()
    assert ((rep["frac"] >= 0) & (rep["frac"] <= 1)).all()
    got = (100 * rep["n_leaked"] >= 50 * rep["n_shingles"]) & (
        rep["n_shingles"] > 0)
    assert (rep["compromised"] == got).all()


def test_cooccurrence_diagonal_pins_to_ablation(ray_session):
    """Tail-exception pin: the co-fire matrix diagonal IS ablation's
    per-bank fail count — byte-equal, so the driver's value check of
    rule_bank_ablation transfers to the shared five bank cores here."""
    import __ray_entry__ as E

    co = E.queries()["quality_flag_cooccurrence"]("unused")
    ab = E.queries()["rule_bank_ablation"]("unused")
    diag = co[co["bank_a"] == co["bank_b"]].set_index("bank_a")
    for _, row in ab.iterrows():
        assert int(diag.loc[row["bank"], "n_both_failed"]) == int(
            row["n_failed"])
    # off-diagonal is bounded by both diagonals (co-fire <= own fails)
    for _, r in co.iterrows():
        assert r["n_both_failed"] <= diag.loc[r["bank_a"], "n_both_failed"]
        assert r["n_both_failed"] <= diag.loc[r["bank_b"], "n_both_failed"]


def test_partition_skew_report_pins_to_single_process(ray_session):
    """Tail-exception pin: the Ray report equals an independent
    single-process numpy reference over the same fixture bytes."""
    import glob

    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from __ray_entry__ import _webtext_dir
    from txiac_qc_ray.functions.urls import fnv1a64

    got = E.queries()["partition_skew_report"]("unused")
    t = pq.read_table(sorted(glob.glob(_webtext_dir() + "/part-*.parquet")),
                      columns=["url", "text"])
    shard = (fnv1a64(t["url"].combine_chunks())
             % np.uint64(16)).astype(np.int64)
    import pyarrow.compute as pc_

    nb = np.asarray(pc_.fill_null(
        pc_.cast(pc_.binary_length(t["text"].combine_chunks()),
                 "int64"), 0))
    n = np.bincount(shard, minlength=16)
    b = np.bincount(shard, weights=nb, minlength=16).astype(np.int64)
    total = int(b.sum())
    assert got["shard"].tolist() == [i for i in range(16) if n[i] > 0]
    assert got["n_docs"].tolist() == [int(x) for x in n[n > 0]]
    assert got["n_bytes"].tolist() == [int(x) for x in b[n > 0]]
    assert got["byte_share"].tolist() == [
        float(x) / total for x in b[n > 0]]


def test_grouped_rollup_pins_and_folds(ray_session):
    """Tail-exception pin: leaf level == an independent single-process
    pandas groupby; rolled levels are exact folds of the leaf rows;
    empty input still yields the grand-total row (SQL ROLLUP law)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from txiac_qc_ray.pipelines.relational import grouped_rollup

    out = grouped_rollup(SF)
    t = pq.read_table(SF + "/documents.parquet",
                      columns=["source", "lang", "n_chars"]).to_pandas()
    ref = (t.assign(n_chars=t["n_chars"].fillna(0).astype("int64"))
            .groupby(["source", "lang"], dropna=False)
            .agg(n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
            .reset_index())
    leaf = out[out["grouping_id"] == 0].reset_index(drop=True)
    m = leaf.merge(ref, on=["source", "lang"], suffixes=("", "_ref"))
    assert len(m) == len(leaf) == len(ref)
    assert (m["n_docs"] == m["n_docs_ref"]).all()
    assert (m["sum_chars"] == m["sum_chars_ref"]).all()
    lvl1 = out[out["grouping_id"] == 1]
    fold1 = leaf.groupby("source", dropna=False)[
        ["n_docs", "sum_chars"]].sum().reset_index()
    m1 = lvl1.merge(fold1, on="source", suffixes=("", "_f"))
    assert len(m1) == len(lvl1) == len(fold1)
    assert (m1["n_docs"] == m1["n_docs_f"]).all()
    grand = out[out["grouping_id"] == 3]
    assert len(grand) == 1
    assert int(grand["n_docs"].iloc[0]) == len(t)
    assert int(grand["sum_chars"].iloc[0]) == int(
        t["n_chars"].fillna(0).sum())


def test_column_profile_pins_to_pandas(ray_session):
    """Tail-exception pin: byte-equal to a single-process pandas
    value_counts reference with the same (count DESC, value ASC,
    NULLS LAST) ranking."""
    import pandas as pd
    import pyarrow.parquet as pq

    from txiac_qc_ray.pipelines.relational import column_profile

    got = column_profile(SF)
    t = pq.read_table(SF + "/documents.parquet",
                      columns=["lang", "source"]).to_pandas()
    for col in ("lang", "source"):
        vc = t[col].value_counts(dropna=False).reset_index()
        vc.columns = ["value", "n"]
        vc["_null"] = vc["value"].isna()
        vc = vc.sort_values(["n", "_null", "value"],
                            ascending=[False, True, True],
                            ignore_index=True).head(5)
        sub = got[got["col"] == col].reset_index(drop=True)
        assert sub["value"].where(sub["value"].notna(), None).tolist() == \
            vc["value"].where(vc["value"].notna(), None).tolist()
        assert sub["n_docs"].tolist() == vc["n"].tolist()
        assert sub["rank"].tolist() == list(range(1, len(sub) + 1))


def test_mojibake_gate_semantics(ray_session):
    """Decorated rows (fnv(url)%5==0, non-null text) carry exactly the
    suffix's 2 digraphs + 1 replacement char and are dropped; every
    undecorated ASCII row keeps."""
    from __ray_entry__ import _mojibake_gate, _webtext_dir
    import glob

    import pyarrow.parquet as pq

    from txiac_qc_ray.functions.urls import fnv1a64
    from txiac_qc_ray.pipelines.webtext import MOJI_MOD

    out = _mojibake_gate("unused").to_pandas().set_index("url")
    t = pq.read_table(sorted(glob.glob(_webtext_dir() + "/part-*.parquet")),
                      columns=["url", "text"])
    h = fnv1a64(t["url"].combine_chunks()) % np.uint64(MOJI_MOD)
    for url, hv, txt in zip(t["url"].to_pylist(), h.tolist(),
                            t["text"].to_pylist()):
        row = out.loc[url]
        if hv == 0 and txt is not None:
            assert row["n_mojibake"] == 2 and row["n_replacement"] == 1
            assert not row["keep"]
        else:
            # the base fixture is ASCII (plus the 2% decorated NFC rows
            # elsewhere — none of which contain the damage signature)
            assert row["n_mojibake"] == 0 and row["n_replacement"] == 0
            assert row["keep"]


def test_dedup_savings_report_pins_to_components(ray_session):
    """Tail-exception pin: each strategy row's doc count equals the
    size of the drop set the in-cap-checked components produce, and
    'either' is the distinct union (never more than the sum)."""
    from txiac_qc_ray.pipelines.docs import (dedup_savings_report,
                                             exact_dedup_losers,
                                             neardup_clusters_distributed,
                                             neardup_keep_best)

    rep = dedup_savings_report(SF).set_index("strategy")
    ex = exact_dedup_losers(SF)["doc_id"].to_numpy()
    cl = neardup_clusters_distributed(SF)
    best = neardup_keep_best(SF)
    nd = np.setdiff1d(cl["doc_id"].to_numpy(),
                      best["best_doc_id"].to_numpy())
    assert rep.loc["exact", "n_docs_dropped"] == len(ex)
    assert rep.loc["neardup", "n_docs_dropped"] == len(nd)
    assert rep.loc["either", "n_docs_dropped"] == len(np.union1d(ex, nd))
    assert (rep["chars_dropped"] >= 0).all()
    assert rep.loc["either", "chars_dropped"] <= (
        rep.loc["exact", "chars_dropped"] + rep.loc["neardup",
                                                    "chars_dropped"])
