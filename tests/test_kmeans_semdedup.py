"""Round-5 session-9 ops: integer fixed-point embedding k-means and
SemDeDup (Abbas et al. 2023) — each checked against an independent
pure-numpy reference (the DuckDB twin runs in the sweep), plus the
shared-core transfer pin (semdedup's cluster_id IS embedding_kmeans's
assignment) and an adversarial planted-duplicate corpus exercising the
tie rule, the empty-cluster carry, and zero-norm keep semantics."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _reference_kmeans(sf_dir, k=None, iters=None):
    """Single-process Lloyd reference: same quantization, init, tie
    rule, and truncating-division update as the distributed operator —
    but one flat numpy loop, no Ray."""
    from txiac_qc_ray.pipelines import docs as D

    k = D.KMEANS_K if k is None else k
    iters = D.KMEANS_ITERS if iters is None else iters
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    mask = t["embedding"].combine_chunks().is_valid()
    t = t.filter(mask)
    n = len(t)
    v = np.asarray(t["embedding"].combine_chunks().values,
                   dtype=np.float64).reshape(n, -1)
    ids = np.asarray(t["vec_id"])
    order = np.argsort(ids)
    v, ids = v[order], ids[order]
    q = np.floor(v * D.KMEANS_SCALE).astype(np.int64)

    def assign(Q, C):
        dist = ((Q * Q).sum(1)[:, None] + (C * C).sum(1)[None, :]
                - 2 * (Q @ C.T))
        a = np.argmin(dist, axis=1)
        return a, dist[np.arange(len(a)), a]

    C = q[:k].copy()
    for _ in range(iters):
        a, _ = assign(q, C)
        for j in range(C.shape[0]):
            m = a == j
            if m.sum():
                s = q[m].sum(0)
                C[j] = np.sign(s) * (np.abs(s) // int(m.sum()))
    a, dist = assign(q, C)
    return ids, q, a.astype(np.int64), dist


def test_embedding_kmeans_matches_python_reference(ray_session):
    from txiac_qc_ray.pipelines.docs import embedding_kmeans

    ids, _, a_ref, d_ref = _reference_kmeans(SF)
    got = (embedding_kmeans(SF).to_pandas()
           .sort_values("vec_id", ignore_index=True))
    assert list(got.columns) == ["vec_id", "cluster_id", "dist"]
    assert (got["vec_id"].to_numpy() == ids).all()
    assert (got["cluster_id"].to_numpy() == a_ref).all()
    assert (got["dist"].to_numpy() == d_ref).all()
    # the fixture spreads across clusters (not a degenerate single blob)
    assert got["cluster_id"].nunique() >= 2


def test_semdedup_matches_python_reference(ray_session):
    from txiac_qc_ray.pipelines import docs as D

    ids, q, a_ref, _ = _reference_kmeans(SF)
    na = (q * q).sum(1)
    keep_ref = np.ones(len(ids), dtype=bool)
    for j in np.unique(a_ref):
        m = np.where(a_ref == j)[0]  # ids already ascending
        Q = q[m]
        dot = (Q @ Q.T).astype(np.float64)
        naf = na[m].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = dot / np.sqrt(naf[:, None] * naf[None, :])
        sims = np.where((na[m][:, None] > 0) & (na[m][None, :] > 0),
                        sims, -np.inf)
        keep_ref[m] = ~np.tril(
            sims >= D.SEMDEDUP_SIM_THRESHOLD, k=-1).any(axis=1)
    got = (D.semdedup(SF).to_pandas()
           .sort_values("vec_id", ignore_index=True))
    assert (got["vec_id"].to_numpy() == ids).all()
    assert (got["cluster_id"].to_numpy() == a_ref).all()
    assert (got["keep"].to_numpy() == keep_ref).all()


def test_semdedup_cluster_assignment_transfer_pin(ray_session):
    """The shared-core pin: semdedup's (vec_id, cluster_id) columns are
    BYTE-EQUAL to embedding_kmeans's — the in-cap driver value check of
    either op covers the other's k-means core."""
    from txiac_qc_ray.pipelines.docs import embedding_kmeans, semdedup

    km = (embedding_kmeans(SF).to_pandas()
          .sort_values("vec_id", ignore_index=True))
    sd = (semdedup(SF).to_pandas()
          .sort_values("vec_id", ignore_index=True))
    pd.testing.assert_frame_equal(km[["vec_id", "cluster_id"]],
                                  sd[["vec_id", "cluster_id"]])


def test_semdedup_planted_duplicates(ray_session, tmp_path):
    """Adversarial micro-corpus: an exact duplicate pair must land in
    one cluster via the lowest-cid tie rule (identical centroids at
    init — also forcing the empty-cluster carry in the update), the
    higher id of the pair is dropped, and a zero-norm vector is always
    kept."""
    from txiac_qc_ray.pipelines.docs import embedding_kmeans, semdedup

    d = 8
    e0 = [1.0] + [0.0] * (d - 1)
    e2 = [0.0, 1.0] + [0.0] * (d - 2)
    tab = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([e0, e0, e2, [0.0] * d],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 2], pa.int32()),
    })
    sf = str(tmp_path)
    pq.write_table(tab, os.path.join(sf, "embeddings.parquet"))

    km = (embedding_kmeans(sf).to_pandas()
          .sort_values("vec_id", ignore_index=True))
    # v0 and v1 are identical -> identical init centroids c0/c1; the
    # dist tie resolves to the LOWEST cid on both rows
    assert km["cluster_id"].tolist()[:2] == [0, 0]
    assert (km["dist"] >= 0).all()

    sd = (semdedup(sf).to_pandas()
          .sort_values("vec_id", ignore_index=True))
    assert sd["keep"].tolist() == [True, False, True, True]


def test_semdedup_null_embedding_out_of_scope(ray_session, tmp_path):
    """Null-embedding rows are dropped on BOTH sides (the twin filters
    embedding IS NOT NULL); everything else is unaffected."""
    from txiac_qc_ray.pipelines.docs import embedding_kmeans

    d = 4
    tab = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.5] * d, None, [-0.25] * d],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32()),
    })
    sf = str(tmp_path)
    pq.write_table(tab, os.path.join(sf, "embeddings.parquet"))
    km = (embedding_kmeans(sf).to_pandas()
          .sort_values("vec_id", ignore_index=True))
    assert km["vec_id"].tolist() == [0, 2]


def test_cluster_cap_sample_transfer_pin(ray_session):
    """Tail-exception pin: cluster_cap_sample's FULL output is a pure
    function of embedding_kmeans's (vec_id, cluster_id) — keep iff the
    vector's mix64(vec_id) rank within its cluster is <= m. The in-cap
    driver value check of embedding_kmeans therefore transfers to this
    op through this byte-equality."""
    from txiac_qc_ray.pipelines.docs import (CLUSTER_CAP_M, _mix64,
                                             cluster_cap_sample,
                                             embedding_kmeans)

    km = (embedding_kmeans(SF).to_pandas()
          .sort_values("vec_id", ignore_index=True))
    key = _mix64(km["vec_id"].to_numpy(dtype=np.int64).astype(np.uint64))
    keep_ref = np.zeros(len(km), dtype=bool)
    cl = km["cluster_id"].to_numpy()
    for j in np.unique(cl):
        mask = np.where(cl == j)[0]
        order = mask[np.argsort(key[mask])]
        keep_ref[order[:CLUSTER_CAP_M]] = True
    rec = km[["vec_id", "cluster_id"]].copy()
    rec["keep"] = keep_ref
    got = (cluster_cap_sample(SF).to_pandas()
           .sort_values("vec_id", ignore_index=True))
    pd.testing.assert_frame_equal(got, rec)


def test_cluster_cap_sample_caps_at_m(ray_session, tmp_path):
    """A cluster larger than m keeps exactly m members; smaller
    clusters keep all (m-th-smallest-key threshold semantics)."""
    from txiac_qc_ray.pipelines.docs import cluster_cap_sample

    d = 4
    n = 40
    rng = np.random.default_rng(7)
    base = rng.normal(size=d)
    vecs = [(0.2 * base + 0.01 * rng.normal(size=d)).astype(np.float32)
            for _ in range(n)]
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, dtype=np.int32)),
    })
    sf = str(tmp_path)
    pq.write_table(tab, os.path.join(sf, "embeddings.parquet"))
    got = cluster_cap_sample(sf, m=5).to_pandas()
    per = got.groupby("cluster_id")["keep"].agg(["sum", "count"])
    for _, row in per.iterrows():
        assert row["sum"] == min(5, row["count"])


def test_hard_negatives_cluster_exclusion(ray_session):
    """Every mined negative sits in a DIFFERENT k-means cluster than its
    probe, self-pairs never appear, and sims are (desc, nid asc) ranked
    — checked against the embedding_kmeans assignment on the fixture."""
    import numpy as np

    from txiac_qc_ray.pipelines import docs as D

    sf = "/root/testdata/sf0.001"
    neg = D.hard_negatives(sf)
    assert len(neg) > 0
    km = D.embedding_kmeans(sf).to_pandas().set_index("vec_id")["cluster_id"]
    for qid, grp in neg.groupby("qid"):
        assert (grp["nid"] != qid).all()
        qc = km.loc[qid]
        assert (km.loc[grp["nid"]].to_numpy() != qc).all()
        s = grp.sort_values("rk")["sim"].to_numpy()
        assert (np.diff(s) <= 0).all()
        assert list(grp.sort_values("rk")["rk"]) == list(range(1, len(grp) + 1))
