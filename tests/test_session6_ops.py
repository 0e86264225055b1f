"""Round-5 final-session ops: per-source TV divergence and the
cross-source shared-shingle matrix — each checked against an
independent pure-Python reference (not the DuckDB twin: the sweep
already runs that), plus the shard-invariance property the overlap
op's bounded-shuffle shape relies on."""

import re
from collections import Counter
from fractions import Fraction

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[a-z]+")


def _toks(text):
    return _TOK.findall((text or "").lower())


def test_source_divergence_tv_matches_python_reference(ray_session):
    from txiac_qc_ray.pipelines.docs import source_divergence_tv

    df = pq.read_table(SF + "/documents.parquet",
                       columns=["source", "text"]).to_pandas()
    per_src: dict[str, Counter] = {}
    for s, t in zip(df["source"], df["text"]):
        per_src.setdefault(s, Counter()).update(_toks(t))
    corpus = Counter()
    for c in per_src.values():
        corpus.update(c)
    n_total = sum(corpus.values())
    got = source_divergence_tv(SF)
    assert list(got.columns) == ["source", "n_tokens", "tv"]
    assert list(got["source"]) == sorted(k for k, c in per_src.items()
                                         if sum(c.values()) > 0)
    for _, row in got.iterrows():
        c = per_src[row["source"]]
        n_s = sum(c.values())
        assert row["n_tokens"] == n_s
        # integer-cleared numerator over the FULL corpus vocabulary
        # (Python ints: arbitrary precision), then the same single
        # int->double division the operator performs
        num = sum(abs(c.get(tok, 0) * n_total - ctot * n_s)
                  for tok, ctot in corpus.items())
        assert row["tv"] == float(num) / float(2 * n_s * n_total), \
            row["source"]
        # and it IS the rational TV value, independently via Fraction
        tv = sum(abs(Fraction(c.get(tok, 0), n_s) - Fraction(ctot, n_total))
                 for tok, ctot in corpus.items()) / 2
        assert abs(row["tv"] - float(tv)) < 1e-12
        assert 0.0 <= row["tv"] <= 1.0


def test_source_overlap_matrix_matches_python_reference(ray_session):
    from txiac_qc_ray.pipelines.docs import source_overlap_matrix

    df = pq.read_table(SF + "/documents.parquet",
                       columns=["source", "text"]).to_pandas()
    sets: dict[str, set] = {}
    for s, t in zip(df["source"], df["text"]):
        toks = _toks(t)
        sets.setdefault(s, set()).update(
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2))
    srcs = sorted(sets)
    exp = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            n = len(sets[a] & sets[b])
            if n:
                exp.append((a, b, n))
    exp_df = pd.DataFrame(exp, columns=["source_a", "source_b", "n_shared"])
    got = source_overlap_matrix(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp_df, check_dtype=False)


def test_source_overlap_matrix_shard_invariant(ray_session):
    """The (shard = hash % S) split is exact: per-shard pair counts are
    shingle-additive, so the result cannot depend on S."""
    from txiac_qc_ray.pipelines.docs import source_overlap_matrix

    a = source_overlap_matrix(SF, n_shards=3)
    b = source_overlap_matrix(SF, n_shards=16)
    pd.testing.assert_frame_equal(a, b)


def test_interleave_sources_closed_form_matches_naive_sort(ray_session):
    """The closed-form global rank == the naive ORDER BY (key, source)
    position, and the result is a permutation of 1..N."""
    import numpy as np

    from txiac_qc_ray.functions.urls import fnv1a64
    from txiac_qc_ray.pipelines.docs import interleave_sources
    import pyarrow as pa

    got = interleave_sources(SF).to_pandas().sort_values(
        "position", ignore_index=True)
    df = pq.read_table(SF + "/documents.parquet",
                       columns=["doc_id", "source"]).to_pandas()
    # naive reference: rank within source by doc_id, key = rn * step,
    # global sort by (key, source)
    df = df.sort_values(["source", "doc_id"], ignore_index=True)
    df["rn"] = df.groupby("source").cumcount() + 1
    wt = 1 + (fnv1a64(pa.array(df["source"], pa.string()))
              % np.uint64(3)).astype(np.int64)
    df["key"] = df["rn"] * (6 // wt)
    df = df.sort_values(["key", "source"], ignore_index=True)
    df["position"] = np.arange(1, len(df) + 1)
    exp = df[["position", "doc_id", "source"]]
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True),
                                  check_dtype=False)
    assert sorted(got["position"]) == list(range(1, len(got) + 1))


def test_interleave_sources_prefix_fairness(ray_session):
    """Weighted fair queueing's defining property: in every prefix,
    each source's share tracks its weight within one schedule round."""
    import numpy as np
    import pyarrow as pa

    from txiac_qc_ray.functions.urls import fnv1a64
    from txiac_qc_ray.pipelines.docs import interleave_sources

    got = interleave_sources(SF).to_pandas().sort_values(
        "position", ignore_index=True)
    srcs = sorted(got["source"].unique())
    wt = dict(zip(srcs, 1 + (fnv1a64(pa.array(srcs, pa.string()))
                             % np.uint64(3)).astype(np.int64)))
    W = sum(wt.values())
    head = got.head(len(got) // 2)  # no source exhausts in this prefix
    for s in srcs:
        seen = int((head["source"] == s).sum())
        expect = len(head) * wt[s] / W
        # within one full round of the schedule (W slots)
        assert abs(seen - expect) <= wt[s] + 1, (s, seen, expect)


def test_funnel_conversion_matches_python_reference(ray_session):
    from txiac_qc_ray.pipelines.windows import funnel_conversion

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    su = (ev[ev["event_type"] == "signup"]
          .groupby("user_id")["ts"].min())
    conv = 0
    for u, mts in su.items():
        m = ev[(ev["user_id"] == u) & (ev["event_type"] == "purchase")]
        if (m["ts"] > mts).any():
            conv += 1
    got = funnel_conversion("/root/testdata/sf0.001")
    assert got.shape == (1, 3)
    assert int(got["n_users"][0]) == ev["user_id"].nunique()
    assert int(got["n_signed_up"][0]) == len(su)
    assert int(got["n_converted"][0]) == conv
    # the funnel is a funnel: monotone non-increasing stages
    assert (got["n_users"][0] >= got["n_signed_up"][0]
            >= got["n_converted"][0] >= 0)


def test_retention_cohorts_matches_python_reference(ray_session):
    from txiac_qc_ray.pipelines.windows import retention_cohorts

    WEEK = 604_800_000_000
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    su = (ev[ev["event_type"] == "signup"].groupby("user_id")["us"].min()
          // WEEK)
    act = set(zip(ev["user_id"], ev["us"] // WEEK))
    from collections import Counter
    exp = Counter()
    for u, aw in act:
        if u in su.index and aw >= su[u]:
            exp[(int(su[u]), int(aw - su[u]))] += 1
    got = retention_cohorts("/root/testdata/sf0.001")
    assert list(got.columns) == ["cohort_week", "weeks_since",
                                 "n_active_users"]
    got_map = {(int(r.cohort_week), int(r.weeks_since)):
               int(r.n_active_users) for r in got.itertuples()}
    assert got_map == dict(exp)
    # week-0 of each cohort includes the signup event itself
    for cw in {k[0] for k in got_map}:
        assert got_map.get((cw, 0), 0) >= 1
