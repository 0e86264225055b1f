"""Adversarial robustness: pathological corpora that stress the shuffle
and null-handling paths — an all-identical corpus (every LSH bucket is
ONE hot bucket), a fully-unique corpus, and null/empty texts."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
        "source": pa.array(sources or ["s0"] * n, pa.string()),
        "n_chars": pa.array([len(x) if x else 0 for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def _collect(res, sort_cols=None):
    """Corpus-sized ops return streaming Datasets (VERDICT r3 item 1);
    tests collect + canonical-sort at the harness boundary."""
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    return df.sort_values(sort_cols or list(df.columns), ignore_index=True)


def test_all_identical_corpus_hot_bucket(ray_session, tmp_path):
    """40 identical docs: every minhash band hashes to ONE bucket (the
    hottest possible key) — the sharded pair expansion must still emit
    exactly C(40,2) pairs at jaccard 1.0, and clustering one component."""
    from txiac_qc_ray.pipelines import docs as D

    d = _write_docs(tmp_path, ["the quick brown fox jumps over the lazy dog"] * 40)
    pairs = D.minhash_lsh_candidates(d, 0.5)
    assert len(pairs) == 40 * 39 // 2
    assert (pairs["jaccard"] == 1.0).all()
    clusters = D.neardup_clusters(d, 0.5)
    assert set(clusters["cluster_id"]) == {0}
    assert len(clusters) == 40
    sp = D.simhash_neardup_pairs(d)
    assert len(sp) == 40 * 39 // 2 and (sp["hamming"] == 0).all()
    winners = _collect(D.exact_dedup_rows(d), ["doc_id"])
    assert list(winners["doc_id"]) == [0]
    losers = D.exact_dedup_losers(d)
    assert list(losers["doc_id"]) == list(range(1, 40))


def test_unique_corpus_no_pairs(ray_session, tmp_path):
    from txiac_qc_ray.pipelines import docs as D

    # NB tokens are [a-z]+ runs: digits vanish, so uniqueness must be
    # alphabetic ("doc1" and "doc2" tokenize identically)
    words = "abcdefghijklmnopqrstuvwxyz"
    n_docs = 18  # i + k stays < 26: no modular wrap-around duplicates
    d = _write_docs(tmp_path, [
        " ".join(words[i + k] * (k + 2) for k in range(8))
        for i in range(n_docs)])
    assert len(D.minhash_lsh_candidates(d, 0.5)) == 0
    assert len(D.neardup_clusters(d, 0.5)) == 0
    assert len(D.neardup_clusters_distributed(d, 0.5)) == 0
    assert len(D.exact_dedup_losers(d)) == 0
    assert D.exact_dedup_rows(d).count() == n_docs


def test_null_and_empty_texts(ray_session, tmp_path):
    """Null/empty/whitespace texts must flow through every text op
    without error and with sane outputs."""
    from txiac_qc_ray.pipelines import docs as D

    texts = [None, "", "   ", "a a a", "hello world hello world"]
    d = _write_docs(tmp_path, texts)
    sh = D.simhash_docs(d)
    assert list(sh["simhash"][:3]) == ["0" * 16] * 3  # no tokens -> 0
    fp = D.fingerprint_docs(d)
    assert list(fp["fingerprint"][:4]) == [""] * 4  # < 5 tokens -> empty
    dd = D.dedup_adjacent_tokens(d).to_pandas().sort_values("doc_id",
                                                            ignore_index=True)
    assert dd["text_dedup"].tolist() == ["", "", "", "a", "hello world hello world"]
    assert dd["n_removed"].tolist() == [0, 0, 0, 2, 0]
    tc = D.token_counts_docs(d).to_pandas().sort_values("doc_id", ignore_index=True)
    assert tc["n_tokens"].tolist()[1:] == [0, 0, 3, 4]
    li = D.langid_docs(d)
    assert len(li) == 5  # null text -> None/und, no crash
    tt = _collect(D.tfidf_top_terms(d), ["doc_id"])
    assert set(tt["doc_id"]) <= {3, 4}  # token-less docs emit no terms
    fs = D.dedup_index_first_seen(d)
    # null fills to "" before hashing (both engines), so docs 0 and 1
    # share a hash and doc 1 loses; whitespace "   " is its own text
    assert fs["first_seen"].tolist() == [True, False, True, True, True]
    # an all-empty corpus returns the typed empty Dataset, no join crash
    d_empty = _write_docs(tmp_path, [None, "", "   "])
    assert D.tfidf_top_terms(d_empty).count() == 0


def test_skewed_source_ngram_jaccard(ray_session, tmp_path):
    """One source holding every doc (the documented per-source partition
    bound) still completes and matches a brute-force mirror."""
    from txiac_qc_ray.pipelines import docs as D

    base = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [base + f" tail{i}" for i in range(20)] + [base] * 2
    d = _write_docs(tmp_path, texts)
    got = D.ngram_jaccard_pairs(d, threshold=0.25)
    # brute force
    sets = []
    for x in texts:
        h, _ = D.token_ngram_hashes(pa.array([x], type=pa.string()), 3)
        sets.append(set(h.tolist()))
    exp = 0
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            si, sj = sets[i], sets[j]
            if si and sj and round(len(si & sj) / len(si | sj), 4) >= 0.25:
                exp += 1
    assert len(got) == exp > 0


def test_prep_corpus_invariants_sf01(ray_session):
    """10x-scale invariants for the composite prep chain (values are
    oracle-checked at sf0.01; this pins the set algebra at sf0.1):
    output excludes eval split, every near-dup cluster contributes at
    most its winner, nothing contaminated survives, quality gate holds."""
    from txiac_qc_ray.pipelines import docs as D

    sf = "/root/testdata/sf0.1"
    out = D.prep_corpus(sf)
    ids = set(out["doc_id"].astype(int))
    assert all(i % 50 != 0 for i in ids)
    assert (out["n_tokens"] >= 10).all()
    clusters = D.neardup_clusters(sf, 0.5)
    for d, c in zip(clusters["doc_id"], clusters["cluster_id"]):
        if int(d) != int(c):
            assert int(d) not in ids, f"cluster loser {d} survived"
    cont = D.decontaminate_against(sf).to_pandas()
    bad = set(cont[cont["contaminated"]]["doc_id"].astype(int))
    assert ids & bad == set()
    losers = set(D.exact_dedup_losers(sf)["doc_id"].astype(int))
    assert ids & losers == set()


def test_ngram_df_cap_kills_hot_shingle(ray_session, tmp_path):
    """200 docs sharing one boilerplate trigram (VERDICT r2 item 5):
    uncapped, that single shingle expands C(200,2)=19900 pairs at
    jaccard 1/3; the default df_cap drops it so the sweep does no
    quadratic work and emits nothing."""
    from txiac_qc_ray.pipelines import docs as D

    # unique suffix must be alphabetic: tokenize() extracts [a-z]+ only
    texts = ["alpha beta gamma uniq" + "".join(chr(97 + int(c)) for c in str(i))
             for i in range(200)]
    d = _write_docs(tmp_path, texts)
    # default cap (64 < 200): the shared trigram carries no signal
    assert len(D.ngram_jaccard_pairs(d, threshold=0.25)) == 0
    # cap lifted: every pair shares exactly the boilerplate trigram
    lifted = D.ngram_jaccard_pairs(d, threshold=0.25, df_cap=1000)
    assert len(lifted) == 200 * 199 // 2
    assert (lifted["jaccard"] == 0.3333).all()


def _write_events(tmp_path, n, users, span_hours):
    """Deterministic events table: n rows over `users` user_ids spread
    across span_hours (types cycle click/view/error)."""
    rng = np.random.default_rng(4242)
    ts0 = np.datetime64("2024-03-01T00:00:00", "us")
    ts = ts0 + (rng.integers(0, span_hours * 3600, n) * 1_000_000).astype("timedelta64[us]")
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, users, n), pa.int64()),
        "event_type": pa.array([("click", "view", "error")[i % 3] for i in range(n)],
                               pa.string()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
    })
    d = os.path.join(str(tmp_path), "ev")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


def test_windows_bucket_invariance_hot_key(ray_session, tmp_path):
    """ONE user owning a 3-week event stream (the hottest possible key):
    the bucketed as-of/session/lag paths must return exactly what the
    single-bucket (= old whole-key-on-one-worker) path returns, at 6h
    buckets (many seeds/stitches) and at a bucket spanning everything."""
    from txiac_qc_ray.pipelines import windows as W

    d = _write_events(tmp_path, 3000, users=2, span_hours=21 * 24)
    for fn in (W.asof_join_clicks_errors, W.session_windows, W.lag_diff,
               W.rolling_sum_cents, W.running_total_cents):
        small = _collect(fn(d, bucket_hours=6))
        one = _collect(fn(d, bucket_hours=10_000_000))
        pd.testing.assert_frame_equal(small, one, obj=fn.__name__)
        assert len(small) > 0


def test_windows_null_event_type_and_pre_epoch_ts(ray_session, tmp_path):
    """Null event_type must aggregate as SQL's NULL group (not crash the
    object-key np.unique), and pre-1970 timestamps (negative epoch-us)
    must not be confused with any summary sentinel in the bucketed
    as-of/lag paths."""
    from txiac_qc_ray.pipelines import relational as R
    from txiac_qc_ray.pipelines import windows as W

    n = 400
    rng = np.random.default_rng(7)
    ts0 = np.datetime64("1969-12-25T00:00:00", "us")  # spans the epoch
    ts = ts0 + (rng.integers(0, 14 * 86400, n) * 1_000_000).astype("timedelta64[us]")
    etypes = [None if i % 7 == 0 else ("click", "view", "error")[i % 3]
              for i in range(n)]
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 3, n), pa.int64()),
        "event_type": pa.array(etypes, pa.string()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
    })
    d = os.path.join(str(tmp_path), "ev")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "events.parquet"))

    # tumbling/hopping: null-keyed rows form their own group, like SQL
    tw = R.tumbling_window(d)
    assert tw["event_type"].isna().sum() > 0
    assert int(tw["cnt"].sum()) == n
    hw = R.hopping_window(d)
    assert hw["event_type"].isna().sum() > 0
    assert int(hw["cnt"].sum()) == 2 * n  # every event lands in 2 windows

    # bucketed paths vs single-bucket path across the 1970 boundary
    for fn in (W.asof_join_clicks_errors, W.lag_diff, W.running_total_cents):
        small = _collect(fn(d, bucket_hours=6))
        one = _collect(fn(d, bucket_hours=10_000_000))
        pd.testing.assert_frame_equal(small, one, obj=fn.__name__)
        assert len(small) > 0


def test_null_keys_distinct_count_and_cap(ray_session, tmp_path):
    """Null group keys in the two r3 agg/cap ops: distinct_count_users
    counts a null event_type as its own group (like SQL) and
    cap_per_host caps the null-source host partition, instead of
    crashing the object-key lexsort."""
    from txiac_qc_ray.pipelines import docs as D
    from txiac_qc_ray.pipelines import relational as R

    n = 120
    rng = np.random.default_rng(11)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 10, n), pa.int64()),
        "event_type": pa.array([None if i % 5 == 0 else ("click", "view")[i % 2]
                                for i in range(n)], pa.string()),
        "ts": pa.array(np.full(n, np.datetime64("2024-01-01", "us"))),
        "value": pa.array(np.ones(n)),
    })
    d = os.path.join(str(tmp_path), "ev")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    dc = R.distinct_count_users(d)
    assert dc["event_type"].isna().sum() == 1
    mirror = (t.to_pandas().groupby("event_type", dropna=False)["user_id"]
              .nunique().sort_index())
    assert sorted(dc["n_users"]) == sorted(mirror.tolist())

    texts = [f"doc body {i}" for i in range(40)]
    dd = _write_docs(tmp_path, texts,
                     sources=[None if i % 4 == 0 else f"s{i % 3}"
                              for i in range(40)])
    capped = D.cap_per_host(dd, k=3)
    assert capped["source"].isna().sum() == 3  # null host capped at k
    assert (capped.groupby("source", dropna=False).size() <= 3).all()


def test_dedup_index_first_seen_hot_hash(ray_session, tmp_path):
    """All-identical corpus: every update lands on ONE index shard (the
    hottest possible hash) and exactly doc 0 is first_seen; a unique
    corpus is first_seen everywhere. Deterministic under any batch
    order (commutative-min index)."""
    from txiac_qc_ray.pipelines import docs as D

    d = _write_docs(tmp_path, ["same text for everyone"] * 30)
    out = D.dedup_index_first_seen(d)
    assert out["first_seen"].tolist() == [True] + [False] * 29
    d2 = _write_docs(tmp_path, [f"uniq {'x' * (i + 1)}" for i in range(12)])
    out2 = D.dedup_index_first_seen(d2)
    assert out2["first_seen"].all() and len(out2) == 12


def test_dedup_index_shard_count_invariance(ray_session, tmp_path):
    """The actor-index dedup answer may not depend on how the hash space
    is sharded (1 actor vs 8) — commutative-min makes it order- and
    layout-free."""
    from txiac_qc_ray.pipelines import docs as D

    texts = [f"body {'x' * (i % 7)}" for i in range(40)]  # 7 distinct texts
    d = _write_docs(tmp_path, texts)
    a = D.dedup_index_first_seen(d, n_index_shards=1)
    b = D.dedup_index_first_seen(d, n_index_shards=8)
    pd.testing.assert_frame_equal(a, b)
    assert int(a["first_seen"].sum()) == 7


def test_dedup_paragraphs_semantics(ray_session, tmp_path):
    """Cross-corpus segment dedup: duplicated docs lose every segment to
    the first copy; a doc sharing one 4-token segment loses just that
    segment; shard count never changes the answer."""
    from txiac_qc_ray.pipelines import docs as D

    seg = "alpha beta gamma delta"          # one full 4-token segment
    texts = [
        f"{seg} epsilon zeta eta theta",    # doc 0: segs [seg, tail0]
        f"{seg} epsilon zeta eta theta",    # doc 1: exact dup -> empty
        f"{seg} iota kappa lam mu",         # doc 2: loses seg, keeps tail
        "nu xi omicron pi",                 # doc 3: unique, untouched
        "",                                 # doc 4: empty -> 0 segs
    ]
    d = _write_docs(tmp_path, texts)
    got = _collect(D.dedup_paragraphs(d, seg_tokens=4), ["doc_id"])
    assert list(got["doc_id"]) == [0, 1, 2, 3, 4]
    assert list(got["text_dedup"]) == [
        texts[0], "", "iota kappa lam mu", texts[3], ""]
    assert list(got["n_kept_segs"]) == [2, 0, 1, 1, 0]
    assert list(got["n_total_segs"]) == [2, 2, 2, 1, 0]
    # shard-count invariance (value contract of every bounded shuffle)
    alt = _collect(D.dedup_paragraphs(d, seg_tokens=4, n_shards=1), ["doc_id"])
    pd.testing.assert_frame_equal(got, alt)


def test_dedup_paragraphs_all_identical(ray_session, tmp_path):
    """Hot-segment corpus: 30 identical docs -> doc 0 survives whole,
    every other doc reassembles to empty text."""
    from txiac_qc_ray.pipelines import docs as D

    d = _write_docs(tmp_path, ["one two three four five six seven eight"] * 30)
    got = _collect(D.dedup_paragraphs(d, seg_tokens=4), ["doc_id"])
    assert got.loc[0, "text_dedup"] == "one two three four five six seven eight"
    assert (got.loc[1:, "text_dedup"] == "").all()
    assert list(got["n_total_segs"]) == [2] * 30
    assert list(got["n_kept_segs"]) == [2] + [0] * 29


def test_dup_window_fraction_semantics(ray_session, tmp_path):
    """Sliding 3-token windows: only window texts occurring in >= 2
    DISTINCT docs count; within-doc repeats alone do not; every
    position of a shared text counts; shard count never changes the
    answer."""
    from txiac_qc_ray.pipelines import docs as D

    texts = [
        "alpha beta gamma delta epsilon",  # 0: shares 'alpha beta gamma' w/ 1
        "alpha beta gamma zeta eta",       # 1
        "pq rs pq rs pq rs",               # 2: within-doc repeats only
        "uniq words only here now",        # 3: clean
        "xy",                              # 4: too short -> 0 windows
        "",                                # 5: empty
    ]
    d = _write_docs(tmp_path, texts)
    got = _collect(D.dup_window_fraction(d, window_tokens=3, max_frac=0.3),
                   ["doc_id"])
    assert list(got["doc_id"]) == [0, 1, 2, 3, 4, 5]
    assert list(got["n_windows"]) == [3, 3, 4, 3, 0, 0]
    # docs 0/1 share exactly one window text at one position each
    assert list(got["n_dup_windows"]) == [1, 1, 0, 0, 0, 0]
    assert got.loc[4, "n_windows"] == 0 and pd.isna(got.loc[4, "dup_frac"])
    assert list(got["keep"]) == [False, False, True, True, True, True]
    alt = _collect(D.dup_window_fraction(d, window_tokens=3, max_frac=0.3,
                                         n_shards=1), ["doc_id"])
    pd.testing.assert_frame_equal(got, alt)


def test_dup_window_fraction_adversarial_vs_sql(ray_session, tmp_path):
    """~60%-duplicate corpus (boilerplate prefix shared by most docs,
    plus exact dup pairs): engine == DuckDB twin value-for-value, and
    no driver-side set of the shared-window population is ever built
    (candidates ride the DropIndex)."""
    import duckdb

    from txiac_qc_ray import oracles as O
    from txiac_qc_ray.pipelines import docs as D

    words = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
             "do eiusmod tempor incididunt ut labore et dolore").split()
    texts = []
    for i in range(60):
        body = " ".join(words[(i * 3) % 7:] + [f"tail{i} mark{i % 5}"])
        if i % 3 == 0:
            texts.append("shared boiler plate prefix spans many documents "
                         + body)
        elif i % 3 == 1:
            texts.append(texts[-1])  # exact duplicate of the previous doc
        else:
            texts.append(body)
    d = _write_docs(tmp_path, texts)
    got = _collect(D.dup_window_fraction(d, window_tokens=8), ["doc_id"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = (con.execute(O.dup_window_fraction_sql(8))
            .df().sort_values("doc_id", ignore_index=True))
    got["keep"] = got["keep"].astype(bool)
    want["keep"] = want["keep"].astype(bool)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False)
    assert (got["n_dup_windows"] > 0).mean() > 0.5  # the corpus IS adversarial


def test_ccnet_ppl_buckets_semantics_and_ties(ray_session, tmp_path):
    """Tie-heavy corpus: many docs share one exact score (same int
    cost / token count), so the 1/3-rank threshold lands INSIDE the tie
    run — every member must land in the same bucket in both engines;
    null text and tokenless docs get NULL score/bucket and stay out of
    the threshold population; head<=middle<=tail ordering holds."""
    import duckdb

    from txiac_qc_ray import oracles as O
    from txiac_qc_ray.pipelines import docs as D

    texts = (["the the the"] * 9            # one tied score x9 (all-vocab)
             + ["zzzq zzzq"] * 6            # one tied OOV-heavy score x6
             + ["the of and zzzq"] * 5      # mixed
             + ["1234 5678", ""])           # tokenless + empty -> NULL
    d = _write_docs(tmp_path, texts)
    got = _collect(D.ccnet_ppl_buckets(d), ["doc_id"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = (con.execute(O.ccnet_ppl_buckets_sql())
            .df().sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False)
    # tie runs are atomic: one bucket per distinct score
    body = got[got["n_tok"] > 0]
    assert (body.groupby("ppl_score")["ppl_bucket"].nunique() == 1).all()
    # tokenless docs: NULL score and bucket
    tail = got[got["n_tok"] == 0]
    assert len(tail) == 2
    assert tail["ppl_score"].isna().all() and tail["ppl_bucket"].isna().all()
    # bucket order follows score order within a language
    en = got[(got["lang_pred"] == "en") & (got["n_tok"] > 0)]
    rank = {"head": 0, "middle": 1, "tail": 2}
    srt = en.sort_values("ppl_score")
    assert srt["ppl_bucket"].map(rank).is_monotonic_increasing


def test_knn_self_join_ties_and_small_corpus(ray_session, tmp_path):
    """Duplicate vectors create EXACT similarity ties (sim 1.0 against
    every copy) — the (sim desc, nid asc) tie-break must pick the same
    neighbors as the SQL row_number twin; a corpus smaller than k
    returns n-1 neighbors per vector, never the self match."""
    import duckdb
    import pyarrow.parquet as pq

    from txiac_qc_ray import oracles as O
    from txiac_qc_ray.pipelines import docs as D

    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 8))
    # ids 0,1,2 identical; 3,4 identical; 5..11 distinct
    vecs = np.concatenate([base[:1]] * 3 + [base[1:2]] * 2 + [base])
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    d = str(tmp_path)
    got = _collect(D.knn_self_join(d, k=4), ["qid", "nid"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    want = (con.execute(O.knn_self_join_sql(4))
            .df().sort_values(["qid", "nid"], ignore_index=True))
    pd.testing.assert_frame_equal(
        got[["qid", "nid", "sim"]], want, check_dtype=False)
    # each of the identical triplet ranks its two copies first (nid asc)
    q0 = got[got["qid"] == 0].sort_values(["sim", "nid"],
                                          ascending=[False, True])
    assert list(q0["nid"])[:2] == [1, 2] and (q0["sim"].iloc[:2] == 1.0).all()

    # tiny corpus: 3 vectors, k=5 -> exactly 2 neighbors each, no self
    t3 = t.slice(0, 3)
    d3 = tmp_path / "tiny"
    d3.mkdir()
    pq.write_table(t3, str(d3 / "embeddings.parquet"))
    small = _collect(D.knn_self_join(str(d3), k=5), ["qid", "nid"])
    assert len(small) == 6
    assert (small["qid"] != small["nid"]).all()


def test_dup_window_fraction_clean_corpus_shortcut(ray_session, tmp_path):
    """A corpus with NO shared windows: every doc keeps, dup counts are
    zero, and the answer matches the SQL twin (exercises the
    empty-candidate fast path that skips the verify pass)."""
    import duckdb

    from txiac_qc_ray import oracles as O
    from txiac_qc_ray.pipelines import docs as D

    # letter-unique words: tokens are [a-z]+ runs, so digits would
    # vanish and make every row identical — spell the row index out
    def w(i, tag):
        return tag + "abcdefghijklmnopqrst"[i]

    texts = [" ".join(w(i, t) for t in ("aa", "bb", "cc", "dd", "ee"))
             for i in range(20)]
    d = _write_docs(tmp_path, texts)
    got = _collect(D.dup_window_fraction(d, window_tokens=3), ["doc_id"])
    assert (got["n_dup_windows"] == 0).all() and got["keep"].all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = (con.execute(O.dup_window_fraction_sql(3))
            .df().sort_values("doc_id", ignore_index=True))
    got["keep"] = got["keep"].astype(bool)
    want["keep"] = want["keep"].astype(bool)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False)


def test_remove_dup_windows_semantics(ray_session, tmp_path):
    """Symmetric exact-substring removal: a 3-token span shared by two
    docs vanishes from BOTH; within-doc repeats alone survive; overlap
    of two shared windows removes the union of covered tokens; the
    answer matches the SQL twin on a duplicate-heavy corpus."""
    import duckdb

    from txiac_qc_ray import oracles as O
    from txiac_qc_ray.pipelines import docs as D

    texts = [
        "aa bb cc dd ee",     # 0: shares 'aa bb cc' AND 'bb cc dd' w/ 1
        "aa bb cc dd zz",     # 1: -> tokens aa..dd covered in both
        "pq rs pq rs pq rs",  # 2: within-doc repeats only -> untouched
        "solo words here",    # 3: clean
        "",                   # 4: empty
    ]
    d = _write_docs(tmp_path, texts)
    got = _collect(D.remove_dup_windows(d, window_tokens=3), ["doc_id"])
    assert list(got["doc_id"]) == [0, 1, 2, 3, 4]
    assert list(got["text_dedup"]) == ["ee", "zz", texts[2], texts[3], ""]
    assert list(got["n_tokens"]) == [5, 5, 6, 3, 0]
    assert list(got["n_removed_tokens"]) == [4, 4, 0, 0, 0]
    # shard invariance
    alt = _collect(D.remove_dup_windows(d, window_tokens=3, n_shards=1),
                   ["doc_id"])
    pd.testing.assert_frame_equal(got, alt)

    # duplicate-heavy corpus value-checked against the SQL twin
    words = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
             "do eiusmod tempor incididunt").split()
    many = []
    for i in range(40):
        body = " ".join(words[(i * 5) % 7:] + [f"tail{'x' * (i % 9 + 1)}"])
        many.append(("common prefix shared across documents " + body)
                    if i % 2 == 0 else body)
    d2 = tmp_path / "many"
    d2.mkdir()
    dd = _write_docs(d2, many)
    got2 = _collect(D.remove_dup_windows(dd, window_tokens=8), ["doc_id"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{dd}/documents.parquet'")
    want2 = (con.execute(O.remove_dup_windows_sql(8))
             .df().sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(
        got2[want2.columns.tolist()], want2, check_dtype=False)
    assert (got2["n_removed_tokens"] > 0).mean() > 0.4


def test_window_ops_fuzz_vs_python_reference(ray_session, tmp_path):
    """Seeded fuzz: random tiny-alphabet corpora (high natural window
    duplication, docs shorter/equal/longer than W, empty docs) —
    dup_window_fraction and remove_dup_windows both equal a pure-Python
    reference on every trial."""
    from collections import Counter

    from txiac_qc_ray.pipelines import docs as D

    rng = np.random.default_rng(11)
    vocab = ["ax", "by", "cz", "dw"]  # 4 tokens -> many shared windows
    W = 3
    for trial in range(4):
        n_docs = int(rng.integers(5, 14))
        texts = []
        for _ in range(n_docs):
            n_tok = int(rng.integers(0, 9))
            texts.append(" ".join(
                vocab[int(k)] for k in rng.integers(0, len(vocab), n_tok)))
        d = tmp_path / f"t{trial}"
        d.mkdir()
        dd = _write_docs(d, texts)

        toks = [t.split() if t else [] for t in texts]
        wins = [[tuple(tk[i:i + W]) for i in range(len(tk) - W + 1)]
                for tk in toks]
        docs_of = Counter()
        for i, ws in enumerate(wins):
            for w in set(ws):
                docs_of[w] += 1
        shared = {w for w, c in docs_of.items() if c >= 2}

        frac = _collect(D.dup_window_fraction(dd, window_tokens=W),
                        ["doc_id"])
        for i, ws in enumerate(wins):
            assert frac.loc[i, "n_windows"] == len(ws)
            assert frac.loc[i, "n_dup_windows"] == sum(
                w in shared for w in ws), (trial, i)

        rem = _collect(D.remove_dup_windows(dd, window_tokens=W),
                       ["doc_id"])
        for i, tk in enumerate(toks):
            cov = np.zeros(len(tk), dtype=bool)
            for p, w in enumerate(wins[i]):
                if w in shared:
                    cov[p:p + W] = True
            want_text = " ".join(t for t, c in zip(tk, cov) if not c)
            assert rem.loc[i, "text_dedup"] == want_text, (trial, i)
            assert rem.loc[i, "n_removed_tokens"] == int(cov.sum())
