"""Round-2 scale-path parity tests for the dedup/ANN family:

- the distributed ANN LSH/IVF pipelines (VERDICT r1 item 2) must return
  the exact brute-force top-k (IVF by construction — triangle-inequality
  pruning; LSH empirically with the frozen parameters);
- the sign-LSH bucketed near-dup path (item 4) must equal the exact
  broadcast path;
- the vectorized n-gram Jaccard sweep (item 5) must match a brute-force
  set reimplementation;
- keep-winning-row exact dedup (item 8) must be layout-invariant and
  keep exactly the min-doc_id row of each distinct text.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _key(df):
    return list(zip(df["qid"], df["nid"], df["sim"]))


def test_ann_lsh_equals_bruteforce(ray_session):
    from txiac_qc_ray.pipelines import docs as D

    assert _key(D.ann_topk_lsh(SF)) == _key(D.ann_topk_bruteforce(SF))


def test_ann_ivf_equals_bruteforce(ray_session):
    from txiac_qc_ray.pipelines import docs as D

    # exact by construction (bound-pruned scan) — any params agree
    assert _key(D.ann_topk_ivf(SF)) == _key(D.ann_topk_bruteforce(SF))
    assert _key(D.ann_topk_ivf(SF, n_lists=8, n_probe=2)) == _key(
        D.ann_topk_bruteforce(SF))


def test_neardup_lsh_equals_exact(ray_session):
    from txiac_qc_ray.pipelines import docs as D

    exact = D.embedding_neardup_pairs(SF)
    lsh = D.embedding_neardup_pairs_lsh(SF)
    pd.testing.assert_frame_equal(exact, lsh)


def test_ngram_jaccard_vectorized_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from txiac_qc_ray.pipelines import docs as D

    got = D.ngram_jaccard_pairs(SF, threshold=0.25)
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "source", "text"])
    df = t.to_pandas()
    rows = []
    for _, g in df.groupby("source"):
        g = g.sort_values("doc_id", ignore_index=True)
        sets = [set(D.token_ngram_hashes(pa.array([x], type=pa.string()), 3)[0].tolist())
                for x in g["text"]]
        ids = g["doc_id"].to_numpy()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                si, sj = sets[i], sets[j]
                if not si or not sj:
                    continue
                jac = len(si & sj) / len(si | sj)
                if round(jac, 4) >= 0.25:
                    rows.append((ids[i], ids[j], round(jac, 4)))
    exp = (pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])
           .sort_values(["id_a", "id_b"], ignore_index=True))
    assert list(map(tuple, got.to_numpy())) == list(map(tuple, exp.to_numpy()))


def test_minhash_verify_worker_side_matches_exact_jaccard(ray_session):
    """LSH candidates verified worker-side == exact all-pairs >= tau."""
    import pyarrow.parquet as pq

    from txiac_qc_ray.pipelines import docs as D

    got = D.minhash_lsh_candidates(SF, 0.5)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = np.asarray(t["doc_id"])
    h, off = D.token_ngram_hashes(t["text"].combine_chunks(), 3)
    sets = [set(h[off[i]:off[i + 1]].tolist()) for i in range(len(off) - 1)]
    exp = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            si, sj = sets[i], sets[j]
            jac = (1.0 if not si and not sj else
                   0.0 if not si or not sj else len(si & sj) / len(si | sj))
            if round(jac, 4) >= 0.5:
                exp.add((int(ids[i]), int(ids[j])))
    assert set(zip(got["id_a"].astype(int), got["id_b"].astype(int))) == exp


def test_exact_dedup_rows(ray_session):
    import pyarrow.parquet as pq

    from txiac_qc_ray.pipelines import docs as D

    got = D.exact_dedup_rows(SF).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    exp_ids = set(df.groupby("text")["doc_id"].min())
    assert set(got["doc_id"]) == exp_ids
    assert got["text"].is_unique
    # winners carry their own full payload
    merged = got.merge(df, on="doc_id", suffixes=("", "_orig"))
    assert (merged["text"] == merged["text_orig"]).all()
    assert (merged["n_chars"] == merged["n_chars_orig"]).all()


def test_hex16_matches_format(ray_session):
    from txiac_qc_ray.pipelines.docs import _hex16

    x = np.array([0, 1, 0xDEADBEEF, np.iinfo(np.uint64).max], dtype=np.uint64)
    assert _hex16(x).to_pylist() == [f"{int(v):016x}" for v in x]
    assert _hex16(np.zeros(0, np.uint64)).to_pylist() == []


def test_emb_ndarray_zero_copy_shape(ray_session):
    from txiac_qc_ray.pipelines.docs import emb_ndarray

    lst = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                   type=pa.list_(pa.float32()))
    m = emb_ndarray(lst)
    assert m.shape == (3, 2) and m.dtype == np.float64
    np.testing.assert_array_equal(m, [[1, 2], [3, 4], [5, 6]])
    # sliced (offset != 0) chunked input still reshapes correctly
    sl = lst.slice(1, 2)
    np.testing.assert_array_equal(emb_ndarray(sl), [[3, 4], [5, 6]])


def test_neardup_clusters_distributed_equals_unionfind(ray_session):
    from txiac_qc_ray.pipelines import docs as D

    a = D.neardup_clusters(SF).reset_index(drop=True).astype("int64")
    b = D.neardup_clusters_distributed(SF).astype("int64")
    pd.testing.assert_frame_equal(a, b)


def test_ann_ivf_indexed_equals_bruteforce(ray_session, tmp_path):
    """Partitioned-index IVF (path-pruned probed-list reads) is exact and
    idempotent against a cached index."""
    from txiac_qc_ray.pipelines import docs as D

    idx = str(tmp_path / "ivf_index")
    bf = D.ann_topk_bruteforce(SF)
    a = D.ann_topk_ivf_indexed(SF, index_dir=idx)
    b = D.ann_topk_ivf_indexed(SF, index_dir=idx)  # cache hit path
    assert _key(a) == _key(bf) and _key(b) == _key(bf)
    import glob, os

    parts = glob.glob(os.path.join(idx, "list_id=*"))
    assert len(parts) >= 2  # real hive partitioning on disk


def test_exact_dedup_losers_with_real_duplicates(ray_session, tmp_path):
    """Losers = complement of winners within duplicate groups (the
    broadcast-safe drop side of prep_corpus)."""
    import os

    import pyarrow.parquet as pq

    from txiac_qc_ray.pipelines import docs as D

    t = pa.table({
        "doc_id": pa.array([5, 1, 2, 3, 4, 0], pa.int64()),
        "text": pa.array(["x", "x", "y", "y", "y", "z"]),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["s"] * 6),
        "n_chars": pa.array([1] * 6, pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    losers = D.exact_dedup_losers(d)
    assert list(losers["doc_id"]) == [3, 4, 5]
    winners = D.exact_dedup_rows(d).to_pandas()
    assert set(winners["doc_id"]) | set(losers["doc_id"]) == {0, 1, 2, 3, 4, 5}
    assert set(winners["doc_id"]) & set(losers["doc_id"]) == set()


def test_rolling_time_sum_bucket_invariance(ray_session):
    """The bucketed time-window stitch must be invariant to bucket size
    (6h == 12h == 48h buckets for a 6h window)."""
    from txiac_qc_ray.pipelines import windows as W

    def run(bh):
        return (W.rolling_time_sum_cents(SF, window_hours=6, bucket_hours=bh)
                .to_pandas().sort_values("event_id", ignore_index=True))

    a, b, c = run(6), run(12), run(48)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_minhash_verify_paths_identical(ray_session):
    """The broadcast fast path and the beyond-bound join path of the
    worker-side Jaccard verify must return identical pairs (the bound
    is a perf switch, never a semantics switch)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from txiac_qc_ray.pipelines import docs as D

    sf = "/root/testdata/sf0.001"
    docs = D._read(sf, "documents", ["doc_id"]).to_pandas()
    ids = docs["doc_id"].to_numpy()[:40].astype(np.int64)
    pairs_pd = pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
    pairs = ray.data.from_arrow(pa.Table.from_pandas(pairs_pd, preserve_index=False))
    cand = np.unique(pairs_pd.to_numpy().ravel())
    fast = D._verify_pairs_jaccard(sf, pairs, cand)  # broadcast path
    slow = D._verify_pairs_jaccard(sf, pairs, cand, broadcast_max=0)  # join path
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(fast.sort_values(key, ignore_index=True),
                                  slow.sort_values(key, ignore_index=True))
    assert len(fast) == len(pairs_pd)


def test_decontaminate_bloom_equals_exact(ray_session):
    """The bloom variant must return byte-identical results to the exact
    broadcast path (no false negatives in a Bloom filter; every
    candidate exact-verified)."""
    import pandas as pd

    from txiac_qc_ray.pipelines import docs as D

    sf = "/root/testdata/sf0.001"
    a = D.decontaminate_against(sf).to_pandas().sort_values("doc_id", ignore_index=True)
    b = D.decontaminate_bloom(sf).to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["contaminated"].any()


def test_append_ivf_index_incremental_equals_full(ray_session, tmp_path):
    """IVF maintenance: build the index on HALF the corpus, append the
    other half as a new partition — queries over the grown index must
    equal brute force over the full corpus (append keeps the
    triangle-inequality bounds valid: r_max folds by max, counts by
    sum), and the sidecar counts must sum to the full corpus."""
    import json
    import os

    import pyarrow.parquet as pq

    from txiac_qc_ray.pipelines import docs as D

    full = pq.read_table(f"{SF}/embeddings.parquet")
    vid = np.asarray(full["vec_id"])
    n_queries = 4
    # partition A: queries + even corpus ids (training centroids see
    # only half the data); partition B: odd corpus ids
    in_a = (vid < n_queries) | (vid % 2 == 0)
    for name, mask in (("a", in_a), ("b", ~in_a)):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(full.filter(pa.array(mask)),
                       str(d / "embeddings.parquet"))

    idx = str(tmp_path / "ivf_grown")
    D.build_ivf_index(str(tmp_path / "a"), idx, n_queries=n_queries)
    meta0 = json.load(open(os.path.join(idx, "_ivf_meta.json")))
    meta1 = D.append_ivf_index(str(tmp_path / "b"), idx)
    assert meta1["centroids"] == meta0["centroids"]  # frozen
    n_corpus = int((vid >= n_queries).sum())
    assert sum(meta1["counts"]) == n_corpus
    assert all(new >= old for new, old in zip(meta1["r_max"], meta0["r_max"]))

    got = D.ann_topk_ivf_indexed(SF, n_queries=n_queries, index_dir=idx)
    assert _key(got) == _key(D.ann_topk_bruteforce(SF, n_queries=n_queries))


def test_cc_pointer_jump_deep_chain(ray_session):
    """Pointer doubling on a 24-node chain (the worst-case deep
    component min-label propagation faces): same labels, O(log d)
    rounds instead of O(d)."""
    from txiac_qc_ray.pipelines.docs import _cc_min_label

    n = 16
    src = np.concatenate([np.arange(n - 1), np.arange(1, n)]).astype(np.int64)
    dst = np.concatenate([np.arange(1, n), np.arange(n - 1)]).astype(np.int64)
    edges = pd.DataFrame({"src": src, "dst": dst})

    # single_task_max_rows=0 forces the DISTRIBUTED rounds (this test
    # pins round counts; the default-path fast task reports 1 round)
    plain, r_plain = _cc_min_label(edges, max_iters=64,
                                   single_task_max_rows=0)
    jumped, r_jump = _cc_min_label(edges, max_iters=64, pointer_jump=True,
                                   single_task_max_rows=0)
    assert (plain["label"] == 0).all() and (jumped["label"] == 0).all()
    pd.testing.assert_frame_equal(
        plain.sort_values("node", ignore_index=True),
        jumped.sort_values("node", ignore_index=True))
    assert r_plain >= n - 2          # one hop per round
    assert r_jump <= 7               # frontier doubles per round
    # the default single-task fast path: identical labels, 1 round
    fast, r_fast = _cc_min_label(edges, max_iters=64)
    pd.testing.assert_frame_equal(
        fast.sort_values("node", ignore_index=True),
        plain.sort_values("node", ignore_index=True))
    assert r_fast == 1


def test_chunk_for_training_semantics(ray_session, tmp_path):
    """Concat-and-chunk packing vs a brute-force reference: sparse,
    UNSORTED doc_ids (exercises the doc_id-range bucketing + local sort),
    zero-token and null docs (skipped but never shifting the stream),
    spans partition each doc's tokens, every chunk holds exactly
    context_len tokens except the last."""
    import os

    import pyarrow.parquet as pq

    from txiac_qc_ray.pipelines.docs import chunk_for_training

    d = str(tmp_path)
    ids = [50, 3, 100, 7, 10, 42]
    texts = ["e " * 7, "a b c", None, "", "d " * 10, "f g"]
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   os.path.join(d, "documents.parquet"))
    C = 4
    got = (chunk_for_training(d, context_len=C).to_pandas()
           .sort_values(["doc_id", "chunk_id"], ignore_index=True))

    # brute force: lay tokens end-to-end in doc_id order
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    rows, off = [], 0
    for i in order:
        nt = len((texts[i] or "").split())
        if nt == 0:
            continue
        for cid in range(off // C, (off + nt - 1) // C + 1):
            rows.append((ids[i], cid, max(cid * C - off, 0),
                         min((cid + 1) * C - off, nt)))
        off += nt
    exp = pd.DataFrame(rows, columns=["doc_id", "chunk_id",
                                      "tok_start", "tok_end"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # spans partition each doc's tokens
    per_doc = got.groupby("doc_id").apply(
        lambda g: (g["tok_end"] - g["tok_start"]).sum())
    assert per_doc.to_dict() == {3: 3, 10: 10, 42: 2, 50: 7}  # 7/100: 0 tok
    # every chunk carries exactly C tokens except the final one
    load = (got["tok_end"] - got["tok_start"]).groupby(got["chunk_id"]).sum()
    assert (load.iloc[:-1] == C).all() and load.iloc[-1] <= C


def test_chunk_for_training_layout_invariance(ray_session, tmp_path):
    """The global token offsets (and so every chunk span) must not
    depend on how the corpus is sharded into files or batched."""
    import os

    import pyarrow.parquet as pq

    from txiac_qc_ray.pipelines.docs import chunk_for_training

    rng = np.random.default_rng(7)
    n = 300
    ids = rng.permutation(np.arange(0, 5 * n, 5, dtype=np.int64))  # sparse
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(0, 40, n)]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})

    one = str(tmp_path / "one"); os.makedirs(one)
    pq.write_table(t, os.path.join(one, "documents.parquet"))
    # same rows split across three row groups in a different row order
    many = str(tmp_path / "many"); os.makedirs(many)
    perm = rng.permutation(n)
    pq.write_table(t.take(perm), os.path.join(many, "documents.parquet"),
                   row_group_size=n // 3)

    def run(d):
        return (chunk_for_training(d, context_len=32).to_pandas()
                .sort_values(["doc_id", "chunk_id"], ignore_index=True))

    pd.testing.assert_frame_equal(run(one), run(many))


def test_vocab_topk_cms_matches_exact(ray_session, tmp_path):
    """The count-min scale twin must (a) never underestimate, (b) agree
    with the exact vocab_topk on the fixture's top-k set, and (c) have
    exact counts here (vocab << 2^w_bits makes collisions negligible —
    if one ever lands, the >= bound still holds and (b)/(c) localize it)."""
    import os

    import pyarrow.parquet as pq

    from txiac_qc_ray.pipelines import docs as D

    exact = D.vocab_topk(SF, k=15)
    approx = D.vocab_topk_cms(SF, k=15)
    assert list(approx["tok"]) == list(exact["tok"])
    assert (approx["cnt_approx"].to_numpy()
            >= exact["cnt"].to_numpy()).all()
    assert (approx["cnt_approx"].to_numpy()
            == exact["cnt"].to_numpy()).all()
    # empty corpus -> typed empty
    t = pq.read_table(f"{SF}/documents.parquet").schema.empty_table()
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = D.vocab_topk_cms(d)
    assert len(out) == 0 and list(out.columns) == ["tok", "cnt_approx"]


def test_jsonl_gz_source_equals_plain(ray_session, tmp_path):
    """Gzipped line-JSON (the shipping format of web corpora) must parse
    identically to the plain file through the same reader, and a MIXED
    plain+gz list (a directory mid-recompression) must read every row —
    Ray detects the codec per file."""
    import gzip
    import os
    import shutil

    from txiac_qc_ray.sources.jsonl import read_docs_jsonl

    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "docs_sample.jsonl")
    gz = str(tmp_path / "docs_sample.jsonl.gz")
    with open(src, "rb") as f, gzip.open(gz, "wb") as g:
        shutil.copyfileobj(f, g)
    plain = read_docs_jsonl(src).to_pandas()
    packed = read_docs_jsonl(gz).to_pandas()
    pd.testing.assert_frame_equal(plain, packed)
    mixed = read_docs_jsonl([src, gz]).to_pandas()
    assert len(mixed) == 2 * len(plain)


def test_cc_min_label_large_pair_graph(ray_session):
    """VERDICT r4 item 2: the min-label rounds size their partitions
    from the graph, and a large random pair graph (50k nodes, 100k
    undirected edges — far past the old fixed num_partitions=4 scale
    heuristics) still labels every component with its min node,
    matching a driver union-find reference."""
    from txiac_qc_ray.pipelines.docs import _cc_min_label, _cc_num_partitions

    # sizing: bounded per-partition payload, floor 4
    assert _cc_num_partitions(10, 10) == 4
    assert _cc_num_partitions(10_000_000, 3_000_000) == 5
    assert _cc_num_partitions(1, 9_999_999) == 5

    rng = np.random.default_rng(7)
    n, m = 50_000, 50_000
    a = rng.integers(0, n, m).astype(np.int64)
    b = rng.integers(0, n, m).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    edges = pd.DataFrame({"src": np.concatenate([a, b]),
                          "dst": np.concatenate([b, a])})

    labels, _ = _cc_min_label(edges, max_iters=64, pointer_jump=True)

    parent = np.arange(n, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    # min label per component: resolve every node, take min node per root
    roots = np.array([find(i) for i in range(n)])
    import pandas as _pd
    ref = (_pd.DataFrame({"node": np.arange(n), "root": roots})
           .groupby("root")["node"].transform("min"))
    ref_map = dict(zip(np.arange(n), ref.to_numpy()))
    got = dict(zip(labels["node"], labels["label"]))
    touched = np.unique(np.concatenate([a, b]))
    assert all(got[int(t)] == int(ref_map[int(t)]) for t in touched)
    # the distributed rounds (fast path disabled) agree on the same graph
    from txiac_qc_ray.pipelines.docs import _cc_min_label as _cml
    dist, _ = _cml(edges, max_iters=64, pointer_jump=True,
                   single_task_max_rows=0)
    got_d = dict(zip(dist["node"], dist["label"]))
    assert all(got_d[int(t)] == int(ref_map[int(t)]) for t in touched)


def _w(k: int) -> str:
    """Unique 5-letter word (tokens are [a-z]+ runs — digits vanish)."""
    s = ""
    for _ in range(5):
        s += chr(ord("a") + k % 26)
        k //= 26
    return s


def test_prep_corpus_high_dup_rate_no_driver_sets(ray_session, tmp_path):
    """VERDICT r4 item 1: a >=50%-exact-duplicate corpus (the regime
    where the old driver-side Python drop sets were O(corpus)) runs the
    prep composite through the sharded-actor DropIndex and still
    value-matches the independent DuckDB twin. Near-dups are exact
    copies (jaccard 1.0 — LSH can never miss them) and contamination
    overlaps sit far below the 0.5 jaccard threshold, so the SQL
    all-pairs oracle and the LSH+verify engine agree exactly."""
    import os

    import duckdb
    import pyarrow.parquet as pq

    from txiac_qc_ray.oracles import prep_corpus_sql
    from txiac_qc_ray.pipelines import docs as D

    texts = []
    # 240 unique base docs over disjoint vocabularies, 30 tokens each
    for i in range(240):
        texts.append(" ".join(_w(i * 40 + j) for j in range(30)))
    # 300 exact copies: one of each base doc + a second copy of the
    # first 60 -> 300/570 = 52.6% duplicate rows
    texts += texts[:240] + texts[:60]
    # 20 contaminated docs: an 8-token run lifted from an eval doc
    # (doc_id % 50 == 0 -> 6 shared distinct trigrams >= min_overlap 5)
    # inside 30 otherwise-unique tokens (jaccard ~0.1, far below 0.5)
    for c in range(20):
        ev = (c % 5) * 50  # eval doc ids 0,50,100,150,200
        run = " ".join(_w(ev * 40 + j) for j in range(8))
        own = " ".join(_w(200_000 + c * 40 + j) for j in range(30))
        texts.append(run + " " + own)
    # 10 quality-gate failures: 5 too-short, 5 mean-token-len > 12
    for q in range(5):
        texts.append(_w(300_000 + q) + " " + _w(300_100 + q))
    for q in range(5):
        texts.append(" ".join(_w(310_000 + q * 20 + j) * 7 for j in range(12)))

    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "documents.parquet"))

    # the loser feed really is corpus-scale here (the old set() regime)
    assert D.exact_dedup_losers_ds(d).count() == 300
    assert 300 / n >= 0.5

    got = D.prep_corpus(d)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    exp = (con.execute(prep_corpus_sql()).fetchdf()
           .sort_values("doc_id", ignore_index=True))
    con.close()

    assert len(got) == len(exp)
    for col in ("doc_id", "n_chars", "n_tokens"):
        np.testing.assert_array_equal(got[col].to_numpy().astype(np.int64),
                                      exp[col].to_numpy().astype(np.int64))
    for col in ("lang", "source"):
        assert list(got[col]) == list(exp[col])
    # sanity on the regimes: contaminated + quality-fail + eval rows out
    assert not set(range(240, 540)) & set(got["doc_id"])  # every copy lost


def test_dropindex_membership_roundtrip(ray_session):
    """DropIndex unit contract: exact membership (bloom prefilter +
    sharded actor verify) for int64 ids and for uint64 keys riding as
    their twos-complement int64 view, across multiple add sources."""
    import ray

    from txiac_qc_ray.state.dropindex import DropIndex

    idx = DropIndex(n_shards=3)
    rng = np.random.default_rng(11)
    a = rng.integers(0, 1 << 62, 5000).astype(np.int64)
    # uint64-range keys: the int64 view is negative — must round-trip
    b = (rng.integers(0, 1 << 63, 3000).astype(np.uint64)
         + np.uint64(1 << 63)).astype(np.int64)
    idx.add_ids(a[:2500])
    idx.add_dataset(ray.data.from_arrow(
        pa.table({"doc_id": pa.array(a[2500:], pa.int64())})))
    idx.add_dataset(ray.data.from_arrow(
        pa.table({"key": pa.array(b, pa.int64())})), column="key")
    idx.seal()
    members = np.unique(np.concatenate([a, b]))
    assert idx.size() == len(members)

    probe = np.concatenate([a[::7], b[::5],
                            rng.integers(0, 1 << 62, 4000).astype(np.int64)])
    got = idx.contains(probe)
    exp = np.isin(probe, members)
    np.testing.assert_array_equal(got, exp)
    # empty probe and all-miss probe
    assert idx.contains(np.empty(0, dtype=np.int64)).shape == (0,)
    assert not idx.contains(np.array([-12345], dtype=np.int64)).any()


def test_embed_docs_tasks_equals_actors(ray_session):
    """The actor-pool embedder (state in __init__) and the stateless
    task form must produce identical embeddings."""
    from txiac_qc_ray.pipelines.docs import embed_docs

    a = (embed_docs(SF, mode="tasks").to_pandas()
         .sort_values("doc_id", ignore_index=True))
    b = (embed_docs(SF, mode="actors").to_pandas()
         .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["doc_id"] + [f"e{j}" for j in range(16)]


def test_ann_from_text_matches_single_process_reference(ray_session):
    """End-to-end text -> embedding -> ANN: the fused streamed pipeline
    must equal a single-process reference computed straight from the
    raw text (tokens -> mix64(fnv) signs -> int sums -> cosine top-k),
    proving the whole composition, not just the embedding stage."""
    import pyarrow.parquet as pq

    from txiac_qc_ray.functions.urls import fnv1a64
    from txiac_qc_ray.pipelines.docs import (_EMBED_DIM, _mix64,
                                             ann_topk_from_text)
    from txiac_qc_ray.functions import textstats as ts

    got = ann_topk_from_text(SF, k=5, query_mod=50)

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    tv = ts.tokenize(t["text"])
    mixed = _mix64(fnv1a64(tv.dictionary))
    bits = ((mixed[:, None] >> np.arange(_EMBED_DIM, dtype=np.uint64)) &
            np.uint64(1)).astype(np.int64)
    per_tok = (bits * 2 - 1)[tv.ids]
    ids = np.asarray(t["doc_id"])
    emb = np.zeros((len(ids), _EMBED_DIM), dtype=np.int64)
    for j in range(_EMBED_DIM):
        emb[:, j] = ts.seg_sum(per_tok[:, j].astype(np.float64),
                               tv.offsets).astype(np.int64)
    n2 = np.sum(emb * emb, axis=1)
    is_q = (ids % 50 == 0) & (n2 > 0)
    is_c = (ids % 50 != 0) & (n2 > 0)
    rows = []
    for qi in np.nonzero(is_q)[0][np.argsort(ids[is_q])]:
        dots = (emb[qi] @ emb[is_c].T).astype(np.float64)
        sims = dots / np.sqrt((n2[qi] * n2[is_c]).astype(np.float64))
        cid = ids[is_c]
        order = np.lexsort((cid, -sims))[:5]
        for o in order:
            rows.append((int(ids[qi]), int(cid[o]), sims[o]))
    ref = pd.DataFrame(rows, columns=["qid", "nid", "sim"])
    from txiac_qc_ray.pipelines.relational import round_half_away
    ref["sim"] = round_half_away(ref["sim"].to_numpy(), 4)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), ref.reset_index(drop=True))


def test_knn_self_join_ivf_equals_broadcast(ray_session, tmp_path):
    """The IVF scale path of the k-NN self-join is EXACT: byte-equal to
    the broadcast op on the fixture, including with n_probe=1 — the
    adversarial setting where most of each query's true top-k lives
    OUTSIDE its first probed list, so the answer is correct only if the
    phase-2 bound expansion actually fires."""
    from txiac_qc_ray.pipelines import docs as D

    a = (D.knn_self_join(SF).to_pandas()
         .sort_values(["qid", "nid"], ignore_index=True))
    b = (D.knn_self_join_ivf(SF, index_dir=str(tmp_path / "ivf_a"))
         .to_pandas().sort_values(["qid", "nid"], ignore_index=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    c = (D.knn_self_join_ivf(SF, n_probe=1, n_lists=8,
                             index_dir=str(tmp_path / "ivf_b"))
         .to_pandas().sort_values(["qid", "nid"], ignore_index=True))
    pd.testing.assert_frame_equal(a, c, check_dtype=False)


def test_run_pair_indices_matches_triu_reference():
    """The shared LSH-bucket pair expansion (_run_pair_indices) emits
    exactly the pairs the old per-run triu_indices loop did, in the
    same row-major order — fuzzed over random run layouts including
    empty input, all-singleton runs, and one giant run."""
    from txiac_qc_ray.pipelines.docs import _run_pair_indices

    rng = np.random.default_rng(7)
    layouts = [[], [1], [1, 1, 1], [5], [200], [3, 1, 2, 1, 4]]
    layouts += [rng.integers(1, 9, size=rng.integers(1, 40)).tolist()
                for _ in range(50)]
    for lens in layouts:
        key = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        ref_i, ref_j = [], []
        start = 0
        for ln in lens:
            a, b = np.triu_indices(ln, k=1)
            ref_i.append(a + start)
            ref_j.append(b + start)
            start += ln
        ref_i = (np.concatenate(ref_i) if ref_i
                 else np.empty(0, dtype=np.int64))
        ref_j = (np.concatenate(ref_j) if ref_j
                 else np.empty(0, dtype=np.int64))
        got_i, got_j = _run_pair_indices(key)
        np.testing.assert_array_equal(got_i, ref_i)
        np.testing.assert_array_equal(got_j, ref_j)


def test_neardup_keep_best_prefers_quality_over_min_id(ray_session, tmp_path):
    """The representative is the LONGEST member (max n_chars, tie min
    doc_id), not the min-id member — and the DuckDB twin agrees on the
    crafted corpus."""
    import os

    import duckdb
    import pyarrow.parquet as pq

    from txiac_qc_ray.oracles import neardup_keep_best_sql
    from txiac_qc_ray.pipelines import docs as D

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu "
            "amber birch cedar dune")
    texts = [base, base, base + " ember flint grove heath",
             "totally unrelated words about nothing shared at all"]
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = D.neardup_keep_best(d)
    assert list(out["cluster_id"]) == [0]
    assert list(out["best_doc_id"]) == [2]   # longest, NOT min id
    assert list(out["cluster_size"]) == [3]
    assert list(out["best_n_chars"]) == [len(texts[2])]
    con = duckdb.connect()
    con.register("documents", t)
    orc = con.execute(neardup_keep_best_sql(0.5)).df()
    pd.testing.assert_frame_equal(
        out.astype("int64"), orc.astype("int64"))
