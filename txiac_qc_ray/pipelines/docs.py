"""Training-data operators over the `documents` and `embeddings` tables:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), and text
analysis (token counts, quality stats, fingerprints, langid).

All hashes are stable pure functions (FNV-1a / splitmix mixing), never
Python's randomized hash(). Each operator documents its partitioning
assumption for the 100 TB path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

from ..functions import textstats as ts
from ..functions.urls import fnv1a64
from .relational import round_half_away, _read


# ---- shingling / hashing helpers -----------------------------------------

def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def token_ngram_hashes(texts: pa.Array, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(flat ngram hashes, offsets per doc) — word n-gram shingles, hashed
    to uint64; n-grams never cross documents."""
    tv = ts.tokenize(texts)
    n_docs = len(tv.offsets) - 1
    counts = np.diff(tv.offsets)
    if len(tv.flat) < n:
        return np.zeros(0, np.uint64), np.zeros(n_docs + 1, np.int64)
    tok_hash = fnv1a64(tv.flat)
    h = np.zeros(len(tok_hash) - n + 1, dtype=np.uint64)
    for k in range(n):
        h ^= _mix64(tok_hash[k : len(tok_hash) - n + 1 + k] + np.uint64(k + 1))
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    valid = doc_of[: len(h)] == doc_of[n - 1 :]
    new_counts = np.maximum(counts - (n - 1), 0)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(new_counts, out=offsets[1:])
    return h[valid], offsets


# ---- exact dedup (SURVEY.md §2.6: groupby(hash).first) -------------------

def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Group documents by exact text content; keep the min doc_id of each
    group (deterministic representative). At scale the groupby key is the
    64-bit content hash (url-hash-partitioned shuffle); equal-hash groups
    are exact-compared only if texts are carried (here: hash is the key)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        h = fnv1a64(t["text"])
        return pa.table({"doc_id": t["doc_id"],
                         "text_hash": h.astype(np.int64)})

    agg = (ds.map_batches(add_hash, batch_format="pyarrow")
             .groupby("text_hash")
             .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")))
    df = agg.to_pandas()[["doc_id", "n_dups"]]
    return df.sort_values("doc_id", ignore_index=True)


# ---- MinHash + LSH near-dup (public scheme: Broder '97 minhash, banding) -

_MINHASH_PERMS = 64
_LSH_BANDS = 16  # 4 rows/band
_MINHASH_SALTS = _mix64(np.arange(1, _MINHASH_PERMS + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def minhash_signatures(texts: pa.Array, n: int = 3) -> np.ndarray:
    """(n_docs, PERMS) uint64 minhash signature matrix (empty docs -> max)."""
    h, offsets = token_ngram_hashes(texts, n)
    n_docs = len(offsets) - 1
    sig = np.full((n_docs, _MINHASH_PERMS), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(h) == 0:
        return sig
    for p in range(_MINHASH_PERMS):
        hp = _mix64(h ^ _MINHASH_SALTS[p])
        mins = np.full(n_docs, np.iinfo(np.uint64).max, dtype=np.uint64)
        np.minimum.at(mins, np.repeat(np.arange(n_docs), np.diff(offsets)), hp)
        sig[:, p] = mins
    return sig


def minhash_lsh_candidates(sf_dir: str, jaccard_threshold: float = 0.5) -> pd.DataFrame:
    """Near-dup pairs via shingle->minhash->band->bucket-groupby->verify
    (the scale path: the only shuffle is groupby(band, band_hash), keyed
    exactly as the ray_guide LSH pattern prescribes)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    _N_SHARDS = 64  # two-level grouping: shuffle on a bounded shard key,
    # then a vectorized within-shard groupby — a per-(band,hash) map_groups
    # would schedule one task per TINY bucket (millions at scale); sharding
    # keeps the shuffle key cardinality fixed while preserving exactness
    # (every (band, band_hash) bucket lands wholly in one shard).

    def explode_bands(t: pa.Table) -> pa.Table:
        sig = minhash_signatures(t["text"])
        ids = np.asarray(t["doc_id"])
        rows_per_band = _MINHASH_PERMS // _LSH_BANDS
        band_ids, band_hashes, doc_ids = [], [], []
        for b in range(_LSH_BANDS):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            bh = np.zeros(len(ids), dtype=np.uint64)
            for c in range(rows_per_band):
                bh = _mix64(bh ^ chunk[:, c])
            band_ids.append(np.full(len(ids), b, dtype=np.int64))
            band_hashes.append(bh.astype(np.int64))
            doc_ids.append(ids)
        band = np.concatenate(band_ids)
        bh = np.concatenate(band_hashes)
        return pa.table({
            "band": band,
            "band_hash": bh,
            "shard": (bh.astype(np.uint64) ^ (band.astype(np.uint64) << np.uint64(56)))
                     % np.uint64(_N_SHARDS),
            "doc_id": np.concatenate(doc_ids),
        })

    bands = ds.map_batches(explode_bands, batch_format="pyarrow")

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-bucket pair expansion within one shard
        g = g.sort_values(["band", "band_hash", "doc_id"], ignore_index=True)
        key = g["band"].to_numpy() * np.int64(1 << 48) + (
            g["band_hash"].to_numpy() & np.int64((1 << 48) - 1))
        ids = g["doc_id"].to_numpy()
        out_a, out_b = [], []
        start = 0
        change = np.nonzero(np.diff(key))[0] + 1
        bounds = np.concatenate([[0], change, [len(key)]])
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            if e - s >= 2:
                a, b = np.triu_indices(e - s, k=1)
                out_a.append(ids[s:e][a])
                out_b.append(ids[s:e][b])
        if not out_a:
            return pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                                 "id_b": np.array([], dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    pairs = bands.groupby("shard").map_groups(
        shard_pairs, batch_format="pandas").to_pandas()
    if len(pairs) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    pairs = pairs.drop_duplicates(ignore_index=True)

    # verify candidates with true n-gram Jaccard (driver-side: candidate
    # set is tiny; at scale this is a broadcast-join map stage)
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
    text_of = dict(zip(docs["doc_id"], docs["text"]))
    sims = [ngram_jaccard(text_of[a], text_of[b]) for a, b in zip(pairs["id_a"], pairs["id_b"])]
    pairs["jaccard"] = round_half_away(np.array(sims), 4)
    out = pairs[pairs["jaccard"] >= jaccard_threshold]
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    ha, _ = token_ngram_hashes(pa.array([a], type=pa.string()), n)
    hb, _ = token_ngram_hashes(pa.array([b], type=pa.string()), n)
    sa, sb = set(ha.tolist()), set(hb.tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ---- SimHash (Charikar '02) ----------------------------------------------

def simhash_64(texts: pa.Array) -> np.ndarray:
    """64-bit SimHash over token unigram hashes (uint64 per doc)."""
    tv = ts.tokenize(texts)
    n_docs = len(tv.offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(tv.flat) == 0:
        return out
    th = fnv1a64(tv.flat)
    doc_of = np.repeat(np.arange(n_docs), np.diff(tv.offsets))
    acc = np.zeros((n_docs, 64), dtype=np.int64)
    for bit in range(64):
        b = ((th >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
        np.add.at(acc[:, bit], doc_of, b)
    bits = (acc > 0).astype(np.uint64)
    for bit in range(64):
        out |= bits[:, bit] << np.uint64(bit)
    return out


def simhash_docs(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        sh = simhash_64(t["text"])
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array([f"{int(x):016x}" for x in sh], type=pa.string())})

    return ds.map_batches(stage, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id", ignore_index=True)


# ---- n-gram Jaccard dedup (all-pairs within same source, small-side) -----

def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.25) -> pd.DataFrame:
    """Pairwise n-gram Jaccard over documents grouped by `source`
    (partitioning assumption: candidate comparisons only within a
    partition key — here `source`; a full cross-product would be
    quadratic and is exactly what MinHash-LSH above avoids)."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", ignore_index=True)
        sigs = [set(token_ngram_hashes(pa.array([t], type=pa.string()))[0].tolist())
                for t in g["text"]]
        ids = g["doc_id"].to_numpy()
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                si, sj = sigs[i], sigs[j]
                if not si or not sj:
                    continue
                jac = len(si & sj) / len(si | sj)
                if jac >= threshold:
                    out_a.append(ids[i]); out_b.append(ids[j]); out_j.append(jac)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b,
                             "jaccard": round_half_away(np.array(out_j, dtype=np.float64), 4) if out_j else []})

    df = ds.groupby("source").map_groups(per_source, batch_format="pandas").to_pandas()
    return df.sort_values(["id_a", "id_b"], ignore_index=True)


# ---- embedding cosine: brute-force top-k + near-dup pairs ----------------

def _embedding_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    ids = t["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    return ids, mat


def ann_topk_bruteforce(sf_dir: str, n_queries: int = 4, k: int = 5) -> pd.DataFrame:
    """Brute-force cosine top-k: query matrix broadcast once (ray.put),
    each batch of the corpus does one numpy matmul against it — the
    baseline ANN path (SURVEY.md 'similarity search')."""
    ids_all, mat_all = _embedding_matrix(sf_dir)
    order = np.argsort(ids_all)
    ids_all, mat_all = ids_all[order], mat_all[order]
    q_ids, q_mat = ids_all[:n_queries], mat_all[:n_queries]
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, qn))

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def stage(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        vid = np.asarray(t["vec_id"])
        m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
        keep = vid >= qi.max() + 1  # corpus = non-query vectors
        if not keep.any():
            return pa.table({"qid": pa.array([], pa.int64()),
                             "nid": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        vid, m = vid[keep], m[keep]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = qm @ mn.T  # (nq, batch)
        nq, nb = sims.shape
        return pa.table({
            "qid": np.repeat(qi, nb),
            "nid": np.tile(vid, nq),
            "sim": sims.reshape(-1),
        })

    allsims = ds.map_batches(stage, batch_format="pyarrow").to_pandas()
    # per-query top-k merge on the driver (k*nq rows) — at scale this is a
    # per-batch partial top-k then a tiny groupby-merge
    out = (allsims.sort_values(["qid", "sim", "nid"], ascending=[True, False, True])
           .groupby("qid", sort=True).head(k).reset_index(drop=True))
    out["sim"] = round_half_away(out["sim"].to_numpy(), 4)
    return out[["qid", "nid", "sim"]]


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, sim >= threshold).
    Fixture-scale: one broadcast matrix, per-batch matmul; scale path:
    LSH bucket on sign-random-projection then within-bucket matmul."""
    ids_all, mat_all = _embedding_matrix(sf_dir)
    order = np.argsort(ids_all)
    ids_all, mat_all = ids_all[order], mat_all[order]
    norm = mat_all / np.linalg.norm(mat_all, axis=1, keepdims=True)
    ref = ray.put((ids_all, norm))

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def stage(t: pa.Table) -> pa.Table:
        aid, an = ray.get(ref)
        vid = np.asarray(t["vec_id"])
        m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ an.T  # (batch, all)
        bi, aj = np.nonzero((sims >= threshold) & (vid[:, None] < aid[None, :]))
        return pa.table({
            "id_a": vid[bi],
            "id_b": aid[aj],
            "sim": sims[bi, aj],
        })

    df = ds.map_batches(stage, batch_format="pyarrow").to_pandas()
    if df.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "sim": pd.Series([], dtype="float64")})
    df["sim"] = round_half_away(df["sim"].to_numpy(), 4)
    return df.sort_values(["id_a", "id_b"], ignore_index=True)


def ann_topk_lsh(sf_dir: str, n_queries: int = 4, k: int = 5,
                 n_planes: int = 8, n_tables: int = 12) -> pd.DataFrame:
    """Multi-table sign-random-projection LSH ANN: L independent tables of
    b hyperplane sign bits; each query unions candidates from its bucket
    and Hamming-1 neighbors in every table, then ranks by true cosine.
    Approximate — recall vs the brute-force baseline is tested; the scale
    path shards tables/buckets across workers (bucket id is the shuffle
    key) so each worker only matmuls its bucket's slice."""
    rng = np.random.default_rng(12345)  # frozen projection planes
    ids_all, mat_all = _embedding_matrix(sf_dir)
    order = np.argsort(ids_all)
    ids_all, mat_all = ids_all[order], mat_all[order]
    planes = rng.normal(size=(n_tables, n_planes, mat_all.shape[1]))
    q_ids, q_mat = ids_all[:n_queries], mat_all[:n_queries]
    corpus_mask = ids_all >= q_ids.max() + 1
    c_ids, c_mat = ids_all[corpus_mask], mat_all[corpus_mask]
    c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
    shifts = (np.uint32(1) << np.arange(n_planes, dtype=np.uint32))

    tables: list[dict[int, np.ndarray]] = []
    for t in range(n_tables):
        sig = ((c_mat @ planes[t].T) > 0).astype(np.uint32) @ shifts
        tables.append({int(b): np.nonzero(sig == b)[0] for b in np.unique(sig)})

    out_q, out_n, out_s = [], [], []
    for qi, qv in zip(q_ids, q_mat):
        cand_parts = []
        for t in range(n_tables):
            sig = int(((planes[t] @ qv) > 0).astype(np.uint32) @ shifts)
            for p in [sig] + [sig ^ (1 << b) for b in range(n_planes)]:
                hit = tables[t].get(p)
                if hit is not None:
                    cand_parts.append(hit)
        if not cand_parts:
            continue
        cand = np.unique(np.concatenate(cand_parts))
        qn = qv / np.linalg.norm(qv)
        sims = c_norm[cand] @ qn
        top = np.argsort(-sims, kind="stable")[:k]
        out_q.extend([qi] * len(top))
        out_n.extend(c_ids[cand][top].tolist())
        out_s.extend(sims[top].tolist())
    return pd.DataFrame({"qid": out_q, "nid": out_n,
                         "sim": round_half_away(np.array(out_s), 4) if out_s else []})


# ---- text analysis -------------------------------------------------------

def token_counts_docs(sf_dir: str) -> ray.data.Dataset:
    """Whitespace token count per doc (vectorized RE2 count)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], r"\S+")
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(stage, batch_format="pyarrow")


def quality_stats_docs(sf_dir: str) -> ray.data.Dataset:
    """Simple quality stats: chars, tokens, mean token length (exact
    integer arithmetic -> bitwise-stable division)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        n_tok = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        alpha = pc.cast(pc.utf8_length(pc.replace_substring(t["text"], " ", "")), pa.int64())
        # unrounded: int/int double division is bitwise-equal to the SQL
        mean_len = pc.divide(pc.cast(alpha, pa.float64()), pc.cast(n_tok, pa.float64()))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tok,
            "mean_tok_len": mean_len,
        })

    return ds.map_batches(stage, batch_format="pyarrow")


def fingerprint_docs(sf_dir: str) -> pd.DataFrame:
    """Rolling-hash document fingerprint: min-3 winnowed hashes of word
    5-grams, hex-joined (stable content signature)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        h, offsets = token_ngram_hashes(t["text"], n=5)
        fps = []
        for i in range(len(offsets) - 1):
            seg = h[offsets[i]:offsets[i + 1]]
            if len(seg) == 0:
                fps.append("")
                continue
            mins = np.sort(seg)[:3]
            fps.append("-".join(f"{int(x):016x}" for x in mins))
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pa.array(fps, type=pa.string())})

    return ds.map_batches(stage, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id", ignore_index=True)


def langid_docs(sf_dir: str) -> pd.DataFrame:
    """LangId over the documents table (actor-pool stage; model loaded
    once per actor)."""
    from ..stages.langid import LangIdStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(LangIdStage, batch_format="pyarrow",
                         concurrency=(1, 2), num_cpus=1)
    df = out.select_columns(["doc_id", "lang_pred"]).to_pandas()
    return df.sort_values("doc_id", ignore_index=True)


# ---- near-dup clusters: connected components over LSH pairs --------------

def neardup_clusters(sf_dir: str, jaccard_threshold: float = 0.5) -> pd.DataFrame:
    """Group near-duplicate documents into clusters: MinHash-LSH candidate
    pairs -> union-find on the driver (candidate set is tiny after LSH;
    at 10^12 docs the scale path is iterative min-label propagation —
    repeat `groupby(label).min()` joins until fixpoint — with the SAME
    pair input). Returns (doc_id, cluster_id=min doc_id of component)
    for docs that belong to a multi-doc cluster."""
    pairs = minhash_lsh_candidates(sf_dir, jaccard_threshold)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        union(int(a), int(b))
    rows = sorted({int(x) for x in pairs[["id_a", "id_b"]].to_numpy().ravel()})
    return pd.DataFrame({"doc_id": rows,
                         "cluster_id": [find(x) for x in rows]})


# ---- IVF ANN (inverted-file index over deterministic k-means) ------------

def _kmeans_deterministic(x: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Tiny deterministic k-means (k-means|| would be the at-scale choice;
    here: centroids seeded by evenly-strided sorted-norm picks, Lloyd
    iterations, all pure numpy, no RNG) -> (k, d) centroids."""
    order = np.argsort(np.linalg.norm(x, axis=1), kind="stable")
    cent = x[order[np.linspace(0, len(x) - 1, k).astype(int)]].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for c in range(k):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(0)
    return cent


def ann_topk_ivf(sf_dir: str, n_queries: int = 4, k: int = 5,
                 n_lists: int = 16, n_probe: int = 4) -> pd.DataFrame:
    """IVF ANN: corpus vectors partitioned into `n_lists` inverted lists by
    nearest centroid (the at-scale shuffle key); each query scans only its
    `n_probe` nearest lists. Approximate; recall vs ann_topk_bruteforce is
    tested. -> (qid, nid, sim), same schema as the brute-force baseline."""
    ids_all, mat_all = _embedding_matrix(sf_dir)
    order = np.argsort(ids_all)
    ids_all, mat_all = ids_all[order], mat_all[order]
    q_ids, q_mat = ids_all[:n_queries], mat_all[:n_queries]
    corpus_mask = ids_all >= q_ids.max() + 1
    c_ids, c_mat = ids_all[corpus_mask], mat_all[corpus_mask]
    c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)

    cent = _kmeans_deterministic(c_norm, n_lists)
    d2 = ((c_norm[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    lists = d2.argmin(1)

    out_q, out_n, out_s = [], [], []
    for qi, qv in zip(q_ids, q_mat):
        qn = qv / np.linalg.norm(qv)
        probe = np.argsort(((cent - qn) ** 2).sum(1), kind="stable")[:n_probe]
        cand = np.nonzero(np.isin(lists, probe))[0]
        if len(cand) == 0:
            continue
        sims = c_norm[cand] @ qn
        top = np.argsort(-sims, kind="stable")[:k]
        out_q.extend([qi] * len(top))
        out_n.extend(c_ids[cand][top].tolist())
        out_s.extend(sims[top].tolist())
    return pd.DataFrame({"qid": out_q, "nid": out_n,
                         "sim": round_half_away(np.array(out_s), 4) if out_s else []})
