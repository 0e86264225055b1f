"""Distributed drop-id membership index: sharded sorted-array actors
plus a constant-size Bloom prefilter.

This is the scale-safe replacement for driver-side Python drop sets
(VERDICT r4 item 1): at a realistic 20-50% duplicate rate on a 100 TB
corpus the exact-dup/near-dup/contamination loser set is billions of
ids — a driver set() OOMs and a ray.put broadcast ships multi-GB to
every task. Here the ids live SHARDED across actors as sorted int64
arrays (memory distributed, O(|drops|/n_shards) per actor, the same
actor pattern as docs._MinIndexShard), and the only broadcast is an
m-bit Bloom bitmap (2^22 bits = 512 KiB, constant regardless of drop
count). A streamed filter pass probes the bitmap vectorized; only the
bloom-candidate rows — true drops plus the small false-positive rate —
pay an actor round trip, where a sorted searchsorted removes every
false positive. Blooms have no false negatives, so the combined answer
is EXACT.

Used by pipelines.docs._prep_survivors (prep_corpus / prep_to_chunks
drop sets) and the flagship --dedup flow (stages.scoring.mark_dup_losers
accepts a DropIndex in place of the broadcast key array).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_BLOOM_BITS_LOG2 = 22  # 512 KiB bitmap — same constant as docs.decontaminate_bloom
_BLOOM_SALTS = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — INLINED copy of pipelines.docs._mix64
    (identity pinned by tests/test_driver_conditions.py). It must
    not be a worker-side lazy import: this function runs INSIDE
    map_batches tasks, and when the driver imported the repo via a
    sys.path hack (the driver contract) workers cannot `import
    txiac_qc_ray` at call time — cloudpickle by-value registration
    covers the already-loaded function objects, not a fresh module
    import executed on the worker."""
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


@ray.remote
class _MembershipShard:
    """One shard of the index: a SORTED int64 id array. add() buffers
    and compacts amortized (numpy int64 sort is radix; the merge input
    is already-sorted runs — same scheme as docs._MinIndexShard);
    contains() is one searchsorted. Membership adds are idempotent and
    order-independent, so any batch arrival order yields the same
    index."""

    def __init__(self) -> None:
        self._ids = np.empty(0, dtype=np.int64)
        self._pend: list[np.ndarray] = []
        self._pend_n = 0

    def _compact(self) -> None:
        if not self._pend:
            return
        ids = np.unique(np.concatenate([self._ids] + self._pend))
        self._ids = ids
        self._pend, self._pend_n = [], 0

    def add(self, ids: np.ndarray) -> None:
        if len(ids):
            self._pend.append(np.asarray(ids, dtype=np.int64).copy())
            self._pend_n += len(ids)
            if self._pend_n >= max(4096, len(self._ids) // 4):
                self._compact()

    def contains(self, ids: np.ndarray) -> np.ndarray:
        self._compact()
        pos = np.searchsorted(self._ids, ids)
        inb = pos < len(self._ids)
        hit = np.zeros(len(ids), dtype=bool)
        hit[inb] = self._ids[pos[inb]] == ids[inb]
        return hit

    def bloom_partial(self, m: int) -> np.ndarray:
        """This shard's contribution to the global bitmap (m/8 bytes)."""
        self._compact()
        bm = np.zeros(m // 8, dtype=np.uint8)
        h = self._ids.astype(np.uint64)
        for salt in _BLOOM_SALTS:
            pos = (_mix64(h ^ salt) & np.uint64(m - 1)).astype(np.int64)
            np.bitwise_or.at(bm, pos >> 3,
                             (np.uint8(1) << (pos & 7).astype(np.uint8)))
        return bm

    def size(self) -> int:
        self._compact()
        return int(len(self._ids))


class DropIndex:
    """Driver-side handle over the shard actors. Lifecycle:

        idx = DropIndex(n_shards)
        idx.add_dataset(losers_ds, "doc_id")   # any number of sources
        idx.seal()                             # builds + broadcasts the bloom
        ... map_batches(lambda t: ... idx.contains(ids) ...)

    The handle is picklable (actor handles + one ObjectRef), so
    contains() runs inside map_batches tasks; the captured handles keep
    the actors alive for as long as the consuming Dataset plan lives.
    Ids are int64 (uint64 callers view-cast — wraparound is consistent
    as long as add and probe use the same cast)."""

    def __init__(self, n_shards: int = 8,
                 bloom_bits_log2: int = _BLOOM_BITS_LOG2) -> None:
        self.n_shards = int(n_shards)
        self.m = 1 << bloom_bits_log2
        self.actors = [_MembershipShard.remote() for _ in range(self.n_shards)]
        self.bloom_ref = None

    def _shard_of(self, ids: np.ndarray) -> np.ndarray:
        return (_mix64(ids.astype(np.uint64))
                % np.uint64(self.n_shards)).astype(np.int64)

    def add_ids(self, ids: np.ndarray) -> None:
        """Push one array of ids (driver- or worker-side)."""
        ids = np.asarray(ids, dtype=np.int64)
        if not len(ids):
            return
        s = self._shard_of(ids)
        ray.get([self.actors[k].add.remote(ids[s == k]) for k in np.unique(s)])

    def add_dataset(self, ds: "ray.data.Dataset", column: str = "doc_id") -> None:
        """Stream a Dataset of ids into the shards — one map_batches
        push pass with a count() barrier so every id has landed before
        seal(). Zero-column blocks (Ray's empty-groupby artifact) are
        skipped."""
        actors, n, col = self.actors, self.n_shards, column
        shard_of = self._shard_of

        def push(t: pa.Table) -> pa.Table:
            if col in t.column_names and t.num_rows:
                ids = np.asarray(t[col]).astype(np.int64)
                s = shard_of(ids)
                ray.get([actors[k].add.remote(ids[s == k])
                         for k in np.unique(s)])
            return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

        ds.map_batches(push, batch_format="pyarrow").count()

    def seal(self) -> "DropIndex":
        """Fold the shards' bloom partials (n_shards x 512 KiB through
        the driver — constant-bounded) and broadcast the bitmap."""
        parts = ray.get([a.bloom_partial.remote(self.m) for a in self.actors])
        bm = np.zeros(self.m // 8, dtype=np.uint8)
        for p in parts:
            np.bitwise_or(bm, p, out=bm)
        self.bloom_ref = ray.put(bm)
        return self

    def size(self) -> int:
        return int(sum(ray.get([a.size.remote() for a in self.actors])))

    def contains(self, ids: np.ndarray) -> np.ndarray:
        """Exact vectorized membership: bloom probe first (broadcast
        bitmap, zero RPC), actor verify only for the candidates."""
        if self.bloom_ref is None:
            raise RuntimeError("DropIndex.contains before seal() — the "
                               "bloom prefilter is not built yet")
        ids = np.asarray(ids, dtype=np.int64)
        out = np.zeros(len(ids), dtype=bool)
        if not len(ids):
            return out
        bm = ray.get(self.bloom_ref)
        cand = np.ones(len(ids), dtype=bool)
        h = ids.astype(np.uint64)
        for salt in _BLOOM_SALTS:
            pos = (_mix64(h ^ salt) & np.uint64(self.m - 1)).astype(np.int64)
            cand &= ((bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).astype(bool)
        if not cand.any():
            return out
        ci = np.nonzero(cand)[0]
        cids = ids[ci]
        s = self._shard_of(cids)
        uniq = np.unique(s)
        hits = ray.get([self.actors[k].contains.remote(cids[s == k])
                        for k in uniq])
        for k, hk in zip(uniq, hits):
            out[ci[s == k]] = hk
        return out
