"""URL helpers: host extraction and a stable 64-bit url hash.

The url hash is the pipeline's partitioning key (north_rule: url-hash
partitioning) — it must be stable across processes and rounds, so it is
a pure FNV-1a over utf-8 bytes, not Python's randomized hash().
Vectorized via numpy over the Arrow buffers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HOST_RE = r"^[a-z]+://([^/]+)"


def host_of_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Extract the host part of each url (null-safe, vectorized RE2)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    st = pc.extract_regex(urls, pattern=r"^[a-z]+://(?P<host>[^/]+)")
    return pc.struct_field(st, [0])


def fnv1a64(strings: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable FNV-1a 64-bit hash per string (uint64 ndarray).

    Vectorized over the flattened utf-8 byte buffer: processes the k-th
    byte of every string in lockstep (documents have short urls, so the
    loop runs ~len(longest url) iterations, each fully vectorized).
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    filled = pc.fill_null(strings, "")
    arr = filled.cast(pa.large_binary())
    if arr.offset != 0:
        # raw-buffer reads below assume offset 0; a sliced array would
        # silently hash the wrong byte ranges (ADVICE r1) -> rebase
        arr = pa.concat_arrays([arr])  # compacts to offset-0 buffers
    assert arr.offset == 0
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] is not None else np.zeros(0, np.uint8)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1)
    starts, ends = offsets[:-1].copy(), offsets[1:]
    h = np.full(len(arr), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    pos = starts.copy()
    active = pos < ends
    while active.any():
        idx = np.nonzero(active)[0]
        h[idx] = (h[idx] ^ buf[pos[idx]].astype(np.uint64)) * prime
        pos[idx] += 1
        active = pos < ends
    return h


def url_bucket(urls: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Partition id in [0, n_buckets) from the stable url hash."""
    return (fnv1a64(urls) % np.uint64(n_buckets)).astype(np.int64)


def page_row_keys(url_col, ts_col) -> np.ndarray:
    """uint64 row-identity key for the flagship's --dedup drop set:
    fnv1a64 of url + NUL + warc_ts (microseconds). Distinguishes
    recrawls of the same url at different timestamps; rows identical in
    BOTH url and warc_ts are indistinguishable by key and are therefore
    never put in the drop set (see qc.exact_dup_loser_rowkeys) —
    under-drop, never annihilation of every copy. Lives here (not in
    pipelines.qc) so worker-side callers bind it at module level — a
    runtime relative import inside a batch fn breaks under the driver
    contract (see tests/test_driver_conditions.py)."""
    url_s = pc.fill_null(url_col, "")
    ts_s = pc.fill_null(pc.cast(pc.cast(ts_col, pa.int64()), pa.string()), "")
    return fnv1a64(pc.binary_join_element_wise(url_s, ts_s, "\x00"))
