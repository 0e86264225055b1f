"""Hypothesis property tests for the frozen kernels: codec round-trips
over arbitrary inputs, hash stability/consistency, resize bounds —
the §5.4 property layer extended to the round-2 additions."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@settings(max_examples=40, deadline=None)
@given(arrays(np.uint8, st.tuples(st.integers(1, 24), st.integers(1, 24),
                                  st.just(3))))
def test_ppm_roundtrip_any_image(img):
    from txiac_qc_ray.stages.multimodal import decode_ppm, encode_ppm

    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


@settings(max_examples=40, deadline=None)
@given(arrays(np.uint8, st.tuples(st.integers(1, 16), st.integers(1, 16),
                                  st.just(3))))
def test_bmp_roundtrip_any_image(img):
    from txiac_qc_ray.stages.multimodal import decode_bmp24, encode_bmp24

    np.testing.assert_array_equal(decode_bmp24(encode_bmp24(img)), img)


@settings(max_examples=40, deadline=None)
@given(arrays(np.int16, st.integers(0, 2048)), st.integers(8000, 48000))
def test_wav_roundtrip_any_samples(samples, rate):
    from txiac_qc_ray.stages.multimodal import decode_wav_pcm16, encode_wav_pcm16

    back, r = decode_wav_pcm16(encode_wav_pcm16(samples, rate))
    assert r == rate
    np.testing.assert_array_equal(back, samples)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="utf-8"), max_size=40),
                max_size=30))
def test_fnv1a64_matches_scalar_reference(texts):
    """Vectorized buffer-walking FNV == a trivially-correct per-string
    loop, for arbitrary unicode including empty strings."""
    from txiac_qc_ray.functions.urls import fnv1a64

    arr = pa.array(texts, type=pa.string())
    got = fnv1a64(arr)

    def scalar_fnv(s: str) -> int:
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) % (1 << 64)
        return h

    exp = np.array([scalar_fnv(s) for s in texts], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="ab c", max_size=60), min_size=1, max_size=20))
def test_dedup_adjacent_tokens_properties(texts):
    """Collapse invariants: output has no adjacent duplicate tokens,
    kept+removed == token count, token multiset order preserved."""
    import ray.data

    from txiac_qc_ray.pipelines import docs as D

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = D.dedup_adjacent_tokens(d).to_pandas().sort_values(
            "doc_id", ignore_index=True)
    for txt, ded, kept, removed in zip(texts, out["text_dedup"],
                                       out["n_kept"], out["n_removed"]):
        toks = txt.split()
        dtoks = ded.split() if ded else []
        assert all(x != y for x, y in zip(dtoks, dtoks[1:]))
        assert kept + removed == len(toks)
        assert kept == len(dtoks)
        # order-preserving collapse: reference scan
        exp = [x for i, x in enumerate(toks) if i == 0 or x != toks[i - 1]]
        assert dtoks == exp


@settings(max_examples=20, deadline=None)
@given(arrays(np.float64, st.tuples(st.integers(2, 40), st.integers(2, 8)),
              elements=st.floats(-1, 1, allow_nan=False)))
def test_sq_dists_matches_broadcast(x):
    from txiac_qc_ray.pipelines.docs import _sq_dists

    cent = x[: max(1, len(x) // 3)]
    exp = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    got = _sq_dists(x, cent)
    np.testing.assert_allclose(got, exp, atol=1e-9)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 13), min_size=1, max_size=5),
       st.integers(0, 3),
       st.data())
def test_all_gram_runs_packed_equals_bruteforce(doc_sizes, vbits, data):
    """The bit-packed one-lexsort n-gram grouping == a per-position
    brute force, for every n in 2..10 at once, across id widths that
    exercise 1..31 ids-per-word packings and multi-doc boundaries.
    Token lengths are a function of the id (the tokenize() invariant
    the charlen representative relies on)."""
    from collections import Counter

    from txiac_qc_ray.pipelines.webtext import _all_gram_runs

    V = [2, 5, 700, 2**40][vbits]
    T = sum(doc_sizes)
    ids = np.array(data.draw(st.lists(
        st.integers(0, V - 1), min_size=T, max_size=T)), dtype=np.int64)
    doc_of = np.repeat(np.arange(len(doc_sizes)),
                       doc_sizes).astype(np.int64)
    uniq = np.unique(ids) if T else np.array([], dtype=np.int64)
    lmap = {int(u): (int(u) % 4) + 1 for u in uniq}
    lens = (np.array([lmap[int(i)] for i in ids], dtype=np.int64)
            if T else np.zeros(0, np.int64))
    ns = (2, 3, 4, 5, 6, 7, 8, 9, 10)
    runs = _all_gram_runs(ids, doc_of, lens, ns)
    cum = np.concatenate([[0], np.cumsum(lens)])
    for n in ns:
        doc_g, cnt, charlen = runs[n]
        got = sorted(zip(doc_g.tolist(), cnt.tolist(), charlen.tolist()))
        c, lg = Counter(), {}
        for i in range(T - n + 1):
            if doc_of[i] == doc_of[i + n - 1]:
                key = (int(doc_of[i]),) + tuple(ids[i:i + n].tolist())
                c[key] += 1
                lg[key] = int(cum[i + n] - cum[i]) + (n - 1)
        exp = sorted((k[0], v, lg[k]) for k, v in c.items())
        assert got == exp, n
