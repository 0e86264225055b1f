"""Hand-computed truth tables for the vectorized text-stat kernels."""

import numpy as np
import pyarrow as pa

from txiac_qc_ray.functions import textstats as ts
from txiac_qc_ray.stages.features import compute_features


def arr(*xs):
    return pa.array(list(xs), type=pa.string())


def test_tokenize_basic():
    tv = ts.tokenize(arr("The cat, the hat!", "", None, "a b c"))
    assert ts.token_counts(tv).tolist() == [4, 0, 0, 3]
    assert tv.flat.to_pylist() == ["the", "cat", "the", "hat", "a", "b", "c"]
    assert tv.is_null.tolist() == [False, False, True, False]


def test_count_in_set():
    tv = ts.tokenize(arr("the cat the dog", "dog dog", None))
    stop = pa.array(["the"], type=pa.string())
    assert ts.count_in_set(tv, stop).tolist() == [2, 0, 0]


def test_top_trigram_fraction_repeated_phrase():
    # "a b c" repeated 5x -> 15 words; trigram (a,b,c) occurs 5 times -> 15/15=1.0
    doc = " ".join(["a b c"] * 5)
    out = ts.top_trigram_fraction(ts.tokenize(arr(doc)))
    assert out[0] == 1.0


def test_top_trigram_fraction_unique_words():
    doc = "one two three four five six seven eight nine ten"
    out = ts.top_trigram_fraction(ts.tokenize(arr(doc)))
    # every trigram occurs once -> 3*1/10
    assert abs(out[0] - 0.3) < 1e-12


def test_top_trigram_short_and_null():
    out = ts.top_trigram_fraction(ts.tokenize(arr("a b", None, "")))
    assert np.isnan(out).tolist() == [True, True, True]


def test_trigrams_do_not_cross_docs():
    # doc0 ends with "x y", doc1 starts with "z": the cross trigram (x,y,z)
    # must not count
    out = ts.top_trigram_fraction(ts.tokenize(arr("p q r x y", "z z z z z z")))
    assert abs(out[0] - 3 / 5) < 1e-12  # every in-doc trigram unique
    assert out[1] == 1.0  # (z,z,z) dominates entirely


def test_duplicate_paragraph_fraction():
    out = ts.duplicate_paragraph_fraction(
        arr("A\n\nB\n\nA\n\nB", "A\n\nB", "solo", None)
    )
    assert abs(out[0] - 0.5) < 1e-12
    assert out[1] == 0.0
    assert out[2] == 0.0
    assert np.isnan(out[3])


def test_symbol_char_counts():
    assert ts.symbol_char_counts(arr("a #$% b @", "clean words", None)).tolist() == [4, 0, 0]


def test_features_null_propagation():
    f = compute_features(arr(None, "", "the cat sat on the mat"))
    assert np.isnan(f["n_words"][0]) and np.isnan(f["mean_word_len"][0])
    assert f["n_words"][1] == 0.0
    assert np.isnan(f["stopword_ratio"][1])  # 0 words -> undefined
    assert f["n_words"][2] == 6.0
    assert abs(f["stopword_ratio"][2] - 3 / 6) < 1e-12  # the, on, the
    assert abs(f["mean_word_len"][2] - 17 / 6) < 1e-12


def test_features_batch_invariance():
    """Feature values must not depend on batch boundaries (parallelism-
    invariance property, SURVEY.md §5.4)."""
    docs = arr("the cat sat", "a b c a b c a b c", None, "x y z w", "")
    full = compute_features(docs)
    parts = [compute_features(docs.slice(i, 1)) for i in range(5)]
    for k in full:
        merged = np.concatenate([p[k] for p in parts])
        np.testing.assert_array_equal(full[k], merged)
