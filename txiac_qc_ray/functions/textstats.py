"""Vectorized text-statistics kernels (shared by the Ray stages and the
single-process golden oracle, so distribution can never change a value).

All kernels are pure functions of their inputs: Arrow string array in,
numpy arrays out. No Python loop over rows in any hot path — tokenization
uses `pc.split_pattern_regex` + flattened-list segment arithmetic; n-gram
repetition uses dictionary-encoded token ids + uint64 key sorting.

Semantics mirror the reference's NaN conventions (Home.py:139,340): a
feature that is undefined for a row (no words, null text) is NaN, and NaN
never fires a threshold rule (numpy comparisons with NaN are False — same
as pandas `.loc[abs(diff) >= t]` skipping NaN rows).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# A "word" is a maximal run of ASCII letters in the lowercased text.
_NONWORD_SPLIT = "[^a-z]+"
# Symbol characters for the Gopher-style symbol-to-word ratio.
_SYMBOL_CLASS = r"[#$%&*@!^<>|~+=]"


@dataclass
class TokenView:
    """Flattened tokens of a batch of documents.

    flat[offsets[i]:offsets[i+1]] are the (non-empty, lowercased, alphabetic)
    tokens of document i. `is_null[i]` marks null input text.
    """

    flat: pa.Array  # string array of all tokens, doc-major order
    offsets: np.ndarray  # int64, len n_docs+1
    is_null: np.ndarray  # bool, len n_docs
    # dictionary encoding of `flat`, computed once in tokenize(): all set
    # lookups (stopwords, langid vocabs, LM vocab) run over the SMALL
    # dictionary and are gathered back through `ids` — one O(tokens) pass
    # total instead of one per lookup.
    ids: np.ndarray | None = None  # int64 index into dictionary, per token
    dictionary: pa.Array | None = None  # unique token strings


def seg_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-document sum of a per-token array (handles empty segments).

    Uses `np.add.reduceat` over each segment independently — NOT a global
    cumsum — so each document's float sum is bit-identical no matter how
    documents are batched together (parallelism-invariance; a prefix-sum
    difference of two rounded cumulative values would differ by batch).
    """
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float64)
    starts, ends = offsets[:-1], offsets[1:]
    nonempty = ends > starts
    if len(values) and nonempty.any():
        # consecutive non-empty starts tile the value array exactly (empty
        # segments contribute no gap), so reduceat yields per-segment sums
        v = values if values.dtype == np.float64 else values.astype(np.float64)
        out[nonempty] = np.add.reduceat(v, starts[nonempty].astype(np.intp))
    return out


def tokenize(texts: pa.Array) -> TokenView:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    is_null = np.asarray(texts.is_null())
    filled = pc.fill_null(texts, "")
    lower = pc.utf8_lower(filled)
    splits = pc.split_pattern_regex(lower, _NONWORD_SPLIT)
    splits = splits.combine_chunks() if isinstance(splits, pa.ChunkedArray) else splits
    raw_flat = pc.list_flatten(splits)
    raw_offsets = np.asarray(splits.offsets)
    nonempty = np.asarray(pc.not_equal(raw_flat, "").combine_chunks()
                          if isinstance(raw_flat, pa.ChunkedArray)
                          else pc.not_equal(raw_flat, ""))
    # Drop empty tokens, remapping offsets through the cumulative keep-count.
    keep_cum = np.zeros(len(nonempty) + 1, dtype=np.int64)
    np.cumsum(nonempty, out=keep_cum[1:])
    flat = raw_flat.filter(pa.array(nonempty))
    offsets = keep_cum[raw_offsets]
    if len(flat):
        enc = pc.dictionary_encode(flat)
        enc = enc.combine_chunks() if isinstance(enc, pa.ChunkedArray) else enc
        ids = np.asarray(enc.indices).astype(np.int64)
        dictionary = enc.dictionary
    else:
        ids = np.zeros(0, dtype=np.int64)
        dictionary = pa.array([], type=pa.string())
    return TokenView(flat=flat, offsets=offsets, is_null=is_null,
                     ids=ids, dictionary=dictionary)


def token_counts(tv: TokenView) -> np.ndarray:
    return np.diff(tv.offsets).astype(np.int64)


def count_in_set(tv: TokenView, value_set: pa.Array) -> np.ndarray:
    """Per-document count of tokens that are members of `value_set`
    (membership tested once per DICTIONARY entry, gathered per token)."""
    if len(tv.flat) == 0:
        return np.zeros(len(tv.offsets) - 1, dtype=np.int64)
    dict_mask = np.asarray(pc.is_in(tv.dictionary, value_set=value_set))
    mask = dict_mask[tv.ids]
    return seg_sum(mask, tv.offsets).astype(np.int64)


def _mix3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """64-bit mix of three token-id arrays (uint64 in) -> 40-bit key.

    COLLISION TOLERANCE (ADVICE r1, deliberate): the 40-bit truncation
    leaves 24 bits for the doc id in the packed (doc << 40 | key) sort key
    of top_trigram_fraction. Two distinct trigrams within ONE document
    collide with p ~ n_trigrams^2 / 2^41 (< 1e-5 for a 10k-word doc),
    which can only ever INFLATE frac_top_3gram by merging two counts.
    The same function is used by the frozen pandas oracle, so golden
    parity is exact by construction; the feature feeds order-statistics
    thresholds where a <1e-5 perturbation probability is immaterial.
    """
    x = (
        a * np.uint64(0x9E3779B97F4A7C15)
        ^ b * np.uint64(0xC2B2AE3D27D4EB4F)
        ^ c * np.uint64(0x165667B19E3779F9)
    )
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return x & np.uint64((1 << 40) - 1)


def top_trigram_fraction(tv: TokenView) -> np.ndarray:
    """Gopher-style repetition: (3 * count of the most frequent token
    3-gram) / n_words per document; NaN where n_words < 3.

    Trigrams never cross document boundaries. Fully vectorized: token ids
    from dictionary encoding, per-(doc, trigram) counts via uint64 key sort.
    """
    n_docs = len(tv.offsets) - 1
    n_words = np.diff(tv.offsets)
    out = np.full(n_docs, np.nan, dtype=np.float64)
    if len(tv.flat) < 3:
        return out
    ids = tv.ids.astype(np.uint64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.uint64), n_words)
    a, b, c = ids[:-2], ids[1:-1], ids[2:]
    same_doc = doc_of[:-2] == doc_of[2:]
    if not same_doc.any():
        return out
    key = (doc_of[:-2][same_doc] << np.uint64(40)) | _mix3(
        a[same_doc], b[same_doc], c[same_doc]
    )
    uniq, counts = np.unique(key, return_counts=True)
    docs_of_uniq = (uniq >> np.uint64(40)).astype(np.int64)
    top = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(top, docs_of_uniq, counts)
    has = n_words >= 3
    # overlapping occurrences of a self-similar gram can push the raw
    # fraction past 1 ("z z z z"); clip — it means "the whole doc"
    out[has] = np.minimum(3.0 * top[has] / n_words[has], 1.0)
    return out


def duplicate_paragraph_fraction(texts: pa.Array) -> np.ndarray:
    """Fraction of paragraphs (split on blank line) that are exact
    duplicates of an earlier paragraph; 0.0 for <=1 paragraph, NaN for null."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    is_null = np.asarray(texts.is_null())
    filled = pc.fill_null(texts, "")
    paras = pc.split_pattern(filled, "\n\n")
    paras = paras.combine_chunks() if isinstance(paras, pa.ChunkedArray) else paras
    flat = pc.list_flatten(paras)
    offsets = np.asarray(paras.offsets)
    n = np.diff(offsets)
    n_docs = len(n)
    if len(flat) == 0:
        out = np.zeros(n_docs, dtype=np.float64)
        out[is_null] = np.nan
        return out
    ids = np.asarray(pc.dictionary_encode(flat).indices).astype(np.uint64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.uint64), n)
    key = (doc_of << np.uint64(32)) | ids
    n_unique_pairs = len(np.unique(key))
    # unique paragraph count per doc = count of distinct (doc, para) keys
    uniq_keys = np.unique(key)
    docs_of_uniq = (uniq_keys >> np.uint64(32)).astype(np.int64)
    uniq_per_doc = np.bincount(docs_of_uniq, minlength=n_docs)
    out = np.zeros(n_docs, dtype=np.float64)
    multi = n > 1
    out[multi] = 1.0 - uniq_per_doc[multi] / n[multi]
    out[is_null] = np.nan
    del n_unique_pairs
    return out


def symbol_char_counts(texts: pa.Array) -> np.ndarray:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    filled = pc.fill_null(texts, "")
    return np.asarray(pc.count_substring_regex(filled, _SYMBOL_CLASS)).astype(np.int64)


def char_counts(texts: pa.Array) -> np.ndarray:
    """utf8 length per doc; NaN (as float) where null."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    out = np.asarray(pc.utf8_length(pc.fill_null(texts, ""))).astype(np.float64)
    out[np.asarray(texts.is_null())] = np.nan
    return out


def total_word_chars(tv: TokenView) -> np.ndarray:
    if len(tv.flat) == 0:
        return np.zeros(len(tv.offsets) - 1, dtype=np.float64)
    dict_lens = np.asarray(pc.utf8_length(tv.dictionary)).astype(np.float64)
    return seg_sum(dict_lens[tv.ids], tv.offsets)
