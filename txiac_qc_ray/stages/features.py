"""Heuristic quality-feature stage (reference analog: the diff-feature
derive, Home.py:138-139 — per-configured-item vectorized column math; here
the "items" are Gopher/C4-style web-text heuristics, SURVEY.md §2.2 M1).

Stateless `map_batches` stage, Arrow in / Arrow out, fully vectorized via
functions/textstats.py. Emits the FEATURE_COLUMNS of config.py as float64
plus nothing else — model-based scores (langid, ppl) come from their own
actor-pool stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import textstats as ts
from ..vocab import EN_STOPWORDS

_STOP_SET = pa.array(list(EN_STOPWORDS), type=pa.string())


def compute_features(texts: pa.Array, tv: ts.TokenView | None = None) -> dict[str, np.ndarray]:
    """All heuristic features for a batch of texts (shared with the oracle).

    Pass a precomputed TokenView to share ONE tokenization across the
    feature/langid/perplexity scorers (stages/scoring.py fused stage) —
    tokenize is deterministic, so shared vs per-stage views are identical."""
    tv = tv if tv is not None else ts.tokenize(texts)
    n_words = ts.token_counts(tv).astype(np.float64)
    n_chars = ts.char_counts(texts)
    wchars = ts.total_word_chars(tv)
    stop = ts.count_in_set(tv, _STOP_SET).astype(np.float64)
    sym = ts.symbol_char_counts(texts).astype(np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        mean_word_len = np.where(n_words > 0, wchars / n_words, np.nan)
        stopword_ratio = np.where(n_words > 0, stop / n_words, np.nan)
        symbol_word_ratio = np.where(n_words > 0, sym / n_words, np.nan)
    frac_top_3gram = ts.top_trigram_fraction(tv)
    dup_para_frac = ts.duplicate_paragraph_fraction(texts)
    # null text -> every feature NaN (NaN-propagation, ref Home.py:139)
    for arr in (n_words, mean_word_len, stopword_ratio, symbol_word_ratio,
                frac_top_3gram, dup_para_frac):
        arr[tv.is_null] = np.nan
    return {
        "n_words": n_words,
        "n_chars": n_chars,
        "mean_word_len": mean_word_len,
        "stopword_ratio": stopword_ratio,
        "symbol_word_ratio": symbol_word_ratio,
        "frac_top_3gram": frac_top_3gram,
        "dup_para_frac": dup_para_frac,
    }


def features_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage fn (stateless task)."""
    feats = compute_features(batch.column("text"))
    for name, arr in feats.items():
        batch = batch.append_column(name, pa.array(arr, type=pa.float64()))
    return batch
