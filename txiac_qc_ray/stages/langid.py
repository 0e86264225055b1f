"""Language identification — a from-scratch, deterministic vocabulary-
profile classifier run as an actor-pool `map_batches` stage (north_star:
"fastText langid ... stateful actor-pool stages"; this is the no-external-
model stand-in: frozen per-language word profiles from vocab.py, trained
from nothing but module constants, bit-reproducible).

Reference analog: the pavement-type categorical gate (pav_filter,
Home.py:143-158) — a per-row categorical decision feeding a filter rule.

Scoring: score(lang) = |{tokens ∈ vocab_lang}| / n_tokens; prediction is
the argmax over LANGID_LANGS in fixed order (deterministic tie-break);
"und" when no score reaches LANGID_MIN_SCORE or the doc has no tokens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import LANGID_LANGS, LANGID_MIN_SCORE, LANGID_UNKNOWN
from ..functions import textstats as ts
from ..vocab import LANG_VOCABS


class LangIdModel:
    """Frozen model; build once per actor (stage __init__)."""

    def __init__(self) -> None:
        self.langs = LANGID_LANGS
        self.value_sets = {
            lang: pa.array(sorted(set(LANG_VOCABS[lang])), type=pa.string())
            for lang in self.langs
        }

    def predict(self, texts: pa.Array, tv: ts.TokenView | None = None) -> tuple[np.ndarray, np.ndarray]:
        """-> (lang_pred: object ndarray of str, lang_score: float64).
        Accepts a shared TokenView (see stages/scoring.py)."""
        tv = tv if tv is not None else ts.tokenize(texts)
        n = ts.token_counts(tv).astype(np.float64)
        scores = np.zeros((len(self.langs), len(n)), dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            for k, lang in enumerate(self.langs):
                hits = ts.count_in_set(tv, self.value_sets[lang]).astype(np.float64)
                scores[k] = np.where(n > 0, hits / n, 0.0)
        best_k = scores.argmax(axis=0)  # first max wins: fixed tie-break
        best = scores[best_k, np.arange(len(n))]
        preds = np.array(self.langs, dtype=object)[best_k]
        unknown = (best < LANGID_MIN_SCORE) | (n == 0)
        preds[unknown] = LANGID_UNKNOWN
        best = best.copy()
        best[tv.is_null] = np.nan
        preds = preds.astype(object)
        preds[tv.is_null] = None
        return preds, best


class LangIdStage:
    """Actor-pool stage: `ds.map_batches(LangIdStage, concurrency=N, ...)`.

    Model construction happens once per actor in __init__ (SURVEY.md §2.3
    ST-new); __call__ scores one Arrow batch.
    """

    def __init__(self) -> None:
        self.model = LangIdModel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = self.model.predict(batch.column("text"))
        batch = batch.append_column("lang_pred", pa.array(preds, type=pa.string()))
        return batch.append_column("lang_score", pa.array(scores, type=pa.float64()))


_MODEL_CACHE: list[LangIdModel] = []


def langid_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of LangIdStage: the frozen model is built
    once per WORKER PROCESS (module-level cache) instead of once per
    actor — same init-amortization, but elastic over all CPUs and no
    actor-pool spin-up cost. Identical output to LangIdStage."""
    if not _MODEL_CACHE:
        _MODEL_CACHE.append(LangIdModel())
    model = _MODEL_CACHE[0]
    preds, scores = model.predict(batch.column("text"))
    batch = batch.append_column("lang_pred", pa.array(preds, type=pa.string()))
    return batch.append_column("lang_score", pa.array(scores, type=pa.float64()))
