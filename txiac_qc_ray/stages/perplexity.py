"""Unigram language-model perplexity — a from-scratch, deterministic
KenLM-style scorer run as an actor-pool `map_batches` stage.

The LM is frozen: unigram probabilities are the exact Zipf weights the
fixture corpus draws English words from (vocab.py + sources/pages.py
``_zipf_cdf``), so scores are bit-reproducible with no external model
download. OOV tokens get a fixed floor log-prob (config.PPL_OOV_LOGP).

    ppl(doc) = exp( -(1/n) * sum_i log p(w_i) ),   NaN when n == 0.

Vectorized: one `pc.index_in` of the batch's flattened tokens into the
frozen vocab, then a segmented mean via cumulative sums — no per-row loop.

Reference analog: the derived per-row measure columns that threshold
rules consume (Home.py:138-139 -> 176-183); `ppl` is one more feature
column with a `gt` rule on it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PPL_OOV_LOGP
from ..functions import textstats as ts
from ..vocab import EN_WORDS


class UnigramLM:
    def __init__(self) -> None:
        # De-duplicate (keeping first occurrence order) then freeze probs.
        seen: dict[str, int] = {}
        for w in EN_WORDS:
            if w not in seen:
                seen[w] = len(seen)
        self.vocab = pa.array(list(seen.keys()), type=pa.string())
        ranks = np.arange(len(seen), dtype=np.float64)
        w = 1.0 / (ranks + 5.0)
        self.logp = np.log(w / w.sum())

    def score(self, texts: pa.Array, tv: ts.TokenView | None = None) -> np.ndarray:
        """Per-document perplexity (float64; NaN for empty/null docs).
        Accepts a shared TokenView (see stages/scoring.py)."""
        tv = tv if tv is not None else ts.tokenize(texts)
        n = ts.token_counts(tv).astype(np.float64)
        out = np.full(len(n), np.nan, dtype=np.float64)
        if len(tv.flat) > 0:
            # vocab lookup once per dictionary entry, gathered per token
            didx = np.asarray(pc.fill_null(pc.index_in(tv.dictionary, value_set=self.vocab), -1))
            dict_logp = np.where(didx >= 0, self.logp[np.clip(didx, 0, None)], PPL_OOV_LOGP)
            tok_logp = dict_logp[tv.ids]
            sums = ts.seg_sum(tok_logp, tv.offsets)
            has = n > 0
            out[has] = np.exp(-sums[has] / n[has])
        out[tv.is_null] = np.nan
        return out


class PerplexityStage:
    """Actor-pool stage: model built once per actor, batches scored in
    __call__ (`ds.map_batches(PerplexityStage, concurrency=N)`)."""

    def __init__(self) -> None:
        self.lm = UnigramLM()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ppl = self.lm.score(batch.column("text"))
        return batch.append_column("ppl", pa.array(ppl, type=pa.float64()))


_LM_CACHE: list[UnigramLM] = []


def perplexity_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of PerplexityStage (process-cached model)."""
    if not _LM_CACHE:
        _LM_CACHE.append(UnigramLM())
    ppl = _LM_CACHE[0].score(batch.column("text"))
    return batch.append_column("ppl", pa.array(ppl, type=pa.float64()))


PPL_COST_SCALE = 1_000_000  # micro-nats: cost(tok) = round(-logp * SCALE)


def quantized_cost_table() -> tuple[pa.Array, np.ndarray, int]:
    """Frozen INTEGER per-token cost table for the CCNet-style bucket op
    (pipelines.docs.ccnet_ppl_buckets): cost = round(-logp * 1e6) int64
    over the UnigramLM vocab; OOV = round(-PPL_OOV_LOGP * 1e6). Integer
    costs make the doc score (= cost sum / token count, ONE int/int
    double division) bit-identical between the Ray engine and the DuckDB
    twin: log/exp run once HERE at freeze time, never per engine — the
    int table itself is the spec, embedded as VALUES in the SQL
    (oracles.ccnet_ppl_buckets_sql). Monotone in the real unigram
    perplexity, so quantile buckets over it are the CCNet buckets."""
    lm = UnigramLM()
    costs = np.rint(-lm.logp * PPL_COST_SCALE).astype(np.int64)
    oov = int(np.rint(-PPL_OOV_LOGP * PPL_COST_SCALE))
    return lm.vocab, costs, oov
