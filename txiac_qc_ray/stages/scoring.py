"""Fused scoring stage: extract -> host -> features + langid + ppl ->
rules -> scrub in ONE map_batches call with ONE tokenization pass.

Functionally identical to composing the individual stages (they all
accept the shared TokenView and use the same deterministic kernels) —
pinned by tests/test_pipeline_parity.py, which runs the composed path
against the oracle, and test_scoring_fused, which runs this fused path
against the composed one.

Why fuse: each separate map_batches re-slices/rebuilds Arrow tables and
re-tokenizes the text; tokenization is ~1/3 of per-doc CPU, so sharing
it cuts the pipeline's hot-path cost ~35% (measured 239 -> ~150 us/doc).
Models live in a per-worker-process cache (built once per process, like
an actor's __init__, but elastic across all CPUs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_RULES, RuleSpec
from ..functions import textstats as ts
from ..functions.urls import host_of_urls, page_row_keys
from .extract import extract_batch
from .features import compute_features
from .langid import LangIdModel
from .perplexity import UnigramLM
from .rules import apply_rules
from .scrub import ScrubStage

_CACHE: dict[str, object] = {}


def _models() -> tuple[LangIdModel, UnigramLM, ScrubStage]:
    if "langid" not in _CACHE:
        _CACHE["langid"] = LangIdModel()
        _CACHE["lm"] = UnigramLM()
        _CACHE["scrub"] = ScrubStage()
    return _CACHE["langid"], _CACHE["lm"], _CACHE["scrub"]  # type: ignore[return-value]


def mark_dup_losers(batch: pa.Table, dup_rowkeys_ref,
                    column: str = "is_dup_loser") -> pa.Table:
    """Append the `column` feature (1.0 when this page's row key —
    url + warc_ts, see qc.page_row_keys — is in the given drop set,
    else 0.0) so a cross-document dedup decision becomes an ordinary
    RuleSpec evaluated by apply_rules — flags, drop_reason and
    rule_flags stay uniform with every other rule. Two callers, two
    columns: the --dedup exact drop set fills `is_dup_loser`
    (config.DEDUP_RULE) and the --neardup MinHash-LSH drop set fills
    `is_neardup_loser` (config.NEARDUP_RULE).

    Two drop-set forms (pytest-pinned identical): an ObjectRef to a
    sorted uint64 key array (broadcast fast path, one searchsorted per
    batch) or a state.dropindex.DropIndex (high-dup-rate path — the
    keys live sharded across actors, the batch probes a 512 KiB bloom
    and pays an actor round trip only for candidates)."""
    import ray

    uh = page_row_keys(batch.column("url"), batch.column("warc_ts"))
    # discriminate on ray.ObjectRef, NOT on the DropIndex class: the
    # driver contract pickles txiac_qc_ray modules BY VALUE, so the
    # worker-side DropIndex class object can be a clone of the one this
    # instance was built from and isinstance would silently miss
    if not isinstance(dup_rowkeys_ref, ray.ObjectRef):
        hit = dup_rowkeys_ref.contains(uh.astype(np.int64))
    else:
        hs = ray.get(dup_rowkeys_ref)
        pos = np.searchsorted(hs, uh)
        inb = pos < len(hs)
        hit = np.zeros(len(uh), dtype=bool)
        hit[inb] = hs[pos[inb]] == uh[inb]
    return batch.append_column(column, pa.array(hit.astype(np.float64)))


def make_qc_batch(rules: tuple[RuleSpec, ...] = DEFAULT_RULES,
                  dup_rowkeys_ref=None,
                  rule_banks: tuple[str, ...] = (),
                  neardup_rowkeys_ref=None):
    """-> a single stateless map_batches fn running the whole QC stack.

    `rule_banks` mirrors PipelineConfig.rule_banks: the caller passes the
    bank-extended rule tuple (cfg.effective_rules()) alongside it."""
    # resolved at BUILD time (driver side) and captured by the closure:
    # a runtime `from ..pipelines...` import inside qc_batch would run
    # on the WORKER, which cannot import the package when the driver
    # loaded the repo via a sys.path hack (driver contract); cloudpickle
    # by-value registration ships function OBJECTS, not import machinery
    if rule_banks:
        from ..pipelines.webtext import bank_features_batch
    else:
        bank_features_batch = None

    def qc_batch(batch: pa.Table) -> pa.Table:
        langid, lm, scrub = _models()
        batch = extract_batch(batch)
        batch = batch.append_column("host", host_of_urls(batch.column("url")))
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        tv = ts.tokenize(texts)  # ONE tokenization, shared by all scorers
        for name, arr in compute_features(texts, tv).items():
            batch = batch.append_column(name, pa.array(arr, type=pa.float64()))
        preds, scores = langid.predict(texts, tv)
        batch = batch.append_column("lang_pred", pa.array(preds, type=pa.string()))
        batch = batch.append_column("lang_score", pa.array(scores, type=pa.float64()))
        batch = batch.append_column("ppl", pa.array(lm.score(texts, tv), type=pa.float64()))
        if dup_rowkeys_ref is not None:
            batch = mark_dup_losers(batch, dup_rowkeys_ref)
        if neardup_rowkeys_ref is not None:
            batch = mark_dup_losers(batch, neardup_rowkeys_ref,
                                    column="is_neardup_loser")
        if rule_banks:
            # share the stage's single tokenization with the banks
            batch = bank_features_batch(batch, rule_banks, tv=tv)
        batch = apply_rules(batch, rules)
        return scrub(batch)

    return qc_batch
