"""Freeze the expected `qc_label_documents` output at sf0.01 into a
golden parquet the driver's DuckDB oracle can read.

The golden is computed by a SINGLE-PROCESS composition of the frozen
pure kernels (features/langid/ppl/rules/scrub) over one Arrow table —
no Ray, no batching, no actor pools — so the driver row pins exactly
what the repo's golden-parity tests pin for the pages pipeline: that
DISTRIBUTED execution (block splits, actor pools, ordering) cannot
change a single value. The model kernels themselves are shared with the
pipeline by design (SURVEY.md §5: "shared by the Ray stages and the
single-process golden oracle, so distribution can never change a
value"); algorithmic correctness of the models is separately pinned by
the vocab-classifier SQL oracle (langid) and the rule truth-table tests.

Rerun only on a deliberate semantic change:
    python scripts/freeze_qc_golden.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "golden")


def single_process_qc_label(t: pa.Table) -> pa.Table:
    """Mirror of pipelines.qc.qc_label_documents, one table, no Ray."""
    from txiac_qc_ray.stages.features import compute_features
    from txiac_qc_ray.stages.langid import LangIdModel
    from txiac_qc_ray.stages.perplexity import UnigramLM
    from txiac_qc_ray.stages.rules import apply_rules
    from txiac_qc_ray.stages.scrub import scrub_texts

    url = pc.binary_join_element_wise(
        pa.array(["doc://"] * t.num_rows), pc.cast(t["doc_id"], pa.string()), "")
    t = pa.table({"url": url, "doc_id": t["doc_id"], "host": t["source"],
                  "lang": t["lang"], "text": t["text"]})
    texts = t.column("text").combine_chunks()
    for name, arr in compute_features(texts).items():
        t = t.append_column(name, pa.array(arr, type=pa.float64()))
    preds, scores = LangIdModel().predict(texts)
    t = t.append_column("lang_pred", pa.array(preds, type=pa.string()))
    t = t.append_column("lang_score", pa.array(scores, type=pa.float64()))
    t = t.append_column("ppl", pa.array(UnigramLM().score(texts), type=pa.float64()))
    # two-pass E2 flow, single-process: calibrate the calibratable rules
    # on THIS corpus with the shared derivation (same np.nanpercentile
    # call the Ray pass makes — one formula, no drift)
    import numpy as np

    from txiac_qc_ray.config import DEFAULT_RULES
    from txiac_qc_ray.pipelines.calibrate import (derive_rule_thresholds,
                                                  exact_quantiles_fn)

    feats = sorted({r.feature for r in DEFAULT_RULES
                    if r.calibration in ("percentile", "tukey")})
    vals = {f: np.asarray(t.column(f), dtype=np.float64) for f in feats}
    rules = derive_rule_thresholds(DEFAULT_RULES, exact_quantiles_fn(vals))
    t = apply_rules(t, rules)
    scrubbed, changed = scrub_texts(t.column("text"))
    keep = pc.fill_null(t.column("keep"), False)
    scrubbed = pc.if_else(keep, scrubbed, pa.scalar(None, type=pa.string()))
    changed = pc.and_(pa.array(changed), keep)
    t = t.append_column("scrubbed_text", scrubbed)
    t = t.append_column("scrubbed", changed)
    return t.drop_columns(["rule_flags"]).sort_by("doc_id")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    golden = single_process_qc_label(docs)
    path = os.path.join(OUT, "qc_label_sf0.01.parquet")
    pq.write_table(golden, path)
    print(f"{golden.num_rows} rows, {golden.num_columns} cols -> {path}")


if __name__ == "__main__":
    main()
