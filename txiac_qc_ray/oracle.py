"""Frozen single-process oracle (the "reference semantics" implementation).

Plays the role of the reference app's pandas core: one process, one
fully-materialized table, no Ray (SURVEY.md §5.1 golden-fixture parity).
The Ray pipeline must reproduce its outputs exactly — byte-identical
extracted/scrubbed text per url, identical keep/drop labels and
drop_reasons — regardless of batching, actor pools or parallelism.

It deliberately reuses the same pure kernels (textstats/extract/scrub/
rules modules) in ONE batch, so any parity failure isolates a
distribution bug (batch boundaries, actor state, shuffle) rather than a
kernel difference; kernel-level correctness is pinned separately by
hand-computed unit tests (tests/test_textstats.py etc.).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .config import DEFAULT_RULES, RuleSpec
from .stages.extract import extract_text
from .stages.features import compute_features
from .stages.langid import LangIdModel
from .stages.perplexity import UnigramLM
from .stages.rules import apply_rules
from .stages.scrub import scrub_texts
from .functions.urls import host_of_urls


def oracle_label(pages: pa.Table, rules: tuple[RuleSpec, ...] = DEFAULT_RULES) -> pa.Table:
    """pages(url, warc_ts, html, text, lang) -> fully labeled table,
    sorted by url (FIXTURES.md F2 golden schema superset)."""
    texts = pa.array([extract_text(h) for h in pages.column("html").to_pylist()],
                     type=pa.string())
    t = pages.drop_columns(["html"])
    if "text" in t.column_names:
        t = t.drop_columns(["text"])
    t = t.append_column("text", texts)
    t = t.append_column("host", host_of_urls(t.column("url")))

    feats = compute_features(texts)
    for name, arr in feats.items():
        t = t.append_column(name, pa.array(arr, type=pa.float64()))
    preds, scores = LangIdModel().predict(texts)
    t = t.append_column("lang_pred", pa.array(preds, type=pa.string()))
    t = t.append_column("lang_score", pa.array(scores, type=pa.float64()))
    t = t.append_column("ppl", pa.array(UnigramLM().score(texts), type=pa.float64()))
    t = apply_rules(t, rules)

    scrubbed, changed = scrub_texts(t.column("text"))
    keep = pc.fill_null(t.column("keep"), False)
    scrubbed = pc.if_else(keep, scrubbed, pa.scalar(None, type=pa.string()))
    changed = pc.and_(pa.array(changed), keep)
    t = t.append_column("scrubbed_text", scrubbed)
    t = t.append_column("scrubbed", changed)
    return t.sort_by("url")


def oracle_counters(labeled: pa.Table, dims: tuple[str, ...]) -> pd.DataFrame:
    """Per-dimension counters: the reference's outlier-distribution blocks
    (groupby dim on flagged AND all rows + merge, Home.py:456-462) fused
    into one pass: count_all / count_dropped / count_scrubbed per key."""
    df = labeled.select(list(dims) + ["keep", "scrubbed"]).to_pandas()
    out = []
    for dim in dims:
        key = df[dim].astype(object).where(df[dim].notna(), "(null)")
        g = pd.DataFrame({
            "key": key,
            "count_all": 1,
            "count_dropped": (~df["keep"].fillna(False)).astype("int64"),
            "count_scrubbed": df["scrubbed"].fillna(False).astype("int64"),
        }).groupby("key", sort=True).sum().reset_index()
        g.insert(0, "dim", dim)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    return res.sort_values(["dim", "key"], ignore_index=True)
