"""Frozen-BPE subword tokenizer (VERDICT r4 missing #1): the three
implementations of the one SPEC — vectorized engine, per-word reference,
staged-REPLACE SQL twin — must agree, and the frozen merge table must be
exactly what the deterministic trainer produces."""

import numpy as np
import pyarrow as pa
import pytest


def test_frozen_merges_match_trainer():
    """Re-running scripts/freeze_bpe.py must be byte-identical to the
    committed table (determinism + provenance pin)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import freeze_bpe

    frozen = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "txiac_qc_ray", "data",
        "bpe_merges.py")).read()
    assert freeze_bpe.merges_source() == frozen


def test_merges_are_well_formed():
    """Every merge part is a char or an EARLIER merge's output — the
    invariant that makes rank-order single-pass application equal the
    classic lowest-rank-first loop (functions.bpe docstring)."""
    from txiac_qc_ray.functions.bpe import frozen_merges

    merges = frozen_merges()
    assert len(merges) == 128
    known = {chr(ord("a") + i) for i in range(26)}
    for x, y in merges:
        assert x in known and y in known, (x, y)
        known.add(x + y)


def test_engine_matches_reference_fuzz():
    """400 random words (skewed toward repeated-char runs, the overlap
    edge case) + pathological fixtures: vectorized engine == per-word
    reference, batched any way."""
    import re

    from txiac_qc_ray.functions.bpe import (bpe_apply_reference,
                                            bpe_subword_counts,
                                            frozen_merges)

    merges = frozen_merges()
    rng = np.random.default_rng(5)
    words = []
    for _ in range(400):
        n = int(rng.integers(1, 14))
        alpha = "abcdefghijklmnopqrstuvwxyz"[: int(rng.integers(2, 27))]
        words.append("".join(rng.choice(list(alpha), n)))
    words += ["aaaaaaa", "thththth", "thethethethe", "a", "zz",
              "ingionatreth", "x" * 40]
    texts = [" ".join(words[i::7]) for i in range(7)]
    texts += [None, "", "  ", "42 !?", "The THEME, obviously."]

    eng = bpe_subword_counts(pa.array(texts, pa.string()))
    ref = []
    for t in texts:
        ws = re.findall(r"[a-z]+", t.lower()) if t else []
        ref.append(sum(len(bpe_apply_reference(w, merges)) for w in ws))
    assert eng.tolist() == ref

    # batch-layout invariance: one doc at a time == all at once
    singles = [int(bpe_subword_counts(pa.array([t], pa.string()))[0])
               for t in texts]
    assert singles == ref


def test_sql_twin_matches_reference():
    """The staged-REPLACE SQL computes the SPEC, including chained
    same-symbol runs (the case a shared-space encoding gets wrong)."""
    import re

    import duckdb
    import pandas as pd

    from txiac_qc_ray.functions.bpe import (bpe_apply_reference,
                                            bpe_ntok_ctes, frozen_merges)

    merges = frozen_merges()
    texts = ["thththth ththth", "aaaa aa a", "the theme of the theater",
             None, "", "mixed 42 CASE!", "qqqqqqqq"]
    ref = []
    for t in texts:
        ws = re.findall(r"[a-z]+", t.lower()) if t else []
        ref.append(sum(len(bpe_apply_reference(w, merges)) for w in ws))
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = con.execute("WITH " + bpe_ntok_ctes()
                      + "\nSELECT n_tokens FROM bpe_ntok ORDER BY doc_id"
                      ).fetchdf()["n_tokens"].tolist()
    con.close()
    assert got == ref


def test_chunk_for_training_bpe_streams_and_budgets(ray_session, tmp_path):
    """chunk_for_training_bpe returns a streaming Dataset whose chunk
    spans partition the SUBWORD stream exactly (every chunk C tokens
    except the last; per-doc spans sum to the doc's subword count)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from txiac_qc_ray.functions.bpe import bpe_subword_counts
    from txiac_qc_ray.pipelines.docs import chunk_for_training_bpe

    texts = [f"the quick brown fox number {'x' * (i % 5)} jumps "
             f"over the lazy dog " * (i % 7 + 1) for i in range(40)]
    t = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 40, pa.string()),
        "source": pa.array(["s"] * 40, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(t, os.path.join(d, "documents.parquet"))

    C = 64
    res = chunk_for_training_bpe(d, context_len=C)
    assert isinstance(res, ray.data.Dataset)
    df = res.to_pandas().sort_values(["doc_id", "chunk_id"],
                                     ignore_index=True)
    counts = bpe_subword_counts(t["text"])
    per_doc = df.groupby("doc_id").apply(
        lambda g: int((g["tok_end"] - g["tok_start"]).sum()),
        include_groups=False)
    for did, total in per_doc.items():
        assert total == counts[did]
    # every chunk holds exactly C tokens except the final partial one
    chunk_tok = df.groupby("chunk_id").apply(
        lambda g: int((g["tok_end"] - g["tok_start"]).sum()),
        include_groups=False).sort_index()
    assert (chunk_tok.iloc[:-1] == C).all()
    assert 0 < chunk_tok.iloc[-1] <= C
