"""Round-5 session-12 ops — each checked against an independent
pure-Python reference (not the DuckDB twin: the local sweep already
runs that)."""

import re
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[a-z]+")


def _toks(text):
    return _TOK.findall((text or "").lower())


def test_pmi_collocations_matches_python_reference(ray_session):
    from txiac_qc_ray.pipelines.docs import pmi_collocations

    df = pq.read_table(SF + "/documents.parquet",
                      columns=["text"]).to_pandas()
    uni: Counter = Counter()
    big: Counter = Counter()
    for t in df["text"]:
        toks = _toks(t)
        uni.update(toks)
        big.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    n = float(sum(uni.values()))
    rows = []
    for g, cab in big.items():
        if cab < 5:
            continue
        a, b = g.split(" ")
        # the SAME fixed float expression tree as both engines
        score = (float(cab) * n) / (float(uni[a]) * float(uni[b]))
        rows.append((g, cab, score))
    rows.sort(key=lambda r: (-r[2], r[0]))
    expected = rows[:20]

    out = pmi_collocations(SF)
    assert len(out) == 20
    got = list(zip(out["gram"], out["cnt"], out["score"]))
    for (eg, ec, es), (gg, gc, gs) in zip(expected, got):
        assert eg == gg and ec == gc
        assert es == gs  # bit-identical: same IEEE expression tree

    # ranking sanity: scores non-increasing, count guard respected
    s = out["score"].to_numpy()
    assert (np.diff(s) <= 0).all()
    assert (out["cnt"].to_numpy() >= 5).all()


def test_anchor_text_corpus_nav_invariant(ray_session):
    """Every valid-html page carries exactly one Home/About/Contact nav
    anchor pointing at its own host, so per host the three nav texts
    must all count exactly the host's page count — independent of the
    decoration (decorated anchors never use nav words)."""
    import __ray_entry__ as E
    from txiac_qc_ray.pipelines.webtext import anchor_text_corpus

    wdir = E._webtext_dir()
    out = anchor_text_corpus(wdir).to_pandas()
    df = pq.read_table(wdir, columns=["url", "html"]).to_pandas()
    df = df[df["html"].notna()]
    pages_per_host = df["url"].str.extract(
        r"^[a-z]+://([^/]+)")[0].value_counts()
    nav = out[out["anchor_text"].isin(["Home", "About", "Contact"])]
    assert set(nav["anchor_text"]) == {"Home", "About", "Contact"}
    for host, grp in nav.groupby("dst_host"):
        assert sorted(grp["n_anchors"]) == [pages_per_host[host]] * 3
    # decorated texts come only from the frozen lexicon
    from txiac_qc_ray.pipelines.webtext import ANCHOR_WORDS
    rest = out[~out["anchor_text"].isin(["Home", "About", "Contact"])]
    assert set(rest["anchor_text"]) <= set(ANCHOR_WORDS)


def test_url_features_gate_semantics(ray_session):
    """Undecorated pages all keep (uniform fixture shape passes every
    axis); each of the four decorations fails exactly its own axis;
    the gate fires on a real fraction of the corpus (flag-rate lesson)."""
    import __ray_entry__ as E
    from txiac_qc_ray.pipelines import webtext as w

    out = w.url_features(E._webtext_dir()).to_pandas()
    base = out[out["url_len"] == 34]  # undecorated
    assert base["keep"].all() and len(base) > 0
    dec = out[out["url_len"] != 34]
    assert 0.2 < len(dec) / len(out) < 0.5  # ~1/3 decorated
    assert not dec["keep"].any()
    # every axis fires somewhere
    assert (dec["path_depth"] > w.URLFEAT_MAX_DEPTH).any()
    assert (dec["n_params"] > w.URLFEAT_MAX_PARAMS).any()
    assert (dec["url_len"] > w.URLFEAT_MAX_LEN).any()
    assert (w.URLFEAT_DIGIT_DEN * dec["n_digits"]
            > w.URLFEAT_DIGIT_NUM * dec["url_len"]).any()


def test_winnow_guarantee_and_python_reference(ray_session):
    """Winnowing property (Schleimer et al. 2003): within any doc with
    >= w grams, every w-window contains a selected position — so the
    gap between consecutive selections is < w. Plus a brute-force
    python reference over the engine's own hash stream."""
    import pyarrow as pa
    from txiac_qc_ray.functions import textstats as ts
    from txiac_qc_ray.pipelines.docs import (_ngram_hashes_tv,
                                             winnow_fingerprints)

    W = 4
    out = winnow_fingerprints(SF, w=W).to_pandas()
    df = pq.read_table(SF + "/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    tv = ts.tokenize(pa.array(df["text"], pa.string()))
    h, offsets, _ = _ngram_hashes_tv(tv, 3)
    by_doc = {d: g.sort_values("pos") for d, g in out.groupby("doc_id")}
    n_checked = 0
    for row_i, doc_id in enumerate(df["doc_id"]):
        grams = h[offsets[row_i]:offsets[row_i + 1]]
        if len(grams) < W:
            assert doc_id not in by_doc
            continue
        # brute-force rightmost-min selection
        sel = set()
        for i in range(len(grams) - W + 1):
            window = grams[i:i + W]
            mn = window.min()
            sel.add(i + max(j for j in range(W) if window[j] == mn))
        got = by_doc[doc_id]
        assert sorted(sel) == list(got["pos"])
        # every w-window holds a selection => consecutive selections
        # are at most w apart (the next window can pick its right edge)
        gaps = np.diff(sorted(sel))
        assert (gaps <= W).all() if len(gaps) else True
        n_checked += 1
    assert n_checked > 400  # the fixture docs are long enough


def test_code_detect_gate_semantics(ray_session):
    """Undecorated prose never trips the gate (the symbol class
    excludes '=' precisely because fixture prose carries url-query
    runs); every decorated page trips it regardless of page length
    (the proportional-repetition property); rate ~ 1/4."""
    import __ray_entry__ as E
    from txiac_qc_ray.pipelines import webtext as w
    import numpy as np
    import pyarrow as pa
    from txiac_qc_ray.pipelines.docs import _mix64
    from txiac_qc_ray.functions.urls import fnv1a64

    out = w.code_detect(E._webtext_dir()).to_pandas()
    h = _mix64(fnv1a64(pa.array(out["url"], pa.string()))
               + np.uint64(w.CODE_SALT))
    decorated = ((h % np.uint64(w.CODE_MOD)) == 0) & (out["n_words"] > 0)
    assert out.loc[decorated, "is_code"].all()
    assert not out.loc[~decorated, "is_code"].any()
    rate = decorated.mean()
    assert 0.15 < rate < 0.35
    assert (out["keep"] == ~out["is_code"]).all()
