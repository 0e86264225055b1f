"""Round-5 session-3 ops: PII audit counts, the frozen-weight linear
quality classifier, the host-reputation gate and language-balanced
sampling — semantic pins on handcrafted corpora + DuckDB-twin equality
(the same twins the driver runs)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from check_oracle import normalize  # noqa: E402

from txiac_qc_ray import oracles as O  # noqa: E402
from txiac_qc_ray.pipelines import docs as D  # noqa: E402
from txiac_qc_ray.pipelines import webtext as W  # noqa: E402

PII_ROWS = [
    ("u0", "clean prose with the usual words and no identifiers at all."),
    ("u1", "mail a.b@c.example and b.c@d.example plus ip 10.0.0.1 end."),
    ("u2", "call (512) 555-0123 or (512) 555-9999 ssn 123-45-6789."),
    ("u3", "that stupid dumb idiot text repeats stupid again."),
    ("u4", None),
    ("u5", ""),
]


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mixing_pages")
    t = pa.table({"url": pa.array([r[0] for r in PII_ROWS]),
                  "text": pa.array([r[1] for r in PII_ROWS],
                                   type=pa.string())})
    pq.write_table(t, os.path.join(str(d), "part-00000.parquet"))
    return str(d)


def _twin_equal(ds, sql, con=None):
    mine = normalize(ds if isinstance(ds, pd.DataFrame) else ds.to_pandas())
    orc = normalize((con or duckdb.connect()).execute(sql).df())
    pd.testing.assert_frame_equal(mine, orc)
    return mine


def test_pii_counts_twin_and_semantics(ray_session, pages_dir):
    out = _twin_equal(W.pii_counts(pages_dir),
                      O.pii_counts_sql(pages_dir + "/*.parquet"))
    by = out.set_index("url")
    assert by.loc["u0", "n_pii_total"] == 0 and not by.loc["u0", "has_pii"]
    assert by.loc["u1", "n_email"] == 2 and by.loc["u1", "n_ipv4"] == 1
    assert by.loc["u2", "n_phone"] == 2 and by.loc["u2", "n_ssn"] == 1
    assert by.loc["u3", "n_toxicity"] == 4  # stupid x2 + dumb + idiot
    # null / empty text -> all-zero counts, has_pii false
    assert by.loc["u4", "n_pii_total"] == 0 and by.loc["u5", "n_pii_total"] == 0
    assert not by.loc["u4", "has_pii"]


def test_quality_classifier_twin_and_semantics(ray_session, tmp_path):
    rows = [
        # clean prose: alpha tokens + stop words clear the 10/word bar
        ("q0", "the quick brown fox jumps over the lazy dog with style."),
        # symbol/digit spam: negative weights sink it
        ("q1", "#### $$$$ %%%% 1234 5678 @@@@ !!!! 9999 0000 ^^^^"),
        # toxicity: one hit costs 200 points
        ("q2", "you stupid thing"),
        ("q3", None),
        ("q4", ""),
    ]
    d = str(tmp_path / "pages")
    os.makedirs(d)
    t = pa.table({"url": pa.array([r[0] for r in rows]),
                  "text": pa.array([r[1] for r in rows], type=pa.string())})
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    out = _twin_equal(W.quality_classifier(d),
                      O.quality_classifier_sql(d + "/*.parquet"))
    by = out.set_index("url")
    assert by.loc["q0", "keep"]
    assert not by.loc["q1", "keep"]   # symbols + digits sink it
    assert not by.loc["q2", "keep"]   # toxicity dominates
    assert not by.loc["q3", "keep"]   # null text: n_words == 0
    assert not by.loc["q4", "keep"]
    # exact integer score on q0: 11 words, all alpha, 3 stop-word hits
    # (the, the, with) -> 12*11 + 40*3 = 252 with the frozen weights
    w = dict(W.QC_WEIGHTS)
    assert by.loc["q0", "n_words"] == 11
    assert by.loc["q0", "quality_score"] == w["alpha"] * 11 + w["stop"] * 3


def test_dedup_lines_within_doc_twin_and_semantics(ray_session, tmp_path):
    rows = [
        ("d0", "nav\nbody one.\nnav\nbody two.\nnav"),
        ("d1", "a\na\na"),
        ("d2", None),
        ("d3", ""),
        ("d4", "unique only\nlines here"),
    ]
    d = str(tmp_path / "pages")
    os.makedirs(d)
    t = pa.table({"url": pa.array([r[0] for r in rows]),
                  "text": pa.array([r[1] for r in rows], type=pa.string())})
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    out = _twin_equal(W.dedup_lines_within_doc(d),
                      O.dedup_lines_within_doc_sql(d + "/*.parquet"))
    by = out.set_index("url")
    assert by.loc["d0", "clean_text"] == "nav\nbody one.\nbody two."
    assert by.loc["d0", "n_lines"] == 5 and by.loc["d0", "n_dup_lines"] == 2
    assert by.loc["d1", "clean_text"] == "a" and by.loc["d1", "n_dup_lines"] == 2
    assert by.loc["d2", "clean_text"] == "None"  # normalize() stringifies
    assert by.loc["d2", "n_lines"] == 0 and by.loc["d2", "n_dup_lines"] == 0
    assert by.loc["d3", "clean_text"] == "" and by.loc["d3", "n_lines"] == 1
    assert by.loc["d4", "clean_text"] == rows[4][1]
    assert by.loc["d4", "n_dup_lines"] == 0


def _docs_view(path: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    return con


def test_host_reputation_filter_semantics(ray_session, tmp_path):
    # hostA avg = (100+500)/2 = 300.0 (exactly at the bar -> kept);
    # hostB avg = (100+200)/2 = 150.0 (dropped); null host avg 400 kept
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["x"] * 5),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["hostA", "hostA", "hostB", "hostB", None]),
        "n_chars": pa.array([100, 500, 100, 200, 400], type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.host_reputation_filter(d),
                      O.host_reputation_filter_sql(), _docs_view(p))
    assert sorted(out["doc_id"]) == [0, 1, 4]
    assert set(out[out["doc_id"] < 2]["host_avg_chars"]) == {300.0}


def test_language_balanced_sample_semantics(ray_session, tmp_path):
    # 'en' has 200 docs (thinned toward 60), 'xx' has 3 (rate 1.0: ALL kept)
    n_en = 200
    t = pa.table({
        "doc_id": pa.array(list(range(n_en + 3)), type=pa.int64()),
        "text": pa.array(["x"] * (n_en + 3)),
        "lang": pa.array(["en"] * n_en + ["xx"] * 3),
        "source": pa.array(["s"] * (n_en + 3)),
        "n_chars": pa.array([10] * (n_en + 3), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.language_balanced_sample(d),
                      O.language_balanced_sample_sql(), _docs_view(p))
    out["doc_id"] = out["doc_id"].astype(int)
    xx = out[out["lang"] == "xx"]
    assert len(xx) == 3 and set(xx["rate"]) == {1.0}  # rare lang passes whole
    en = out[out["lang"] == "en"]
    assert 0 < len(en) < n_en                        # dominant lang thinned
    assert set(en["rate"]) == {60.0 / n_en}


def test_temperature_sample_semantics(ray_session, tmp_path):
    # alpha=1/2 damping: en (n=400, w=20) thins to p = 150*20/(sum_w*400);
    # the three small langs straddle the perfect square 16 (15/16/17) to
    # exercise the SQL twin's floor(sqrt)+correction EXACT-isqrt branch
    # on both sides of the boundary (isqrt(15)=3, isqrt(16)=4, isqrt(17)=4)
    sizes = {"en": 400, "s15": 15, "s16": 16, "s17": 17}
    langs = [l for l, n in sizes.items() for _ in range(n)]
    t = pa.table({
        "doc_id": pa.array(list(range(len(langs))), type=pa.int64()),
        "text": pa.array(["x"] * len(langs)),
        "lang": pa.array(langs),
        "source": pa.array(["s"] * len(langs)),
        "n_chars": pa.array([10] * len(langs), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.temperature_sample(d),
                      O.temperature_sample_sql(), _docs_view(p))
    out["doc_id"] = out["doc_id"].astype(int)
    kept = out["lang"].value_counts().to_dict()
    # sum_w = 20 + 3 + 4 + 4 = 31; p_small = 150*w/(31*n) > 1 for every
    # small lang -> they pass through WHOLE; en is thinned
    assert kept["s15"] == 15 and kept["s16"] == 16 and kept["s17"] == 17
    assert 0 < kept["en"] < 400
    # damping sanity: en keeps roughly p_en*400 = 150*20/31 ~ 97 docs
    # (mix64 is uniform; generous band)
    assert 60 < kept["en"] < 140


def test_passage_chunks_semantics(ray_session, tmp_path):
    # 7-token doc with P=4, S=2 -> starts 0/2/4/6: overlapping interior
    # passages, a short tail, plus null / empty / punctuation-only docs
    # (no tokens -> no passage) and a doc shorter than one passage
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta"),
        (1, None),
        (2, ""),
        (3, "!!! 123 ..."),
        (4, "one two"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([0] * len(rows), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.passage_chunks(d, passage_len=4, stride=2),
                      O.passage_chunks_sql(passage_len=4, stride=2),
                      _docs_view(p))
    out = out.sort_values(["doc_id", "passage_id"], ignore_index=True)
    out["doc_id"] = out["doc_id"].astype(int)
    d0 = out[out["doc_id"] == 0]
    assert list(d0["passage"]) == [
        "alpha beta gamma delta", "gamma delta epsilon zeta",
        "epsilon zeta eta", "eta"]
    assert list(d0["tok_start"]) == [0, 2, 4, 6]
    assert list(d0["tok_end"]) == [4, 4 + 2, 7, 7]
    assert set(out["doc_id"]) == {0, 4}  # null/empty/no-token docs drop
    assert list(out[out["doc_id"] == 4]["passage"]) == ["one two"]


def test_topic_classify_semantics(ray_session, tmp_path):
    rows = [
        (0, "scan filter sort"),            # execution 3
        (1, "table row stream window"),     # storage 2 == streaming 2 ->
                                            # 'storage' (first max in
                                            # sorted topic-name order)
        (2, "hello world nothing relevant"),  # all-zero -> none
        (3, None),                          # null -> none, score 0
        (4, "query query key table"),       # query 3 > storage 1
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([0] * len(rows), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.topic_classify(d), O.topic_classify_sql(),
                      _docs_view(p))
    by = out.set_index(out["doc_id"].astype(int))
    assert by.loc[0, "topic"] == "execution" and by.loc[0, "score"] == 3
    assert by.loc[1, "topic"] == "storage" and by.loc[1, "score"] == 2
    assert by.loc[2, "topic"] == "none" and by.loc[2, "score"] == 0
    assert by.loc[3, "topic"] == "none" and by.loc[3, "score"] == 0
    assert by.loc[4, "topic"] == "query" and by.loc[4, "score"] == 3


def test_bm25_search_semantics(ray_session, tmp_path):
    # query 0 = ("fast", "query"): tf dominance and length normalization
    # are both visible; docs without either term score exactly 0.0
    rows = [
        (0, "fast fast fast query"),          # high tf, short -> top
        (1, "fast query " + "pad " * 60),     # same terms, long -> penalized
        (2, "fast"),                          # one term only
        (3, "table row column"),              # no query-0 terms -> 0.0
        (4, None),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([0] * len(rows), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.bm25_search(d, k=3), O.bm25_search_sql(k=3),
                      _docs_view(p))
    q0 = out[out["query_id"] == 0].sort_values("rk")
    assert list(q0["doc_id"].astype(int)) == [0, 2, 1]
    assert (q0["score"] > 0).all()
    # docs with no query terms tie at exactly 0.0, broken by doc_id:
    # q2 = ("stream", "window") matches nothing -> 0.0 everywhere
    q2 = out[out["query_id"] == 2].sort_values("rk")
    assert set(q2["score"]) == {0.0}
    assert list(q2["doc_id"].astype(int)) == [0, 1, 2]


def test_assign_output_shards_semantics(ray_session, tmp_path):
    # shard_bytes=10: doc sizes 6,6,6 -> starts 0,6,12 -> shards 0,0,1
    # (doc 1 STRADDLES the boundary and belongs to the shard it starts
    # in); null text is 0 bytes and inherits its offset's shard
    rows = [(0, "aaaaaa"), (1, "bbbbbb"), (2, "cccccc"),
            (3, None), (4, "dd")]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([0] * len(rows), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.assign_output_shards(d, shard_bytes=10),
                      O.assign_output_shards_sql(shard_bytes=10),
                      _docs_view(p))
    out = out.sort_values("doc_id", ignore_index=True)
    assert list(out["shard_id"].astype(int)) == [0, 0, 1, 1, 1]
    assert list(out["n_bytes"].astype(int)) == [6, 6, 6, 0, 2]


def test_doremi_source_weights_semantics(ray_session, tmp_path):
    # srcA's text is all OOV (costly) -> positive excess; srcB's is a
    # cheap frozen-vocab word repeated -> zero (clamped); empty-token
    # and null docs contribute 0 cost and 0 tokens
    from txiac_qc_ray.stages.perplexity import quantized_cost_table
    vocab, costs, _ = quantized_cost_table()
    cheap = vocab.to_pylist()[int(np.argmin(costs))]
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["zzqy wvvx qqzz", f"{cheap} {cheap} {cheap}",
                          None, "!!!"], type=pa.string()),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["srcA", "srcB", "srcB", "srcA"]),
        "n_chars": pa.array([0] * 4, type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.doremi_source_weights(d),
                      O.doremi_source_weights_sql(), _docs_view(p))
    by = out.set_index("source")
    assert by.loc["srcA", "excess_w"] > 0       # costlier than average
    assert by.loc["srcB", "excess_w"] == 0.0    # below average, clamped
    assert by.loc["srcA", "n_docs"] == 2 and by.loc["srcB", "n_tokens"] == 3


def test_shingle_novelty_semantics(ray_session, tmp_path):
    # doc 0 coins every trigram (novelty 1.0); doc 1 is an exact copy
    # (novelty 0.0); doc 2 shares a prefix and adds new text; docs with
    # <3 tokens or null text have no shingles -> NULL novelty
    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma zeta eta theta"),
        (3, "one two"),
        (4, None),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([0] * len(rows), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.shingle_novelty(d, n_shards=4),
                      O.shingle_novelty_sql(), _docs_view(p))
    by = out.set_index(out["doc_id"].astype(int))
    assert by.loc[0, "novelty"] == 1.0 and by.loc[0, "n_shingles"] == 3
    assert by.loc[1, "novelty"] == 0.0
    # doc 2: trigrams (alpha beta gamma) seen in doc 0; the other 3 new
    assert by.loc[2, "n_shingles"] == 4 and by.loc[2, "n_novel"] == 3
    assert np.isnan(by.loc[3, "novelty"]) and by.loc[3, "n_shingles"] == 0
    assert np.isnan(by.loc[4, "novelty"])


def test_inverted_index_semantics(ray_session, tmp_path):
    rows = [(0, "apple banana apple"), (1, "banana"), (2, None), (3, "")]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([0] * len(rows), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.inverted_index(d), O.inverted_index_sql(),
                      _docs_view(p))
    got = {(r.tok, int(r.doc_id)): int(r.tf) for r in out.itertuples()}
    assert got == {("apple", 0): 2, ("banana", 0): 1, ("banana", 1): 1}


def test_quality_percentile_semantics(ray_session, tmp_path):
    # en: values 10,10,20,30 -> percent_rank 0,0,2/3,1 (ties share the
    # MIN rank); xx has a single row -> 0.0; null lang own group
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array(["x"] * 6),
        "lang": pa.array(["en", "en", "en", "en", "xx", None]),
        "source": pa.array(["s"] * 6),
        "n_chars": pa.array([10, 10, 20, 30, 99, 7], type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.quality_percentile(d), O.quality_percentile_sql(),
                      _docs_view(p))
    by = out.set_index(out["doc_id"].astype(int))
    assert by.loc[0, "pct_rank"] == 0.0 and by.loc[1, "pct_rank"] == 0.0
    assert by.loc[2, "pct_rank"] == 2.0 / 3.0
    assert by.loc[3, "pct_rank"] == 1.0
    assert by.loc[4, "pct_rank"] == 0.0  # single-row language
    assert by.loc[5, "pct_rank"] == 0.0  # null-lang single row


def test_span_corruption_plan_semantics(ray_session, tmp_path):
    # grid=4, span=2: doc 0 has 10 tokens, offset = mix64(0) % 4; spans
    # tile the grid and never overrun; a 1-token doc plans nothing
    import txiac_qc_ray.pipelines.docs as dd
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "one", None],
                         type=pa.string()),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([0] * 3, type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.span_corruption_plan(d, span_len=2, grid=4),
                      O.span_corruption_plan_sql(span_len=2, grid=4),
                      _docs_view(p))
    out["doc_id"] = out["doc_id"].astype(int)
    assert set(out["doc_id"]) == {0}
    off = int(dd._mix64(np.array([0], np.uint64))[0] % 4)
    d0 = out.sort_values("span_id")
    assert list(d0["tok_start"]) == [off + 4 * k for k in range(len(d0))]
    assert (d0["tok_end"] - d0["tok_start"] == 2).all()
    assert (d0["tok_end"] <= 10).all()


def test_tokenizer_fertility_semantics(ray_session, tmp_path):
    # fertility >= 1 by construction (a word is at least one subword);
    # a null-text-only language reports NULL fertility
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["the table row", "zzqqy wvvxk", None],
                         type=pa.string()),
        "lang": pa.array(["en", "xx", "empty"]),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([0] * 3, type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.tokenizer_fertility(d), O.tokenizer_fertility_sql(),
                      _docs_view(p))
    by = out.set_index("lang")
    assert by.loc["en", "fertility"] >= 1.0
    assert by.loc["xx", "fertility"] >= by.loc["en", "fertility"]  # OOV-ish
    assert np.isnan(by.loc["empty", "fertility"])
    assert by.loc["en", "n_words"] == 3


def test_doc_commonness_semantics(ray_session, tmp_path):
    # 4 docs: "the the" appears in every doc (df=4); "rare" only in doc
    # 0. Doc 3 is all-common -> commonness 1.0, dropped at the 1/2 bar;
    # doc 0 mixes in rare words -> kept. Zero-token doc -> NULL, false.
    rows = [
        (0, "the rare words here"),
        (1, "the common the common"),
        (2, "the words appear here"),
        (3, "the the the"),
        (4, "!!!"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([0] * len(rows), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.doc_commonness(d), O.doc_commonness_sql(),
                      _docs_view(p))
    by = out.set_index(out["doc_id"].astype(int))
    # doc 3: every token is "the" (df=4, N=5) -> commonness 4/5
    assert by.loc[3, "commonness"] == 4.0 / 5.0 and not by.loc[3, "keep"]
    assert by.loc[0, "keep"]  # rare words pull the mean df down
    assert np.isnan(by.loc[4, "commonness"]) and not by.loc[4, "keep"]
    assert by.loc[0, "commonness"] < by.loc[3, "commonness"]


def test_host_dup_rate_semantics(ray_session, tmp_path):
    # "same text" appears on A twice and B once -> all three rows are
    # duplicates (cross-source counts for both sides); null text never
    # is; unique texts aren't
    rows = [
        (0, "same text", "A"), (1, "same text", "A"), (2, "same text", "B"),
        (3, "unique a", "A"), (4, None, "B"), (5, "unique b", "C"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array([r[2] for r in rows]),
        "n_chars": pa.array([0] * len(rows), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.host_dup_rate(d, n_shards=4),
                      O.host_dup_rate_sql(), _docs_view(p))
    by = out.set_index("source")
    assert by.loc["A", "n_docs"] == 3 and by.loc["A", "n_dup_docs"] == 2
    assert by.loc["A", "dup_rate"] == 2.0 / 3.0
    assert by.loc["B", "n_docs"] == 2 and by.loc["B", "n_dup_docs"] == 1
    assert by.loc["C", "n_dup_docs"] == 0 and by.loc["C", "dup_rate"] == 0.0


def test_ngram_lm_export_matches_fluency_fit(ray_session):
    """The exported trigram table IS ngram_fluency's fit: every scored
    held-out transition that fluency counted as 'known' exists in the
    export, and export counts are positive."""
    out = D.ngram_lm_export("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0 and (out["cnt"] >= 1).all()
    assert out["gram"].str.count(" ").eq(2).all()  # three tokens each


def test_tumbling_distinct_users_bounds(ray_session):
    """Windowed distinct counts are bounded by the global per-type
    distinct counts and by the window event counts."""
    from txiac_qc_ray.pipelines import relational as R

    sf = "/root/testdata/sf0.001"
    win = R.tumbling_distinct_users(sf)
    glob = R.distinct_count_users(sf).set_index("event_type")
    tot = win.groupby("event_type")["n_users"].max()
    for et, mx in tot.items():
        assert mx <= glob.loc[et, "n_users"]
    assert (win["n_users"] >= 1).all() or len(win) == 0


def test_incremental_dedup_semantics(ray_session, tmp_path):
    # old = even doc_ids. new doc 1 repeats old doc 0's text -> dropped;
    # new doc 3 is new text -> kept; new doc 5 repeats ANOTHER NEW doc's
    # text (7) but no old doc's -> kept (within-new dups are not this
    # op's job); null text matches an old empty string (documented)
    rows = [
        (0, "seen before"), (1, "seen before"),
        (2, "old only"), (3, "brand new"),
        (4, ""), (5, "twin new"),
        (6, "other old"), (7, "twin new"),
        (8, "x"), (9, None),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s"] * len(rows)),
        "n_chars": pa.array([0] * len(rows), type=pa.int64()),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    p = os.path.join(d, "documents.parquet")
    pq.write_table(t, p)
    out = _twin_equal(D.incremental_dedup(d), O.incremental_dedup_sql(),
                      _docs_view(p))
    by = out.set_index(out["doc_id"].astype(int))["keep"]
    assert not by[1]          # exact old text
    assert by[3] and by[5] and by[7]
    assert not by[9]          # null == old empty string (doc 4)


def test_topic_mixture_report_consistency(ray_session):
    """The mixture matrix is the per-source rollup of topic_classify:
    row sums match the classifier's label counts and shares sum to 1
    per source."""
    sf = "/root/testdata/sf0.001"
    mix = D.topic_mixture_report(sf)
    lab = D.topic_classify(sf).to_pandas()
    docs = D._read(sf, "documents", ["doc_id", "source"]).to_pandas()
    lab = lab.merge(docs, on="doc_id")
    counts = (lab.groupby(["source", "topic"]).size()
              .rename("n").reset_index())
    m = mix.merge(counts, on=["source", "topic"], how="outer").fillna(0)
    assert (m["n_docs"] == m["n"]).all()
    share_sum = mix.groupby("source")["doc_share"].sum()
    assert ((share_sum - 1.0).abs() < 0.01).all()  # 4dp rounding slack
