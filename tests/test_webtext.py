"""Web-text rule banks (pipelines/webtext.py): semantic pins on a
handcrafted adversarial corpus + DuckDB-twin equality on BOTH the
handcrafted corpus and the frozen 2000-page driver fixture."""

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
from txiac_qc_ray.pipelines import webtext as W  # noqa: E402

ROWS = [
    # real mixed doc: 1 good first line (5 sentences), short line, bullet,
    # javascript line, unterminated line
    ("u0", "Good line with words here. Another proper sentence follows now!"
           " More text ends here. Fourth sentence is fine. Fifth one"
           " closes it.\nshort line\n- bullet item listed here.\n"
           "JavaScript is required here.\nNo terminal punct line"),
    ("u1", "This has lorem ipsum inside. One. Two. Three. Four. Five. Six"
           " sentences here."),
    ("u2", "Contains a curly { brace. One. Two. Three. Four. Five."),
    ("u3", "That stupid idea was dumb. The rest of the page is fine"
           " honestly. With the and of. Be to have that. More words pad"
           " it out. Final line ends properly."),
    ("u4", "mail contact.42@mail3.example.com and (512) 555-0123 plus"
           " 123-45-6789 ip 10.0.0.1 end."),
    ("u5", None),
    ("u6", ""),
    ("u7", "  \t \n   "),
    ("u8", "- first bullet.\n- second bullet.\n- third bullet.\nplain.\n"
           "And this trails off...\nAnd more dots here too…"),
    # 80 words, trailing '.' attached to the last word so the mean word
    # length is 241/80 = 3.0125 (>= the Gopher 3.0 floor)
    ("u9", ("the be to of and that have with " * 10).strip() + "."),
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("webtext_corpus")
    t = pa.table({"url": pa.array([r[0] for r in ROWS]),
                  "text": pa.array([r[1] for r in ROWS], type=pa.string())})
    pq.write_table(t, os.path.join(str(d), "part-00000.parquet"))
    return str(d)


def _twin_equal(fn, sql):
    mine = normalize(fn.to_pandas())
    orc = normalize(duckdb.connect().execute(sql).df())
    pd.testing.assert_frame_equal(mine, orc)
    return mine


def test_scrub_docs_twin_and_semantics(ray_session, corpus_dir):
    out = _twin_equal(W.scrub_docs(corpus_dir),
                      O.scrub_docs_sql(corpus_dir + "/*.parquet"))
    by = out.set_index("url")
    assert by.loc["u4", "scrubbed"]
    s = by.loc["u4", "scrubbed_text"]
    assert "<EMAIL>" in s and "<PHONE>" in s and "<SSN>" in s and "<IP>" in s
    assert "@" not in s and "555-0123" not in s
    assert "<TOX>" in by.loc["u3", "scrubbed_text"]  # stupid/dumb scrubbed
    # normalize() stringifies object columns, so SQL NULL == Arrow null
    # both render as 'None' here; frame equality above pins the match
    assert by.loc["u5", "scrubbed_text"] == "None"
    assert not by.loc["u5", "scrubbed"]
    assert not by.loc["u0", "scrubbed"]  # clean doc untouched
    assert by.loc["u0", "scrubbed_text"] == ROWS[0][1]


def test_c4_line_filter_twin_and_semantics(ray_session, corpus_dir):
    out = _twin_equal(W.c4_line_filter(corpus_dir),
                      O.c4_line_filter_sql(corpus_dir + "/*.parquet"))
    by = out.set_index("url")
    # u0: 5 lines; only the first (terminal punct, >=3 words, no js) and
    # the bullet line survive; keep (5 sentences in clean_text, no bad word)
    assert by.loc["u0", "n_lines"] == 5 and by.loc["u0", "n_kept"] == 2
    assert by.loc["u0", "clean_text"].splitlines()[1] == "- bullet item listed here."
    assert by.loc["u0", "keep"]
    # doc-level drops: lorem ipsum / curly brace / bad word
    assert not by.loc["u1", "keep"] and by.loc["u1", "n_kept"] == 1
    assert not by.loc["u2", "keep"]
    assert not by.loc["u3", "keep"]  # 'stupid' is a bad word
    # u9: one giant line ending in '.', 81 words -> kept line, but only
    # 1 sentence -> dropped at doc level
    assert by.loc["u9", "n_kept"] == 1 and not by.loc["u9", "keep"]
    # null / empty / whitespace
    assert by.loc["u5", "n_lines"] == 0 and not by.loc["u5", "keep"]
    assert by.loc["u6", "n_lines"] == 1 and by.loc["u6", "n_kept"] == 0
    assert by.loc["u6", "clean_text"] == ""
    assert by.loc["u7", "n_lines"] == 2 and by.loc["u7", "n_kept"] == 0


URL_ROWS = [
    "https://good.example/page1",        # clean -> keep
    "http://host013.example/page",       # blocklisted host
    "ftp://files.example/readme",        # non-http(s) scheme -> no host
    None,                                # null url
    "https://assets.example/logo.PNG",   # static asset, case-insensitive
    "https://cdn.example/app.js?v=123",  # asset ext guarded by ?query
    "https://ads.example/banner",        # blocklisted host
    "https://good.example/file.pdfx",    # NOT an asset ext (pdfx)
    "https://no-path.example",           # authority only, no path
    # blocklist evasion attempts — normalization must catch all four
    "https://ADS.example/banner2",       # uppercase host
    "https://ads.example:8080/banner3",  # explicit port
    "https://u:p@ads.example/banner4",   # userinfo
    "https://ads.example./banner5",      # FQDN trailing dot
    # IPv6 literals survive the digits-only port strip
    "https://[2001:db8::1]/x",
    "https://[::1]:8080/x",
    "https://:8080/x",                   # empty authority -> null host
]


def test_url_host_filter_twin_and_semantics(ray_session, tmp_path):
    d = tmp_path / "urls"
    d.mkdir()
    t = pa.table({"url": pa.array(URL_ROWS, type=pa.string()),
                  "text": pa.array([""] * len(URL_ROWS))})
    pq.write_table(t, str(d / "part-00000.parquet"))
    out = _twin_equal(W.url_host_filter(str(d)),
                      O.url_host_filter_sql(str(d) + "/*.parquet"))
    by = out.set_index("url")  # normalize() stringifies nulls to 'None'
    assert by.loc["https://good.example/page1", "keep"]
    assert by.loc["https://good.example/page1", "host"] == "good.example"
    assert not by.loc["http://host013.example/page", "keep"]
    assert by.loc["http://host013.example/page", "host"] == "host013.example"
    assert by.loc["ftp://files.example/readme", "host"] == "None"
    assert not by.loc["ftp://files.example/readme", "keep"]
    assert by.loc["None", "host"] == "None" and not by.loc["None", "keep"]
    assert not by.loc["https://assets.example/logo.PNG", "keep"]
    assert not by.loc["https://cdn.example/app.js?v=123", "keep"]
    assert not by.loc["https://ads.example/banner", "keep"]
    assert by.loc["https://good.example/file.pdfx", "keep"]
    assert by.loc["https://no-path.example", "keep"]
    assert by.loc["https://no-path.example", "host"] == "no-path.example"
    for evasion in ("https://ADS.example/banner2",
                    "https://ads.example:8080/banner3",
                    "https://u:p@ads.example/banner4",
                    "https://ads.example./banner5"):
        assert by.loc[evasion, "host"] == "ads.example", evasion
        assert not by.loc[evasion, "keep"], evasion
    assert by.loc["https://[2001:db8::1]/x", "host"] == "[2001:db8::1]"
    assert by.loc["https://[2001:db8::1]/x", "keep"]
    assert by.loc["https://[::1]:8080/x", "host"] == "[::1]"
    assert by.loc["https://:8080/x", "host"] == "None"
    assert not by.loc["https://:8080/x", "keep"]


def test_gopher_quality_flags_twin_and_semantics(ray_session, corpus_dir):
    out = _twin_equal(W.gopher_quality_flags(corpus_dir),
                      O.gopher_quality_flags_sql(corpus_dir + "/*.parquet"))
    by = out.set_index("url")
    # u8: 6 lines, 3 bullets (0.5 <= 0.9 ok), 2 ellipsis ends (1/3 > 0.3)
    assert by.loc["u8", "frac_bullet_lines"] == 0.5
    assert by.loc["u8", "frac_ellipsis_lines"] == pytest.approx(1 / 3)
    assert not by.loc["u8", "gopher_keep"]
    # u9: 80 words, all stopwords, mean len 3.0125 -> keep=True
    assert by.loc["u9", "n_words"] == 80
    assert by.loc["u9", "n_stop"] == 80
    assert by.loc["u9", "mean_word_len"] == pytest.approx(241 / 80)
    assert by.loc["u9", "gopher_keep"]
    # u0: only 33 words -> under the 50-word floor
    assert not by.loc["u0", "gopher_keep"]
    # null text: int stats 0, fracs null, keep false
    assert by.loc["u5", "n_words"] == 0
    assert np.isnan(by.loc["u5", "mean_word_len"])
    assert not by.loc["u5", "gopher_keep"]
    # whitespace-only: 0 words -> fracs null except line fracs (2 lines)
    assert by.loc["u7", "n_words"] == 0
    assert by.loc["u7", "frac_bullet_lines"] == 0.0


def test_webtext_ops_stream_and_match_on_fixture(ray_session):
    """Driver-fixture equality: the exact compare the driver will run."""
    import ray

    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    glob = d + "/part-*.parquet"
    for fn, sql in [(W.scrub_docs, O.scrub_docs_sql(glob)),
                    (W.c4_line_filter, O.c4_line_filter_sql(glob)),
                    (W.gopher_quality_flags, O.gopher_quality_flags_sql(glob))]:
        ds = fn(d)
        assert isinstance(ds, ray.data.Dataset)  # streaming boundary
        _twin_equal(ds, sql)


REP_ROWS = [
    # 6 lines: 'dup.' x3 (dup run), two distinct, one empty tail after \n
    ("r0", "dup.\ndup.\ndup.\nunique one.\nanother line."),
    # heavy phrase repetition: top 2/3/4-gram and dup-5-gram all fire
    ("r1", ("spark table spark table " * 20).strip() + "."),
    # 60 DISTINCT 2-letter words: zero repetition and every top-gram
    # char fraction is exactly (2n + n-1)/120 — small enough to keep
    # (a short all-distinct doc would still fail: one 3-gram occurrence
    # can exceed 18% of a 10-word doc's chars by size alone)
    ("r2", " ".join(chr(97 + i // 26) + chr(97 + i % 26)
                    for i in range(60)) + "."),
    ("r3", None),
    ("r4", ""),
    ("r5", "  \t \n   "),
    # single repeated token: overlapping grams clip the fractions at 1.0
    ("r6", "z z z z z z z z z z"),
]


@pytest.fixture(scope="module")
def rep_corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("webtext_rep")
    t = pa.table({"url": pa.array([r[0] for r in REP_ROWS]),
                  "text": pa.array([r[1] for r in REP_ROWS], type=pa.string())})
    pq.write_table(t, os.path.join(str(d), "part-00000.parquet"))
    return str(d)


def test_gopher_repetition_twin_and_semantics(ray_session, rep_corpus_dir):
    out = _twin_equal(W.gopher_repetition_stats(rep_corpus_dir),
                      O.gopher_repetition_sql(rep_corpus_dir + "/*.parquet"))
    by = out.set_index("url")
    # r0: 5 lines, 'dup.' x3 -> 2 duplicate occurrences beyond the
    # distinct set; dup chars = 3*4 of 4+4+4+11+13 line chars
    assert by.loc["r0", "frac_dup_lines"] == pytest.approx(2 / 5)
    assert by.loc["r0", "frac_chars_dup_lines"] == pytest.approx(12 / 36)
    assert not by.loc["r0", "repetition_keep"]
    # r1: 'spark table' x40 tokens; top 2-gram dominates the text and
    # every dup n-gram fraction clips at 1.0 across the whole 5..10 family
    assert by.loc["r1", "frac_chars_top_2gram"] > 0.5
    for n in range(5, 11):
        assert by.loc["r1", f"frac_chars_dup_{n}grams"] == 1.0
    assert not by.loc["r1", "repetition_keep"]
    # r2: 60 distinct 2-char words (120 token chars) -> every n-gram
    # ties at count 1 and the tie-break fixes charlen at 2n + (n-1)
    assert by.loc["r2", "frac_chars_top_2gram"] == pytest.approx(5 / 120)
    assert by.loc["r2", "frac_chars_top_3gram"] == pytest.approx(8 / 120)
    assert by.loc["r2", "frac_chars_top_4gram"] == pytest.approx(11 / 120)
    for n in range(5, 11):
        assert by.loc["r2", f"frac_chars_dup_{n}grams"] == 0.0
    assert by.loc["r2", "repetition_keep"]
    # r6 has 10 'z' tokens: its single 10-gram occurs once -> dup10 = 0,
    # while shorter overlapping grams repeat
    assert by.loc["r6", "frac_chars_dup_10grams"] == 0.0
    assert by.loc["r6", "frac_chars_dup_9grams"] > 0.0
    # r6: overlapping 'z z' grams -> clipped at 1.0, dropped
    assert by.loc["r6", "frac_chars_top_2gram"] == 1.0
    assert not by.loc["r6", "repetition_keep"]
    # null / empty / whitespace: null stats, keep false
    for u in ("r3", "r4", "r5"):
        assert np.isnan(by.loc[u, "frac_chars_top_2gram"])
        assert not by.loc[u, "repetition_keep"]
    assert np.isnan(by.loc["r3", "frac_dup_lines"])
    assert by.loc["r5", "frac_dup_lines"] == 0.0


def test_gopher_repetition_fixture_twin(ray_session):
    import ray

    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    ds = W.gopher_repetition_stats(d)
    assert isinstance(ds, ray.data.Dataset)
    out = _twin_equal(ds, O.gopher_repetition_sql(d + "/part-*.parquet"))
    # the corpus's 5% high-repetition mix must actually fire the rule
    dropped = (~out["repetition_keep"].astype(bool)).sum()
    assert 100 <= dropped <= 600


def test_rule_banks_in_flagship(ray_session):
    """PipelineConfig.rule_banks wires the banks into the flagship:
    bank flags equal the standalone queries' keep columns (extraction is
    byte-identical to the pages text, so the same rules fire), the bank
    rules produce drop reasons, tasks==actors, and the default config
    emits no bank columns."""
    from txiac_qc_ray.config import PipelineConfig
    from txiac_qc_ray.pipelines.qc import build_qc_pipeline, read_pages
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    banks = ("c4", "gopher", "repetition", "url", "classifier", "fineweb")
    out = (build_qc_pipeline(read_pages(d), PipelineConfig(rule_banks=banks))
           .to_pandas().sort_values("url", ignore_index=True))
    out_actors = (build_qc_pipeline(
        read_pages(d), PipelineConfig(rule_banks=banks, stage_mode="actors"))
        .to_pandas().sort_values("url", ignore_index=True))
    pd.testing.assert_frame_equal(out, out_actors)

    by = out.set_index("url")
    for bank, fn in [("c4", W.c4_line_filter),
                     ("gopher", W.gopher_quality_flags),
                     ("repetition", W.gopher_repetition_stats),
                     ("url", W.url_host_filter),
                     ("classifier", W.quality_classifier),
                     ("fineweb", W.fineweb_quality_flags)]:
        keep_col = {"c4": "keep", "gopher": "gopher_keep",
                    "repetition": "repetition_keep", "url": "keep",
                    "classifier": "keep", "fineweb": "keep"}[bank]
        standalone = fn(d).to_pandas().set_index("url")[keep_col].astype(bool)
        flag = by[f"{bank}_keep"].astype(bool)
        assert flag.equals(standalone.reindex(by.index)), bank
        # the bank's rule fires exactly where its keep flag is 0
        assert by[f"rule_{bank}_dropped"].astype(bool).equals(~flag), bank
    # bank rules actually produce drop reasons on this corpus, and only
    # for docs every DEFAULT rule passed (appended-after order)
    bank_reasons = out["drop_reason"].isin(
        ["c4_dropped", "gopher_dropped", "repetition_dropped"])
    assert bank_reasons.any()
    # the url bank fires on the fixture's blocklisted hosts
    assert (out["drop_reason"] == "url_dropped").any()
    # keep = base keep AND all three bank keeps
    base = (build_qc_pipeline(read_pages(d), PipelineConfig())
            .to_pandas().sort_values("url", ignore_index=True))
    assert "c4_keep" not in base.columns  # default untouched
    expect = (base["keep"].to_numpy()
              & by["c4_keep"].to_numpy().astype(bool)
              & by["gopher_keep"].to_numpy().astype(bool)
              & by["repetition_keep"].to_numpy().astype(bool)
              & by["url_keep"].to_numpy().astype(bool)
              & by["classifier_keep"].to_numpy().astype(bool)
              & by["fineweb_keep"].to_numpy().astype(bool))
    assert (out["keep"].to_numpy() == expect).all()
    # and the non-bank columns of the banks-on run match the default run
    shared = [c for c in base.columns if not c.startswith("rule_")
              and c not in ("keep", "drop_reason", "rule_flags",
                            "scrubbed_text", "scrubbed")]
    pd.testing.assert_frame_equal(out[shared], base[shared])


def test_webtext_ops_with_duplicate_urls(ray_session, tmp_path):
    """The ops are per-ROW; a corpus may carry the same url twice
    (recrawls at different warc_ts). The repetition oracle keys on a
    per-row id, not url — this pins the divergence a url-keyed twin had
    (two same-url rows with different texts pooled their tokens)."""
    t = pa.table({
        "url": pa.array(["same", "same", "other"]),
        "text": pa.array([
            ("spark table spark table " * 20).strip() + ".",
            "Totally different words here now. And more of them follow"
            " along. The be to of and. That have with the be. Final"
            " sentence closes this out.",
            "dup.\ndup.\ndup.\nunique one.\nanother line.",
        ], type=pa.string()),
    })
    d = str(tmp_path / "dups")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    glob = d + "/*.parquet"
    for fn, sql in [(W.scrub_docs, O.scrub_docs_sql(glob)),
                    (W.c4_line_filter, O.c4_line_filter_sql(glob)),
                    (W.gopher_quality_flags, O.gopher_quality_flags_sql(glob)),
                    (W.gopher_repetition_stats, O.gopher_repetition_sql(glob))]:
        _twin_equal(fn(d), sql)
    rep = W.gopher_repetition_stats(d).to_pandas()
    same = rep[rep["url"] == "same"].sort_values("frac_chars_top_2gram")
    # the two same-url rows keep DISTINCT per-row stats: the clean row
    # passes, the repeated-phrase row clips and fails
    assert not same["repetition_keep"].iloc[-1]
    assert same["repetition_keep"].iloc[0]


def _funnel_corpus_table() -> pa.Table:
    """One row per funnel stage, each failing EXACTLY its own bank:
    distinct 4-letter words everywhere so the repetition bank never
    fires by accident, >=5 sentences of >=3 words ending '.' so c4
    passes unless sabotaged, two stopwords so Gopher passes unless
    sabotaged."""
    import itertools

    letters = "bcdfghjklmnpqrstvwxz"
    gen = ("".join(p) for p in itertools.product(letters, repeat=3))

    def words(n):
        return ["w" + next(gen) for _ in range(n)]

    def para(n_sent=5, wps=12):
        sents = []
        for i in range(n_sent):
            ws = words(wps)
            if i == 0:
                ws[0], ws[1] = "the", "and"
            sents.append(" ".join(ws).capitalize() + ".")
        return " ".join(sents)

    rep_para = para()
    # classifier saboteur: 2 stopwords + 15 words carrying 7 digits each
    # -> score 40*2 + 12*60 - 2*105 = 590 < 10*60, every other bank green
    sents = []
    for i in range(5):
        ws = words(12)
        if i == 0:
            ws[0], ws[1] = "the", "and"
        if i >= 2:
            ws[:5] = [x + "1234567" for x in ws[:5]]
        sents.append(" ".join(ws).capitalize() + ".")
    rows = [
        ("http://ok.example/a", None),                       # null_text
        ("http://ads.example/x", para()),                    # url (blocklist)
        ("http://ok.example/b", "lorem ipsum " + para()),    # c4
        ("http://ok.example/c", para(n_sent=5, wps=8)),      # gopher (<50 w)
        ("http://ok.example/d", rep_para + "\n\n" + rep_para),  # repetition
        ("http://ok.example/e", " ".join(sents)),            # classifier
        ("http://ok.example/f", para()),                     # kept
    ]
    return pa.table({"url": pa.array([r[0] for r in rows]),
                     "text": pa.array([r[1] for r in rows],
                                      type=pa.string())})


def test_rule_bank_funnel_first_fail_attribution(ray_session, tmp_path):
    """Each crafted row lands in EXACTLY its own stage (first-fail
    priority), and the engine matches the DuckDB twin byte-for-byte."""
    from txiac_qc_ray.oracles import rule_bank_funnel_sql
    from txiac_qc_ray.pipelines.webtext import FUNNEL_STAGES, rule_bank_funnel

    d = str(tmp_path / "funnel")
    os.makedirs(d)
    pq.write_table(_funnel_corpus_table(),
                   os.path.join(d, "part-00000.parquet"))
    mine = rule_bank_funnel(d)
    assert list(mine["drop_stage"]) == list(FUNNEL_STAGES)
    assert list(mine["n_docs"]) == [1] * len(FUNNEL_STAGES)
    orc = duckdb.connect().execute(
        rule_bank_funnel_sql(d + "/part-*.parquet")).df()
    pd.testing.assert_frame_equal(
        normalize(mine), normalize(orc))


def test_rule_bank_funnel_fixture_twin(ray_session):
    """Driver-fixture equality: the exact compare the driver will run,
    plus the conservation law (stage counts sum to the corpus size)."""
    from txiac_qc_ray.oracles import rule_bank_funnel_sql
    from txiac_qc_ray.pipelines.webtext import rule_bank_funnel
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    mine = rule_bank_funnel(d)
    assert int(mine["n_docs"].sum()) == 2000
    orc = duckdb.connect().execute(
        rule_bank_funnel_sql(d + "/part-*.parquet")).df()
    pd.testing.assert_frame_equal(normalize(mine), normalize(orc))


def test_dedup_url_keep_latest_semantics(ray_session):
    """Recrawled urls (fnv%RECRAWL_MOD==0) keep the SHIFTED timestamp
    with n_snapshots=2; the rest keep their original capture with
    n_snapshots=1; one row per distinct url; and the DuckDB twin
    agrees byte-for-byte on the driver fixture."""
    from txiac_qc_ray.functions.urls import fnv1a64
    from txiac_qc_ray.oracles import dedup_url_keep_latest_sql
    from txiac_qc_ray.pipelines.webtext import (
        RECRAWL_MOD, RECRAWL_SHIFT_US, dedup_url_keep_latest)
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    import glob as _glob

    base = pa.concat_tables(
        [pq.read_table(f, columns=["url", "warc_ts"])
         for f in sorted(_glob.glob(d + "/part-*.parquet"))])
    mine = dedup_url_keep_latest(d).to_pandas().sort_values(
        "url", ignore_index=True)
    assert len(mine) == len(set(base["url"].to_pylist()))
    h = fnv1a64(base["url"].combine_chunks())
    re_mask = (h % np.uint64(RECRAWL_MOD)) == 0
    ts0 = base["warc_ts"].to_pandas().astype("datetime64[us]").to_numpy()
    expect = pd.DataFrame({"url": base["url"].to_pylist(), "ts": ts0})
    expect.loc[re_mask, "ts"] += pd.Timedelta(microseconds=RECRAWL_SHIFT_US)
    expect["n"] = np.where(re_mask, 2, 1).astype("int64")
    expect = expect.sort_values("url", ignore_index=True)
    assert (mine["warc_ts"].astype("datetime64[us]").to_numpy()
            == expect["ts"].to_numpy()).all()
    assert (mine["n_snapshots"].to_numpy() == expect["n"].to_numpy()).all()
    orc = duckdb.connect().execute(
        dedup_url_keep_latest_sql(d + "/part-*.parquet")).df()
    pd.testing.assert_frame_equal(normalize(mine), normalize(orc))


def test_lexical_diversity_twin_and_semantics(ray_session, corpus_dir):
    glob = corpus_dir + "/*.parquet"
    mine = _twin_equal(W.lexical_diversity(corpus_dir),
                       O.lexical_diversity_sql(glob))
    by = mine.set_index("url")
    # u9 = an 8-word phrase repeated 10x: TTR 8/80 = 0.1 < 0.2 -> drop
    assert by.loc["u9", "n_tokens"] == 80
    assert by.loc["u9", "n_distinct"] == 8
    assert by.loc["u9", "n_hapax"] == 0
    assert by.loc["u9", "ttr"] == 0.1
    assert by.loc["u9", "keep"] == False  # noqa: E712
    # u1: 13 tokens, all unique -> TTR 1.0, all hapax, keep
    assert by.loc["u1", "n_tokens"] == 13
    assert by.loc["u1", "n_distinct"] == 13
    assert by.loc["u1", "n_hapax"] == 13
    assert by.loc["u1", "keep"] == True  # noqa: E712
    # null / empty / whitespace text: zero tokens, NULL ratios, drop
    for u in ("u5", "u6", "u7"):
        assert by.loc[u, "n_tokens"] == 0
        assert np.isnan(by.loc[u, "ttr"])
        assert by.loc[u, "keep"] == False  # noqa: E712


def test_readability_scores_twin_and_semantics(ray_session, corpus_dir):
    glob = corpus_dir + "/*.parquet"
    mine = _twin_equal(W.readability_scores(corpus_dir),
                       O.readability_scores_sql(glob))
    by = mine.set_index("url")
    # u9: 80 whitespace words, ONE terminal run -> 80 wps > 40 -> drop
    assert by.loc["u9", "n_words"] == 80
    assert by.loc["u9", "n_sentences"] == 1
    assert by.loc["u9", "words_per_sentence"] == 80.0
    assert by.loc["u9", "keep"] == False  # noqa: E712
    # u8: "..." is a run counting ONE sentence end, and the unicode
    # ellipsis "…" is not ASCII terminal punctuation at all —
    # lines: 3 bullets (.) + plain. + "off..." -> 5 runs
    assert by.loc["u8", "n_sentences"] == 5
    # null / empty: no sentences -> NULL ratio, drop
    for u in ("u5", "u6", "u7"):
        assert by.loc[u, "n_sentences"] == 0
        assert np.isnan(by.loc[u, "words_per_sentence"])
        assert by.loc[u, "keep"] == False  # noqa: E712
    # the clean prose doc keeps
    assert by.loc["u0", "keep"] == True  # noqa: E712


def test_fineweb_quality_flags_twin_and_semantics(ray_session, corpus_dir,
                                                  tmp_path):
    glob = corpus_dir + "/*.parquet"
    mine = _twin_equal(W.fineweb_quality_flags(corpus_dir),
                       O.fineweb_quality_flags_sql(glob))
    by = mine.set_index("url")
    # u9: ONE long punct-terminated line -> all three rules pass
    assert by.loc["u9", "n_lines"] == 1
    assert by.loc["u9", "punct_line_frac"] == 1.0
    assert by.loc["u9", "short_line_frac"] == 0.0
    assert by.loc["u9", "keep"] == True  # noqa: E712
    # u0: 4 of 5 lines are under 30 chars -> short-line rule drops (>= 0.67)
    assert by.loc["u0", "short_line_frac"] == 0.8
    assert by.loc["u0", "keep"] == False  # noqa: E712
    # null text -> NULL stats, drop; empty/whitespace -> short lines, drop
    assert np.isnan(by.loc["u5", "punct_line_frac"])
    for u in ("u5", "u6", "u7"):
        assert by.loc[u, "keep"] == False  # noqa: E712

    # adversarial corpus exercising each rule in isolation (the fixture
    # never fires the dup-line rule: its pages repeat within one line).
    # Filler lines are DISTINCT (via the index word) so only the rule
    # under test fires.
    def lp(i):
        return f"Line variant {i} is comfortably longer than thirty chars."

    def lnp(i):
        return f"line variant {i} is comfortably longer than thirty chars"

    dup = lp("dup")
    rows = [
        # all punct, no shorts, no dups -> keep
        ("k0", "\n".join(lp(i) for i in range(5))),
        # punct-line ratio 1/10 < 0.12 -> drop by rule (a) alone
        ("d_punct", "\n".join([lnp(i) for i in range(9)] + [lp(9)])),
        # short-line ratio 4/5 >= 0.67 -> drop by rule (b) alone
        ("d_short", "\n".join([f"tiny {i}." for i in range(4)] + [lp(0)])),
        # dup-line char fraction >= 0.10 -> drop by rule (c) alone
        ("d_dup", "\n".join([dup] * 4 + [lp("unique-tail")])),
        # boundary: punct ratio exactly 0.12 (3/25) KEEPS (rule is >=)
        ("b_punct", "\n".join([lnp(i) for i in range(22)]
                              + [lp(i) for i in range(3)])),
    ]
    d = str(tmp_path / "fineweb_adv")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({"url": pa.array([r[0] for r in rows]),
                             "text": pa.array([r[1] for r in rows])}),
                   os.path.join(d, "part-0.parquet"))
    adv = _twin_equal(W.fineweb_quality_flags(d),
                      O.fineweb_quality_flags_sql(d + "/*.parquet"))
    byadv = adv.set_index("url")
    assert byadv.loc["k0", "keep"] == True  # noqa: E712
    assert byadv.loc["b_punct", "keep"] == True  # noqa: E712
    for u in ("d_punct", "d_short", "d_dup"):
        assert byadv.loc[u, "keep"] == False, u  # noqa: E712
    assert byadv.loc["d_dup", "dup_line_char_frac"] >= 0.10


def test_fineweb_fixture_twin(ray_session):
    """Driver-fixture equality + a discriminating keep rate (the
    punct-line rule must fire on the symbol/repetition classes and the
    short-line rule on the too-short class)."""
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    fw = _twin_equal(W.fineweb_quality_flags(d),
                     O.fineweb_quality_flags_sql(d + "/part-*.parquet"))
    rate = fw["keep"].mean()
    assert 0.85 < rate < 0.97, rate
    # both rules discriminate on this corpus
    assert (fw["punct_line_frac"] < 0.12).sum() > 50
    assert (fw["short_line_frac"] >= 0.67).sum() > 20


def test_normalize_unicode_twin_and_semantics(ray_session, tmp_path):
    import unicodedata

    from txiac_qc_ray.functions.urls import fnv1a64 as _fnv

    # handcrafted corpus: urls chosen so some rows ARE decorated;
    # one row carries PRE-EXISTING decomposed unicode (no decoration
    # needed for the normalize path to fire), one is pure ASCII
    rows = [(f"https://h{i:02d}.example/p/{i}",
             f"Plain ascii body number {i} ends here.") for i in range(16)]
    rows.append(("u_decomp", "already café inline."))
    rows.append(("u_null", None))
    d = str(tmp_path / "nfc")
    os.makedirs(d)
    pq.write_table(pa.table({"url": pa.array([r[0] for r in rows]),
                             "text": pa.array([r[1] for r in rows],
                                              type=pa.string())}),
                   os.path.join(d, "part-0.parquet"))
    out = _twin_equal(W.normalize_unicode(d),
                      O.normalize_unicode_sql(d + "/*.parquet"))
    by = out.set_index("url")
    # pre-existing decomposed text normalizes even when NOT decorated
    if int(_fnv(pa.array(["u_decomp"]))[0]) % W.NFC_MOD != 0:
        assert by.loc["u_decomp", "changed"]
        assert by.loc["u_decomp", "text_nfc"] == "already café inline."
    # null text stays null, changed false ('None' via normalize())
    assert by.loc["u_null", "text_nfc"] == "None"
    assert by.loc["u_null", "changed"] == False  # noqa: E712
    # decorated rows compose; undecorated ASCII rows pass through
    hs = _fnv(pa.array([r[0] for r in rows[:16]]))
    n_dec = int((np.asarray(hs) % np.uint64(W.NFC_MOD) == 0).sum())
    ascii_rows = out[out["url"].str.startswith("https://")]
    assert int(ascii_rows["changed"].sum()) == n_dec
    changed_texts = ascii_rows[ascii_rows["changed"]]["text_nfc"]
    for t in changed_texts:
        assert t.endswith(unicodedata.normalize("NFC", W.NFC_SUFFIX))
        assert "́" not in t  # composed, no combining marks remain


def test_normalize_unicode_fixture_twin(ray_session):
    """Driver-fixture equality + the decoration rate (the op must FIRE
    on the decorated eighth, not just hash-match)."""
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    out = _twin_equal(W.normalize_unicode(d),
                      O.normalize_unicode_sql(d + "/part-*.parquet"))
    rate = out["changed"].mean()
    assert 0.08 < rate < 0.16, rate  # ~1/8 decorated, minus null texts


def test_noindex_filter_twin_and_semantics(ray_session, tmp_path):
    from txiac_qc_ray.pipelines.docs import _mix64
    from txiac_qc_ray.functions.urls import fnv1a64 as _fnv

    # handcrafted corpus: real robots metas in the html itself (no
    # decoration dependence), plus case-insensitivity and null html
    rows = [
        ("u_plain", b"<html><head></head><body>hello</body></html>"),
        ("u_noidx", b'<html><head><meta name="robots" '
                    b'content="noindex"></head><body>x</body></html>'),
        ("u_nofol", b'<html><head><meta name="robots" '
                    b'content="nofollow"></head><body>x</body></html>'),
        ("u_upper", b'<html><head><META NAME="ROBOTS" '
                    b'CONTENT="NOINDEX,NOFOLLOW"></head><body>x</body></html>'),
        ("u_null", None),
    ]
    d = str(tmp_path / "noindex")
    os.makedirs(d)
    pq.write_table(pa.table({"url": pa.array([r[0] for r in rows]),
                             "html": pa.array([r[1] for r in rows],
                                              type=pa.binary())}),
                   os.path.join(d, "part-0.parquet"))
    out = _twin_equal(W.noindex_filter(d),
                      O.noindex_filter_sql(d + "/*.parquet"))
    by = out.set_index("url")
    # decoration may add directives to any non-null row; assert the
    # invariants that hold regardless: an embedded noindex always drops
    assert by.loc["u_noidx", "noindex"] == True  # noqa: E712
    assert by.loc["u_noidx", "keep"] == False  # noqa: E712
    assert by.loc["u_upper", "noindex"] == True  # noqa: E712
    assert by.loc["u_upper", "nofollow"] == True  # noqa: E712
    assert by.loc["u_nofol", "nofollow"] == True  # noqa: E712
    assert by.loc["u_null", "keep"] == False  # noqa: E712
    assert by.loc["u_null", "noindex"] == False  # noqa: E712
    # nofollow alone never drops: keep == NOT noindex for non-null html
    nn = out[out["url"] != "u_null"]
    assert (nn["keep"] == ~nn["noindex"]).all()
    # u_plain / u_nofol keep unless the decoration landed a noindex tag
    h = _mix64(_fnv(pa.array(["u_nofol"])) + np.uint64(W.NOINDEX_SALT))[0]
    decorated_noindex = (int(h) % W.NOINDEX_MOD == 0
                         and (int(h) // W.NOINDEX_MOD) % 2 == 0)
    assert bool(by.loc["u_nofol", "keep"]) == (not decorated_noindex)


def test_noindex_fixture_twin(ray_session):
    """Driver-fixture equality + decoration rates (the gate must FIRE
    on the decorated fifth: ~half noindex-dropped, ~half nofollow-kept)."""
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    out = _twin_equal(W.noindex_filter(d),
                      O.noindex_filter_sql(d + "/part-*.parquet"))
    assert 0.05 < out["noindex"].mean() < 0.15
    assert 0.12 < out["nofollow"].mean() < 0.28
    # nofollow-only pages are kept
    kept_nofollow = out[out["nofollow"] & ~out["noindex"]]
    assert len(kept_nofollow) > 50
    assert kept_nofollow["keep"].all()


def test_lexical_readability_fixture_twin(ray_session):
    """Driver-fixture equality + discriminating flag rates (the gate
    must FIRE on the repetition class, not just hash-match)."""
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    glob = d + "/part-*.parquet"
    lex = _twin_equal(W.lexical_diversity(d), O.lexical_diversity_sql(glob))
    rd = _twin_equal(W.readability_scores(d), O.readability_scores_sql(glob))
    for df in (lex, rd):
        rate = df["keep"].mean()
        assert 0.85 < rate < 0.97, rate


def test_lexical_readability_empty_pages(ray_session, tmp_path):
    """Empty-partition contract for the two s7 gates: typed empty out."""
    d = str(tmp_path)
    t = pa.table({"url": pa.array([], type=pa.string()),
                  "text": pa.array([], type=pa.string())})
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    for fn in (W.lexical_diversity, W.readability_scores):
        ds = fn(d)
        # Ray 2.49 to_pandas() drops columns on ANY empty dataset; the
        # typed contract lives in the Dataset schema (non-None only
        # because the ops seed it through the zero-row guard).
        names = ds.schema().names
        assert "url" in names and "keep" in names
        assert len(ds.to_pandas()) == 0


def test_extraction_yield_twin_and_semantics(ray_session, tmp_path):
    d = str(tmp_path)
    t = pa.table({
        "url": pa.array(["a", "b", "c", "d", "e", "f"]),
        "html": pa.array([b"<html>abcdefghij</html>",
                          b"<x>hello world this is content</x>",
                          None, None, b"<p></p>", b""],
                         type=pa.binary()),
        "text": pa.array(["abcdefghij",
                          "hello world this is content",
                          None, "abc", "", "x"], type=pa.string()),
    })
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    mine = _twin_equal(W.extraction_yield(d),
                       O.extraction_yield_sql(d + "/*.parquet"))
    by = mine.set_index("url")
    # chrome-heavy: 2*10 < 23 -> drop, ratio = 10/23 exactly
    assert by.loc["a", "keep"] == False  # noqa: E712
    assert by.loc["a", "yield_ratio"] == 10 / 23
    # content-heavy: 2*28 >= 35 -> keep
    assert by.loc["b", "keep"] == True  # noqa: E712
    assert by.loc["b", "text_bytes"] == 27 and by.loc["b", "html_bytes"] == 34
    # null text + null html -> NULL bytes/ratio, drop
    assert np.isnan(by.loc["c", "yield_ratio"])
    assert by.loc["c", "keep"] == False  # noqa: E712
    # text without html -> NULL html side, drop
    assert by.loc["d", "text_bytes"] == 3
    assert np.isnan(by.loc["d", "yield_ratio"])
    assert by.loc["d", "keep"] == False  # noqa: E712
    # empty text over non-empty html -> ratio 0.0, drop
    assert by.loc["e", "yield_ratio"] == 0.0
    assert by.loc["e", "keep"] == False  # noqa: E712
    # EMPTY html -> no defined ratio (never divide by zero), drop
    assert np.isnan(by.loc["f", "yield_ratio"])
    assert by.loc["f", "keep"] == False  # noqa: E712


def test_dedup_normalized_twin_and_semantics(ray_session, tmp_path):
    from txiac_qc_ray.functions.urls import fnv1a64

    d = str(tmp_path)
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    urls = ["https://t.example/a", "https://t.example/b",
            "https://t.example/c", "https://t.example/d",
            "https://t.example/e"]
    # precondition: only /c is recaptured by the decorated view
    mods = (fnv1a64(pa.array(urls)) % np.uint64(W.NORMDUP_MOD)).tolist()
    assert mods == [2, 3, 0, 1, 2]
    t = pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array([t0, t0 + pd.Timedelta(hours=1), t0, t0, t0],
                            type=pa.timestamp("us")),
        # /a and /b normalize to the same "hello world"; /d is null;
        # /e normalizes to empty (punct/whitespace only)
        "text": pa.array(["Hello,  World!", "hello world",
                          "Unique page text.", None, "  !!! ??? "],
                         type=pa.string()),
    })
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    mine = _twin_equal(W.dedup_normalized(d),
                       O.dedup_normalized_sql(d + "/*.parquet"))
    assert len(mine) == 2  # null + normalizes-to-empty are out of scope
    by = mine.set_index("url")
    # byte-unequal, normalized-equal pair collapses; earliest capture wins
    assert by.loc["https://t.example/a", "n_variants"] == 2
    assert "https://t.example/b" not in by.index
    # /c's perturbed recapture (uppercase reflow, +1 day) joins its group
    assert by.loc["https://t.example/c", "n_variants"] == 2
    assert by.loc["https://t.example/c", "first_ts"] == t0


def test_extraction_yield_dedup_normalized_fixture_twin(ray_session):
    """Driver-fixture equality + discriminating rates (the yield gate
    must FIRE on the short/empty/chrome class; the normalized dedup
    must actually COLLAPSE the reflowed recaptures)."""
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    glob = d + "/part-*.parquet"
    ey = _twin_equal(W.extraction_yield(d), O.extraction_yield_sql(glob))
    rate = ey["keep"].mean()
    assert 0.8 < rate < 0.97, rate
    dn = _twin_equal(W.dedup_normalized(d), O.dedup_normalized_sql(glob))
    multi = (dn["n_variants"] > 1).sum()
    # ~1/NORMDUP_MOD of textful pages gain a reflowed recapture; every
    # one must land in a multi-variant group
    assert multi > 300, multi
    assert dn["n_variants"].sum() > len(dn)


def test_extraction_yield_dedup_normalized_empty_pages(ray_session, tmp_path):
    d = str(tmp_path)
    t = pa.table({"url": pa.array([], type=pa.string()),
                  "warc_ts": pa.array([], type=pa.timestamp("us")),
                  "html": pa.array([], type=pa.binary()),
                  "text": pa.array([], type=pa.string())})
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    ds = W.extraction_yield(d)
    assert "keep" in ds.schema().names and len(ds.to_pandas()) == 0
    assert len(W.dedup_normalized(d).to_pandas()) == 0


def test_lang_confusion_twin_and_semantics(ray_session, tmp_path):
    d = str(tmp_path)
    en = ("the quick brown fox jumps over the lazy dog and the cat "
          "with all of that and this have been there") * 3
    de = ("der schnelle braune fuchs springt und der hund und die "
          "katze sind auch da mit dem und das ist ein") * 3
    t = pa.table({
        "url": pa.array([f"u{i}" for i in range(6)]),
        "text": pa.array([en, en, de, en, None, "   "], type=pa.string()),
        # u1 declares de over english text (the planted-mislabel case);
        # u4 null text, u5 tokenless text, u3 null declared lang
        "lang": pa.array(["en", "de", "de", None, "en", "en"],
                         type=pa.string()),
    })
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    mine = W.lang_confusion(d)
    orc = duckdb.connect().execute(O.lang_confusion_sql(d + "/*.parquet")).df()
    pd.testing.assert_frame_equal(normalize(mine), normalize(orc))
    cells = {(r.lang_declared, r.lang_pred): r.n_pages
             for r in mine.itertuples()}
    assert cells[("en", "en")] == 1
    assert cells[("de", "en")] == 1      # the planted mislabel fires
    assert cells[("de", "de")] == 1
    assert cells[(None, "en")] == 1      # null declared is a real cell
    assert cells[("en", None)] == 1      # null text -> NULL prediction
    assert cells[("en", "und")] == 1     # tokenless text -> 'und'
    assert mine["n_pages"].sum() == 6


def test_lang_confusion_fixture_twin(ray_session):
    """Driver-fixture equality + the audit must actually FIND the
    fixture's ~2% planted declared-lang mislabels."""
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    mine = W.lang_confusion(d)
    orc = duckdb.connect().execute(
        O.lang_confusion_sql(d + "/part-*.parquet")).df()
    pd.testing.assert_frame_equal(normalize(mine), normalize(orc))
    off_diag = mine[(mine["lang_declared"].notna())
                    & (mine["lang_pred"].notna())
                    & (mine["lang_pred"] != "und")
                    & (mine["lang_declared"] != mine["lang_pred"])]
    assert off_diag["n_pages"].sum() > 20  # the planted mislabels
    total = mine["n_pages"].sum()
    assert total == 2000


def test_lang_confusion_empty_pages(ray_session, tmp_path):
    d = str(tmp_path)
    t = pa.table({"url": pa.array([], type=pa.string()),
                  "text": pa.array([], type=pa.string()),
                  "lang": pa.array([], type=pa.string())})
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    out = W.lang_confusion(d)
    assert list(out.columns) == ["lang_declared", "lang_pred", "n_pages"]
    assert len(out) == 0


def test_pii_density_by_host_twin_and_pin(ray_session):
    """Fixture twin equality + the TRANSFER PIN: the rollup must be
    byte-equal to aggregating the in-cap pii_counts output by host —
    the driver's pii_counts value check then covers this op through
    the pin (the knn_self_join_ivf tail-exception pattern)."""
    from txiac_qc_ray.functions.urls import host_of_urls
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    mine = W.pii_density_by_host(d)
    orc = duckdb.connect().execute(
        O.pii_density_by_host_sql(d + "/part-*.parquet")).df()
    pd.testing.assert_frame_equal(normalize(mine), normalize(orc))
    # transfer pin: rollup of pii_counts' per-page rows, recomputed the
    # same way (int sums, int/int double divisions)
    pc_df = W.pii_counts(d).to_pandas()
    host = host_of_urls(pa.array(pc_df["url"].tolist(),
                                 type=pa.string())).to_pandas()
    roll = (pd.DataFrame({
                "host": host,
                "n_pages": 1,
                "n_pages_with_pii": pc_df["has_pii"].astype("int64"),
                "n_pii_total": pc_df["n_pii_total"].astype("int64")})
            .groupby("host", dropna=False).sum().reset_index()
            .sort_values("host", na_position="last", ignore_index=True))
    n = roll["n_pages"].to_numpy().astype("float64")
    roll["pii_rate"] = roll["n_pages_with_pii"].to_numpy() / n
    roll["pii_per_page"] = roll["n_pii_total"].to_numpy() / n
    for c in ("n_pages", "n_pages_with_pii", "n_pii_total"):
        roll[c] = roll[c].astype("int64")
    pd.testing.assert_frame_equal(normalize(mine), normalize(roll))
    # the rollup must single out the PII-heavy hosts (rate fires)
    assert mine["n_pii_total"].sum() > 50
    assert (mine["pii_rate"] > 0).any() and (mine["pii_rate"] == 0).any()


def test_crawl_drift_twin_and_pin(ray_session):
    """Fixture twin equality + the TRANSFER PIN vs the in-cap
    extraction_yield: bucketing its per-page text_bytes by the
    warc_ts hour must reproduce crawl_drift byte-for-byte."""
    import pyarrow.parquet as _pq
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    mine = W.crawl_drift(d)
    orc = duckdb.connect().execute(
        O.crawl_drift_sql(d + "/part-*.parquet")).df()
    pd.testing.assert_frame_equal(normalize(mine), normalize(orc))
    # transfer pin
    ey = W.extraction_yield(d).to_pandas()[["url", "text_bytes"]]
    raw = _pq.read_table(d, columns=["url", "warc_ts"]).to_pandas()
    j = raw.merge(ey, on="url")
    ts_us = (j["warc_ts"].to_numpy().astype("datetime64[us]")
             .astype("int64"))
    j["bucket_hour"] = ts_us // 3_600_000_000
    roll = (pd.DataFrame({
                "bucket_hour": j["bucket_hour"],
                "n_pages": 1,
                "n_text": j["text_bytes"].notna().astype("int64"),
                "total_text_bytes":
                    j["text_bytes"].fillna(0).astype("int64")})
            .groupby("bucket_hour").sum().reset_index()
            .sort_values("bucket_hour", ignore_index=True))
    nt = roll["n_text"].to_numpy().astype("float64")
    roll["mean_text_bytes"] = np.where(
        nt > 0, roll["total_text_bytes"].to_numpy() / nt, np.nan)
    for c in ("bucket_hour", "n_pages", "n_text", "total_text_bytes"):
        roll[c] = roll[c].astype("int64")
    pd.testing.assert_frame_equal(normalize(mine), normalize(roll))
    # the report has multiple buckets and a stable page total
    assert len(mine) >= 2 and mine["n_pages"].sum() == 2000


def test_pii_density_crawl_drift_empty_pages(ray_session, tmp_path):
    d = str(tmp_path)
    t = pa.table({"url": pa.array([], type=pa.string()),
                  "warc_ts": pa.array([], type=pa.timestamp("us")),
                  "text": pa.array([], type=pa.string())})
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    out = W.pii_density_by_host(d)
    assert len(out) == 0 and "pii_rate" in out.columns
    out = W.crawl_drift(d)
    assert len(out) == 0 and "mean_text_bytes" in out.columns


def test_dedup_normalized_rows_twin_and_pin(ray_session):
    """Fixture twin equality + the TRANSFER PIN: the in-cap report
    dedup_normalized's (url, n_variants) must be reconstructible
    BYTE-EQUAL from this op's (keep, norm_hash) — winners are the
    keep=true in-scope rows, group sizes the norm_hash counts."""
    from txiac_qc_ray.sources.pages import default_pages_dir

    d = default_pages_dir(2000)
    rows = W.dedup_normalized_rows(d).to_pandas()
    orc = duckdb.connect().execute(
        O.dedup_normalized_rows_sql(d + "/part-*.parquet")).df()
    pd.testing.assert_frame_equal(normalize(rows), normalize(orc))
    rep = W.dedup_normalized(d).to_pandas()
    ins = rows[rows["norm_hash"].notna()]
    sizes = ins.groupby("norm_hash").size()
    winners = ins[ins["keep"]].copy()
    winners["n_variants"] = winners["norm_hash"].map(sizes).astype("int64")
    rec = winners[["url", "n_variants"]].sort_values("url",
                                                     ignore_index=True)
    exp = rep[["url", "n_variants"]].sort_values("url", ignore_index=True)
    pd.testing.assert_frame_equal(rec, exp)
    # loser totals agree and out-of-scope rows never drop
    assert int((~rows["keep"]).sum()) == int((rep["n_variants"] - 1).sum())
    assert rows.loc[rows["norm_hash"].isna(), "keep"].all()


def test_rule_bank_ablation_consistency(ray_session):
    """Ablation counters agree with the funnel on the frozen fixture:
    a bank's funnel row counts first-fails, so it is bounded by the
    ablation's n_failed; unique drops are bounded by n_failed; and the
    kept population matches: docs failing NOTHING = funnel 'kept'."""
    from txiac_qc_ray.pipelines.webtext import (rule_bank_ablation,
                                                rule_bank_funnel)
    from txiac_qc_ray.sources.pages import default_pages_dir

    pages = default_pages_dir(2000)
    abl = rule_bank_ablation(pages).set_index("bank")
    fun = rule_bank_funnel(pages).set_index("drop_stage")
    for bank in abl.index:
        assert 0 <= abl.loc[bank, "n_unique_drops"] <= abl.loc[bank, "n_failed"]
        # first-fail count can never exceed total fails of that bank
        assert fun.loc[bank, "n_docs"] <= abl.loc[bank, "n_failed"]
    # a doc uniquely dropped by the LAST funnel stage (classifier) is
    # by definition that stage's first fail too
    assert (abl.loc["classifier", "n_unique_drops"]
            <= fun.loc["classifier", "n_docs"])
