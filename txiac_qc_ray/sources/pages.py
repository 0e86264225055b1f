"""Deterministic synthetic `pages` corpus (FIXTURES.md F1).

Schema (authoritative, BASELINE.json `input_hint`):
    url: string, warc_ts: timestamp[us], html: binary, text: string,
    lang: string

Every row is a pure function of ``(seed, row_index)`` — no wall clock, no
external data — so golden outputs are stable across processes, rounds and
file layouts. ``text`` is the ground truth of the HTML->text extractor
(stages/extract.py is the exact inverse of :func:`_render_html`); the
byte-identical-extraction invariant is tested against it.

Row mix (fractions of N, FIXTURES.md):
  70% clean English prose            -> passes all rules
   8% non-English (de/fr/es)         -> langid drop
   5% high-repetition                -> repetition-rule drop
   5% symbol/garbage                 -> heuristic (Gopher-style) drop
   4% too-short (<50 words)          -> length-rule drop
   1% empty text                     -> length-rule drop
   5% PII + mild-toxicity injections -> KEPT but scrubbed
   2% null/whitespace edge cases     -> NaN-propagation semantics
"""

from __future__ import annotations

import datetime
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..vocab import DE_WORDS, EN_WORDS, ES_WORDS, FR_WORDS, TOXICITY_LEXICON

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_BASE_TS = datetime.datetime(2024, 1, 1, 0, 0, 0)
_NONEN = (("de", DE_WORDS), ("fr", FR_WORDS), ("es", ES_WORDS))


def _zipf_cdf(n: int) -> np.ndarray:
    w = 1.0 / (np.arange(n, dtype=np.float64) + 5.0)
    return np.cumsum(w / w.sum())


_CDFS = {
    "en": _zipf_cdf(len(EN_WORDS)),
    "de": _zipf_cdf(len(DE_WORDS)),
    "fr": _zipf_cdf(len(FR_WORDS)),
    "es": _zipf_cdf(len(ES_WORDS)),
}
_VOCABS = {"en": EN_WORDS, "de": DE_WORDS, "fr": FR_WORDS, "es": ES_WORDS}


def _draw_words(rng: np.random.Generator, lang: str, n: int) -> list[str]:
    vocab, cdf = _VOCABS[lang], _CDFS[lang]
    idx = np.searchsorted(cdf, rng.random(n), side="left")
    return [vocab[j] for j in idx]


def _sentences_to_text(words: list[str], rng: np.random.Generator) -> str:
    """Group words into sentences (5-40 words) and paragraphs (3-6 sentences)."""
    sents: list[str] = []
    i = 0
    while i < len(words):
        k = int(rng.integers(5, 41))
        chunk = words[i : i + k]
        i += k
        if chunk:
            chunk = [chunk[0].capitalize()] + chunk[1:]
            sents.append(" ".join(chunk) + ".")
    paras: list[str] = []
    j = 0
    while j < len(sents):
        k = int(rng.integers(3, 7))
        paras.append(" ".join(sents[j : j + k]))
        j += k
    return "\n\n".join(paras)


_PII_MAKERS = (
    lambda rng: f"contact.{int(rng.integers(10, 99))}@mail{int(rng.integers(0, 9))}.example.com",
    lambda rng: f"({int(rng.integers(200, 999))}) 555-{int(rng.integers(0, 10000)):04d}",
    lambda rng: f"{int(rng.integers(100, 900))}-{int(rng.integers(10, 99))}-{int(rng.integers(0, 10000)):04d}",
    lambda rng: f"{int(rng.integers(1, 255))}.{int(rng.integers(0, 255))}.{int(rng.integers(0, 255))}.{int(rng.integers(1, 255))}",
)


def generate_page(seed: int, i: int) -> dict:
    """Pure function of (seed, i) -> one pages row (dict of python values)."""
    rng = np.random.default_rng([seed, i])
    u = rng.random()
    lang = "en"
    if u < 0.70:  # clean English
        words = _draw_words(rng, "en", int(rng.integers(80, 400)))
        text = _sentences_to_text(words, rng)
    elif u < 0.78:  # non-English
        lang, _ = _NONEN[int(rng.integers(0, 3))]
        words = _draw_words(rng, lang, int(rng.integers(80, 400)))
        text = _sentences_to_text(words, rng)
    elif u < 0.83:  # high repetition
        phrase = " ".join(_draw_words(rng, "en", int(rng.integers(3, 9))))
        reps = int(rng.integers(20, 60))
        filler = _sentences_to_text(_draw_words(rng, "en", int(rng.integers(20, 60))), rng)
        text = filler + "\n\n" + " ".join([phrase] * reps) + "."
    elif u < 0.88:  # symbol garbage
        syms = ["#$%&", "@@!!", "***", "$$$", "%%^^", "<<>>", "||~~", "++=="]
        n = int(rng.integers(60, 200))
        toks = []
        for j in np.asarray(rng.integers(0, 10, n)):
            if j < 7:
                toks.append(syms[int(rng.integers(0, len(syms)))])
            else:
                toks.append(EN_WORDS[int(rng.integers(0, len(EN_WORDS)))])
        text = " ".join(toks)
    elif u < 0.92:  # too short (<50 words)
        words = _draw_words(rng, "en", int(rng.integers(3, 45)))
        text = _sentences_to_text(words, rng)
    elif u < 0.93:  # empty
        text = ""
    elif u < 0.98:  # PII + mild toxicity -> kept but scrubbed
        words = _draw_words(rng, "en", int(rng.integers(120, 400)))
        n_inj = int(rng.integers(1, 4))
        for _ in range(n_inj):
            pii = _PII_MAKERS[int(rng.integers(0, len(_PII_MAKERS)))](rng)
            pos = int(rng.integers(0, len(words)))
            words.insert(pos, pii)
        if rng.random() < 0.7:
            tox = TOXICITY_LEXICON[int(rng.integers(0, len(TOXICITY_LEXICON)))]
            words.insert(int(rng.integers(0, len(words))), tox)
        text = _sentences_to_text(words, rng)
    else:  # edge cases: null text / null lang / whitespace-only
        e = rng.random()
        if e < 0.4:
            text = None
        elif e < 0.7:
            words = _draw_words(rng, "en", int(rng.integers(80, 200)))
            text = _sentences_to_text(words, rng)
            lang = None
        else:
            text = "  \t \n   "

    # declared page lang is wrong ~2% of the time (langid must disagree)
    if lang is not None and rng.random() < 0.02:
        others = [x for x in ("en", "de", "fr", "es") if x != lang]
        lang = others[int(rng.integers(0, 3))]

    host = int(100 * rng.random() ** 3)  # Zipf-ish host skew for partition tests
    url = f"https://host{host:03d}.example/p/{i:08d}"
    ts = _BASE_TS + datetime.timedelta(seconds=7 * i)
    html = None if text is None else _render_html(text, i).encode("utf-8")
    return {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}


def _escape(s: str) -> str:
    """Deterministic HTML escaping (inverse applied by stages/extract.py)."""
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#x27;")
    )


def _render_html(text: str, i: int) -> str:
    paras = text.split("\n\n")
    body = "\n".join(f"<p>{_escape(p)}</p>" for p in paras)
    return (
        "<html><head><title>Doc "
        + str(i)
        + "</title>\n"
        + "<style>body { font-family: sans-serif; } .content { margin: 1em; }</style>\n"
        + '<script>var x = 42; console.log("boilerplate " + x);</script>\n'
        + "</head><body>\n"
        + '<nav><a href="/">Home</a> | <a href="/about">About</a> | <a href="/contact">Contact</a></nav>\n'
        + '<div class="content">\n'
        + body
        + "\n</div>\n"
        + "<footer>&copy; 2024 example.com &mdash; All rights reserved.</footer>\n"
        + "</body></html>"
    )


def pages_batch(seed: int, start: int, n: int) -> pa.Table:
    rows = [generate_page(seed, i) for i in range(start, start + n)]
    cols = {k: [r[k] for r in rows] for k in ("url", "warc_ts", "html", "text", "lang")}
    return pa.table(cols, schema=PAGES_SCHEMA)


ROWS_PER_FILE = 2_500  # frozen so file contents depend only on (seed, index);
# small files + small row groups keep read (and fused map) parallelism high —
# 100k docs -> 40 files, matching a many-shard layout at scale


def generate_pages_parquet(out_dir: str, n_docs: int, seed: int = 42) -> str:
    """Write the corpus as multiple parquet shards (cached & resumable).

    Files are `part-{k:05d}.parquet`, each covering a fixed index range, so
    any shard can be (re)generated independently — the generation itself
    follows the resumable-partitioned-output layout used by the pipeline.
    """
    meta_path = os.path.join(out_dir, "_meta.json")
    meta = {"n_docs": n_docs, "seed": seed, "rows_per_file": ROWS_PER_FILE, "v": 2}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f) == meta:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for k, start in enumerate(range(0, n_docs, ROWS_PER_FILE)):
        n = min(ROWS_PER_FILE, n_docs - start)
        path = os.path.join(out_dir, f"part-{k:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pages_batch(seed, start, n), tmp, row_group_size=500)
        os.replace(tmp, path)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return out_dir


def default_pages_dir(n_docs: int, seed: int = 42, root: str = "/tmp/txiac_pages") -> str:
    """Cache location for a corpus of a given size; generates on first use."""
    out = os.path.join(root, f"seed{seed}_n{n_docs}")
    return generate_pages_parquet(out, n_docs, seed)
