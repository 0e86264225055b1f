"""Published web-text quality-filter operators over the `pages` corpus
(url, warc_ts, html, text, lang — BASELINE.json input_hint shape).

Three standalone, value-checked operators that complement the flagship's
fused rule stage (stages/rules.py) with the published C4 / Gopher rule
families, each expressed as ONE stateless vectorized `map_batches` pass:

- `scrub_docs`      — the PII/toxicity regex scrub as its own query
                      (north_rule "regex scrub transforms"; the flagship
                      exercises it only inside the golden compare);
- `c4_line_filter`  — C4's line-level cleaning (Raffel et al. 2020 §2.2):
                      keep lines ending in terminal punctuation with >=3
                      words and no "javascript"; drop pages with
                      "lorem ipsum", a curly brace, a bad word, or fewer
                      than 5 sentences after cleaning;
- `gopher_quality_flags` — Gopher's doc-level heuristics (Rae et al. 2021
                      A1.1): word count 50..100k, mean word length 3..10,
                      symbol-to-word ratio, >=80% words with an alphabetic
                      char, >=2 canonical stop words, <=90% bullet lines,
                      <=30% ellipsis lines.

Parity strategy: every predicate is a single RE2 pattern or an integer
count, evaluated by pyarrow's RE2 kernels here and by DuckDB's RE2
`regexp_*` functions in the oracle twins (oracles.py) — same spec, two
independent engines. All ratio columns are int/int double divisions so
the float64 values are bitwise-identical on both sides.

Scale notes: one streamed pass, no shuffle, no driver state; line-level
work flattens each batch's lines into a single Arrow array (vectorized
predicates) and reassembles per-doc via offset arithmetic — never a
Python loop over rows or lines.

Reference analog: the reference flags rows via per-measure threshold
rules (Home.py:176-183); these are the web-text rule banks north_rule
substitutes for those measures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.textstats import _SYMBOL_CLASS, tokenize
from ..functions.urls import fnv1a64, host_of_urls
from ..stages.scrub import SCRUB_PATTERNS, scrub_texts
from .docs import _hex16 as _hex16_str
from .docs import _mix64

# ---- shared RE2 patterns (the SQL twins embed the SAME strings) --------
WORD_RE = r"\S+"
C4_TERMINAL_RE = r'[.!?"]$'        # line ends in terminal punctuation
C4_MIN_LINE_WORDS = 3
C4_JAVASCRIPT_RE = r"(?i)javascript"
C4_LOREM_RE = r"(?i)lorem ipsum"
C4_MIN_SENTENCES = 5
SENTENCE_RE = r"[.!?]"
# A sentence END for the readability gate is a maximal run of terminal
# punctuation ("..." / "?!" end ONE sentence, not three) — a different
# spec from C4's per-character SENTENCE_RE, hence a separate constant.
SENTENCE_RUN_RE = r"[.!?]+"
# Readability bounds: mean words-per-sentence outside [READ_MIN_WPS,
# READ_MAX_WPS] marks fragment lists (nav chrome, tag soup) on the low
# end and unpunctuated run-ons (the repetition class) on the high end.
READ_MIN_WPS, READ_MAX_WPS = 3, 40
# Lexical-diversity gate: keep iff distinct-token fraction (type-token
# ratio) >= LEX_MIN_TTR_NUM/LEX_MIN_TTR_DEN — cross-multiplied in
# integers so both engines compare exactly.
LEX_MIN_TTR_NUM, LEX_MIN_TTR_DEN = 1, 5
# the C4 bad-word list IS the scrub bank's frozen toxicity pattern —
# reference the same constant so they can never drift apart
BADWORD_RE = next(p for n, p, _ in SCRUB_PATTERNS if n == "toxicity")

ALPHA_WORD_RE = r"[^\s]*[A-Za-z][^\s]*"   # a whitespace token with a letter
SYMBOL_RE = _SYMBOL_CLASS                 # same chars as the feature stage
WHITESPACE_RE = r"\s"
# Gopher's canonical "must contain >=2 of" stop-word list (Rae et al. A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_STOPWORD_RE = r"\b(?:" + "|".join(GOPHER_STOPWORDS) + r")\b"
BULLET_LINE_RE = "^\\s*[-*•]"
ELLIPSIS_LINE_RE = "(\\.\\.\\.|…)$"

# Gopher repetition thresholds (Rae et al. 2021 table A1): a doc is
# dropped when ANY fraction exceeds its bound.
REP_MAX_DUP_LINE_FRAC = 0.30
REP_MAX_DUP_LINE_CHAR_FRAC = 0.20
REP_MAX_DUP_PARA_FRAC = 0.30
REP_MAX_DUP_PARA_CHAR_FRAC = 0.20
REP_MAX_TOP_GRAM_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
REP_MAX_DUP_GRAM_FRAC = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12,
                         9: 0.11, 10: 0.10}
TOKEN_RE = r"[a-z]+"  # tokenize()'s [a-z]+ runs over lowercased text

# URL-level filtering (the C4-family domain blocklist step): scheme must
# be http(s), host must not be blocklisted, path must not be a static
# asset. One host charset constant builds BOTH engines' patterns (pyarrow
# extract_regex needs a named group, DuckDB regexp_extract a plain one).
URL_HOST_CHARSET = r"[^/?#]+"
URL_HOST_BLOCKLIST = ("host013.example", "host042.example",
                      "host077.example", "ads.example", "tracker.example")
URL_BAD_EXT_RE = r"(?i)\.(?:jpe?g|png|gif|webp|css|js|ico|pdf|zip)(?:[?#].*)?$"

GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MEAN_LEN_LO, GOPHER_MEAN_LEN_HI = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3


def _read_pages_text(paths: str | list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(paths, columns=["url", "text"])


def _as_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def scrub_docs(paths: str | list[str]) -> ray.data.Dataset:
    """PII/toxicity scrub over EVERY page -> (url, scrubbed_text, scrubbed).

    Null text stays null with scrubbed=false. Same frozen pattern bank
    (and candidate prefilter) as the flagship's ScrubStage."""
    def stage(t: pa.Table) -> pa.Table:
        out, changed = scrub_texts(_as_array(t.column("text")))
        return pa.table({
            "url": t["url"],
            "scrubbed_text": out,
            "scrubbed": pa.array(changed),
        })

    return _read_pages_text(paths).map_batches(stage, batch_format="pyarrow")


def _url_keep(url: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """-> (host, keep) for a url column: host = the NORMALIZED host of
    an http(s) URL — authority lowercased, userinfo ('user@'), port
    (':8080') and the FQDN trailing dot stripped — null when the scheme
    is not http/https or the url is null; keep = host parsed AND host
    not in URL_HOST_BLOCKLIST AND the path is not a static asset
    (URL_BAD_EXT_RE). Normalizing BEFORE the blocklist test matters:
    'https://ADS.example:8080/x', 'https://u@ads.example/x' and
    'https://ads.example./x' are all the blocked domain — an exact
    compare on the raw authority is trivially evadable. The port strip
    is digits-only so IPv6 literals ('[2001:db8::1]') survive intact.
    Out of scope (documented, not silent): percent-encoded hostnames
    ('ads%2eexample') — crawl pipelines see DNS-resolvable hostnames,
    and decoding belongs to a URL canonicalizer, not a filter. Shared
    by the standalone query and the flagship's opt-in `url` rule bank."""
    host_pat = "^https?://(?P<host>" + URL_HOST_CHARSET + ")"
    auth = pc.struct_field(pc.extract_regex(url, host_pat), "host")
    # each pattern matches at most once ('^.*@' anchored+greedy -> last
    # '@'; the two '$'-anchored strips), so Arrow's replace-all equals
    # the SQL twin's replace-first
    host = pc.utf8_lower(pc.replace_substring_regex(
        pc.replace_substring_regex(
            pc.replace_substring_regex(auth, "^.*@", ""),
            ":[0-9]*$", ""),
        "\\.+$", ""))
    # an authority that strips to nothing ('https://:8080/x') is no
    # host at all -> null (the SQL twin's outer nullif)
    host = pc.if_else(pc.equal(host, ""), pa.scalar(None, pa.string()), host)
    valid = np.asarray(pc.is_valid(host))
    blocked = np.asarray(pc.fill_null(
        pc.is_in(host, value_set=pa.array(URL_HOST_BLOCKLIST)), False))
    bad_ext = np.asarray(pc.fill_null(
        pc.match_substring_regex(url, URL_BAD_EXT_RE), False))
    return host, valid & ~blocked & ~bad_ext


def url_host_filter(paths: str | list[str]) -> ray.data.Dataset:
    """URL-level filtering -> (url, host, keep): the step every web
    pipeline runs BEFORE fetching/cleaning text (C4 §2.2's badword-domain
    blocklist analog). One stateless vectorized pass, no shuffle —
    complements `cap_per_host` (which bounds per-domain VOLUME; this
    drops domains outright)."""
    ds = ray.data.read_parquet(paths, columns=["url"])

    def stage(t: pa.Table) -> pa.Table:
        url = _as_array(t.column("url"))
        host, keep = _url_keep(url)
        return pa.table({"url": url, "host": host, "keep": pa.array(keep)})

    return ds.map_batches(stage, batch_format="pyarrow")


def _line_split(text: pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """-> (flat lines of the VALID rows, per-row line counts (0 for null),
    validity mask). Segment k of the flat array covers rows with
    offsets[k]..offsets[k+1] where offsets = cumsum of the counts."""
    lst = pc.split_pattern(text, "\n")
    valid = np.asarray(pc.is_valid(text))
    counts = np.asarray(pc.fill_null(pc.list_value_length(lst), 0),
                        dtype=np.int64)
    flat = _as_array(pc.list_flatten(lst))
    return flat, counts, valid


def _segment_counts(flags: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-row sums of a flat boolean line array segmented by `counts`."""
    cs = np.concatenate([[0], np.cumsum(flags, dtype=np.int64)])
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def _c4_stats(text: pa.Array, split=None) -> dict:
    """Core of the C4 line filter (shared by the query stage and the
    flagship's opt-in rule bank): -> dict of clean_text (pa.Array),
    n_lines/n_kept (int64 np), keep (bool np). `split` = a precomputed
    _line_split(text) to share across banks (deterministic, so shared
    vs per-call splits are identical)."""
    flat, counts, valid = split if split is not None else _line_split(text)
    keep_line = (
        np.asarray(pc.match_substring_regex(flat, C4_TERMINAL_RE))
        & np.asarray(pc.greater_equal(
            pc.count_substring_regex(flat, WORD_RE), C4_MIN_LINE_WORDS))
        & ~np.asarray(pc.match_substring_regex(flat, C4_JAVASCRIPT_RE))
    )
    n_kept = _segment_counts(keep_line, counts)
    kept_flat = flat.filter(pa.array(keep_line))
    new_off = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
    clean_list = pa.ListArray.from_arrays(
        pa.array(new_off, type=pa.int32()), kept_flat)
    joined = pc.binary_join(clean_list, "\n")
    clean_text = pc.if_else(pa.array(valid), joined,
                            pa.scalar(None, pa.string()))
    n_sent = np.asarray(pc.fill_null(
        pc.count_substring_regex(clean_text, SENTENCE_RE), 0))
    bad = (
        np.asarray(pc.fill_null(
            pc.match_substring_regex(text, C4_LOREM_RE), True))
        | np.asarray(pc.fill_null(
            pc.match_substring(text, "{"), True))
        | np.asarray(pc.fill_null(
            pc.match_substring_regex(text, BADWORD_RE), True))
    )
    keep = valid & ~bad & (n_sent >= C4_MIN_SENTENCES)
    return {"clean_text": clean_text, "n_lines": counts,
            "n_kept": n_kept, "keep": keep}


def c4_line_filter(paths: str | list[str]) -> ray.data.Dataset:
    """C4 line-level cleaning -> (url, clean_text, n_lines, n_kept, keep).

    clean_text = the kept lines re-joined with '\\n' ('' if none survive,
    null for null text). keep = doc-level C4 retention: no "lorem ipsum",
    no '{', no bad word (raw text), and >=5 sentences in clean_text."""
    def stage(t: pa.Table) -> pa.Table:
        s = _c4_stats(_as_array(t.column("text")))
        return pa.table({
            "url": t["url"],
            "clean_text": s["clean_text"],
            "n_lines": pa.array(s["n_lines"], type=pa.int64()),
            "n_kept": pa.array(s["n_kept"], type=pa.int64()),
            "keep": pa.array(s["keep"]),
        })

    return _read_pages_text(paths).map_batches(stage, batch_format="pyarrow")


def gopher_quality_flags(paths: str | list[str]) -> ray.data.Dataset:
    """Gopher doc-level heuristics -> per-doc stats + `gopher_keep`.

    Columns: url, n_words, n_stop (int64; 0 for null text), mean_word_len,
    symbol_word_ratio, frac_alpha_words (null when n_words=0),
    frac_bullet_lines, frac_ellipsis_lines (null for null text),
    gopher_keep (bool, false for null text)."""
    def stage(t: pa.Table) -> pa.Table:
        cols = _gopher_stats(_as_array(t.column("text")))
        return pa.table({"url": t["url"], **cols})

    return _read_pages_text(paths).map_batches(stage, batch_format="pyarrow")


def _gopher_stats(text: pa.Array, split=None) -> dict[str, pa.Array]:
    """Core of the Gopher doc heuristics (shared by the query stage and
    the flagship's opt-in rule bank); `split` as in _c4_stats."""
    valid = np.asarray(pc.is_valid(text))

    def count(pattern: str, arr: pa.Array = text) -> np.ndarray:
        return np.asarray(pc.fill_null(
            pc.count_substring_regex(arr, pattern), 0)).astype(np.int64)

    n_words = count(WORD_RE)
    n_alpha = count(ALPHA_WORD_RE)
    n_sym = count(SYMBOL_RE)
    n_stop = count(GOPHER_STOPWORD_RE, pc.utf8_lower(text))
    wchars = np.asarray(pc.fill_null(pc.utf8_length(
        pc.replace_substring_regex(text, pattern=WHITESPACE_RE,
                                   replacement="")), 0)).astype(np.int64)

    flat, n_lines, _ = split if split is not None else _line_split(text)
    bullet = np.asarray(pc.match_substring_regex(flat, BULLET_LINE_RE))
    ellipsis = np.asarray(pc.match_substring_regex(flat, ELLIPSIS_LINE_RE))
    n_bullet = _segment_counts(bullet, n_lines)
    n_ellipsis = _segment_counts(ellipsis, n_lines)

    with np.errstate(divide="ignore", invalid="ignore"):
        mean_len = np.where(n_words > 0, wchars / n_words, np.nan)
        sym_ratio = np.where(n_words > 0, n_sym / n_words, np.nan)
        alpha_frac = np.where(n_words > 0, n_alpha / n_words, np.nan)
        bullet_frac = np.where(n_lines > 0, n_bullet / n_lines, np.nan)
        ell_frac = np.where(n_lines > 0, n_ellipsis / n_lines, np.nan)

    with np.errstate(invalid="ignore"):
        keep = (
            valid
            & (n_words >= GOPHER_MIN_WORDS)
            & (n_words <= GOPHER_MAX_WORDS)
            & (mean_len >= GOPHER_MEAN_LEN_LO)
            & (mean_len <= GOPHER_MEAN_LEN_HI)
            & (sym_ratio <= GOPHER_MAX_SYMBOL_RATIO)
            & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
            & (n_stop >= GOPHER_MIN_STOPWORDS)
            & (bullet_frac <= GOPHER_MAX_BULLET_FRAC)
            & (ell_frac <= GOPHER_MAX_ELLIPSIS_FRAC)
        )

    def frac_col(arr: np.ndarray, null_when: np.ndarray) -> pa.Array:
        return pa.array(arr, type=pa.float64(), mask=null_when)

    return {
        "n_words": pa.array(n_words, type=pa.int64()),
        "n_stop": pa.array(n_stop, type=pa.int64()),
        "mean_word_len": frac_col(mean_len, n_words == 0),
        "symbol_word_ratio": frac_col(sym_ratio, n_words == 0),
        "frac_alpha_words": frac_col(alpha_frac, n_words == 0),
        "frac_bullet_lines": frac_col(bullet_frac, n_lines == 0),
        "frac_ellipsis_lines": frac_col(ell_frac, n_lines == 0),
        "gopher_keep": pa.array(keep),
    }


def _all_gram_runs(ids: np.ndarray, doc_of: np.ndarray, lens: np.ndarray,
                   ns: tuple[int, ...]) -> dict:
    """Exact per-(doc, n-gram) occurrence groups for EVERY n in `ns`,
    from ONE sort.

    Grouping keys are the dictionary-id columns themselves, NOT a hash —
    two distinct grams can never merge, so the counts equal the SQL
    twin's string-keyed counts exactly. One lexsort on (doc, c_0..c_9)
    orders positions so that, by the lexicographic prefix property,
    positions sharing any n-prefix are contiguous FOR ALL n at once;
    per n we filter to positions whose gram fits inside the doc (a
    subsequence keeps contiguity) and cut runs by comparing the first
    n id columns of consecutive kept rows. Out-of-range tail positions
    pad with the encoding's 0 (< every real id+1; they appear only in
    rows the per-n validity filter removes or in key positions past n).

    -> {n: (doc of each group, count per group, char length of the
    gram incl. its n-1 joining spaces)}. charlen is read from one
    representative occurrence per group — valid because `lens` is a
    function of the dictionary id (same id == same token == same
    length), which tokenize() guarantees.

    The n_max id columns are BIT-PACKED, first id most significant,
    into ceil(n_max / (63 // bits)) int64 words (bits = width of the
    largest id+1; pads encode as 0, real ids as id+1, so packing is
    injective and word order == tuple order). A per-batch dictionary is
    small (~10-20 bits), so 10 id columns typically fit TWO words:
    the lexsort runs on 3 keys instead of 11 and each per-n run-cut
    compares at most 2 words (the last masked to its first n-w*ipw ids
    by a right shift) instead of n columns — ~3x on the whole op,
    hash-free exactness unchanged."""
    z = np.zeros(0, dtype=np.int64)
    n_max = max(ns)
    T = len(ids)
    if T < min(ns):
        return {n: (z, z, z) for n in ns}
    bits = int(int(ids.max(initial=0)) + 1).bit_length()
    ipw = max(1, 63 // bits)  # ids per 63-bit word (sign bit untouched)
    enc = ids + 1  # encoded once; pads stay 0
    words, wcounts = [], []
    for w0 in range(0, n_max, ipw):
        cnt = min(ipw, n_max - w0)
        word = np.zeros(T, dtype=np.int64)
        for k in range(w0, w0 + cnt):
            word <<= bits
            # max() guards short streams: a negative T-k slice would wrap
            word[: max(0, T - k)] |= enc[k:]
        words.append(word)
        wcounts.append(cnt)
    order = np.lexsort(tuple(reversed(words)) + (doc_of,))
    doc_s = doc_of[order]
    words_s = [w[order] for w in words]
    cum = np.concatenate([[0], np.cumsum(lens, dtype=np.int64)])
    out = {}
    for n in ns:
        if T < n:
            out[n] = (z, z, z)
            continue
        valid = np.zeros(T, dtype=bool)
        valid[: T - (n - 1)] = doc_of[: T - (n - 1)] == doc_of[n - 1:]
        keep = valid[order]
        sub = np.nonzero(keep)[0]
        if not len(sub):
            out[n] = (z, z, z)
            continue
        first = np.ones(len(sub), dtype=bool)
        if len(sub) > 1:
            prev, cur = sub[:-1], sub[1:]
            same_run = doc_s[cur] == doc_s[prev]
            rem = n
            for w, cnt in zip(words_s, wcounts):
                if rem <= 0:
                    break
                if rem >= cnt:
                    same_run &= w[cur] == w[prev]
                else:
                    sh = (cnt - rem) * bits  # keep the first `rem` ids
                    same_run &= (w[cur] >> sh) == (w[prev] >> sh)
                rem -= cnt
            first[1:] = ~same_run
        run_start = np.nonzero(first)[0]
        counts = np.diff(np.concatenate([run_start, [len(sub)]]))
        starts = order[sub[run_start]]
        charlen = cum[starts + n] - cum[starts] + (n - 1)
        out[n] = (doc_s[sub[run_start]], counts.astype(np.int64),
                  charlen.astype(np.int64))
    return out


def gopher_repetition_stats(paths: str | list[str]) -> ray.data.Dataset:
    """Gopher repetition filters (Rae et al. 2021 A1.1) -> per-doc stats.

    Columns: url, frac_dup_lines (duplicate occurrences / lines),
    frac_chars_dup_lines (chars in lines occurring >=2x / all line chars),
    frac_chars_top_{2,3,4}gram (count x char-length of the most frequent
    word n-gram / total token chars; ties broken toward the SHORTEST gram,
    which fixes the value since count and length determine it),
    frac_chars_dup_{5..10}grams (chars across all n-grams occurring >=2x
    / total token chars; the overlap-uncorrected variant — the COMPLETE
    published family, bounds 0.15 down to 0.10), repetition_keep.

    Tokens are tokenize()'s lowercase [a-z]+ runs; fractions clip at 1.0
    (overlapping self-similar grams can exceed it). Null text -> null
    stats + keep=false; a doc with no tokens (or no line chars) gets null
    gram (line-char) fractions and keep=false."""
    def stage(t: pa.Table) -> pa.Table:
        cols = _repetition_stats(_as_array(t.column("text")))
        return pa.table({"url": t["url"], **cols})

    return _read_pages_text(paths).map_batches(stage, batch_format="pyarrow")


# FineWeb's three supplementary line filters (Penedo et al. 2024 §3.6,
# the C4/Gopher-complementing heuristics their ablations kept): drop a
# doc when (a) fewer than 12% of its lines end in terminal punctuation,
# (b) 67% or more of its lines are shorter than 30 characters, or
# (c) 10% or more of its line characters sit in duplicated lines.
# All three are integer cross-multiplies here (100*n_punct >= 12*n_lines
# etc.) so both engines decide exactly; the reported fractions are
# single int/int double divisions -> bitwise-identical floats.
FINEWEB_MIN_PUNCT_LINE_PCT = 12
FINEWEB_SHORT_LINE_CHARS = 30
FINEWEB_MAX_SHORT_LINE_PCT = 67
FINEWEB_MAX_DUP_LINE_CHAR_PCT = 10


def _fineweb_stats(text: pa.Array, split=None) -> dict:
    """Core of the FineWeb line filters (shared by the query stage and
    the flagship's opt-in rule bank): -> dict of int64/float64 numpy
    arrays + keep. `split` = a precomputed _line_split(text)."""
    flat, counts, valid = split if split is not None else _line_split(text)
    n_docs = len(counts)
    ends_punct = np.asarray(pc.match_substring_regex(flat, C4_TERMINAL_RE))
    line_lens = (np.asarray(pc.utf8_length(flat), dtype=np.int64)
                 if len(flat) else np.zeros(0, dtype=np.int64))
    short = line_lens < FINEWEB_SHORT_LINE_CHARS
    n_punct = _segment_counts(ends_punct, counts)
    n_short = _segment_counts(short, counts)
    # duplicated-line chars: same lexsort run-length pass as the Gopher
    # family's dup_segment_stats, kept in integers for the keep rule
    sdoc = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    line_chars = np.zeros(n_docs, dtype=np.int64)
    np.add.at(line_chars, sdoc, line_lens)
    dup_chars = np.zeros(n_docs, dtype=np.int64)
    if len(flat):
        sid = np.asarray(pc.dictionary_encode(flat).indices, dtype=np.int64)
        order = np.lexsort((sid, sdoc))
        ss, ds = sid[order], sdoc[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (ss[1:] != ss[:-1]) | (ds[1:] != ds[:-1])
        run_start = np.nonzero(first)[0]
        rcnt = np.diff(np.concatenate([run_start, [len(order)]]))
        dmask = rcnt >= 2
        np.add.at(dup_chars, ds[run_start][dmask],
                  rcnt[dmask] * line_lens[order][run_start][dmask])
    # a doc with zero line chars has nothing duplicated: rule (c)
    # passes (100*0 < 10*0 is false, so it needs the explicit branch)
    dup_ok = ((100 * dup_chars < FINEWEB_MAX_DUP_LINE_CHAR_PCT * line_chars)
              | (line_chars == 0))
    keep = (
        valid
        & (100 * n_punct >= FINEWEB_MIN_PUNCT_LINE_PCT * counts)
        & (100 * n_short < FINEWEB_MAX_SHORT_LINE_PCT * counts)
        & dup_ok
    )
    return {"n_lines": counts, "n_punct": n_punct, "n_short": n_short,
            "line_chars": line_chars, "dup_chars": dup_chars,
            "valid": valid, "keep": keep}


def fineweb_quality_flags(paths: str | list[str]) -> ray.data.Dataset:
    """FineWeb supplementary line filters (Penedo et al. 2024 §3.6) ->
    (url, n_lines, punct_line_frac, short_line_frac, dup_line_char_frac,
    keep): the three published heuristics FineWeb's ablations added on
    top of C4/Gopher — terminal-punctuation line ratio (drop < 12%),
    short-line (<30 chars) ratio (drop >= 67%), and duplicated-line
    character fraction (drop >= 10%).

    Null text -> null fractions, keep=false; dup_line_char_frac is null
    when the doc has zero line characters (rule (c) passes — nothing is
    duplicated). Fractions are single int/int double divisions and the
    keep rule is three integer cross-multiplies, so the DuckDB twin is
    bit-identical.

    Scale shape: one stateless vectorized pass (line split -> flat RE2 /
    length kernels -> one per-batch lexsort for the dup-line runs), no
    shuffle, no driver state — a pure map at 100 TB.

    Reference analog: Home.py's per-measure threshold rules (H:176-183)
    re-expressed as the published FineWeb bank (north_rule's heuristic
    quality rules)."""
    def stage(t: pa.Table) -> pa.Table:
        s = _fineweb_stats(_as_array(t.column("text")))
        nl, lc = s["n_lines"], s["line_chars"]
        with np.errstate(divide="ignore", invalid="ignore"):
            punct = np.where(nl > 0, s["n_punct"] / np.where(nl > 0, nl, 1),
                             np.nan)
            shortf = np.where(nl > 0, s["n_short"] / np.where(nl > 0, nl, 1),
                              np.nan)
            dupf = np.where(lc > 0, s["dup_chars"] / np.where(lc > 0, lc, 1),
                            np.nan)
        invalid = ~s["valid"]
        return pa.table({
            "url": t["url"],
            "n_lines": pa.array(np.where(s["valid"], nl, 0),
                                type=pa.int64(), mask=invalid),
            "punct_line_frac": pa.array(punct, type=pa.float64(),
                                        mask=invalid),
            "short_line_frac": pa.array(shortf, type=pa.float64(),
                                        mask=invalid),
            "dup_line_char_frac": pa.array(dupf, type=pa.float64(),
                                           mask=invalid | (lc == 0)),
            "keep": pa.array(s["keep"]),
        })

    return _read_pages_text(paths).map_batches(stage, batch_format="pyarrow")


# Unicode NFC normalization (the CCNet/ftfy-family preprocessing step
# that canonicalizes combining sequences before hashing/dedup — without
# it, byte-exact dedup misses visually-identical recaptures that differ
# only in composition form). The fixture corpus is pure ASCII, so the
# operator is exercised through a deterministic decomposed-recapture
# view (the dedup_normalized union-view pattern): pages with
# fnv1a64(url) % NFC_MOD == 0 get NFC_SUFFIX appended — a suffix built
# from DECOMPOSED sequences (e + U+0301, n + U+0303, c + U+0327) that
# NFC composes. Both engines construct the same decorated bytes and
# genuinely normalize them.
NFC_MOD = 8
NFC_SUFFIX = " Cafe\u0301 nin\u0303o fac\u0327ade"
# NFC is the identity on pure ASCII (Unicode normalization stability),
# so only rows containing a non-ASCII byte take the normalize path.
NON_ASCII_RE = r"[^\x00-\x7F]"


def normalize_unicode(paths: str | list[str]) -> ray.data.Dataset:
    """Unicode NFC normalization over the decomposed-recapture view ->
    (url, text_nfc, changed): text_nfc = the NFC form of the decorated
    text, changed = whether normalization rewrote any bytes. Null text
    stays null with changed=false.

    Parity: the engine normalizes candidates with Python's unicodedata
    (UAX #15 via the unicodedata C module), the DuckDB twin with its own
    independent nfc_normalize — two implementations of the same frozen
    spec, like the RE2-vs-RE2 rule banks. pyarrow's utf8_normalize is
    NOT used: in this build it returns decomposed output for every
    requested form (verified against both Python and DuckDB), so the
    kernel would be wrong, not just slow.

    Scale shape: one stateless pass; a vectorized RE2 prefilter
    (NON_ASCII_RE) skips every pure-ASCII row — NFC is the identity on
    ASCII by the Unicode stability policy — and only the candidate rows
    (1/NFC_MOD of the fixture; real crawls: the non-ASCII share) pay the
    per-row normalize call, the scrub stage's candidate-prefilter
    pattern. No shuffle, no driver state — a pure map at 100 TB.

    Reference analog: the reference canonicalizes compound key columns
    on load (Home.py:98-106); this is the text-payload equivalent
    (north_rule's byte-identical-extraction axis: normalization must be
    an explicit, checked step, never an accident of an engine)."""
    import unicodedata

    ds = ray.data.read_parquet(paths, columns=["url", "text"])

    def stage(t: pa.Table) -> pa.Table:
        urls = _as_array(t.column("url"))
        text = _as_array(t.column("text"))
        h = fnv1a64(urls)
        valid = np.asarray(pc.is_valid(text))
        dec_mask = ((h % np.uint64(NFC_MOD)) == 0) & valid
        dec = pc.if_else(pa.array(dec_mask),
                         pc.binary_join_element_wise(text, NFC_SUFFIX, ""),
                         text)
        cand = np.asarray(pc.fill_null(
            pc.match_substring_regex(dec, NON_ASCII_RE), False))
        changed = np.zeros(len(text), dtype=bool)
        out = dec
        idx = np.nonzero(cand)[0]
        if len(idx):
            # only candidate rows cross the Arrow->Python boundary
            raw = pc.take(dec, pa.array(idx, pa.int64())).to_pylist()
            norm = [unicodedata.normalize("NFC", s) for s in raw]
            changed[idx] = [a != b for a, b in zip(norm, raw)]
            repl_mask = np.zeros(len(text), dtype=bool)
            repl_mask[idx[changed[idx]]] = True
            if repl_mask.any():
                out = pc.replace_with_mask(
                    dec, pa.array(repl_mask),
                    pa.array([n for n, r in zip(norm, raw) if n != r],
                             pa.string()))
        return pa.table({
            "url": urls,
            "text_nfc": out,
            "changed": pa.array(changed),
        })

    return ds.map_batches(stage, batch_format="pyarrow")


def _repetition_stats(text: pa.Array, tv=None,
                      split=None) -> dict[str, pa.Array]:
    """Core of the Gopher repetition stats (shared by the query
    stage and the flagship's opt-in rule bank). `tv` = a precomputed
    TokenView and `split` = a precomputed _line_split(text), both
    deterministic, so sharing them with other stages is value-neutral."""
    from ..functions import textstats as ts

    valid = np.asarray(pc.is_valid(text))
    n_docs = len(text)
    tv = tv if tv is not None else ts.tokenize(text)
    n_words = np.diff(tv.offsets)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
    lens = (np.asarray(pc.utf8_length(tv.flat), dtype=np.int64)
            if len(tv.flat) else np.zeros(0, dtype=np.int64))
    total_chars = np.zeros(n_docs, dtype=np.int64)
    np.add.at(total_chars, doc_of, lens)
    ids = tv.ids if tv.ids is not None else np.zeros(0, dtype=np.int64)

    dup_ns = tuple(sorted(REP_MAX_DUP_GRAM_FRAC))
    runs = _all_gram_runs(ids, doc_of, lens, (2, 3, 4) + dup_ns)
    with np.errstate(divide="ignore", invalid="ignore"):
        tops = {}
        for n in (2, 3, 4):
            doc_g, cnt, charlen = runs[n]
            best_cnt = np.zeros(n_docs, dtype=np.int64)
            np.maximum.at(best_cnt, doc_g, cnt)
            # among max-count grams keep the shortest (value-fixing
            # tie-break, ORDER BY cnt DESC, length ASC in the twin)
            best_len = np.full(n_docs, np.iinfo(np.int64).max)
            at_max = cnt == best_cnt[doc_g]
            np.minimum.at(best_len, doc_g[at_max], charlen[at_max])
            chars = np.where(best_cnt > 0, best_cnt * best_len, 0)
            tops[n] = np.minimum(
                np.where(total_chars > 0, chars / total_chars, np.nan),
                1.0)
        frac_dup = {}
        for n in dup_ns:
            doc_g, cnt, charlen = runs[n]
            dup = np.zeros(n_docs, dtype=np.int64)
            d = cnt >= 2
            np.add.at(dup, doc_g[d], (cnt[d] * charlen[d]))
            frac_dup[n] = np.minimum(
                np.where(total_chars > 0, dup / total_chars, np.nan), 1.0)

        # line family: exact duplicate lines by dictionary id; the
        # paragraph family is the same computation over a '\n\n' split
        def dup_segment_stats(flat, n_segs):
            seg_lens = (np.asarray(pc.utf8_length(flat), dtype=np.int64)
                        if len(flat) else np.zeros(0, dtype=np.int64))
            sdoc = np.repeat(np.arange(n_docs, dtype=np.int64), n_segs)
            seg_chars = np.zeros(n_docs, dtype=np.int64)
            np.add.at(seg_chars, sdoc, seg_lens)
            distinct = np.zeros(n_docs, dtype=np.int64)
            dup_chars = np.zeros(n_docs, dtype=np.int64)
            if len(flat):
                sid = np.asarray(
                    pc.dictionary_encode(flat).indices, dtype=np.int64)
                order = np.lexsort((sid, sdoc))
                ss, ds = sid[order], sdoc[order]
                first = np.ones(len(order), dtype=bool)
                first[1:] = (ss[1:] != ss[:-1]) | (ds[1:] != ds[:-1])
                run_start = np.nonzero(first)[0]
                rcnt = np.diff(np.concatenate([run_start, [len(order)]]))
                np.add.at(distinct, ds[run_start], 1)
                dmask = rcnt >= 2
                np.add.at(dup_chars, ds[run_start][dmask],
                          rcnt[dmask] * seg_lens[order][run_start][dmask])
            frac_dup = np.where(
                n_segs > 0, (n_segs - distinct) / n_segs, np.nan)
            frac_dup_chars = np.where(
                seg_chars > 0, dup_chars / seg_chars, np.nan)
            return frac_dup, frac_dup_chars, seg_chars

        flat, n_lines, _ = split if split is not None else _line_split(text)
        frac_dup_lines, frac_dup_line_chars, line_chars = (
            dup_segment_stats(flat, n_lines))
        paras = pc.split_pattern(text, "\n\n")
        n_paras = np.asarray(pc.fill_null(pc.list_value_length(paras), 0),
                             dtype=np.int64)
        pflat = _as_array(pc.list_flatten(paras))
        frac_dup_paras, frac_dup_para_chars, para_chars = (
            dup_segment_stats(pflat, n_paras))

    with np.errstate(invalid="ignore"):
        keep = (
            valid
            & (frac_dup_lines <= REP_MAX_DUP_LINE_FRAC)
            & (frac_dup_line_chars <= REP_MAX_DUP_LINE_CHAR_FRAC)
            & (frac_dup_paras <= REP_MAX_DUP_PARA_FRAC)
            & (frac_dup_para_chars <= REP_MAX_DUP_PARA_CHAR_FRAC)
            & (tops[2] <= REP_MAX_TOP_GRAM_FRAC[2])
            & (tops[3] <= REP_MAX_TOP_GRAM_FRAC[3])
            & (tops[4] <= REP_MAX_TOP_GRAM_FRAC[4])
        )
        for n in dup_ns:
            keep &= frac_dup[n] <= REP_MAX_DUP_GRAM_FRAC[n]

    def col(arr: np.ndarray, null_when: np.ndarray) -> pa.Array:
        return pa.array(arr, type=pa.float64(), mask=null_when)

    no_tok = total_chars == 0
    out = {
        "frac_dup_lines": col(frac_dup_lines, n_lines == 0),
        "frac_chars_dup_lines": col(frac_dup_line_chars, line_chars == 0),
        "frac_dup_paragraphs": col(frac_dup_paras, n_paras == 0),
        "frac_chars_dup_paragraphs": col(frac_dup_para_chars,
                                         para_chars == 0),
        "frac_chars_top_2gram": col(tops[2], no_tok),
        "frac_chars_top_3gram": col(tops[3], no_tok),
        "frac_chars_top_4gram": col(tops[4], no_tok),
    }
    for n in dup_ns:
        out[f"frac_chars_dup_{n}grams"] = col(frac_dup[n], no_tok)
    out["repetition_keep"] = pa.array(keep)
    return out


def _count_re(arr: pa.Array, pat: str) -> np.ndarray:
    """Non-overlapping RE2 match count per row, null -> 0 (the same
    convention as DuckDB's coalesce(len(regexp_extract_all(..)), 0))."""
    return np.asarray(pc.fill_null(
        pc.cast(pc.count_substring_regex(arr, pat), pa.int64()), 0))


def pii_counts(paths: str | list[str]) -> ray.data.Dataset:
    """Per-page PII/toxicity AUDIT — the measuring arm of the scrub
    bank: for every page, how many spans EACH frozen scrub pattern
    (email/phone/ssn/ipv4/toxicity) matches in the original text, plus
    the total and a has_pii flag. Where `scrub_docs` transforms, this
    reports — the pass a compliance review runs over a crawl before
    deciding what to scrub vs drop, and the per-category counters a
    100 TB run would aggregate into its lineage metrics.

    Counts are independent non-overlapping RE2 scans over the UNTOUCHED
    text (not the scrub's sequential-replacement view) so both engines
    evaluate the same spec: pyarrow count_substring_regex here,
    len(regexp_extract_all(...)) in the DuckDB twin, SAME pattern
    constants (stages/scrub.SCRUB_PATTERNS). Null text -> all counts 0,
    has_pii false. One stateless vectorized pass, no shuffle, no driver
    state — scales as a pure map.

    Reference analog: none (the reference neither scrubs nor audits);
    north_rule's PII bank, reporting side."""
    def stage(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        cols: dict = {"url": t["url"]}
        counts, total = _pii_match_counts(text)
        for name, _pat, _repl in SCRUB_PATTERNS:
            cols[f"n_{name}"] = pa.array(counts[name], type=pa.int64())
        cols["n_pii_total"] = pa.array(total, type=pa.int64())
        cols["has_pii"] = pa.array(total > 0)
        return pa.table(cols)

    return _read_pages_text(paths).map_batches(stage, batch_format="pyarrow")


def _pii_match_counts(text: pa.Array) -> tuple[dict, np.ndarray]:
    """Per-row non-overlapping match counts for every frozen scrub
    pattern -> ({name: int64 ndarray}, total) — the ONE counting kernel
    behind pii_counts and pii_density_by_host (shared so the audit and
    its host rollup can never drift apart). Scrub's candidate prefilter
    applies: every pattern requires a digit, '@' or a lexicon word, so
    ONE cheap scan finds the rows the 5 counting passes must touch;
    non-candidates count 0 by construction (byte-identical to scanning
    every row). Null text -> 0 everywhere."""
    from ..stages.scrub import _CANDIDATE_RE

    n = len(text)
    cand = np.asarray(pc.fill_null(
        pc.match_substring_regex(text, _CANDIDATE_RE), False))
    sub = text.filter(pa.array(cand))
    counts: dict = {}
    total = np.zeros(n, dtype=np.int64)
    for name, pat, _repl in SCRUB_PATTERNS:
        c = np.zeros(n, dtype=np.int64)
        if len(sub):
            c[cand] = _count_re(sub, pat)
        counts[name] = c
        total += c
    return counts, total


# Frozen integer weight vector for the linear quality classifier —
# hand-frozen constants with the SHAPE of a learned fastText/DCLM-style
# scorer (a learned one would load its weights the same way; committed
# ints keep the op deterministic and SQL-twinnable with EXACT integer
# arithmetic). Positive evidence: stop words (prose), alphabetic tokens;
# negative: symbols, toxicity hits, digit characters. A page is kept when
# its score clears QC_MIN_SCORE_PER_WORD points per word — the integer
# cross-multiplied form of `score / n_words >= threshold`.
QC_WEIGHTS = (("stop", 40), ("alpha", 12), ("sym", -30),
              ("tox", -200), ("digit", -2))
QC_MIN_SCORE_PER_WORD = 10
DIGIT_RE = r"[0-9]"


def quality_classifier(paths: str | list[str]) -> ray.data.Dataset:
    """Linear quality classifier over count features — the frozen-weight
    stand-in for the fastText/DCLM-style learned quality scorer every
    modern web pipeline runs after the heuristic banks: score = w · x
    where x is the vector of RE2 count features (stop words, alphabetic
    tokens, symbols, toxicity hits, digit chars) and w is the committed
    integer weight vector QC_WEIGHTS; keep iff n_words > 0 and
    score >= QC_MIN_SCORE_PER_WORD * n_words (integer cross-multiply, no
    float anywhere). -> (url, n_words, quality_score, keep).

    All features are integer counts and the score is an int64 dot
    product, so the DuckDB twin (same pattern constants, same weights)
    is bit-exact by construction. One stateless vectorized pass, no
    shuffle — at 100 TB this is a pure map over the stream, and swapping
    the frozen ints for learned weights changes nothing structural (a
    real model would ride an actor pool __init__, like stages/langid).

    Reference analog: Home.py's per-measure threshold flags (H:176-183)
    are single-feature hard gates; this is their multi-feature weighted
    generalization."""
    def stage(t: pa.Table) -> pa.Table:
        n_words, score, keep = _classifier_stats(_as_array(t.column("text")))
        return pa.table({
            "url": t["url"],
            "n_words": pa.array(n_words, type=pa.int64()),
            "quality_score": pa.array(score, type=pa.int64()),
            "keep": pa.array(keep),
        })

    return _read_pages_text(paths).map_batches(stage, batch_format="pyarrow")


def dedup_lines_within_doc(paths: str | list[str]) -> ray.data.Dataset:
    """Within-document duplicate-line REMOVAL: keep the FIRST occurrence
    of each exact line, preserve order, rejoin with '\\n' — the removal
    counterpart of `gopher_repetition_stats`' duplicate-line fractions
    (that op measures, this one transforms). Repeated nav/footer/cookie
    boilerplate inside one page is the classic target; C4-family
    pipelines run this before any cross-document dedup so the repeated
    chrome doesn't dominate shingles. -> (url, clean_text, n_lines,
    n_dup_lines). Null text stays null with zero counts.

    Vectorized: one split-flatten per batch, lines dictionary-encoded to
    int codes, ONE (doc, code) lexsort marks first occurrences (global
    position as the stable tie-break), and the kept mask reassembles per
    doc via offset arithmetic + Arrow binary_join — no Python loop over
    rows or lines. Stateless single pass, no shuffle (within-doc by
    definition). The DuckDB twin expresses the same spec as a
    list_position first-occurrence lambda."""
    def stage(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        flat, counts, valid = _line_split(text)
        n = len(flat)
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        codes = np.asarray(flat.dictionary_encode().indices)
        order = np.lexsort((codes, doc_of))  # stable: position breaks ties
        d2, c2 = doc_of[order], codes[order]
        first = np.ones(n, dtype=bool)
        first[1:] = (d2[1:] != d2[:-1]) | (c2[1:] != c2[:-1])
        keep = np.zeros(n, dtype=bool)
        keep[order] = first
        kept_counts = _segment_counts(keep, counts)
        off = np.concatenate([[0], np.cumsum(kept_counts)])
        lst = pa.ListArray.from_arrays(pa.array(off, type=pa.int32()),
                                       flat.filter(pa.array(keep)))
        clean = np.asarray(pc.binary_join(
            lst, pa.scalar("\n")).to_pandas(), dtype=object)
        clean[~valid] = None
        return pa.table({
            "url": t["url"],
            "clean_text": pa.array(clean.tolist(), type=pa.string()),
            "n_lines": pa.array(counts, type=pa.int64()),
            "n_dup_lines": pa.array(counts - kept_counts, type=pa.int64()),
        })

    return _read_pages_text(paths).map_batches(stage, batch_format="pyarrow")


def lexical_diversity(paths: str | list[str]) -> ray.data.Dataset:
    """Per-page lexical-diversity audit — the unique-word quality signal
    (MassiveText/DCLM-family pipelines gate on "fraction of unique
    words"; a page whose vocabulary is a tiny fraction of its length is
    boilerplate or keyword stuffing even when every Gopher ratio
    passes): over the `[a-z]+` tokens of the lowercased text, emit
    n_tokens, n_distinct, n_hapax (tokens occurring exactly once in the
    doc), ttr = n_distinct/n_tokens (type-token ratio), hapax_frac =
    n_hapax/n_tokens, and keep iff n_tokens > 0 and
    LEX_MIN_TTR_DEN * n_distinct >= LEX_MIN_TTR_NUM * n_tokens (integer
    cross-multiply — no float in the gate). Zero-token / null text ->
    NULL ratios, keep false. On the fixture the gate isolates the
    high-repetition class (TTR bottoms at ~0.05 there vs a 0.49
    corpus median) — the flag RATE was checked, not just the hash.

    Vectorized: one tokenize per batch (the shared dictionary-encoding
    kernel), ONE (doc, token-id) lexsort; distinct counts are the run
    starts and hapax counts the length-1 runs, both via bincount.
    Stateless single pass, no shuffle, no driver state — a pure map at
    100 TB. Ratios are single int/int float64 divisions, so the DuckDB
    twin (unnest + per-(url, tok) counts) is bit-identical.

    Reference analog: none (Home.py has no text ops); north_rule's
    heuristic-quality bank, diversity axis."""
    def stage(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        tv = tokenize(text)
        n_docs = len(t)
        n_tok = np.diff(tv.offsets).astype(np.int64)
        n_distinct = np.zeros(n_docs, dtype=np.int64)
        n_hapax = np.zeros(n_docs, dtype=np.int64)
        if tv.ids is not None and len(tv.flat):
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_tok)
            order = np.lexsort((tv.ids, doc_of))
            d2, i2 = doc_of[order], tv.ids[order]
            first = np.ones(len(d2), dtype=bool)
            first[1:] = (d2[1:] != d2[:-1]) | (i2[1:] != i2[:-1])
            starts = np.flatnonzero(first)
            run_len = np.diff(np.append(starts, len(d2)))
            n_distinct = np.bincount(d2[starts],
                                     minlength=n_docs).astype(np.int64)
            hap = starts[run_len == 1]
            n_hapax = np.bincount(d2[hap], minlength=n_docs).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ttr = np.where(n_tok > 0, n_distinct / n_tok, np.nan)
            hapax_frac = np.where(n_tok > 0, n_hapax / n_tok, np.nan)
        keep = (n_tok > 0) & (LEX_MIN_TTR_DEN * n_distinct
                              >= LEX_MIN_TTR_NUM * n_tok)
        null_ratio = n_tok == 0
        return pa.table({
            "url": t["url"],
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "n_distinct": pa.array(n_distinct, type=pa.int64()),
            "n_hapax": pa.array(n_hapax, type=pa.int64()),
            "ttr": pa.array(ttr, type=pa.float64(), mask=null_ratio),
            "hapax_frac": pa.array(hapax_frac, type=pa.float64(),
                                   mask=null_ratio),
            "keep": pa.array(keep),
        })

    ds = _read_pages_text(paths)
    if ds.count() == 0:  # metadata-only on a fresh parquet read
        return ray.data.from_arrow(stage(pa.table({
            "url": pa.array([], type=pa.string()),
            "text": pa.array([], type=pa.string())})))
    return ds.map_batches(stage, batch_format="pyarrow")


def readability_scores(paths: str | list[str]) -> ray.data.Dataset:
    """Per-page sentence-shape readability gate: n_words (WORD_RE
    whitespace tokens), n_sentences (maximal terminal-punctuation runs,
    SENTENCE_RUN_RE — "?!" ends ONE sentence), words_per_sentence =
    n_words/n_sentences, and keep iff n_sentences > 0 and
    READ_MIN_WPS * n_sentences <= n_words <= READ_MAX_WPS * n_sentences
    (integer cross-multiplies). Unpunctuated run-ons (the repetition
    class lands near 124 words/sentence on the fixture vs a corpus
    median of ~21) fail high; fragment lists fail low; null text ->
    NULL ratio, keep false.

    One stateless vectorized pass (two RE2 count kernels + one int/int
    float64 division), no shuffle, no driver state — a pure map at
    100 TB. The DuckDB twin counts the SAME pattern constants with
    len(regexp_extract_all(...)), so every value is bit-identical.

    Reference analog: Home.py's per-measure threshold flags (H:176-183)
    as a two-sided ratio gate; north_rule's heuristic-quality bank,
    fluency axis (the non-model sibling of ngram_fluency)."""
    def stage(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        valid = np.asarray(pc.is_valid(text))
        n_words = _count_re(text, WORD_RE)
        n_sent = _count_re(text, SENTENCE_RUN_RE)
        with np.errstate(divide="ignore", invalid="ignore"):
            wps = np.where(n_sent > 0, n_words / n_sent, np.nan)
        keep = (valid & (n_sent > 0)
                & (n_words >= READ_MIN_WPS * n_sent)
                & (n_words <= READ_MAX_WPS * n_sent))
        return pa.table({
            "url": t["url"],
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_sentences": pa.array(n_sent, type=pa.int64()),
            "words_per_sentence": pa.array(wps, type=pa.float64(),
                                           mask=n_sent == 0),
            "keep": pa.array(keep),
        })

    ds = _read_pages_text(paths)
    if ds.count() == 0:  # metadata-only on a fresh parquet read
        return ray.data.from_arrow(stage(pa.table({
            "url": pa.array([], type=pa.string()),
            "text": pa.array([], type=pa.string())})))
    return ds.map_batches(stage, batch_format="pyarrow")


def _classifier_stats(text: pa.Array) -> tuple[np.ndarray, np.ndarray,
                                               np.ndarray]:
    """-> (n_words, score, keep) int64/int64/bool arrays — shared by the
    standalone `quality_classifier` query and the flagship's opt-in
    `classifier` rule bank (so the two can never drift)."""
    n_words = _count_re(text, WORD_RE)
    feats = {
        # (?i) instead of a full lowercased copy of the batch: the
        # stopwords are ASCII and both engines run RE2, so the fold is
        # the same spec — and the lower() materialization was ~20% of
        # the stage's wall
        "stop": _count_re(text, "(?i)" + GOPHER_STOPWORD_RE),
        "alpha": _count_re(text, ALPHA_WORD_RE),
        "sym": _count_re(text, SYMBOL_RE),
        "tox": _count_re(text, BADWORD_RE),
        "digit": _count_re(text, DIGIT_RE),
    }
    score = np.zeros(len(n_words), dtype=np.int64)
    for name, w in QC_WEIGHTS:
        score += w * feats[name]
    keep = (n_words > 0) & (score >= QC_MIN_SCORE_PER_WORD * n_words)
    return n_words, score, keep


# ---- flagship opt-in rule banks -----------------------------------------
# PipelineConfig.rule_banks=("c4", "gopher", "repetition") appends one
# float 0/1 `<bank>_keep` feature per bank and one RuleSpec per bank
# (config.RULE_BANK_RULES) AFTER the default rules, so the frozen golden
# drop_reason order is untouched when banks are off (the default).
_BANK_KEEP = {
    "c4": lambda batch, text, tv, split: np.asarray(
        _c4_stats(text, split=split)["keep"]),
    "gopher": lambda batch, text, tv, split: np.asarray(
        _gopher_stats(text, split=split)["gopher_keep"]),
    "repetition": lambda batch, text, tv, split: np.asarray(
        _repetition_stats(text, tv=tv, split=split)["repetition_keep"]),
    # url bank keys on the batch's url column, not the text
    "url": lambda batch, text, tv, split: _url_keep(
        _as_array(batch.column("url")))[1],
    # frozen-integer-weight linear quality classifier (r5 s3) — shared
    # _classifier_stats core with the standalone query
    "classifier": lambda batch, text, tv, split: _classifier_stats(text)[2],
    # FineWeb supplementary line filters (r5 s11) — shared _fineweb_stats
    # core with the standalone query. NOT in FUNNEL_BANKS: the funnel /
    # ablation reports keep their frozen five-bank order.
    "fineweb": lambda batch, text, tv, split: _fineweb_stats(
        text, split=split)["keep"],
}


def bank_features_batch(batch: pa.Table, banks: tuple[str, ...],
                        tv=None) -> pa.Table:
    """Append `<bank>_keep` float64 0/1 columns for each requested bank
    (no nulls: a null-text doc gets 0.0, but its drop_reason stays
    `null_text` — the first rule in the frozen order). The line split is
    computed ONCE and shared across banks; pass `tv` (the fused stage's
    TokenView) to also share the tokenization."""
    bad = [b for b in banks if b not in _BANK_KEEP]
    if bad or len(set(banks)) != len(banks):
        raise ValueError(
            f"rule_banks must be unique names from {sorted(_BANK_KEEP)}, "
            f"got {banks!r}")
    text = _as_array(batch.column("text"))
    split = _line_split(text)
    for bank in banks:
        keep = _BANK_KEEP[bank](batch, text, tv, split)
        batch = batch.append_column(
            f"{bank}_keep",
            pa.array(np.where(keep, 1.0, 0.0), type=pa.float64()))
    return batch


# ---- rule-bank funnel counters -------------------------------------------
# Frozen funnel order: a doc is attributed to the FIRST bank that drops
# it (null text outranks every bank; a doc passing all five is 'kept').
FUNNEL_BANKS = ("url", "c4", "gopher", "repetition", "classifier")
FUNNEL_STAGES = ("null_text",) + FUNNEL_BANKS + ("kept",)


def rule_bank_funnel(paths: str | list[str]) -> "pd.DataFrame":
    """Per-rule kept/dropped FUNNEL counters over the whole corpus — the
    north_star's "counters (kept/dropped/scrubbed per rule)" as its own
    value-checked query: every page is attributed to the FIRST rule bank
    that drops it in the frozen order FUNNEL_STAGES (null_text, url, c4,
    gopher, repetition, classifier, kept), and the output is one row per
    stage with its doc count — the one-screen report an operator reads
    after a crawl-scale filtering run to see where the corpus went.

    All five bank predicates are computed in ONE stateless vectorized
    pass per batch (the line split and token view are shared across
    banks exactly as in the flagship's fused rule stage), each batch
    reduces to a constant 7-row partial, and a 7-group Sum finishes —
    no shuffle of the corpus, no driver state; at 100 TB the funnel
    costs one streamed read. Every stage row is always present (zero
    counts included) so the schema is fixture-independent.

    Reference analog: Home.py's per-measure flag counts (H:444-904 show
    per-dimension outlier counters); this is the web-text rule-bank
    version over the same first-fail attribution a drop_reason column
    gives the flagship (stages/rules.py)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    n_stages = len(FUNNEL_STAGES)
    ds = _read_pages_text(paths)

    def partial(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        split = _line_split(text)
        lab = np.full(len(text), n_stages - 1, dtype=np.int64)
        # assign last-to-first so the EARLIEST failing bank wins
        for i in range(len(FUNNEL_BANKS) - 1, -1, -1):
            keep = np.asarray(_BANK_KEEP[FUNNEL_BANKS[i]](t, text, None,
                                                          split), dtype=bool)
            lab[~keep] = i + 1
        lab[np.asarray(pc.is_null(text))] = 0
        return pa.table({
            "stage_idx": np.arange(n_stages, dtype=np.int64),
            "n_docs": np.bincount(lab, minlength=n_stages).astype(np.int64),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("stage_idx")
             .aggregate(Sum("n_docs", alias_name="n_docs")))
    df = agg.to_pandas().sort_values("stage_idx", ignore_index=True)
    df["drop_stage"] = [FUNNEL_STAGES[int(i)] for i in df["stage_idx"]]
    return df[["stage_idx", "drop_stage", "n_docs"]]


# ---- URL-keyed keep-latest snapshot dedup --------------------------------
# Deterministic two-crawl union view of the pages corpus: every url whose
# stable FNV-1a hash is ≡0 (mod RECRAWL_MOD) was "re-crawled" exactly one
# day after its first snapshot — the fixture-side stand-in for reading a
# second crawl's shards (same bytes, pure function of the url).
RECRAWL_MOD = 3
RECRAWL_SHIFT_US = 86_400_000_000  # exactly INTERVAL 1 DAY at us precision


def dedup_url_keep_latest(paths: str | list[str],
                          n_shards: int | None = None) -> ray.data.Dataset:
    """URL-keyed keep-latest snapshot dedup — the first step of every
    incremental-crawl pipeline: when the same url appears in multiple
    crawl snapshots, keep only the NEWEST capture (max warc_ts) and
    count how many snapshots were seen. -> streaming Dataset
    (url, warc_ts, n_snapshots), one row per distinct url.

    The multi-snapshot input is the deterministic two-crawl union view
    above (urls with fnv1a64(url) % RECRAWL_MOD == 0 carry a second
    capture one day later); on a real run the union is simply
    read_parquet over both crawls' shards and everything downstream is
    unchanged. Scale shape: ONE bounded shuffle keyed on a url-hash
    shard (the north_rule's partitioning key), winner + count picked
    vectorized inside each shard group; per-url history never needs to
    fit one worker beyond the url's own snapshot list, and no driver
    state. `n_shards` bounds per-group payload — size it from input
    bytes on a real corpus (house `_shard_count` rule).

    Ties are impossible here (the recrawl is strictly later); a real
    two-crawl union with equal timestamps would need a deterministic
    tie-break (e.g. crawl id) — stated so the contract is explicit.

    Reference analog: none (the reference has no temporal dedup);
    Common-Crawl-style pipelines run exactly this before content dedup."""
    from ..functions.urls import fnv1a64

    ds = ray.data.read_parquet(paths, columns=["url", "warc_ts"])
    if n_shards is None:
        # shard count from input bytes (house rule): the old fixed 8
        # capped the shuffle finish at 8-way parallelism on a 32-CPU box
        from .qc import _pages_shard_count

        # floor 8, not 64: these shuffles carry text/urls, and at
        # bench scale extra partitions cost more in exchange scheduling
        # + object-store churn than they buy in group parallelism
        # (measured at the 400k bench, quiet-box canary: 8 beats 16
        # beats 64 on every op here); at real scale the bytes/1GiB
        # term dominates the floor and per-group payload stays bounded
        n_shards = _pages_shard_count(paths, floor=8)

    def union_and_shard(t: pa.Table) -> pa.Table:
        urls = _as_array(t.column("url"))
        h = fnv1a64(urls)
        ts = np.asarray(pc.cast(_as_array(t.column("warc_ts")),
                                pa.int64()))
        re_mask = (h % np.uint64(RECRAWL_MOD)) == 0
        out_url = pa.concat_arrays([urls, urls.filter(pa.array(re_mask))])
        out_ts = np.concatenate([ts, ts[re_mask] + RECRAWL_SHIFT_US])
        shard = (np.concatenate([h, h[re_mask]])
                 % np.uint64(n_shards)).astype(np.int64)
        return pa.table({"url": out_url,
                         "ts_us": pa.array(out_ts, pa.int64()),
                         "shard": pa.array(shard)})

    def winners(g):
        import pandas as pd

        g = g.sort_values(["url", "ts_us"], ascending=[True, False],
                          ignore_index=True)
        counts = g.groupby("url", sort=False).size().to_numpy()
        win = g.drop_duplicates("url", keep="first")
        return pd.DataFrame({
            "url": win["url"].to_numpy(),
            "warc_ts": pd.to_datetime(win["ts_us"].to_numpy(), unit="us"),
            "n_snapshots": counts.astype("int64"),
        })

    return (ds.map_batches(union_and_shard, batch_format="pyarrow")
            .groupby("shard").map_groups(winners, batch_format="pandas"))


# Deterministic content mutation of the two-crawl union view: HALF of
# the re-crawled urls ((h // RECRAWL_MOD) % 2 == 0) changed content
# between snapshots — their second capture's text carries this suffix.
CHANGE_SUFFIX = " [updated]"


def url_snapshot_changes(paths: str | list[str],
                         n_shards: int | None = None) -> ray.data.Dataset:
    """Cross-snapshot CONTENT-change detection — the incremental-crawl
    report that tells a refresh scheduler which pages actually changed
    between crawls: per url, the snapshot count and whether any two
    snapshots carry different text. -> streaming Dataset of
    (url, n_snapshots, changed), one row per distinct url
    (single-snapshot urls report changed=false).

    Input is the same deterministic two-crawl union view as
    dedup_url_keep_latest, extended with content drift: half of the
    re-crawled urls ((fnv1a64(url) // RECRAWL_MOD) % 2 == 0, text
    non-null) changed — their second capture is text || CHANGE_SUFFIX.
    On a real run the union is read_parquet over both crawls' shards.

    Scale shape: ONE bounded shuffle keyed on a url-hash shard; the
    change test inside each shard group is an EXACT text compare
    (distinct-text count per url, null counted as its own value), so
    hash collisions cannot fabricate or hide a change. The shuffle
    ships text once (dedup_paragraphs weight class); a cheaper
    at-scale variant ships (url, text-hash) first — differing hashes
    prove change outright — and ships text only for the equal-hash
    multi-snapshot residue; stated, not built: one exact pass keeps
    the twin contract simplest.

    Reference analog: none (no temporal surface in Home.py); crawl
    pipelines pair this with keep-latest dedup upstream."""
    from ..functions.urls import fnv1a64

    ds = ray.data.read_parquet(paths, columns=["url", "text"])
    if n_shards is None:
        # shard count from input bytes (house rule): the old fixed 8
        # capped the shuffle finish at 8-way parallelism on a 32-CPU box
        from .qc import _pages_shard_count

        # floor 8, not 64: these shuffles carry text/urls, and at
        # bench scale extra partitions cost more in exchange scheduling
        # + object-store churn than they buy in group parallelism
        # (measured at the 400k bench, quiet-box canary: 8 beats 16
        # beats 64 on every op here); at real scale the bytes/1GiB
        # term dominates the floor and per-group payload stays bounded
        n_shards = _pages_shard_count(paths, floor=8)

    def union_and_shard(t: pa.Table) -> pa.Table:
        urls = _as_array(t.column("url"))
        text = _as_array(t.column("text"))
        h = fnv1a64(urls)
        re_mask = (h % np.uint64(RECRAWL_MOD)) == 0
        changed = (re_mask
                   & (((h // np.uint64(RECRAWL_MOD)) % np.uint64(2)) == 0)
                   & np.asarray(pc.is_valid(text)))
        re_sel = pa.array(re_mask)
        re_text = text.filter(re_sel)
        mut = pc.binary_join_element_wise(
            pc.fill_null(re_text, ""), CHANGE_SUFFIX, "")
        re_text = pc.if_else(pa.array(changed[re_mask]), mut, re_text)
        out_url = pa.concat_arrays([urls, urls.filter(re_sel)])
        out_text = pa.concat_arrays([text, re_text.combine_chunks()
                                     if isinstance(re_text, pa.ChunkedArray)
                                     else re_text])
        shard = (np.concatenate([h, h[re_mask]])
                 % np.uint64(n_shards)).astype(np.int64)
        return pa.table({"url": out_url, "text": out_text,
                         "shard": pa.array(shard)})

    def report(g):
        import pandas as pd

        agg = g.groupby("url", sort=False)["text"]
        return pd.DataFrame({
            "url": agg.size().index.to_numpy(dtype=object),
            "n_snapshots": agg.size().to_numpy().astype("int64"),
            "changed": (agg.nunique(dropna=False) > 1).to_numpy(),
        })

    return (ds.map_batches(union_and_shard, batch_format="pyarrow")
            .groupby("shard").map_groups(report, batch_format="pandas"))


# Deterministic per-host chrome injected into the pages corpus (the
# fixture-side stand-in for the nav/footer boilerplate an HTML->text
# extractor leaves behind on real crawls — pure functions of (host,
# url), so both engines rebuild the identical view):
#   header (every page):       '<host> | home | about | contact'
#   footer (urls with fnv1a64(url) % FOOTER_MOD == 0):
#                              'copyright <host> - all rights reserved'
BOILERPLATE_HEADER_SUFFIX = " | home | about | contact"
BOILERPLATE_FOOTER_PRE = "copyright "
BOILERPLATE_FOOTER_POST = " - all rights reserved"
FOOTER_MOD = 4
# a line is boilerplate WITHIN ITS HOST when it appears in at least
# this many distinct pages of that host (frequency-based chrome
# detection; small hosts below the threshold keep their chrome)
BOILERPLATE_MIN_DOCS = 5


def remove_boilerplate_lines(paths: str | list[str],
                             min_docs: int = BOILERPLATE_MIN_DOCS,
                             n_shards: int | None = None) -> ray.data.Dataset:
    """Host-frequency boilerplate-line removal — the cleanup step real
    web pipelines run after text extraction: a line occurring in >=
    `min_docs` DISTINCT pages of the SAME host is site chrome
    (nav/footer/cookie banner), and every occurrence of it is removed
    from that host's pages. Lines are compared EXACTLY and only within
    their host, so a sentence legitimately shared across sites is never
    touched. -> streaming Dataset of (url, clean_text, n_removed), one
    row per input page (null text stays null, n_removed 0).

    Input is the deterministic chrome-injected view above (every page
    gets a host header line, every FOOTER_MOD-th url a host footer) —
    the fixture's prose lines are unique, so the header/footer are
    exactly what frequency detection must recover, and hosts with
    fewer than `min_docs` pages must keep their chrome (both branches
    fire on the frozen corpus). On a real run the injection disappears
    and the input is simply the extractor's output.

    Scale shape — the corpus NEVER shuffles: (1) each batch reduces its
    lines to unique (host, line) rows carrying a distinct-page partial
    count (a page's lines live in exactly one batch, so the partials
    are additive); (2) one NARROW bounded shuffle on shard(fnv(host,
    line)) sums the partials and nominates the chrome set — by
    construction only lines in >= min_docs pages, i.e. O(hosts x
    chrome-lines), orders of magnitude below the corpus; (3) the
    nominated set broadcasts as one sorted key array (ray.put) and a
    stateless second pass drops member lines and rejoins each page
    IN PLACE (offset arithmetic + Arrow binary_join — reassembly needs
    no shuffle because pages were never exploded across batches). When
    the chrome set outgrows a per-worker broadcast, swap the ray.put
    for the sharded-actor DropIndex (state/dropindex.py) — same
    pattern as the flagship's --dedup loser index; stated, not built.
    First cut shipped every line occurrence through TWO corpus-sized
    shuffles with a pandas nunique inside (63 s at the 400k bench);
    this shape is ~8x faster and strictly more scale-honest.

    Reference analog: none in Home.py; C4 (Raffel 2020 §2.2) drops
    boilerplate by line-level RULES (c4_line_filter here) — this is the
    complementary frequency-based detector (CCNet §4.1-style)."""
    from ..functions.urls import fnv1a64
    from .docs import _mix64  # driver-side: _lines_hashed runs on workers

    ds = ray.data.read_parquet(paths, columns=["url", "text"])
    if n_shards is None:
        # shard count from input bytes (house rule): the old fixed 8
        # capped the shuffle finish at 8-way parallelism on a 32-CPU box
        from .qc import _pages_shard_count

        # floor 8, not 64: these shuffles carry text/urls, and at
        # bench scale extra partitions cost more in exchange scheduling
        # + object-store churn than they buy in group parallelism
        # (measured at the 400k bench, quiet-box canary: 8 beats 16
        # beats 64 on every op here); at real scale the bytes/1GiB
        # term dominates the floor and per-group payload stays bounded
        n_shards = _pages_shard_count(paths, floor=8)

    def _injected(t: pa.Table) -> tuple[pa.Array, pa.Array, pa.Array]:
        """-> (urls, host (''-coalesced), chrome-injected text)."""
        urls = _as_array(t.column("url"))
        text = _as_array(t.column("text"))
        host, _ = _url_keep(urls)
        host = _as_array(pc.fill_null(host, ""))
        header = pc.binary_join_element_wise(
            host, BOILERPLATE_HEADER_SUFFIX, "")
        footer = pc.binary_join_element_wise(
            BOILERPLATE_FOOTER_PRE, host, BOILERPLATE_FOOTER_POST, "")
        inj = pc.binary_join_element_wise(header, text, "\n")
        has_footer = (fnv1a64(urls) % np.uint64(FOOTER_MOD)) == 0
        with_footer = pc.binary_join_element_wise(inj, footer, "\n")
        inj = pc.if_else(pa.array(has_footer), with_footer, inj)
        return urls, host, _as_array(inj)

    def _lines_hashed(t: pa.Table):
        """-> (urls, flat lines, per-(host,line) pair hash, per-page
        counts, validity, page-of-line) — shared by both passes. The
        pair hash is routing/prefilter only; every decision that
        depends on it is finished by an exact string compare — so it
        uses a BOUNDED signature (fnv of the first/last 24 chars +
        length) instead of hashing full paragraph-length lines:
        fnv1a64's byte-lockstep loop runs len(longest string)
        iterations, ~70x the cost on 2k-char lines for zero extra
        correctness (a collision only adds one exact compare)."""
        urls, host, inj = _injected(t)
        flat, counts, valid = _line_split(inj)
        row_of = np.repeat(np.arange(len(urls), dtype=np.int64), counts)
        s1 = fnv1a64(pc.utf8_slice_codeunits(flat, 0, 24))
        s2 = fnv1a64(pc.utf8_slice_codeunits(flat, -24))
        lens = np.asarray(pc.utf8_length(flat), dtype=np.uint64)
        ph = _mix64(s1 ^ _mix64(s2)
                    ^ (lens * np.uint64(0x9E3779B97F4A7C15))
                    ^ _mix64(fnv1a64(host))[row_of])
        return urls, host, flat, ph, counts, valid, row_of

    def count_partial(t: pa.Table) -> pa.Table:
        urls, host, flat, ph, counts, valid, row_of = _lines_hashed(t)
        # exact within-batch (host, line) grouping WITHOUT building key
        # strings: combine the two dictionary codes into one int
        le = flat.dictionary_encode()
        lcode = np.asarray(le.indices, dtype=np.int64)
        hcode = np.asarray(host.dictionary_encode().indices,
                           dtype=np.int64)[row_of]
        n_h = int(hcode.max()) + 1 if len(hcode) else 1
        combined = lcode * np.int64(n_h) + hcode
        # distinct (pair, page) -> additive per-pair page counts
        pair_page = combined * np.int64(len(t)) + row_of
        upp = np.unique(pair_page)
        _, cnt = np.unique(upp // np.int64(len(t)), return_counts=True)
        order = np.argsort(combined, kind="stable")
        # first occurrence index of each unique pair (combined sorted)
        sorted_c = combined[order]
        starts = np.ones(len(sorted_c), dtype=bool)
        if len(sorted_c) > 1:
            starts[1:] = sorted_c[1:] != sorted_c[:-1]
        first = order[starts]  # aligned with np.unique's sorted pairs
        take = pa.array(first)
        shard = (ph[first] % np.uint64(n_shards)).astype(np.int64)
        return pa.table({"shard": pa.array(shard),
                         "host": host.take(pa.array(row_of[first])),
                         "line": flat.take(take),
                         "ph": pa.array(ph[first].astype(np.uint64)),
                         "n_pages": pa.array(cnt.astype(np.int64))})

    def nominate(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        tot = g.groupby(["host", "line"], sort=False).agg(
            n_pages=("n_pages", "sum"), ph=("ph", "first")).reset_index()
        bp = tot[tot["n_pages"] >= min_docs]
        return pd.DataFrame({"host": bp["host"].to_numpy(dtype=object),
                             "line": bp["line"].to_numpy(dtype=object),
                             "ph": bp["ph"].to_numpy().astype("uint64")})

    nom = (ds.map_batches(count_partial, batch_format="pyarrow")
           .groupby("shard").map_groups(nominate, batch_format="pandas")
           .to_pandas())
    # bounded by construction: only lines in >= min_docs distinct pages
    # of one host qualify — O(hosts x chrome-lines), never the corpus
    if len(nom) and "ph" in nom.columns:
        order = np.argsort(nom["ph"].to_numpy())
        bp_ph = nom["ph"].to_numpy().astype(np.uint64)[order]
        bp_host = nom["host"].to_numpy(dtype=object)[order]
        bp_line = nom["line"].to_numpy(dtype=object)[order]
        # the hash prefilter scans exactly one slot per probe; a 64-bit
        # collision INSIDE the (tiny) nominated set would require a run
        # scan — fall back to full-key compare slots in that measure-zero
        # case by deduplicating on (ph) with exact keys kept per slot
        assert len(np.unique(bp_ph)) == len(bp_ph), (
            "pair-hash collision inside the nominated chrome set — "
            "rebuild with a second hash salt")
    else:
        bp_ph = np.zeros(0, dtype=np.uint64)
        bp_host = bp_line = np.zeros(0, dtype=object)
    keys_ref = ray.put((bp_ph, bp_host, bp_line))

    def strip(t: pa.Table) -> pa.Table:
        bp_ph, bp_host, bp_line = ray.get(keys_ref)
        urls, host, flat, ph, counts, valid, row_of = _lines_hashed(t)
        if len(bp_ph):
            idx = np.searchsorted(bp_ph, ph)
            idx[idx == len(bp_ph)] = 0  # out of range -> compare fails
            cand = np.nonzero(bp_ph[idx] == ph)[0]
            # exact verify ONLY on hash hits (≈ true chrome occurrences)
            member = np.zeros(len(ph), dtype=bool)
            if len(cand):
                ci = idx[cand]
                lines_c = np.asarray(flat.take(pa.array(cand)), dtype=object)
                hosts_c = np.asarray(
                    host.take(pa.array(row_of[cand])), dtype=object)
                member[cand] = (bp_line[ci] == lines_c) & (bp_host[ci] == hosts_c)
        else:
            member = np.zeros(len(ph), dtype=bool)
        n_rem = _segment_counts(member, counts)
        kept_counts = counts - n_rem
        off = np.zeros(len(counts) + 1, dtype=np.int32)
        np.cumsum(kept_counts, out=off[1:])
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(off, type=pa.int32()),
                                     flat.filter(pa.array(~member))),
            "\n")
        clean = pc.if_else(pa.array(valid), joined,
                           pa.scalar(None, pa.string()))
        return pa.table({"url": urls, "clean_text": clean,
                         "n_removed": pa.array(n_rem.astype(np.int64))})

    return ds.map_batches(strip, batch_format="pyarrow")


VAL_PCT = 10  # held-out fraction, percent of pages


def train_val_split(paths: str | list[str],
                    val_pct: int = VAL_PCT) -> "pd.DataFrame":
    """Deterministic train/validation holdout split report — the last
    step before a training export: every page lands in 'val' with
    probability val_pct/100 keyed on mix64(fnv1a64(url)) (replayable
    across engines, restarts and file layouts — a seeded random split
    is not), and the report counts pages per (lang, split) so an
    operator can see at a glance that the holdout is stratified the
    same way the corpus is. -> pandas DataFrame (lang, split, n_docs);
    null lang is its own group (SQL semantics).

    Scale shape: one stateless streamed pass, per-batch partial counts
    (lang x split cardinality), folded on the driver by a streaming
    O(distinct) merge — the corpus never shuffles and driver state is
    the final report. (First shipped with a groupby finish: Ray's hash
    shuffle cost ~5.7 s of pure task scheduling to move 3k partial
    rows at the 400k bench — stream_reduce_counts replaced it, 6.2 ->
    ~1.7 s.) Assigning the split COLUMN to every page (rather than
    counting) is the same pass minus the aggregate.

    Reference analog: none in Home.py (no dataset-split surface)."""
    import pandas as pd

    from ..functions.urls import fnv1a64
    from .docs import _NULL_KEY, _mix64
    from .relational import stream_reduce_counts

    ds = ray.data.read_parquet(paths, columns=["url", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        lang = pc.fill_null(_as_array(t.column("lang")), _NULL_KEY)
        u = _mix64(fnv1a64(_as_array(t.column("url"))))
        split = pa.array(np.where((u % np.uint64(100))
                                  < np.uint64(val_pct), "val", "train"))
        key = pc.binary_join_element_wise(lang, split, "\x1f")
        uniq, cnt = np.unique(np.asarray(key, dtype=object),
                              return_counts=True)
        return pa.table({"key": pa.array(uniq.tolist(), pa.string()),
                         "n_docs": cnt.astype(np.int64)})

    agg = stream_reduce_counts(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["key"], ["n_docs"])
    parts = [k.rsplit("\x1f", 1) for k in agg["key"]]
    return pd.DataFrame({
        "lang": [None if p[0] == _NULL_KEY else p[0] for p in parts],
        "split": [p[1] for p in parts],
        "n_docs": agg["n_docs"].to_numpy().astype("int64"),
    })


# Percentile-calibration band (Home.py:337-345 'Percentile' mode). The
# reference defaults to 2.5/97.5; these are the nearest DYADIC quantile
# positions (k/16), which make every interpolation intermediate an
# exactly-representable dyadic rational — the cross-engine float parity
# is then exact by construction instead of hedged with rounding. A
# non-dyadic q works too; round the fences to 4dp on both sides if so.
CAL_Q_LO = 1.0 / 16.0
CAL_Q_HI = 15.0 / 16.0


def _hist_quantile_cont(vals: np.ndarray, cnts: np.ndarray,
                        q: float) -> float:
    """Exact linear-interpolated quantile (numpy 'linear' == DuckDB
    quantile_cont) from a SORTED value histogram — the O(distinct)
    scale form of np.percentile over the expanded values."""
    n = int(cnts.sum())
    pos = (n - 1) * q
    lo = int(np.floor(pos))
    frac = pos - lo
    cum = np.cumsum(cnts)
    v_lo = float(vals[np.searchsorted(cum, lo, side="right")])
    v_hi = float(vals[np.searchsorted(cum, min(lo + 1, n - 1), side="right")])
    return v_lo + (v_hi - v_lo) * frac


def calibrated_outlier_flags(paths: str | list[str],
                             q_lo: float = CAL_Q_LO,
                             q_hi: float = CAL_Q_HI) -> ray.data.Dataset:
    """Per-language DATA-CALIBRATED length-outlier flags — the
    reference's core move (calibrate thresholds FROM the data, then
    flag each row against them: the percentile band of Home.py:337-345,
    its default calibration mode; the Tukey variant is the same
    machinery with fences q1 -/+ 1.5*IQR and is already driven by the
    tukey_fences query) applied to the web corpus: the [q_lo, q_hi]
    n_words band is computed PER LANGUAGE (a fixed 50..100k Gopher band
    is wrong for a language whose pages run short), then every page is
    flagged against its own language's band. Null-text pages carry no
    length and are excluded (SQL join semantics); null lang is its own
    calibration group.
    -> (url, lang, n_words, lo, hi, is_outlier), streaming Dataset.

    Scale shape: the corpus never shuffles and the fences are exact —
    n_words is an INTEGER feature, so each batch reduces to (lang,
    n_words) histogram partials, a metadata-sized groupby (langs x
    distinct lengths) sums them, and the exact interpolated quantiles
    come from the merged histogram (same arithmetic as np.percentile
    / quantile_cont, O(distinct) not O(corpus)); fences then broadcast
    (ray.put) and a stateless second pass flags. This is the integer-
    feature exact twin of the t-digest calibration path
    (calibrate.sketch_quantiles) — prefer it whenever the feature is
    discrete; fall back to the sketch for continuous features.

    Reference analog: thre_filter + cal_threshold (Home.py:161-184,
    337-365) — thresholds from quartiles of the data, keep/drop per
    row; per-language grouping replaces the reference's per-measure
    columns."""
    from .relational import stream_reduce_counts

    ds = ray.data.read_parquet(paths, columns=["url", "lang", "text"])

    # ONE text scan: reduce each page to (url, lang, n_words) int/short
    # rows, materialized once (~50 B/doc — the chunk-packer precedent:
    # o(corpus-bytes), two consumers) so calibration and flagging never
    # re-run the RE2 pass over the text
    def feat(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        valid = pa.array(~np.asarray(pc.is_null(text)))
        t = t.filter(valid)
        nw = _count_re(_as_array(t.column("text")), WORD_RE)
        return pa.table({"url": t.column("url"), "lang": t.column("lang"),
                         "n_words": pa.array(nw.astype(np.int64))})

    fm = ds.map_batches(feat, batch_format="pyarrow").materialize()

    def partial(t: pa.Table) -> pa.Table:
        lang_d = _as_array(pc.fill_null(_as_array(t.column("lang")),
                                        "")).dictionary_encode()
        code = np.asarray(lang_d.indices, dtype=np.int64)
        nw = np.asarray(t["n_words"], dtype=np.int64)
        # one int key per (lang, n_words) pair — no string building
        span = np.int64(nw.max()) + 1 if len(nw) else np.int64(1)
        uniq, cnt = np.unique(code * span + nw, return_counts=True)
        lang_out = lang_d.dictionary.take(pa.array(uniq // span))
        return pa.table({"lang": lang_out,
                         "n_words": pa.array((uniq % span).astype(np.int64)),
                         "n_docs": cnt.astype(np.int64)})

    agg = stream_reduce_counts(
        fm.map_batches(partial, batch_format="pyarrow"),
        ["lang", "n_words"], ["n_docs"])
    fences: dict[str, tuple[float, float]] = {}
    if len(agg):
        langs = agg["lang"].to_numpy(dtype=object)
        vals = agg["n_words"].to_numpy().astype(np.int64)
        cnts = agg["n_docs"].to_numpy().astype(np.int64)
        order = np.lexsort((vals, langs))
        langs, vals, cnts = langs[order], vals[order], cnts[order]
        starts = np.ones(len(langs), dtype=bool)
        starts[1:] = langs[1:] != langs[:-1]
        bounds = np.append(np.nonzero(starts)[0], len(langs))
        for i in range(len(bounds) - 1):  # one iteration per LANGUAGE
            s, e = bounds[i], bounds[i + 1]
            fences[langs[s]] = (
                _hist_quantile_cont(vals[s:e], cnts[s:e], q_lo),
                _hist_quantile_cont(vals[s:e], cnts[s:e], q_hi))
    f_langs = np.array(sorted(fences), dtype=object)
    f_lo = np.array([fences[l][0] for l in f_langs], dtype=np.float64)
    f_hi = np.array([fences[l][1] for l in f_langs], dtype=np.float64)
    fences_ref = ray.put((f_langs, f_lo, f_hi))

    def flag(t: pa.Table) -> pa.Table:
        f_langs, f_lo, f_hi = ray.get(fences_ref)
        lang_key = np.asarray(
            pc.fill_null(_as_array(t.column("lang")), ""), dtype=object)
        nw = np.asarray(t["n_words"], dtype=np.int64)
        if len(f_langs):
            idx = np.clip(np.searchsorted(f_langs, lang_key), 0,
                          len(f_langs) - 1)
            lo, hi = f_lo[idx], f_hi[idx]
        else:  # only reachable when every page in the corpus is null-text
            lo = np.zeros(len(t)); hi = np.zeros(len(t))
        return pa.table({
            "url": t.column("url"),
            "lang": t.column("lang"),
            "n_words": t.column("n_words"),
            "lo": pa.array(lo),
            "hi": pa.array(hi),
            "is_outlier": pa.array((nw < lo) | (nw > hi)),
        })

    return fm.map_batches(flag, batch_format="pyarrow")


# Deterministic decorated-recapture view: urls with fnv1a64(url) %
# DECOR_MOD == 0 were ALSO captured one day later through a decorated
# link — a tracking-parameter variant or a fragment variant, picked by
# (h // DECOR_MOD) % 2. Link decoration is why raw-url dedup undercounts
# recaptures on a real crawl.
DECOR_MOD = 3
DECOR_UTM_SUFFIX = "?utm_source=feed&utm_campaign=x"
DECOR_FRAG_SUFFIX = "#frag"
# the canonicalizer's RE2 constants (the SQL twin embeds the SAME):
# strip the fragment, drop utm_* query params, tidy the dangling sep
CANON_FRAG_RE = r"#.*$"
CANON_UTM_RE = r"utm_[^&]*(&|$)"
CANON_DANGLING_RE = r"[?&]$"


def canonical_url_dedup(paths: str | list[str],
                        n_shards: int | None = None) -> ray.data.Dataset:
    """URL CANONICALIZATION + first-capture dedup — the step before
    url-keyed snapshot dedup on a real crawl: the same page is reached
    via tracking-decorated and fragment-decorated links, so raw-url
    grouping splits its capture history. Canonical form here: strip the
    fragment, strip utm_* query params, drop the dangling separator
    (scheme/host case and default-port normalization live in _url_keep
    — this op composes after it on a real pipeline). Keep the EARLIEST
    capture per canonical url plus the capture count.
    -> streaming Dataset (url, first_ts, n_captures), one row per
    distinct canonical url; url is the canonical form.

    Input is the deterministic decorated-recapture view above (the
    dedup_url_keep_latest union-view pattern: on a real run the union
    is read_parquet over both crawls' shards and the decoration is the
    crawler's own). Scale shape: the canonicalizer is a stateless
    vectorized RE2 chain; then ONE bounded shuffle keyed on a
    canonical-url-hash shard picks min-ts + count vectorized per group
    — the north_rule partitioning key, no driver state; size n_shards
    from input bytes (house _shard_count rule).

    Reference analog: the reference joins rows on a compound natural
    key after normalizing it (Home.py:128-132); canonicalization is
    the web-corpus form of making the natural key actually natural."""
    from ..functions.urls import fnv1a64

    ds = ray.data.read_parquet(paths, columns=["url", "warc_ts"])
    if n_shards is None:
        # shard count from input bytes (house rule): the old fixed 8
        # capped the shuffle finish at 8-way parallelism on a 32-CPU box
        from .qc import _pages_shard_count

        # floor 8, not 64: these shuffles carry text/urls, and at
        # bench scale extra partitions cost more in exchange scheduling
        # + object-store churn than they buy in group parallelism
        # (measured at the 400k bench, quiet-box canary: 8 beats 16
        # beats 64 on every op here); at real scale the bytes/1GiB
        # term dominates the floor and per-group payload stays bounded
        n_shards = _pages_shard_count(paths, floor=8)

    def union_canon_shard(t: pa.Table) -> pa.Table:
        urls = _as_array(t.column("url"))
        h = fnv1a64(urls)
        ts = np.asarray(pc.cast(_as_array(t.column("warc_ts")), pa.int64()))
        re_mask = (h % np.uint64(DECOR_MOD)) == 0
        utm = ((h // np.uint64(DECOR_MOD)) % np.uint64(2)) == 0
        dec = pc.binary_join_element_wise(
            urls, pa.array(np.where(utm, DECOR_UTM_SUFFIX,
                                    DECOR_FRAG_SUFFIX)), "")
        raw = pa.concat_arrays([urls, _as_array(dec).filter(pa.array(re_mask))])
        out_ts = np.concatenate([ts, ts[re_mask] + RECRAWL_SHIFT_US])
        canon = pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.replace_substring_regex(raw, CANON_FRAG_RE, ""),
                CANON_UTM_RE, ""),
            CANON_DANGLING_RE, "")
        shard = (fnv1a64(_as_array(canon))
                 % np.uint64(n_shards)).astype(np.int64)
        return pa.table({"url": canon, "ts_us": pa.array(out_ts, pa.int64()),
                         "shard": pa.array(shard)})

    def earliest(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        g = g.sort_values(["url", "ts_us"], ascending=[True, True],
                          ignore_index=True)
        counts = g.groupby("url", sort=False).size().to_numpy()
        win = g.drop_duplicates("url", keep="first")
        return pd.DataFrame({
            "url": win["url"].to_numpy(),
            "first_ts": pd.to_datetime(win["ts_us"].to_numpy(), unit="us"),
            "n_captures": counts.astype("int64"),
        })

    return (ds.map_batches(union_canon_shard, batch_format="pyarrow")
            .groupby("shard").map_groups(earliest, batch_format="pandas"))


# Metadata RE2 constants (the SQL twin embeds the SAME strings)
TITLE_RE = r"<title>([^<]*)</title>"
LINK_RE = r"<a href="

# Meta-robots directive gate (a compliant crawl pipeline must honor
# <meta name="robots" content="noindex">: C4/CCNet-class corpora drop
# such pages at ingest). The fixture html carries no robots meta, so
# the op is exercised through a deterministic decorated-head view (the
# extract_links decoration pattern): pages with mix64(fnv(url) +
# NOINDEX_SALT) % NOINDEX_MOD == 0 get a robots meta APPENDED to the
# html bytes — content "noindex,nofollow" when the next bit is 0 (page
# must be dropped) and "nofollow" alone when 1 (page text is still
# indexable: kept, links not followed). Both engines construct the
# same decorated bytes and genuinely scan them with the same RE2.
NOINDEX_MOD = 5
NOINDEX_SALT = 9065923830046970997  # frozen odd 64-bit constant
ROBOTS_NOINDEX_TAG = '<meta name="robots" content="noindex,nofollow">'
ROBOTS_NOFOLLOW_TAG = '<meta name="robots" content="nofollow">'
ROBOTS_NOINDEX_RE = r'(?i)<meta\s+name="robots"\s+content="[^"]*noindex'
ROBOTS_NOFOLLOW_RE = r'(?i)<meta\s+name="robots"\s+content="[^"]*nofollow'


def noindex_filter(paths: str | list[str]) -> ray.data.Dataset:
    """Meta-robots directive gate over the decorated-head view ->
    (url, noindex, nofollow, keep): scans the html BYTES for a robots
    meta tag; keep = html present AND no noindex directive (nofollow
    alone keeps the page — it governs link extraction, not indexing).
    Null html -> false flags (no payload carries no directive — the
    pii_counts null convention), keep false.

    Scale shape: one stateless vectorized pass (one variadic join for
    the decoration + two RE2 kernels over the html); the html column
    never leaves the read task (map_batches fuses with the scan); no
    shuffle, no driver state — a pure map at 100 TB.

    Reference analog: the reference's isin/blocklist row filters
    (Home.py:176-183) keyed on a payload-embedded directive instead of
    a column value; north_rule's URL/ingest-policy filtering axis, the
    politeness side (url_host_filter is the blocklist side)."""
    ds = ray.data.read_parquet(paths, columns=["url", "html"])

    def stage(t: pa.Table) -> pa.Table:
        urls = _as_array(t.column("url"))
        html = _as_array(t.column("html"))
        valid = np.asarray(pc.is_valid(html))
        h = _mix64(fnv1a64(urls) + np.uint64(NOINDEX_SALT))
        dec_on = ((h % np.uint64(NOINDEX_MOD)) == 0) & valid
        pick_noindex = ((h // np.uint64(NOINDEX_MOD)) % np.uint64(2)) == 0
        tag = np.where(dec_on,
                       np.where(pick_noindex, ROBOTS_NOINDEX_TAG,
                                ROBOTS_NOFOLLOW_TAG), "")
        dec = pc.binary_join_element_wise(
            pc.cast(html, pa.string()), pa.array(tag, pa.string()), "")
        noindex = pc.fill_null(
            pc.match_substring_regex(dec, ROBOTS_NOINDEX_RE), False)
        nofollow = pc.fill_null(
            pc.match_substring_regex(dec, ROBOTS_NOFOLLOW_RE), False)
        keep = valid & ~np.asarray(noindex)
        return pa.table({
            "url": urls,
            "noindex": noindex,
            "nofollow": nofollow,
            "keep": pa.array(keep),
        })

    return ds.map_batches(stage, batch_format="pyarrow")


def extract_page_metadata(paths: str | list[str]) -> ray.data.Dataset:
    """Ingestion-side page-metadata enrichment — the structured fields a
    crawl index keeps NEXT TO the extracted text: first <title> capture
    (null when absent, not ''), anchor-link count (a connectivity
    signal URL-level filters consume), and raw html byte size (the
    storage/truncation audit column). The flagship's extract stage
    drops html as early as possible by design; this op is the one place
    the engine reads html for anything but text. -> streaming Dataset
    (url, title, n_links, html_bytes).

    Scale shape: one stateless vectorized pass — three RE2/byte kernels
    over the html column, no shuffle, no driver state; the html column
    never leaves the read task (map_batches fuses with the scan).

    Reference analog: data_load's derived-on-ingest columns
    (Home.py:98-106 — parse timestamps, compute section length at read
    time): enrichment belongs at the ingest boundary, not downstream."""
    ds = ray.data.read_parquet(paths, columns=["url", "html"])

    def stage(t: pa.Table) -> pa.Table:
        html = pc.cast(_as_array(t.column("html")), pa.string())
        title = pc.struct_field(
            pc.extract_regex(html, TITLE_RE.replace("([^<]*)",
                                                    "(?P<t>[^<]*)")), "t")
        n_links = _count_re(html, LINK_RE)
        nbytes = pc.fill_null(
            pc.cast(pc.binary_length(_as_array(t.column("html"))),
                    pa.int64()), 0)
        return pa.table({"url": t.column("url"), "title": title,
                         "n_links": pa.array(n_links.astype(np.int64)),
                         "html_bytes": nbytes})

    return ds.map_batches(stage, batch_format="pyarrow")


# ---- link graph: outlink extraction + host-level PageRank ---------------
# Deterministic decorated-outlink view (the canonical_url_dedup
# union-view pattern: on a real crawl the anchors are the pages' own;
# the fixture's nav anchors are all same-host, so cross-host anchors
# are APPENDED as a pure function of fnv1a64(url) — k = 1 + h %
# LINK_OUT_MOD anchors, the j-th pointing at host
# mix64(h + j + LINK_SALT) % LINK_HOST_SPACE). Both engines construct
# the SAME decorated bytes and then genuinely parse them, so the
# extraction path (split on the anchor opener, capture to the closing
# quote, resolve relative hrefs against the source host) is what the
# value check exercises.
LINK_OUT_MOD = 3
LINK_HOST_SPACE = 100            # fixture host space: host000..host099
LINK_SALT = 2870177450012600261  # frozen odd 64-bit constant
LINK_HREF_OPEN = '<a href="'     # literal split pattern (both engines)
LINK_HREF_RE = r'<a href="([^"]*)"'   # the DuckDB twin's capture form
LINK_ABS_HOST_RE = r"^https?://([^/?#]+)"

# anchor-tag lookup tables: _LINK_TAGS[j][d] is the j-th decorated
# anchor pointing at host d — built once at import (300 short strings)
_LINK_TAGS = [
    np.array([f'<a href="https://host{d:03d}.example/o/{j}">r</a>'
              for d in range(LINK_HOST_SPACE)], dtype=object)
    for j in range(LINK_OUT_MOD)
]

PAGERANK_SCALE = 10**9           # integer fixed-point rank units
PAGERANK_DAMP_NUM, PAGERANK_DAMP_DEN = 85, 100
PAGERANK_BASE = ((PAGERANK_DAMP_DEN - PAGERANK_DAMP_NUM)
                 * PAGERANK_SCALE) // PAGERANK_DAMP_DEN


def extract_links(paths: str | list[str],
                  n_shards: int | None = None) -> ray.data.Dataset:
    """Outlink EXTRACTION over the decorated-anchor view — the edge-list
    builder for host-graph quality signals (link-based host ranking is
    a published URL-level quality input for crawl filtering, e.g.
    Common Crawl's host-level centrality ranks). Parses every
    `<a href="...">` from the html bytes, resolves relative hrefs
    against the page's own host, and aggregates to host-level edges.
    -> streaming Dataset (src_host, dst_host, n_links), one row per
    ordered host pair (self-edges from the nav anchors included — the
    centrality consumer filters them).

    Scale shape: one stateless vectorized pass (literal split ->
    list-offset flatten -> RE2 capture -> dictionary-encoded per-batch
    pair counts; the html column never leaves the read task), then ONE
    bounded shuffle of pre-aggregated (src, dst, partial-count) rows
    keyed on a pair-hash shard — partials are host-pair-sized, never
    corpus-sized; no driver state.

    Reference analog: the reference derives join keys from compound
    natural columns at load (Home.py:98-106); here the natural key
    (the link graph) is parsed out of the raw payload at ingest."""
    ds = ray.data.read_parquet(paths, columns=["url", "html"])
    if n_shards is None:
        from .qc import _pages_shard_count

        n_shards = _pages_shard_count(paths, floor=8)

    def edge_partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("html")))
        if len(t) == 0:
            return pa.table({"src_host": pa.array([], pa.string()),
                             "dst_host": pa.array([], pa.string()),
                             "w": pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int64())})
        urls = _as_array(t.column("url"))
        html = pc.cast(_as_array(t.column("html")), pa.string())
        h = fnv1a64(urls)
        k = 1 + (h % np.uint64(LINK_OUT_MOD)).astype(np.int64)
        # one variadic join (single output pass) instead of chained
        # two-arg joins — the html column is the big payload and each
        # chained join re-copies it
        tags = []
        for j in range(LINK_OUT_MOD):
            dst_j = (_mix64(h + np.uint64(LINK_SALT + j))
                     % np.uint64(LINK_HOST_SPACE)).astype(np.int64)
            tags.append(pa.array(np.where(j < k, _LINK_TAGS[j][dst_j], ""),
                                 pa.string()))
        dec = pc.binary_join_element_wise(html, *tags, "")
        pieces = pc.list_slice(pc.split_pattern(dec, LINK_HREF_OPEN), 1)
        parents = np.asarray(pc.list_parent_indices(pieces))
        flat = pc.list_flatten(pieces)
        href = pc.struct_field(
            pc.extract_regex(flat, r'^(?P<h>[^"]*)"'), "h")
        src_host = host_of_urls(urls)
        src_flat = pc.take(src_host, pa.array(parents, pa.int64()))
        abs_host = pc.struct_field(
            pc.extract_regex(href, LINK_ABS_HOST_RE.replace(
                "([^/?#]+)", "(?P<host>[^/?#]+)")), "host")
        dst_host = pc.if_else(pc.starts_with(href, "/"), src_flat, abs_host)
        # \x1f pair separator (NUL would trip pandas' string hashing —
        # see the null-group sentinel note); drop unresolvable hrefs
        key = pc.binary_join_element_wise(src_flat, dst_host, "\x1f")
        key = pc.drop_null(key)
        d = pc.dictionary_encode(key)
        codes = np.asarray(d.indices)
        vocab = d.dictionary
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        parts = pc.split_pattern(vocab, "\x1f")
        return pa.table({
            "src_host": pc.list_element(parts, 0),
            "dst_host": pc.list_element(parts, 1),
            "w": pa.array(cnt),
            "shard": pa.array((fnv1a64(vocab) % np.uint64(n_shards))
                              .astype(np.int64)),
        })

    def finish(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        s = (g.groupby(["src_host", "dst_host"], sort=False)["w"].sum()
             .reset_index())
        return pd.DataFrame({"src_host": s["src_host"],
                             "dst_host": s["dst_host"],
                             "n_links": s["w"].astype("int64")})

    return (ds.map_batches(edge_partials, batch_format="pyarrow")
            .groupby("shard").map_groups(finish, batch_format="pandas"))


@ray.remote(num_cpus=1)
def _pagerank_single_task(src: np.ndarray, dst: np.ndarray,
                          w: np.ndarray, n_iter: int) -> pa.Table:
    """Integer fixed-point damped PageRank for a ONE-PARTITION-sized
    edge list inside a single Ray task (the _cc_labels_single_task fast
    path shape): nodes = hosts present in the edge list, r_0 = SCALE,
    each iteration r <- BASE + (85 * sum_in floor(r_src * w / outw_src))
    // 100. Every step is an integer floor, so the result is exactly
    reproducible in any engine (the DuckDB twin unrolls the same
    iterations); dangling-node mass is dropped (documented — the twin
    does the same). Identical to the distributed rounds (pytest-pinned)."""
    hosts = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(hosts, src)
    di = np.searchsorted(hosts, dst)
    outw = np.zeros(len(hosts), dtype=np.int64)
    np.add.at(outw, si, w)
    r = np.full(len(hosts), PAGERANK_SCALE, dtype=np.int64)
    for _ in range(n_iter):
        contrib = (r[si] * w) // outw[si]
        acc = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(acc, di, contrib)
        r = PAGERANK_BASE + (PAGERANK_DAMP_NUM * acc) // PAGERANK_DAMP_DEN
    return pa.table({"host": pa.array(hosts, pa.string()),
                     "rank": pa.array(r, pa.int64())})


def host_pagerank(paths: str | list[str], n_iter: int = 3,
                  single_task_max_rows: int = 2_000_000
                  ) -> ray.data.Dataset:
    """Host-level PageRank over the extracted link graph — the
    centrality score URL-level quality filters consume (a host linked
    by many well-linked hosts is likelier to carry quality text; the
    host-rank percentile becomes a keep/weight signal next to the
    rule banks). Self-edges (intra-host nav links) are excluded, the
    standard host-graph convention. -> Dataset (host, rank) where rank
    is the integer fixed-point score after `n_iter` damped iterations
    (r_0 = PAGERANK_SCALE; r <- BASE + 85% of floor-divided in-flow;
    all-integer arithmetic, so both engines agree bit for bit).

    Scale shape: the edge list is host-pair-sized (already aggregated
    by extract_links). Small graphs collapse into ONE Ray task
    (vectorized searchsorted/add.at iterations — the
    _cc_labels_single_task precedent; each distributed round costs 3+
    cluster barriers, which dominates wall time until the rank table
    outgrows a worker). Beyond `single_task_max_rows` edges the
    iterations run distributed, the _cc_min_label_ds shape: per round
    one hash join (ranks to edges on src_host, partitions sized from
    the data) + one bounded groupby-sum over (dst, contrib) partials —
    payload O(edges + hosts) int rows per round, never corpus-sized,
    no driver state. Dangling hosts lose their mass (documented; the
    SQL twin drops it identically).

    Reference analog: the reference's calibrate-threshold-from-data
    move (Home.py:337-365) — a data-derived per-entity score consumed
    downstream as a filter input."""
    from ray.data.aggregate import Sum as RaySum

    edges = extract_links(paths)

    def drop_self(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.equal(t.column("src_host"),
                                           t.column("dst_host"))))

    edges = edges.map_batches(drop_self, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(pa.table({
            "host": pa.array([], pa.string()),
            "rank": pa.array([], pa.int64())}))
    if n_edges <= single_task_max_rows:
        pdf = edges.to_pandas()
        ref = _pagerank_single_task.remote(
            pdf["src_host"].to_numpy(dtype=object),
            pdf["dst_host"].to_numpy(dtype=object),
            pdf["n_links"].to_numpy(dtype=np.int64), n_iter)
        return ray.data.from_arrow_refs([ref])

    from .docs import _cc_num_partitions

    def rename(frm: str, to: str):
        def _r(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [to if c == frm else c for c in t.column_names])
        return _r

    srcs = (edges.select_columns(["src_host"])
            .map_batches(rename("src_host", "host"), batch_format="pyarrow"))
    dsts = (edges.select_columns(["dst_host"])
            .map_batches(rename("dst_host", "host"), batch_format="pyarrow"))
    from ray.data.aggregate import Count

    nodes = (srcs.union(dsts).groupby("host")
             .aggregate(Count(alias_name="c")).select_columns(["host"])
             .materialize())
    n_nodes = nodes.count()
    n_parts = _cc_num_partitions(n_edges, n_nodes)
    outw = (edges.groupby("src_host")
            .aggregate(RaySum("n_links", alias_name="outw")))
    edges2 = edges.join(outw, join_type="inner", on=["src_host"],
                        num_partitions=n_parts).materialize()

    def init_rank(t: pa.Table) -> pa.Table:
        return pa.table({
            "src_host": t.column("host"),
            "rank": pa.array(np.full(len(t), PAGERANK_SCALE, np.int64))})

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        r = np.asarray(t.column("rank"), dtype=np.int64)
        w = np.asarray(t.column("n_links"), dtype=np.int64)
        o = np.asarray(t.column("outw"), dtype=np.int64)
        return pa.table({"host": t.column("dst_host"),
                         "c": pa.array((r * w) // o)})

    def zero_c(t: pa.Table) -> pa.Table:
        return pa.table({"host": t.column("host"),
                         "c": pa.array(np.zeros(len(t), np.int64))})

    def damp(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("s"), dtype=np.int64)
        return pa.table({
            "src_host": t.column("host"),
            "rank": pa.array(PAGERANK_BASE
                             + (PAGERANK_DAMP_NUM * s)
                             // PAGERANK_DAMP_DEN)})

    for _ in range(n_iter):
        prop = (edges2.join(ranks, join_type="inner", on=["src_host"],
                            num_partitions=n_parts)
                .map_batches(contrib, batch_format="pyarrow"))
        base0 = nodes.map_batches(zero_c, batch_format="pyarrow")
        # barrier between join output and groupby (Ray 2.49 — see the
        # _cc_min_label_ds note); materialize: ranks feed the next
        # round's join and Datasets are lazy plans
        cand = base0.union(prop).repartition(n_parts)
        ranks = (cand.groupby("host").aggregate(RaySum("c", alias_name="s"))
                 .map_batches(damp, batch_format="pyarrow").materialize())

    return ranks.map_batches(rename("src_host", "host"),
                             batch_format="pyarrow")


def host_rank_filter(paths: str | list[str], pct: int = 25,
                     n_iter: int = 3) -> ray.data.Dataset:
    """Link-centrality GATE — the step that turns host_pagerank into a
    page-level keep decision (the published Common-Crawl-style use:
    drop pages from the least-linked hosts wholesale, before per-doc
    rules run). Keep a page iff its host's rank clears the pct-th
    percentile ORDER STATISTIC of all host ranks (ceil(pct*n/100)-th
    smallest, 1-indexed — the house ccnet recipe: no quantile
    interpolation, tie runs stay atomic across engines). Hosts absent
    from the rank table (every page null-html, so no outlinks) get
    rank 0 / keep false on both sides — never a nullable int column
    (the pandas Int64 driver-compare trap).
    -> streaming Dataset (url, host, rank, keep) over every page.

    Scale shape: the rank table is HOST-cardinality (the
    host_reputation_filter precedent: O(hosts) on the driver is the
    size of the result a consumer holds anyway), broadcast once via
    ray.put; the corpus itself streams through one stateless
    searchsorted labeling pass — no shuffle beyond the edge build
    inside host_pagerank.

    Reference analog: calibrate-threshold-from-data + flag
    (Home.py:337-365, 176-183) lifted to the host granularity."""
    from .relational import ensure_columns

    # empty-corpus collect loses the schema (zero-column frame gotcha)
    ranks_pd = ensure_columns(
        host_pagerank(paths, n_iter=n_iter).to_pandas(),
        {"host": "object", "rank": "int64"})
    hosts = np.asarray(ranks_pd["host"], dtype=object)
    rk = ranks_pd["rank"].to_numpy(dtype=np.int64)
    order = np.argsort(hosts)
    hosts, rk = hosts[order], rk[order]
    if len(rk):
        k = (pct * len(rk) + 99) // 100  # ceil, integer arithmetic
        thr = int(np.sort(rk)[max(k - 1, 0)])
    else:
        thr = 0
    ref = ray.put((hosts, rk))

    def label(t: pa.Table) -> pa.Table:
        hs, rv = ray.get(ref)
        urls = _as_array(t.column("url"))
        host = host_of_urls(urls)
        ho = np.asarray(pc.fill_null(host, ""), dtype=object)
        if len(hs):
            idx = np.clip(np.searchsorted(hs, ho), 0, len(hs) - 1)
            found = hs[idx] == ho
            rank = np.where(found, rv[idx], np.int64(0))
        else:
            found = np.zeros(len(t), dtype=bool)
            rank = np.zeros(len(t), dtype=np.int64)
        return pa.table({
            "url": urls,
            "host": host,
            "rank": pa.array(rank, pa.int64()),
            "keep": pa.array(found & (rank >= thr)),
        })

    ds = ray.data.read_parquet(paths, columns=["url"])
    return ds.map_batches(label, batch_format="pyarrow")


def host_components(paths: str | list[str],
                    min_links: int = 2) -> ray.data.Dataset:
    """MUTUAL-STRONG-LINK host clusters — weakly-connected components
    of the host graph restricted to RECIPROCAL edges (each direction
    carrying >= min_links anchors on its own): the mirror-farm /
    site-network detector a crawl audit runs before per-host caps, so
    one cap (cap_per_host, host_rank_filter) can treat a whole mirror
    cluster as one site. Mutuality is the discriminator — a Zipf hub
    host links OUT to everyone, but only genuine site networks link
    each other strongly BOTH ways (directional thresholds collapse the
    fixture to one hub-connected component; reciprocal ones yield real
    clusters). Component id = the lexicographically smallest host in
    the component (strings sort identically in both engines). Only
    hosts on at least one mutual edge appear — isolated hosts are
    their own trivial cluster and are omitted, the walk convention the
    near-dup family uses. -> Dataset (host, component).

    Scale shape: reuses the near-dup CC machinery end to end — the
    edge table is host-pair-sized (already aggregated by
    extract_links, far below corpus scale; the same bounded collect
    the minhash candidate path takes), reciprocity is one vectorized
    unordered-pair group count over that table, hosts map to dense int
    ids through ONE sorted-unique array (sorted ids preserve
    lexicographic order, so the component MIN maps back exactly), and
    labels come from docs._cc_min_label_ds: single-task vectorized
    fixpoint under the 2M-row bound, distributed min-label rounds with
    data-sized partitions beyond it.

    Reference analog: the reference's groupby-over-a-derived-key
    summaries (Home.py:215-270) — here the derived key is itself
    computed by a fixpoint over the link graph."""
    import pandas as pd

    from .docs import _cc_min_label_ds

    def strong(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.invert(pc.equal(t.column("src_host"), t.column("dst_host"))),
            pc.greater_equal(t.column("n_links"), min_links))
        return t.filter(keep)

    pairs = (extract_links(paths)
             .map_batches(strong, batch_format="pyarrow").to_pandas())
    empty = ray.data.from_arrow(pa.table({
        "host": pa.array([], pa.string()),
        "component": pa.array([], pa.string())}))
    if len(pairs) == 0:
        return empty
    # reciprocal = the unordered pair appears twice (each direction is
    # a single grouped row, both already >= min_links after `strong`)
    s = pairs["src_host"].to_numpy(dtype=object)
    d = pairs["dst_host"].to_numpy(dtype=object)
    swap = s > d
    lo, hi = np.where(swap, d, s), np.where(swap, s, d)
    both = (pd.DataFrame({"lo": lo, "hi": hi})
            .groupby(["lo", "hi"], sort=False).size())
    both = both[both == 2].reset_index()
    if len(both) == 0:
        return empty
    src = both["lo"].to_numpy(dtype=object)
    dst = both["hi"].to_numpy(dtype=object)
    hosts = np.unique(np.concatenate([src, dst]))  # sorted unique
    import pandas as pd

    edges_pd = pd.DataFrame({
        "src": np.concatenate([np.searchsorted(hosts, src),
                               np.searchsorted(hosts, dst)]).astype(np.int64),
        "dst": np.concatenate([np.searchsorted(hosts, dst),
                               np.searchsorted(hosts, src)]).astype(np.int64),
    })
    labels, _ = _cc_min_label_ds(edges_pd)
    hosts_ref = ray.put(hosts)

    def to_hosts(t: pa.Table) -> pa.Table:
        hs = ray.get(hosts_ref)
        node = np.asarray(t.column("node"), dtype=np.int64)
        label = np.asarray(t.column("label"), dtype=np.int64)
        return pa.table({
            "host": pa.array(hs[node], pa.string()),
            "component": pa.array(hs[label], pa.string())})

    return labels.map_batches(to_hosts, batch_format="pyarrow")


# ---- extraction-yield gate + normalized exact dedup ---------------------
# Extraction yield (text bytes / html bytes): the boilerplate-density
# signal content extractors publish (jusText/trafilatura-family tooling
# reports "extraction ratio"; a page whose cleaned text is a small
# fraction of its markup is chrome, tag soup, or an extraction failure
# even when every word-level gate passes). Keep iff
# YIELD_DEN * text_bytes >= YIELD_NUM * html_bytes (integer
# cross-multiply — no float in the gate).
YIELD_NUM, YIELD_DEN = 1, 2

# Normalized exact dedup: the normalization spec (BOTH engines embed the
# same constants) is lower -> collapse every non-alphanumeric run to one
# space -> trim. RefinedWeb-family pipelines dedup on exactly this kind
# of normalized text so that case/punctuation/whitespace edits don't
# defeat exact dedup.
NORM_COLLAPSE_RE = r"[^a-z0-9]+"
# Deterministic perturbed-recapture view (the canonical_url_dedup
# union-view pattern): pages with fnv1a64(url) % NORMDUP_MOD == 0 were
# ALSO captured a day later at a distinct url with the text reflowed —
# uppercased with doubled spaces and trailing punctuation — i.e. a
# normalized-equal, byte-UNEQUAL variant. Byte-exact dedup misses every
# one of them; this op must not.
NORMDUP_MOD = 4
NORMDUP_URL_SUFFIX = "?amp=1"
NORMDUP_TEXT_SUFFIX = "  !!"


def extraction_yield(paths: str | list[str]) -> ray.data.Dataset:
    """Per-page extraction-yield gate -> (url, text_bytes, html_bytes,
    yield_ratio, keep): text_bytes / html_bytes as the boilerplate-
    density signal, keep iff both payloads are present, html is
    non-empty, and YIELD_DEN * text_bytes >= YIELD_NUM * html_bytes.
    Null text or null html -> NULL byte count on that side, NULL ratio,
    keep false; empty html -> NULL ratio, keep false. yield_ratio is a
    single int/int float64 division, so the DuckDB twin (strlen /
    octet_length over the same bytes) is bit-identical.

    Scale shape: one stateless vectorized pass (two byte-length
    kernels), no shuffle, no driver state — a pure map at 100 TB; the
    html column never leaves the read task (map_batches fuses with the
    scan).

    Reference analog: Home.py's derived-on-load ratio columns
    (H:98-106) as a keep gate; north_rule's heuristic-quality bank,
    extraction-health axis."""
    ds = ray.data.read_parquet(paths, columns=["url", "html", "text"])

    def stage(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        html = _as_array(t.column("html"))
        tb = pc.cast(pc.binary_length(text), pa.int64())   # null-preserving
        hb = pc.cast(pc.binary_length(html), pa.int64())
        tb_np = np.asarray(pc.fill_null(tb, -1))
        hb_np = np.asarray(pc.fill_null(hb, -1))
        ok = (tb_np >= 0) & (hb_np > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(ok, tb_np / np.where(hb_np > 0, hb_np, 1),
                             np.nan)
        keep = ok & (YIELD_DEN * tb_np >= YIELD_NUM * hb_np)
        return pa.table({
            "url": t["url"],
            "text_bytes": tb,
            "html_bytes": hb,
            "yield_ratio": pa.array(ratio, type=pa.float64(), mask=~ok),
            "keep": pa.array(keep),
        })

    if ds.count() == 0:  # metadata-only on a fresh parquet read
        return ray.data.from_arrow(stage(pa.table({
            "url": pa.array([], type=pa.string()),
            "html": pa.array([], type=pa.binary()),
            "text": pa.array([], type=pa.string())})))
    return ds.map_batches(stage, batch_format="pyarrow")


def _normalize_text(text: pa.Array) -> pa.Array:
    """The frozen normalization chain (lower -> collapse non-alnum runs
    to one space -> trim); the SQL twin is
    trim(regexp_replace(lower(text), NORM_COLLAPSE_RE, ' ', 'g'))."""
    return pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(text),
                                   NORM_COLLAPSE_RE, " "), " ")


def dedup_normalized(paths: str | list[str],
                     n_shards: int | None = None) -> ray.data.Dataset:
    """Normalized exact dedup over the perturbed-recapture view ->
    streaming Dataset (url, first_ts, n_variants): one row per distinct
    NORMALIZED text, carrying the url of its earliest capture (ties by
    url asc) and the variant count. Case/whitespace/punctuation edits
    (the recapture view's uppercase-reflow variants) collapse into one
    group here while byte-exact dedup sees distinct texts. Null-text
    and normalizes-to-empty pages are out of scope (dropped — dedup is
    defined over textful pages).

    Scale shape: pages map to (norm-hash shard, url, ts, norm) rows in
    one vectorized pass; ONE bounded shuffle keyed on
    fnv1a64(norm) % n_shards (shards sized from input footer bytes,
    floor 8 — the house crawl-op rule) groups normalized-equal texts;
    the winner pick and count are a per-group lexsort. No driver state;
    group payload is bounded by the shard count, never a whole-corpus
    collect.

    Reference analog: exact_dedup's winner-per-group shape (SURVEY §2
    dedup family) with a normalization key; RefinedWeb-style
    normalize-then-hash dedup (published pipeline step)."""
    import pandas as pd

    ds = ray.data.read_parquet(paths, columns=["url", "warc_ts", "text"])
    if n_shards is None:
        from .qc import _pages_shard_count

        n_shards = _pages_shard_count(paths, floor=8)

    def union_norm_shard(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("text")))
        if len(t) == 0:
            return pa.table({"url": pa.array([], pa.string()),
                             "ts_us": pa.array([], pa.int64()),
                             "norm": pa.array([], pa.string()),
                             "shard": pa.array([], pa.int64())})
        urls = _as_array(t.column("url"))
        text = _as_array(t.column("text"))
        ts = np.asarray(pc.cast(_as_array(t.column("warc_ts")), pa.int64()))
        h = fnv1a64(urls)
        re_mask = (h % np.uint64(NORMDUP_MOD)) == 0
        # recapture variant: distinct url, +1 day, reflowed text
        # (uppercase, doubled spaces, trailing punctuation) — byte-
        # unequal, normalized-equal by construction
        dec_url = pc.binary_join_element_wise(
            urls, pa.scalar(NORMDUP_URL_SUFFIX), "")
        dec_text = pc.binary_join_element_wise(
            pc.replace_substring(pc.utf8_upper(text), " ", "  "),
            pa.scalar(NORMDUP_TEXT_SUFFIX), "")
        all_urls = pa.concat_arrays(
            [urls, _as_array(dec_url).filter(pa.array(re_mask))])
        all_text = pa.concat_arrays(
            [text, _as_array(dec_text).filter(pa.array(re_mask))])
        all_ts = np.concatenate([ts, ts[re_mask] + RECRAWL_SHIFT_US])
        norm = _normalize_text(all_text)
        nonempty = np.asarray(pc.not_equal(norm, ""))
        sel = pa.array(nonempty)
        norm = norm.filter(sel)
        shard = (fnv1a64(_as_array(norm))
                 % np.uint64(n_shards)).astype(np.int64)
        return pa.table({"url": all_urls.filter(sel),
                         "ts_us": pa.array(all_ts[nonempty], pa.int64()),
                         "norm": norm,
                         "shard": pa.array(shard)})

    def earliest(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["norm", "ts_us", "url"], ignore_index=True)
        counts = g.groupby("norm", sort=False).size().to_numpy()
        win = g.drop_duplicates("norm", keep="first")
        return pd.DataFrame({
            "url": win["url"].to_numpy(),
            "first_ts": pd.to_datetime(win["ts_us"].to_numpy(), unit="us"),
            "n_variants": counts.astype("int64"),
        })

    return (ds.map_batches(union_norm_shard, batch_format="pyarrow")
            .groupby("shard").map_groups(earliest, batch_format="pandas"))


def lang_confusion(paths: str | list[str]) -> "pd.DataFrame":
    """Declared-vs-predicted language agreement audit -> confusion
    matrix (lang_declared, lang_pred, n_pages) — the crawl-metadata
    validation step: a page's self-declared language header is wrong
    often enough (the fixture plants ~2% mislabels by construction)
    that production pipelines trust the model and AUDIT the metadata.
    NULL declared langs and NULL predictions (null text) are real
    matrix cells. The output is the language-pair-sized artifact a
    100 TB run ships to its metrics store, not a per-page table.

    Scale shape: the frozen LangIdModel predicts per batch (built once
    per worker process — the langid_batch cache pattern), each batch
    reduces to (declared, pred, n) partials, and the language-pair-
    sized partial stream folds on the driver via stream_reduce_counts
    (the house rule for metadata-sized finishes: a hash shuffle over
    hundreds of tiny partial blocks costs seconds of pure scheduling).
    The corpus never shuffles.

    Reference analog: the reference's grouped count summaries
    (Home.py:215-270) with a model-predicted grouping key; north_rule's
    langid stage, audit axis."""
    import pandas as pd

    from ..stages.langid import LangIdModel
    from .relational import stream_reduce_counts

    ds = ray.data.read_parquet(paths, columns=["text", "lang"])

    _cache: list = []

    def partials(t: pa.Table) -> pa.Table:
        if not _cache:  # one frozen model per worker process
            _cache.append(LangIdModel())
        preds, _ = _cache[0].predict(_as_array(t.column("text")))
        decl = _as_array(t.column("lang")).to_numpy(zero_copy_only=False)
        pairs = (pd.DataFrame({"lang_declared": decl, "lang_pred": preds})
                 .groupby(["lang_declared", "lang_pred"], dropna=False,
                          sort=False).size().reset_index(name="n_pages"))
        return pa.table({
            "lang_declared": pa.array(
                [None if pd.isna(v) else v
                 for v in pairs["lang_declared"]], pa.string()),
            "lang_pred": pa.array(
                [None if pd.isna(v) else v
                 for v in pairs["lang_pred"]], pa.string()),
            "n_pages": pa.array(pairs["n_pages"].to_numpy(), pa.int64()),
        })

    out = stream_reduce_counts(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["lang_declared", "lang_pred"], ["n_pages"])
    out["n_pages"] = out["n_pages"].astype("int64")
    return (out.sort_values(["lang_declared", "lang_pred"],
                            na_position="last", ignore_index=True)
            [["lang_declared", "lang_pred", "n_pages"]])


def pii_density_by_host(paths: str | list[str]) -> "pd.DataFrame":
    """Host-level PII density rollup -> (host, n_pages,
    n_pages_with_pii, n_pii_total, pii_rate, pii_per_page) — the
    scrub-policy targeting artifact: a compliance review doesn't act on
    400k per-page counters, it acts on "which DOMAINS leak PII and how
    hard", then tightens the scrub (or drops the host) there. NULL /
    unparsable-url pages roll up under a NULL host row.

    Scale shape: the SAME counting kernel as pii_counts
    (_pii_match_counts — shared so audit and rollup can never drift),
    reduced per batch to host-keyed integer partials, folded on the
    driver via stream_reduce_counts (host-cardinality output; the house
    rule for metadata-sized finishes). The corpus never shuffles.
    pii_rate / pii_per_page are single int/int float64 divisions —
    bit-identical in the DuckDB twin.

    Reference analog: the reference's grouped outlier counters per
    district (Home.py:444-904) — counts of flagged rows per grouping
    key; north_rule's scrub bank, metrics side."""
    import pandas as pd

    from .relational import stream_reduce_counts

    ds = ray.data.read_parquet(paths, columns=["url", "text"])

    def partials(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        _counts, total = _pii_match_counts(text)
        host = host_of_urls(_as_array(t.column("url")))
        g = (pd.DataFrame({
                "host": host.to_numpy(zero_copy_only=False),
                "n_pages": np.ones(len(t), dtype=np.int64),
                "n_pages_with_pii": (total > 0).astype(np.int64),
                "n_pii_total": total})
             .groupby("host", dropna=False, sort=False).sum().reset_index())
        return pa.table({
            "host": pa.array([None if pd.isna(v) else v
                              for v in g["host"]], pa.string()),
            "n_pages": pa.array(g["n_pages"].to_numpy(), pa.int64()),
            "n_pages_with_pii": pa.array(
                g["n_pages_with_pii"].to_numpy(), pa.int64()),
            "n_pii_total": pa.array(g["n_pii_total"].to_numpy(), pa.int64()),
        })

    out = stream_reduce_counts(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["host"], ["n_pages", "n_pages_with_pii", "n_pii_total"])
    for c in ("n_pages", "n_pages_with_pii", "n_pii_total"):
        out[c] = out[c].astype("int64")
    n = out["n_pages"].to_numpy().astype(np.float64)
    out["pii_rate"] = out["n_pages_with_pii"].to_numpy() / n
    out["pii_per_page"] = out["n_pii_total"].to_numpy() / n
    return (out.sort_values("host", na_position="last", ignore_index=True)
            [["host", "n_pages", "n_pages_with_pii", "n_pii_total",
              "pii_rate", "pii_per_page"]])


def crawl_drift(paths: str | list[str]) -> "pd.DataFrame":
    """Temporal corpus-drift report -> one row per capture-hour bucket
    (bucket_hour = epoch-us // 3.6e9): n_pages, n_text (non-null),
    total_text_bytes, mean_text_bytes — the monitoring table a
    continuous-crawl pipeline charts to catch ingest regressions
    (a collapsing mean length or a null-text spike in one capture
    window flags a broken extractor or a source outage long before any
    per-page gate does). mean is NULL for a bucket with no textful
    pages.

    Scale shape: per-batch integer partials keyed on the int bucket,
    folded on the driver via stream_reduce_counts (bucket-cardinality
    output — hours, not pages); the corpus never shuffles. The mean is
    one int/int float64 division, bit-identical in the twin.

    Reference analog: the reference's year-by-year district summaries
    (Home.py:215-270) — the same report keyed on capture time instead
    of fiscal year."""
    import pandas as pd

    from .relational import stream_reduce_counts

    ds = ray.data.read_parquet(paths, columns=["warc_ts", "text"])

    def partials(t: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(_as_array(t.column("warc_ts")), pa.int64()))
        bucket = ts // 3_600_000_000
        text = _as_array(t.column("text"))
        valid = np.asarray(pc.is_valid(text)).astype(np.int64)
        nbytes = np.asarray(pc.fill_null(
            pc.cast(pc.binary_length(text), pa.int64()), 0))
        g = (pd.DataFrame({"bucket_hour": bucket,
                           "n_pages": np.ones(len(t), dtype=np.int64),
                           "n_text": valid,
                           "total_text_bytes": nbytes})
             .groupby("bucket_hour", sort=False).sum().reset_index())
        return pa.table({
            "bucket_hour": pa.array(g["bucket_hour"].to_numpy(), pa.int64()),
            "n_pages": pa.array(g["n_pages"].to_numpy(), pa.int64()),
            "n_text": pa.array(g["n_text"].to_numpy(), pa.int64()),
            "total_text_bytes": pa.array(
                g["total_text_bytes"].to_numpy(), pa.int64()),
        })

    out = stream_reduce_counts(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["bucket_hour"], ["n_pages", "n_text", "total_text_bytes"])
    for c in ("bucket_hour", "n_pages", "n_text", "total_text_bytes"):
        out[c] = out[c].astype("int64")
    n_text = out["n_text"].to_numpy().astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = np.where(n_text > 0,
                        out["total_text_bytes"].to_numpy() / n_text, np.nan)
    out["mean_text_bytes"] = mean
    out.loc[out["n_text"] == 0, "mean_text_bytes"] = np.nan
    return (out.sort_values("bucket_hour", ignore_index=True)
            [["bucket_hour", "n_pages", "n_text", "total_text_bytes",
              "mean_text_bytes"]])


def dedup_normalized_rows(paths: str | list[str],
                          n_shards: int | None = None) -> ray.data.Dataset:
    """Per-page label form of `dedup_normalized` -> streaming Dataset
    (url, keep): keep=false iff the page is a NON-earliest capture of
    its normalized-text group over the same perturbed-recapture union
    view (ties by url asc) — the transform a prep chain consumes, where
    `dedup_normalized` is the report (the exact_dedup /
    exact_dedup_rows duality). Out-of-dedup-scope rows (null text, or
    text that normalizes to empty) keep=true: dedup never drops them;
    the null/quality gates do.

    Scale shape: out-of-scope rows take a shuffle-free label pass and
    UNION with the in-scope stream, which pays the same single bounded
    norm-hash shard shuffle as the report; per-group labeling is one
    lexsort + first-occurrence mask. Output is view-row-sized and
    streams; no driver state."""
    import pandas as pd

    ds = ray.data.read_parquet(paths, columns=["url", "warc_ts", "text"])
    if n_shards is None:
        from .qc import _pages_shard_count

        n_shards = _pages_shard_count(paths, floor=8)

    def split_scope(t: pa.Table, want_in_scope: bool) -> pa.Table:
        urls = _as_array(t.column("url"))
        text = _as_array(t.column("text"))
        ts = np.asarray(pc.cast(_as_array(t.column("warc_ts")), pa.int64()))
        valid = np.asarray(pc.is_valid(text))
        h = fnv1a64(urls)
        re_mask = ((h % np.uint64(NORMDUP_MOD)) == 0) & valid
        dec_url = pc.binary_join_element_wise(
            urls, pa.scalar(NORMDUP_URL_SUFFIX), "")
        dec_text = pc.binary_join_element_wise(
            pc.replace_substring(pc.utf8_upper(pc.fill_null(text, "")),
                                 " ", "  "),
            pa.scalar(NORMDUP_TEXT_SUFFIX), "")
        all_urls = pa.concat_arrays(
            [urls, _as_array(dec_url).filter(pa.array(re_mask))])
        all_text = pa.concat_arrays(
            [pc.fill_null(text, ""),
             _as_array(dec_text).filter(pa.array(re_mask))])
        all_ts = np.concatenate([ts, ts[re_mask] + RECRAWL_SHIFT_US])
        all_valid = np.concatenate(
            [valid, np.ones(int(re_mask.sum()), dtype=bool)])
        norm = _normalize_text(all_text)
        in_scope = all_valid & (np.asarray(pc.not_equal(norm, "")))
        sel = pa.array(in_scope if want_in_scope else ~in_scope)
        if not want_in_scope:
            n_out = int((~in_scope).sum())
            return pa.table({"url": all_urls.filter(sel),
                             "keep": pa.array(np.ones(n_out, bool)),
                             "norm_hash": pa.nulls(n_out, pa.string())})
        norm = norm.filter(sel)
        nh = fnv1a64(_as_array(norm))
        shard = (nh % np.uint64(n_shards)).astype(np.int64)
        return pa.table({"url": all_urls.filter(sel),
                         "ts_us": pa.array(all_ts[in_scope], pa.int64()),
                         "norm": norm,
                         "norm_hash": _hex16_str(nh),
                         "shard": pa.array(shard)})

    def label(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["norm", "ts_us", "url"], ignore_index=True)
        first = np.ones(len(g), dtype=bool)
        nv = g["norm"].to_numpy()
        first[1:] = nv[1:] != nv[:-1]
        return pd.DataFrame({"url": g["url"].to_numpy(), "keep": first,
                             "norm_hash": g["norm_hash"].to_numpy()})

    out_scope = ds.map_batches(
        lambda t: split_scope(t, False), batch_format="pyarrow")
    labeled = (ds.map_batches(lambda t: split_scope(t, True),
                              batch_format="pyarrow")
               .groupby("shard").map_groups(label, batch_format="pandas"))
    return labeled.union(out_scope)


def rule_bank_ablation(paths: str | list[str]) -> "pd.DataFrame":
    """Per-bank ABLATION counters — the complement of rule_bank_funnel's
    first-fail attribution: for every bank, how many (non-null-text)
    pages FAIL it at all, and how many fail it UNIQUELY (pass all four
    other banks) — i.e. how many docs removing that one bank would add
    back to the corpus. The unique-drop column is the number an
    operator reads when deciding whether a rule earns its false-positive
    risk; overlap-heavy banks (n_failed high, n_unique_drops low) are
    redundant with the rest of the stack.

    All five bank predicates are computed in ONE stateless vectorized
    pass (shared line split, same _BANK_KEEP cores as the flagship and
    the funnel), each batch reduces to a constant 5-row partial, and a
    5-group Sum finishes — no corpus shuffle, no driver state.

    -> DataFrame (bank_idx, bank, n_failed, n_unique_drops), one row
    per bank in the frozen FUNNEL_BANKS order (zero counts included).
    Reference analog: Home.py's per-measure outlier counts (H:444-904)
    ask "how often does each rule fire"; the ablation adds "does it
    fire ALONE"."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .relational import ensure_columns

    banks = FUNNEL_BANKS
    ds = _read_pages_text(paths)

    def partial(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        split = _line_split(text)
        nonnull = ~np.asarray(pc.is_null(text))
        fails = np.zeros((len(banks), len(text)), dtype=bool)
        for i, b in enumerate(banks):
            keep = np.asarray(_BANK_KEEP[b](t, text, None, split),
                              dtype=bool)
            fails[i] = ~keep & nonnull
        n_fail_per_doc = fails.sum(axis=0)
        unique = fails & (n_fail_per_doc == 1)
        return pa.table({
            "bank_idx": np.arange(len(banks), dtype=np.int64),
            "n_failed": fails.sum(axis=1).astype(np.int64),
            "n_unique_drops": unique.sum(axis=1).astype(np.int64),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("bank_idx")
             .aggregate(Sum("n_failed", alias_name="n_failed"),
                        Sum("n_unique_drops", alias_name="n_unique_drops")))
    df = ensure_columns(agg.to_pandas(),
                        {"bank_idx": "int64", "n_failed": "int64",
                         "n_unique_drops": "int64"})
    spine = pd.DataFrame({"bank_idx": np.arange(len(banks), dtype=np.int64),
                          "bank": list(banks)})
    out = spine.merge(df, on="bank_idx", how="left").fillna(0)
    out["n_failed"] = out["n_failed"].astype("int64")
    out["n_unique_drops"] = out["n_unique_drops"].astype("int64")
    return out[["bank_idx", "bank", "n_failed", "n_unique_drops"]]


def source_datacard(paths: str | list[str]) -> "pd.DataFrame":
    """Host-level DATACARD rollup — the one-screen per-domain corpus
    summary a data card publishes (docs, token mass, mean length,
    stopword share, symbol share): -> (host, n_pages, n_words,
    mean_words, stop_ratio, symbol_ratio). The three ratios are single
    int/int float64 divisions over exact per-host sums — bit-identical
    in the twin; a zero-word host reports NULL ratios. NULL /
    unparsable-url pages roll up under a NULL host row.

    Scale shape: the pii_density_by_host contract — the SAME RE2 count
    kernels as the Gopher bank (WORD_RE / GOPHER_STOPWORD_RE /
    SYMBOL_RE — one spec, shared constants), reduced per batch to
    host-keyed integer partials, folded on the driver via
    stream_reduce_counts (host-cardinality output). The corpus never
    shuffles.

    Reference analog: the county/district summaries (Home.py:215-270)
    — per-group means over exact sums, the host as the group."""
    import pandas as pd

    from .relational import stream_reduce_counts

    ds = ray.data.read_parquet(paths, columns=["url", "text"])

    def _count(text: pa.Array, pattern: str) -> np.ndarray:
        return np.asarray(pc.fill_null(
            pc.count_substring_regex(text, pattern), 0)).astype(np.int64)

    def partials(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        n_words = _count(text, WORD_RE)
        n_stop = _count(text, "(?i)" + GOPHER_STOPWORD_RE)
        n_sym = _count(text, SYMBOL_RE)
        host = host_of_urls(_as_array(t.column("url")))
        g = (pd.DataFrame({
                "host": host.to_numpy(zero_copy_only=False),
                "n_pages": np.ones(len(t), dtype=np.int64),
                "n_words": n_words, "n_stop": n_stop, "n_sym": n_sym})
             .groupby("host", dropna=False, sort=False).sum().reset_index())
        return pa.table({
            "host": pa.array([None if pd.isna(v) else v
                              for v in g["host"]], pa.string()),
            "n_pages": pa.array(g["n_pages"].to_numpy(), pa.int64()),
            "n_words": pa.array(g["n_words"].to_numpy(), pa.int64()),
            "n_stop": pa.array(g["n_stop"].to_numpy(), pa.int64()),
            "n_sym": pa.array(g["n_sym"].to_numpy(), pa.int64()),
        })

    out = stream_reduce_counts(
        ds.map_batches(partials, batch_format="pyarrow"),
        key_cols=["host"],
        sum_cols=["n_pages", "n_words", "n_stop", "n_sym"])
    np_pages = out["n_pages"].to_numpy().astype(np.int64)
    nw = out["n_words"].to_numpy().astype(np.int64)
    ns = out["n_stop"].to_numpy().astype(np.int64)
    ny = out["n_sym"].to_numpy().astype(np.int64)
    mean_words = nw.astype(np.float64) / np_pages.astype(np.float64)
    pos = nw > 0
    stop_ratio = np.full(len(nw), np.nan, dtype=np.float64)
    sym_ratio = np.full(len(nw), np.nan, dtype=np.float64)
    stop_ratio[pos] = ns[pos].astype(np.float64) / nw[pos].astype(np.float64)
    sym_ratio[pos] = ny[pos].astype(np.float64) / nw[pos].astype(np.float64)
    from .relational import round_half_away

    return pd.DataFrame({
        "host": out["host"],
        "n_pages": np_pages,
        "n_words": nw,
        "mean_words": round_half_away(mean_words, 4),
        "stop_ratio": round_half_away(stop_ratio, 4),
        "symbol_ratio": round_half_away(sym_ratio, 4)})


# Anchor-text decoration: the extract_links decorated-outlink view,
# extended with VARIED anchor text — the j-th appended anchor's text is
# ANCHOR_WORDS[mix64(h + j + ANCHOR_TEXT_SALT) % 16] (the href target
# stays the extract_links host pick, so the two ops describe the same
# decorated graph). Both engines construct the same bytes and genuinely
# parse them with the same two-capture RE2.
ANCHOR_TEXT_SALT = 6364136223846793005  # frozen odd 64-bit constant
ANCHOR_WORDS = ("click here", "read more", "home page", "official site",
                "details", "next", "source", "reference", "download",
                "learn more", "archive", "original", "report", "docs",
                "profile", "gallery")
ANCHOR_PAIR_RE = r'<a href="([^"]*)">([^<]*)</a>'  # the twin's form
_ANCHOR_PIECE_RE = r'^(?P<h>[^"]*)">(?P<t>[^<]*)</a>'
_HOSTNAMES = np.array([f"host{d:03d}.example"
                       for d in range(LINK_HOST_SPACE)], dtype=object)
_ANCHOR_WORDS_NP = np.array(ANCHOR_WORDS, dtype=object)


def anchor_text_corpus(paths: str | list[str],
                       n_shards: int | None = None) -> ray.data.Dataset:
    """Anchor-text CORPUS construction over the decorated-anchor view —
    the artifact retriever/query-generation training extracts from a
    crawl (anchor text is the classic external document description;
    MS-MARCO/ORCAS-class datasets are built exactly this way): parse
    every `<a href="...">text</a>` from the html bytes, resolve the
    destination host (relative hrefs -> the page's own host), and
    aggregate texts per destination. -> streaming Dataset
    (dst_host, anchor_text, n_anchors).

    Scale shape: the extract_links contract exactly — one stateless
    vectorized pass (variadic decoration join -> literal split ->
    two-capture RE2 -> dictionary-encoded per-batch pair counts; html
    never leaves the read task), then ONE bounded shuffle of
    pre-aggregated (dst, text, partial-count) rows keyed on a pair-hash
    shard; partials are (host x anchor-vocabulary)-sized, never
    corpus-sized; no driver state.

    Reference analog: the reference's pair-indicator concat + grouped
    counters (Home.py:520-521 categorical pair keys -> groupby counts);
    here the pair key is parsed out of the raw payload.
    Twin: oracles.anchor_text_corpus_sql."""
    ds = ray.data.read_parquet(paths, columns=["url", "html"])
    if n_shards is None:
        from .qc import _pages_shard_count

        n_shards = _pages_shard_count(paths, floor=8)

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"dst_host": pa.array([], pa.string()),
                          "anchor_text": pa.array([], pa.string()),
                          "w": pa.array([], pa.int64()),
                          "shard": pa.array([], pa.int64())})
        t = t.filter(pc.is_valid(t.column("html")))
        if len(t) == 0:
            return empty
        urls = _as_array(t.column("url"))
        html = pc.cast(_as_array(t.column("html")), pa.string())
        h = fnv1a64(urls)
        k = 1 + (h % np.uint64(LINK_OUT_MOD)).astype(np.int64)
        tags = []
        for j in range(LINK_OUT_MOD):
            dst_j = (_mix64(h + np.uint64(LINK_SALT + j))
                     % np.uint64(LINK_HOST_SPACE)).astype(np.int64)
            w_j = (_mix64(h + np.uint64(ANCHOR_TEXT_SALT + j))
                   % np.uint64(len(ANCHOR_WORDS))).astype(np.int64)
            tag = np.where(
                j < k,
                '<a href="https://' + _HOSTNAMES[dst_j] + f"/o/{j}" + '">'
                + _ANCHOR_WORDS_NP[w_j] + "</a>", "")
            tags.append(pa.array(tag, pa.string()))
        dec = pc.binary_join_element_wise(html, *tags, "")
        pieces = pc.list_slice(pc.split_pattern(dec, LINK_HREF_OPEN), 1)
        parents = np.asarray(pc.list_parent_indices(pieces))
        flat = pc.list_flatten(pieces)
        ext = pc.extract_regex(flat, _ANCHOR_PIECE_RE)
        href = pc.struct_field(ext, "h")
        text = pc.struct_field(ext, "t")
        src_flat = pc.take(host_of_urls(urls), pa.array(parents, pa.int64()))
        abs_host = pc.struct_field(
            pc.extract_regex(href, LINK_ABS_HOST_RE.replace(
                "([^/?#]+)", "(?P<host>[^/?#]+)")), "host")
        dst_host = pc.if_else(pc.starts_with(href, "/"), src_flat, abs_host)
        key = pc.binary_join_element_wise(dst_host, text, "\x1f")
        key = pc.drop_null(key)
        if len(key) == 0:
            return empty
        d = pc.dictionary_encode(key)
        vocab = d.dictionary
        cnt = np.bincount(np.asarray(d.indices),
                          minlength=len(vocab)).astype(np.int64)
        parts = pc.split_pattern(vocab, "\x1f")
        return pa.table({
            "dst_host": pc.list_element(parts, 0),
            "anchor_text": pc.list_element(parts, 1),
            "w": pa.array(cnt),
            "shard": pa.array((fnv1a64(vocab) % np.uint64(n_shards))
                              .astype(np.int64)),
        })

    def finish(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        s = (g.groupby(["dst_host", "anchor_text"], sort=False)["w"].sum()
             .reset_index())
        return pd.DataFrame({"dst_host": s["dst_host"],
                             "anchor_text": s["anchor_text"],
                             "n_anchors": s["w"].astype("int64")})

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("shard").map_groups(finish, batch_format="pandas"))


# URL-shape decoration (the canonical_url_dedup union-view pattern):
# the fixture's urls are uniform (`https://hostNNN.example/p/NNNNNNNN`),
# so a shape gate would be constant; pages with
# mix64(fnv(url) + URLFEAT_SALT) % URLFEAT_MOD == 0 get ONE of four
# spam-shaped decorations appended (picked by the next hash bits), and
# both engines construct and genuinely measure the same decorated url.
URLFEAT_SALT = 11400714819323198485  # frozen odd 64-bit constant
URLFEAT_MOD = 3
URLFEAT_DECOR = (
    "?utm_source=feed&utm_medium=rss&ref=123",   # tracking params
    "/buy/cheap/pills/0001/9999/77777",          # deep spam path
    "?s=9999999999999999999999999999999999999999",  # digit-stuffed query
    "/a/b/c/d/e/f/g/h",                          # pure depth
)
URLFEAT_MAX_DEPTH = 6     # path segments past the host
URLFEAT_MAX_PARAMS = 2
URLFEAT_MAX_LEN = 64
URLFEAT_DIGIT_NUM, URLFEAT_DIGIT_DEN = 1, 2  # digits/len <= 1/2


def url_features(paths: str | list[str]) -> ray.data.Dataset:
    """URL-shape quality signals over the decorated-url view — the
    published URL-level filtering axis BEYOND the blocklist
    (RefinedWeb/FineWeb drop SEO-spam urls by shape: excessive path
    depth, tracking-parameter counts, digit stuffing, absurd length):
    per page emit url_len, path_depth ('/' count minus the scheme's
    two), n_params (0 without '?', else '&' count + 1), n_digits, and
    keep = depth <= 6 AND params <= 2 AND len <= 64 AND the
    integer-cross-multiplied digit-ratio gate
    DIGIT_DEN * n_digits <= DIGIT_NUM * url_len (ratio <= 1/2; all
    four thresholds are frozen module constants the twin embeds).
    -> streaming Dataset (url, url_len, path_depth, n_params,
    n_digits, keep); ~1/3 of fixture pages draw a decoration and fail
    exactly one axis each (flag-rate lesson: a gate that never fires
    checks nothing).

    Scale shape: one stateless vectorized pass — five RE2/length
    kernels over the url column only (html is never read), no shuffle,
    no driver state; a pure map at 100 TB.

    Reference analog: the reference's per-row derived features +
    threshold flags (Home.py:138-139, 176-183) keyed on url shape.
    Twin: oracles.url_features_sql."""
    ds = ray.data.read_parquet(paths, columns=["url"])
    n_var = len(URLFEAT_DECOR)

    def stage(t: pa.Table) -> pa.Table:
        urls = _as_array(t.column("url"))
        h = _mix64(fnv1a64(urls) + np.uint64(URLFEAT_SALT))
        dec_on = (h % np.uint64(URLFEAT_MOD)) == 0
        pick = ((h // np.uint64(URLFEAT_MOD)) % np.uint64(n_var)
                ).astype(np.int64)
        suffix = np.where(
            dec_on, np.array(URLFEAT_DECOR, dtype=object)[pick], "")
        dec = pc.binary_join_element_wise(
            urls, pa.array(suffix, pa.string()), "")
        url_len = np.asarray(pc.utf8_length(dec)).astype(np.int64)
        slashes = _count_re(dec, "/").astype(np.int64)
        path_depth = slashes - 2  # 'https://' contributes two
        has_q = np.asarray(pc.match_substring(dec, "?"))
        amps = _count_re(dec, "&").astype(np.int64)
        n_params = np.where(has_q, amps + 1, 0).astype(np.int64)
        n_digits = _count_re(dec, "[0-9]").astype(np.int64)
        keep = ((path_depth <= URLFEAT_MAX_DEPTH)
                & (n_params <= URLFEAT_MAX_PARAMS)
                & (url_len <= URLFEAT_MAX_LEN)
                & (URLFEAT_DIGIT_DEN * n_digits
                   <= URLFEAT_DIGIT_NUM * url_len))
        return pa.table({
            "url": urls,
            "url_len": pa.array(url_len),
            "path_depth": pa.array(path_depth),
            "n_params": pa.array(n_params),
            "n_digits": pa.array(n_digits),
            "keep": pa.array(keep),
        })

    return ds.map_batches(stage, batch_format="pyarrow")


# Code-vs-prose decoration (the url_features union-view pattern): the
# fixture text is pure prose, so a code gate would never fire; pages
# with mix64(fnv(url) + CODE_SALT) % CODE_MOD == 0 get ONE of three
# frozen code snippets appended to the text view (picked by the next
# hash bits). Both engines construct and genuinely measure the same
# decorated text.
CODE_SALT = 14029467366897019727  # frozen odd 64-bit constant
CODE_MOD = 4
CODE_SNIPPETS = (
    "function init(x) { var y = x * 2; if (y > 10) { return y; } "
    "else { return 0; } } const z = init(7); console.log(z);",
    "def main(argv): import sys; x = int(argv[1]); return x * x\n"
    "if __name__ == '__main__': print(main(['', '3']));",
    "int sum(int n) { int s = 0; for (int i = 0; i < n; i++) "
    "{ s += i; } return s; } void run() { printf(\"%d\", sum(9)); }",
)
# '=' is deliberately NOT in the symbol class: the fixture's prose
# carries url-query '=' runs (scrub-target decorations), measured up to
# ratio 0.22 — braces/parens/semicolons separate cleanly (base max
# 0.036 vs decorated >= ~0.2 under the 1/10 gate)
CODE_SYM_RE = r"[{}();\[\]]"
CODE_KW_RE = (r"\b(def|return|import|function|var|const|void|int|"
              r"for|if|else|printf|console)\b")
CODE_SYM_NUM, CODE_SYM_DEN = 1, 10   # code iff syms/words >= 1/10 ...
CODE_MIN_KW = 2                      # ... AND >= 2 keyword hits
CODE_REP_WORDS = 32  # snippet repeats 1 + n_words//32 times (a real
#                      code page is MOSTLY code, not a 25-word tail on
#                      500 words of prose — repetition keeps the
#                      decorated ratio scale-free in page length)


def code_detect(paths: str | list[str]) -> ray.data.Dataset:
    """Code-vs-prose gate over the decorated-text view — the routing
    classifier corpus pipelines run before language-specific filtering
    (StarCoder/RedPajama-class pipelines split code from prose with
    exactly these surface signals: code-symbol density and reserved
    words): per page emit n_words (\\S+ tokens), n_code_sym
    (brace/paren/semicolon/assignment chars), n_kw (frozen reserved-
    word alternation hits), is_code = the integer cross-multiplied
    density gate CODE_SYM_DEN * n_code_sym >= CODE_SYM_NUM * n_words
    AND n_kw >= CODE_MIN_KW, keep = NOT is_code (a prose-quality
    pipeline drops code; a code pipeline flips the gate). Null text ->
    zero counts, is_code false (pii_counts convention).

    Scale shape: one stateless vectorized pass — one variadic join for
    the decoration + three RE2 count kernels, no shuffle, no driver
    state; a pure map at 100 TB.

    Reference analog: the reference's threshold rule flagger
    (Home.py:176-183) over payload-derived density features.
    Twin: oracles.code_detect_sql."""
    ds = ray.data.read_parquet(paths, columns=["url", "text"])
    n_var = len(CODE_SNIPPETS)

    def stage(t: pa.Table) -> pa.Table:
        urls = _as_array(t.column("url"))
        text = _as_array(t.column("text"))
        h = _mix64(fnv1a64(urls) + np.uint64(CODE_SALT))
        dec_on = ((h % np.uint64(CODE_MOD)) == 0) & np.asarray(
            pc.is_valid(text))
        pick = ((h // np.uint64(CODE_MOD)) % np.uint64(n_var)
                ).astype(np.int64)
        reps = 1 + _count_re(text, WORD_RE) // CODE_REP_WORDS
        one = np.array(CODE_SNIPPETS, dtype=object)[pick]
        suffix = np.where(dec_on, one * reps, "")
        dec = pc.binary_join_element_wise(
            text, pa.array(suffix, pa.string()), " ")
        n_words = _count_re(dec, WORD_RE)
        n_sym = _count_re(dec, CODE_SYM_RE)
        n_kw = _count_re(dec, CODE_KW_RE)
        is_code = ((CODE_SYM_DEN * n_sym >= CODE_SYM_NUM * n_words)
                   & (n_kw >= CODE_MIN_KW) & (n_words > 0))
        return pa.table({
            "url": urls,
            "n_words": pa.array(n_words),
            "n_code_sym": pa.array(n_sym),
            "n_kw": pa.array(n_kw),
            "is_code": pa.array(is_code),
            "keep": pa.array(~is_code),
        })

    return ds.map_batches(stage, batch_format="pyarrow")


PARTITION_SKEW_SHARDS = 16


def partition_skew_report(paths: str | list[str],
                          n_shards: int = PARTITION_SKEW_SHARDS
                          ) -> "pd.DataFrame":
    """Partition-SKEW audit for the url-hash shuffle key the flagship
    partitions by (north_star: "partitioning and skew handled
    explicitly ... keyed on url-hash") — per shard fnv1a64(url) %
    n_shards: doc count, text byte mass, and the byte SHARE (one
    int/int double division). The report an operator reads before
    sizing a repartition: a healthy hash key shows shares near
    1/n_shards; a hot shard (one giant host crawled deep) shows up
    immediately.

    Shape: one stateless streamed pass emitting <= n_shards partial
    rows per batch, finished by an n_shards-cardinality groupby — the
    corpus never shuffles, driver state is n_shards rows.

    Reference analog: none (Home.py is single-process); this audits
    the distribution property the reference never had to care about."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..functions.urls import fnv1a64

    ds = _read_pages_text(paths)

    def partial(t: pa.Table) -> pa.Table:
        urls = _as_array(t.column("url"))
        text = _as_array(t.column("text"))
        shard = (fnv1a64(urls) % np.uint64(n_shards)).astype(np.int64)
        nbytes = np.asarray(
            pc.fill_null(pc.cast(pc.binary_length(text), pa.int64()), 0))
        n = np.bincount(shard, minlength=n_shards).astype(np.int64)
        b = np.bincount(shard, weights=nbytes,
                        minlength=n_shards).astype(np.int64)
        nz = n > 0
        return pa.table({
            "shard": np.arange(n_shards, dtype=np.int64)[nz],
            "n_docs": n[nz], "n_bytes": b[nz],
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("shard")
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("n_bytes", alias_name="n_bytes")))
    from ..pipelines.relational import ensure_columns

    df = ensure_columns(agg.to_pandas(),
                        {"shard": "int64", "n_docs": "int64",
                         "n_bytes": "int64"})
    df = df.sort_values("shard", ignore_index=True)
    total = int(df["n_bytes"].sum())
    df["byte_share"] = [float(b) / total if total else 0.0
                        for b in df["n_bytes"]]
    return df


def quality_flag_cooccurrence(paths: str | list[str]) -> "pd.DataFrame":
    """Pairwise rule-bank CO-FIRE matrix — the redundancy audit next to
    rule_bank_ablation's unique-drop counts: for every unordered bank
    pair (a <= b in the frozen FUNNEL_BANKS order, diagonal = that
    bank's own fail count), how many non-null-text pages BOTH banks
    drop. Two banks with co-fire ~= their own fail counts are
    redundant; near-zero co-fire means they police different failure
    modes. Null-text pages are excluded from every count (the ablation
    convention — null text is attributed to the null_text stage before
    any bank runs).

    All five bank predicates come from the SAME shared-split pass the
    funnel/ablation use; each batch reduces to a constant 15-row
    partial (F.T @ F over the 5-column fail matrix) and a 15-group Sum
    finishes — no corpus shuffle, no driver state."""
    import pandas as pd
    from ray.data.aggregate import Sum

    n_banks = len(FUNNEL_BANKS)
    ia, ib = np.triu_indices(n_banks)
    ds = _read_pages_text(paths)

    def partial(t: pa.Table) -> pa.Table:
        text = _as_array(t.column("text"))
        ok = ~np.asarray(pc.is_null(text))
        split = _line_split(text)
        F = np.zeros((len(text), n_banks), dtype=np.int64)
        for i, b in enumerate(FUNNEL_BANKS):
            keep = np.asarray(_BANK_KEEP[b](t, text, None, split),
                              dtype=bool)
            F[:, i] = ~keep
        F[~ok, :] = 0
        m = F.T @ F
        return pa.table({
            "pair_idx": np.arange(len(ia), dtype=np.int64),
            "n_both_failed": m[ia, ib].astype(np.int64),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("pair_idx")
             .aggregate(Sum("n_both_failed", alias_name="n_both_failed")))
    from ..pipelines.relational import ensure_columns

    df = ensure_columns(agg.to_pandas(),
                        {"pair_idx": "int64", "n_both_failed": "int64"})
    got = dict(zip(df["pair_idx"], df["n_both_failed"]))
    return pd.DataFrame({
        "bank_a": [FUNNEL_BANKS[i] for i in ia],
        "bank_b": [FUNNEL_BANKS[j] for j in ib],
        "n_both_failed": np.asarray(
            [int(got.get(k, 0)) for k in range(len(ia))], dtype=np.int64),
    })


# Mojibake view: rows with fnv1a64(url) % MOJI_MOD == 0 get MOJI_SUFFIX
# appended — a suffix carrying the two classic encoding-damage signals
# (UTF-8 read as Latin-1 and re-encoded: 'A-tilde + continuation-range
# char' digraphs; and U+FFFD replacement characters from lossy
# decodes). The ASCII fixture can't exercise the kernel otherwise; the
# decoration is a pure function of the url, replicated verbatim in the
# SQL twin (the NFC-view precedent).
MOJI_MOD = 5
MOJI_SUFFIX = " caf\u00c3\u00a9 na\u00c3\u00af\u0076e \ufffd"  # 2 digraphs + 1 U+FFFD
MOJIBAKE_RE = "\u00c3[\u0080-\u00bf]"  # double-encoding signature
REPLACEMENT_CHAR = "\ufffd"


def mojibake_gate(paths: str | list[str]) -> ray.data.Dataset:
    """Encoding-damage gate over the mojibake view -> (url, n_mojibake,
    n_replacement, keep): n_mojibake counts the classic UTF-8-as-Latin-1
    double-encoding digraphs (U+00C3 followed by a U+0080-U+00BF
    continuation-range char — the 'caf\u00c3\u00a9' signature shape),
    n_replacement counts U+FFFD replacement characters (a lossy decode
    happened upstream), and keep is true iff both are zero. Real crawl
    pipelines drop or re-decode such pages before training (encoding
    damage reads as high-perplexity noise). Null text: counts 0, keep
    true (no evidence of damage — the null_text rule owns that drop).

    One stateless vectorized pass (two RE2/substring counts per batch),
    no shuffle, no driver state — a pure map at 100 TB. Engine and twin
    run the same pattern constants through two independent RE2 bindings
    (Arrow vs DuckDB), the rule-bank parity recipe."""
    ds = ray.data.read_parquet(paths, columns=["url", "text"])

    def stage(t: pa.Table) -> pa.Table:
        urls = _as_array(t.column("url"))
        text = _as_array(t.column("text"))
        h = fnv1a64(urls)
        valid = np.asarray(pc.is_valid(text))
        dec_mask = ((h % np.uint64(MOJI_MOD)) == 0) & valid
        dec = pc.if_else(pa.array(dec_mask),
                         pc.binary_join_element_wise(text, MOJI_SUFFIX, ""),
                         text)
        n_moji = np.asarray(pc.fill_null(pc.cast(
            pc.count_substring_regex(dec, MOJIBAKE_RE), pa.int64()), 0))
        n_repl = np.asarray(pc.fill_null(pc.cast(
            pc.count_substring(dec, REPLACEMENT_CHAR), pa.int64()), 0))
        return pa.table({
            "url": urls,
            "n_mojibake": n_moji,
            "n_replacement": n_repl,
            "keep": pa.array((n_moji == 0) & (n_repl == 0)),
        })

    return ds.map_batches(stage, batch_format="pyarrow")
