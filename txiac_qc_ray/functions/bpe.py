"""Frozen byte-pair-encoding subword tokenizer (VERDICT r4 missing #1).

The chunk packer and token counters previously knew only `\\S+`
whitespace words; real training pipelines pack MODEL-TOKENIZER subwords,
so chunk boundaries and token budgets differed from anything a trainer
consumes. This module supplies a deterministic, fully self-contained
BPE (Sennrich et al. 2016, public knowledge): merges trained once from
the repo's own deterministic pages fixture (scripts/freeze_bpe.py — no
downloads) and frozen into data/bpe_merges.py.

Tokenizer SPEC (one spec, three implementations that must agree —
vectorized engine here, per-word reference below, nested-REPLACE SQL
twin in oracles.py):

  - pre-tokens are maximal [a-z]+ runs of the lowercased text (the
    repo-wide word definition, functions.textstats._NONWORD_SPLIT);
  - each pre-token starts as its character sequence;
  - merges apply IN RANK ORDER, one pass each, replacing leftmost
    non-overlapping adjacent (x, y) pairs with xy — within pre-token
    boundaries only. Rank-order single-pass equals the classic
    lowest-rank-first loop because every merge's parts are chars or
    OUTPUTS OF EARLIER merges (guaranteed by greedy training), so a
    later merge can never create an earlier merge's input pair;
  - a document's subword count is the sum over its pre-tokens.

The engine path is vectorized end to end: per batch, only the
DICTIONARY of unique words (textstats.tokenize computes it anyway) is
encoded — one int32 symbol stream with word-boundary guards, ~6 numpy
kernel ops per merge — and per-document counts gather back through the
dictionary ids.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

from . import textstats as ts
from ..data.bpe_merges import MERGES

N_MERGES = 128
_WORD_RE = re.compile(r"[a-z]+")


# ---- training (single-process, deterministic; scripts/freeze_bpe.py) -----

def train_bpe(texts, n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    """Greedy BPE training over [a-z]+ words of the lowercased texts.
    Deterministic: best pair = max total count, ties broken by
    lexicographically smallest (x, y). Returns merges in rank order."""
    words: Counter[str] = Counter()
    for t in texts:
        if t:
            words.update(_WORD_RE.findall(t.lower()))
    seqs = {w: tuple(w) for w in words}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, seq in seqs.items():
            f = words[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        seqs = {w: tuple(_merge_once(seq, best)) for w, seq in seqs.items()}
    return merges


def _merge_once(seq, pair):
    """One rank's application to a symbol sequence: leftmost
    non-overlapping (x, y) -> xy."""
    x, y = pair
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == x and seq[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def bpe_apply_reference(word: str, merges) -> list[str]:
    """Per-word reference implementation of the SPEC (test oracle for
    the vectorized engine; also what the SQL twin's nested REPLACEs
    compute)."""
    seq = list(word)
    for pair in merges:
        seq = _merge_once(seq, pair)
    return seq


# ---- frozen merges --------------------------------------------------------

def frozen_merges() -> tuple[tuple[str, str], ...]:
    # module-level binding (worker-side callers; driver-contract safety)
    return MERGES


# ---- vectorized engine ----------------------------------------------------

def _merge_symbol_ids(merges) -> list[tuple[int, int, int]]:
    """(x_id, y_id, z_id) per merge over the symbol table: chars a-z are
    ids 0-25, merge k's output is id 26+k. Every merge part must be a
    char or an earlier merge's output (greedy-training invariant)."""
    table = {chr(ord("a") + i): i for i in range(26)}
    out = []
    for k, (x, y) in enumerate(merges):
        z = 26 + k
        out.append((table[x], table[y], z))
        table[x + y] = z
    return out


def _apply_merges_stream(sym: np.ndarray, word_of: np.ndarray,
                         merge_ids) -> tuple[np.ndarray, np.ndarray]:
    """Apply every merge in rank order to a word-boundary-guarded symbol
    stream. Leftmost non-overlapping: for x == y (the only case where
    adjacent matches overlap) keep even offsets within each consecutive
    match run."""
    for x, y, z in merge_ids:
        if len(sym) < 2:
            break
        m = (sym[:-1] == x) & (sym[1:] == y) & (word_of[:-1] == word_of[1:])
        if x == y and m.any():
            idx = np.nonzero(m)[0]
            run_head = np.ones(len(idx), dtype=bool)
            run_head[1:] = idx[1:] != idx[:-1] + 1
            head_pos = idx[run_head][np.cumsum(run_head) - 1]
            drop = ((idx - head_pos) & 1).astype(bool)
            m[idx[drop]] = False
        if not m.any():
            continue
        first = np.concatenate([m, [False]])
        sym = np.where(first, z, sym)
        keep = ~np.concatenate([[False], m])
        sym, word_of = sym[keep], word_of[keep]
    return sym, word_of


def bpe_subword_counts(texts: pa.Array, merges=None) -> np.ndarray:
    """Per-document subword count under the frozen merges — int64,
    0 for null/wordless docs. Vectorized: symbols stream only for the
    batch's UNIQUE words; documents gather counts through tokenize()'s
    dictionary ids."""
    merges = frozen_merges() if merges is None else merges
    tv = ts.tokenize(texts)
    n_docs = len(tv.offsets) - 1
    if tv.dictionary is None or len(tv.dictionary) == 0:
        return np.zeros(n_docs, dtype=np.int64)
    import pyarrow.compute as pc

    words = tv.dictionary
    # dictionary-sized (the batch's UNIQUE words), not corpus-sized —
    # the one place a Python join is house-acceptable (vocab-op rule)
    joined = "".join(words.to_pylist())
    lens = np.asarray(pc.utf8_length(words)).astype(np.int64)
    sym = (np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
           .astype(np.int32) - ord("a"))
    word_of = np.repeat(np.arange(len(lens), dtype=np.int32), lens)
    _, word_of = _apply_merges_stream(sym, word_of, _merge_symbol_ids(merges))
    per_word = np.bincount(word_of, minlength=len(lens)).astype(np.int64)
    per_token = per_word[tv.ids]
    # exact in float64 (counts << 2^53), matching seg_sum's
    # parallelism-invariance contract
    return ts.seg_sum(per_token.astype(np.float64), tv.offsets).astype(np.int64)


# ---- SQL twin builder ------------------------------------------------------

def bpe_ntok_ctes(source: str = "documents", out_cte: str = "bpe_ntok",
                  merges=None, per_level: int = 16) -> str:
    """CTE-chain fragment computing the SAME per-document subword count
    in DuckDB — append after 'WITH ' (or another CTE list); ends in
    `out_cte` with columns (doc_id, n_tokens).

    Encoding: every symbol is written FULLY DELIMITED as '(sym)' —
    adjacent symbols share no characters, so one boundary-safe
    REPLACE('(x)(y)' -> '(xy)') per merge (SQL REPLACE is leftmost
    non-overlapping) chain-merges runs exactly like the SPEC's
    leftmost-greedy pass. A shared-space encoding would stop after the
    first merge of an (x, x, x, x) run because consecutive matches
    would share their boundary space. Words are separated by a
    '(\\x1f)' guard symbol; the final count is '(' occurrences minus
    the guards. The merges apply in rank order STAGED ~16 per CTE
    level: DuckDB's binder caps expression depth at 128, so one
    128-deep nested replace tree cannot bind."""
    merges = frozen_merges() if merges is None else merges
    n_words = "len(regexp_extract_all(lower(text), '[a-z]+'))"
    seq0 = ("'(' || array_to_string("
            "[array_to_string(string_split(t, ''), ')(') "
            "for t in regexp_extract_all(lower(text), '[a-z]+')],"
            " ')(\x1f)(') || ')'")
    ctes = [f"bpe0 AS (SELECT doc_id, coalesce({n_words}, 0) AS n_words, "
            f"{seq0} AS seq FROM {source})"]
    level = 0
    for i in range(0, len(merges), per_level):
        expr = "seq"
        for x, y in merges[i:i + per_level]:
            expr = f"replace({expr}, '({x})({y})', '({x}{y})')"
        level += 1
        ctes.append(f"bpe{level} AS (SELECT doc_id, n_words, {expr} AS seq "
                    f"FROM bpe{level - 1})")
    ctes.append(f"{out_cte} AS (SELECT doc_id, CASE WHEN n_words = 0 THEN 0 "
                "ELSE len(string_split(seq, '(')) - 1 - (n_words - 1) END "
                f"AS n_tokens FROM bpe{level})")
    return ",\n    ".join(ctes)
