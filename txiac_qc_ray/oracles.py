"""SQL oracle builders for the model/hash-based operators.

The driver checks every `queries()` entry against an ANSI/DuckDB SQL
twin. For the hash- and model-based operators the twin is a genuinely
INDEPENDENT SQL re-implementation of the frozen algorithm (FNV-1a,
splitmix64, vocabulary langid scoring), not a dump of our own output:

- Jaccard family: shingle sets rebuilt from `regexp_extract_all` token
  trigram STRINGS — hash-free, so it cross-checks the whole
  shingle->hash->minhash->LSH->verify path end to end (LSH recall on
  the test corpora is exactly 1.0, asserted in pytest, so candidate
  pairs == all-pairs exact Jaccard >= tau).
- simhash / fingerprint: FNV-1a 64 and the splitmix64 finalizer
  re-expressed in HUGEINT arithmetic (xor + split 32x64 multiply mod
  2^64 — INT128 cannot hold a full 64x64 product).
- langid: the frozen per-language vocabularies (txiac_qc_ray.vocab)
  embedded as VALUES, occurrence scoring + fixed-order argmax in SQL.
- ANN LSH / IVF: the brute-force top-k SQL — valid because IVF is
  exact by construction (triangle-inequality bound pruning) and LSH
  parameters are sized for recall 1.0 on the test corpora (pytest
  asserts equality with the exact result at fixture scale).

All tokenization is `regexp_extract_all(lower(text), '[a-z]+')`,
byte-identical to functions/textstats.tokenize for the ASCII corpus.
"""

from __future__ import annotations

M64 = "18446744073709551616::HUGEINT"  # 2^64
M32 = "4294967296::HUGEINT"            # 2^32

# distinct token-trigram shingle sets per doc (string shingles — no hash)
_SHINGLES = """
    sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(generate_series(1, greatest(len(lst)-2, 0)),
                           i -> lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2])) AS s
      FROM (SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z]+') AS lst
            FROM documents)
    )
"""

_JACCARD = """round(CASE WHEN na = 0 AND nb = 0 THEN 1.0
                          WHEN na = 0 OR nb = 0 THEN 0.0
                          ELSE CAST(inter AS DOUBLE) / (na + nb - inter) END, 4)"""


def minhash_pairs_sql(threshold: float = 0.5) -> str:
    return f"""
    WITH {_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) AS na, len(b.s) AS nb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, {_JACCARD} AS jaccard
    FROM pairs WHERE {_JACCARD} >= {threshold}
    """


def ngram_jaccard_sql(threshold: float = 0.25) -> str:
    return f"""
    WITH {_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) AS na, len(b.s) AS nb
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(a.s) > 0 AND len(b.s) > 0
    )
    SELECT id_a, id_b, {_JACCARD} AS jaccard
    FROM pairs WHERE {_JACCARD} >= {threshold}
    """


def neardup_clusters_sql(threshold: float = 0.5) -> str:
    """Connected components over the exact-Jaccard pair graph via a
    recursive min-label walk (cluster_id = min doc_id of component)."""
    return f"""
    WITH RECURSIVE {_SHINGLES},
    jp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) AS na, len(b.s) AS nb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ),
    pairs AS (SELECT id_a, id_b FROM jp WHERE {_JACCARD} >= {threshold}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    walk(node, label) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
    """


# ---- 64-bit hash arithmetic in HUGEINT -----------------------------------

def fnv_expr(t: str) -> str:
    """FNV-1a 64 over the codepoints of `t` (== utf-8 bytes: ASCII corpus,
    asserted by the repo's fixtures). h*prime fits INT128 (prime ~2^40)."""
    return (f"list_reduce(list_prepend(14695981039346656037::HUGEINT, "
            f"list_transform(generate_series(1, length({t})), "
            f"i -> unicode({t}[i])::HUGEINT)), "
            f"(h, c) -> (xor(h, c) * 1099511628211::HUGEINT) % {M64})")


def mulmod(x: str, p: str) -> str:
    """(x * p) mod 2^64 in INT128: split x into 32-bit halves so no
    intermediate exceeds 2^96."""
    return (f"((({x}) % {M32}) * {p} + "
            f"(((({x}) >> 32) * {p}) % {M32}) * {M32}) % {M64}")


def _lt(lst: str, lam: str) -> str:
    return f"list_transform({lst}, x -> {lam})"


def mixed_list(hs: str, salt: int) -> str:
    """list_transform chain computing splitmix64-finalizer
    mix64((h + salt) mod 2^64) for every element of list `hs` —
    mirrors pipelines.docs._mix64 bit for bit."""
    e = _lt(hs, f"(x + {salt}::HUGEINT) % {M64}")
    e = _lt(e, "xor(x, x >> 30)")
    e = _lt(e, mulmod("x", "13787848793156543929::HUGEINT"))  # 0xBF58476D1CE4E5B9
    e = _lt(e, "xor(x, x >> 27)")
    e = _lt(e, mulmod("x", "10723151780598845931::HUGEINT"))  # 0x94D049BB133111EB
    e = _lt(e, "xor(x, x >> 31)")
    return e


def hex16(v: str) -> str:
    """16-digit lowercase hex of a HUGEINT in [0, 2^64)."""
    return (f"printf('%08x%08x', CAST(({v}) >> 32 AS BIGINT), "
            f"CAST(({v}) % {M32} AS BIGINT))")


def simhash_sql() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ),
    th AS (SELECT doc_id, {fnv_expr('tok')} AS h FROM tok),
    bits AS (
      SELECT doc_id, b.bit,
             sum(CASE WHEN (th.h >> b.bit) % 2 = 1 THEN 1 ELSE -1 END) AS acc
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b
      GROUP BY 1, 2
    ),
    sh AS (
      SELECT doc_id,
             sum(CASE WHEN acc > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS sh
      FROM bits GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce({hex16('s.sh')}, '0000000000000000') AS simhash
    FROM documents d LEFT JOIN sh s USING (doc_id)
    """


def fingerprint_sql() -> str:
    """Min-3 winnowed word-5-gram rolling-hash fingerprint: 5-gram hash =
    XOR_k mix64(tokhash[i+k] + (k+1)), hex-joined ascending."""
    gram = "xor(xor(xor(xor(m0[i], m1[i+1]), m2[i+2]), m3[i+3]), m4[i+4])"
    mixes = ", ".join(f"{mixed_list('hs', k + 1)} AS m{k}" for k in range(5))
    return f"""
    WITH hs_t AS (
      SELECT doc_id, list_transform(regexp_extract_all(lower(text), '[a-z]+'),
                                    t -> {fnv_expr('t')}) AS hs
      FROM documents
    ),
    mixed AS (SELECT doc_id, {mixes}, len(hs) AS n FROM hs_t),
    grams AS (
      SELECT doc_id,
             list_sort(list_transform(generate_series(1, greatest(n - 4, 0)),
                                      i -> {gram}))[1:3] AS mins
      FROM mixed
    )
    SELECT doc_id,
           coalesce(list_aggregate(list_transform(mins, v -> {hex16('v')}),
                                   'string_agg', '-'), '') AS fingerprint
    FROM grams
    """


def langid_sql() -> str:
    from .config import LANGID_LANGS, LANGID_MIN_SCORE, LANGID_UNKNOWN
    from .vocab import LANG_VOCABS

    vocab_rows = ", ".join(
        f"('{lang}', '{tok}')"
        for lang in LANGID_LANGS
        for tok in sorted(set(LANG_VOCABS[lang]))
    )
    ord_rows = ", ".join(f"('{lang}', {i})" for i, lang in enumerate(LANGID_LANGS))
    return f"""
    WITH vocab(lang, tok) AS (VALUES {vocab_rows}),
    lang_order(lang, ord) AS (VALUES {ord_rows}),
    tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ),
    ntok AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id, v.lang, count(*) AS hits
      FROM tok t JOIN vocab v ON t.tok = v.tok
      GROUP BY 1, 2
    ),
    scores AS (
      SELECT n.doc_id, l.lang, l.ord,
             CAST(coalesce(h.hits, 0) AS DOUBLE) / CAST(n.n AS DOUBLE) AS score
      FROM ntok n CROSS JOIN lang_order l
      LEFT JOIN hits h ON h.doc_id = n.doc_id AND h.lang = l.lang
    ),
    best AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, ord) AS rk
      FROM scores
    )
    SELECT d.doc_id,
           CASE WHEN b.score IS NULL OR b.score < {LANGID_MIN_SCORE}
                THEN '{LANGID_UNKNOWN}' ELSE b.lang END AS lang_pred
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
    """
