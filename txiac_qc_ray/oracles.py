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


def ngram_jaccard_sql(threshold: float = 0.25, df_cap: int = 64) -> str:
    """Mirrors the Ray side's document-frequency cap: shingles present
    in more than df_cap docs of a source group are dropped from both
    intersection and union before Jaccard."""
    return f"""
    WITH {_SHINGLES},
    ex AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
    df AS (SELECT source, g FROM ex GROUP BY source, g
           HAVING count(*) <= {df_cap}),
    kept AS (SELECT e.doc_id, e.source, e.g
             FROM ex e JOIN df USING (source, g)),
    sets AS (SELECT doc_id, source, list(g) AS s
             FROM kept GROUP BY doc_id, source),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) AS na, len(b.s) AS nb
      FROM sets a JOIN sets b ON a.source = b.source AND a.doc_id < b.doc_id
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


def neardup_keep_best_sql(threshold: float = 0.5) -> str:
    """Representative-selection twin: the cluster walk from
    neardup_clusters_sql, then per-cluster argmax by
    (n_chars DESC, doc_id ASC) via row_number."""
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
    ),
    cl AS (SELECT node AS doc_id, min(label) AS cluster_id
           FROM walk GROUP BY node),
    j AS (SELECT cl.cluster_id, d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
          FROM cl JOIN documents d USING (doc_id)),
    r AS (SELECT cluster_id, doc_id, n_chars,
                 row_number() OVER (PARTITION BY cluster_id
                                    ORDER BY n_chars DESC, doc_id ASC) AS rk,
                 count(*) OVER (PARTITION BY cluster_id) AS sz
          FROM j)
    SELECT cluster_id, doc_id AS best_doc_id,
           CAST(sz AS BIGINT) AS cluster_size, n_chars AS best_n_chars
    FROM r WHERE rk = 1
    """


def _prep_surv_ctes(jaccard_threshold: float, eval_mod: int,
                    min_overlap: int, min_tokens: int,
                    max_mean_tok_len: float) -> str:
    """The corpus-prep CTE block ending in `surv` (the surviving docs) —
    shared by prep_corpus_sql and prep_to_chunks_sql. Callers prepend
    'WITH RECURSIVE ' and select from surv."""
    return f"""{_SHINGLES},
    winners AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
    jp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) AS na, len(b.s) AS nb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ),
    pairs AS (SELECT id_a, id_b FROM jp WHERE {_JACCARD} >= {jaccard_threshold}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    walk(node, label) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
    ),
    cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node),
    losers AS (SELECT doc_id FROM cc WHERE doc_id != cluster_id),
    evs AS (SELECT DISTINCT e.sv FROM
            (SELECT unnest(s) AS sv FROM sh WHERE doc_id % {eval_mod} = 0) e),
    tr AS (SELECT doc_id, unnest(s) AS sv FROM sh WHERE doc_id % {eval_mod} != 0),
    cont AS (SELECT tr.doc_id FROM tr JOIN evs USING (sv)
             GROUP BY 1 HAVING count(*) >= {min_overlap}),
    gated AS (
      SELECT doc_id, lang, source, n_chars,
             len(regexp_extract_all(text, '\\S+')) AS n_tokens,
             CASE WHEN len(regexp_extract_all(text, '\\S+')) = 0 THEN NULL
                  ELSE CAST(length(replace(text, ' ', '')) AS DOUBLE)
                       / len(regexp_extract_all(text, '\\S+')) END AS mean_len
      FROM documents),
    surv AS (
      SELECT doc_id, lang, source, n_chars, n_tokens
      FROM gated
      WHERE doc_id IN (SELECT doc_id FROM winners)
        AND doc_id NOT IN (SELECT doc_id FROM losers)
        AND doc_id NOT IN (SELECT doc_id FROM cont)
        AND doc_id % {eval_mod} != 0
        AND n_tokens >= {min_tokens}
        AND mean_len <= {max_mean_tok_len})"""


def prep_corpus_sql(jaccard_threshold: float = 0.5, eval_mod: int = 50,
                    min_overlap: int = 5, min_tokens: int = 10,
                    max_mean_tok_len: float = 12.0) -> str:
    """Composite corpus-prep twin: the exact-dedup, near-dup-cluster,
    decontamination and quality-gate CTEs composed into one statement —
    value-checks the whole chain end to end."""
    ctes = _prep_surv_ctes(jaccard_threshold, eval_mod, min_overlap,
                           min_tokens, max_mean_tok_len)
    return f"""
    WITH RECURSIVE {ctes}
    SELECT doc_id, lang, source, n_chars, n_tokens FROM surv
    """


def _chunk_explode_sql(source: str, C: int) -> str:
    """The concat-and-chunk explode (window cumsum over doc_id order +
    generate_series span split) over `source` rows (doc_id, n_tokens) —
    appended after a WITH block; shared by chunk_for_training_sql and
    prep_to_chunks_sql so the span math can never drift between them."""
    return f""",
    c AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS nt,
             CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) AS off
      FROM {source}),
    u AS (
      SELECT doc_id, off, nt,
             unnest(generate_series(off // {C},
                                    (off + nt - 1) // {C})) AS chunk_id
      FROM c WHERE nt > 0)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(GREATEST(chunk_id * {C} - off, 0) AS BIGINT) AS tok_start,
           CAST(LEAST((chunk_id + 1) * {C} - off, nt) AS BIGINT) AS tok_end
    FROM u
    """


def chunk_for_training_sql(context_len: int = 512) -> str:
    """Whole-corpus concat-and-chunk twin (token_counts' \\S+ tokens)."""
    return f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                 AS n_tokens
      FROM documents){_chunk_explode_sql("t", int(context_len))}"""


def token_counts_bpe_sql() -> str:
    """Frozen-BPE subword-count twin: the SAME merge table applied as
    staged nested REPLACEs over a fully-delimited '(sym)' sequence
    (functions.bpe.bpe_ntok_ctes documents the encoding and why the
    stages exist — DuckDB's binder caps expression depth at 128)."""
    from .functions.bpe import bpe_ntok_ctes

    return ("WITH " + bpe_ntok_ctes()
            + "\nSELECT doc_id, CAST(n_tokens AS BIGINT) AS n_subwords"
              " FROM bpe_ntok")


def chunk_for_training_bpe_sql(context_len: int = 256) -> str:
    """Concat-and-chunk twin over the frozen-BPE subword stream: the
    bpe CTE chain feeds the shared window-cumsum chunk explode."""
    from .functions.bpe import bpe_ntok_ctes

    return ("WITH " + bpe_ntok_ctes()
            + _chunk_explode_sql("bpe_ntok", int(context_len)))


def prep_to_chunks_sql(context_len: int = 256,
                       jaccard_threshold: float = 0.5, eval_mod: int = 50,
                       min_overlap: int = 5, min_tokens: int = 10,
                       max_mean_tok_len: float = 12.0) -> str:
    """End-to-end training-export twin: the prep CTEs composed with the
    shared chunk explode over the survivors' global token stream
    (doc_id order)."""
    ctes = _prep_surv_ctes(jaccard_threshold, eval_mod, min_overlap,
                           min_tokens, max_mean_tok_len)
    return (f"""
    WITH RECURSIVE {ctes}"""
            + _chunk_explode_sql("surv", int(context_len)))


def decontaminate_sql(eval_mod: int = 50, min_overlap: int = 5) -> str:
    """Decontamination twin: distinct-trigram overlap of each non-eval
    doc against the union of eval-doc trigrams (string shingles — checks
    the hash path end to end)."""
    return f"""
    WITH {_SHINGLES},
    evs AS (SELECT DISTINCT e.sv FROM
            (SELECT unnest(s) AS sv FROM sh WHERE doc_id % {eval_mod} = 0) e),
    tr AS (SELECT doc_id, unnest(s) AS sv FROM sh WHERE doc_id % {eval_mod} != 0),
    ov AS (SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
           FROM tr JOIN evs USING (sv) GROUP BY 1)
    SELECT d.doc_id, coalesce(o.n_overlap, 0::BIGINT) AS n_overlap,
           coalesce(o.n_overlap, 0) >= {min_overlap} AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % {eval_mod} != 0) d
    LEFT JOIN ov o USING (doc_id)
    """


def vocab_topk_sql(k: int = 20) -> str:
    return f"""
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
          FROM documents)
    GROUP BY tok ORDER BY cnt DESC, tok LIMIT {k}
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


def _embed_ctes() -> str:
    """CTE block ending in `emb` (doc_id, e0..e15): the hashing/random-
    projection embedder re-expressed in HUGEINT SQL — FNV-1a of each
    [a-z]+ token, splitmix64 finalizer, per-dimension Rademacher sign
    from bit j, integer sums (exact in both engines). Token-less docs
    LEFT-JOIN back as the zero vector, matching the engine."""
    from .pipelines.docs import _EMBED_DIM

    sums = ", ".join(
        f"CAST(sum(CASE WHEN ((m >> {j}) & 1) = 1 THEN 1 ELSE -1 END) "
        f"AS BIGINT) AS e{j}" for j in range(_EMBED_DIM))
    zeros = ", ".join(f"coalesce(e{j}, 0) AS e{j}" for j in range(_EMBED_DIM))
    return f"""toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents),
    fh AS (SELECT doc_id, {fnv_expr('tok')} AS f FROM toks),
    mh AS (SELECT doc_id, {mix64_scalar('f')} AS m FROM fh),
    eagg AS (SELECT doc_id, {sums} FROM mh GROUP BY doc_id),
    emb AS (SELECT d.doc_id, {zeros}
            FROM documents d LEFT JOIN eagg USING (doc_id))"""


def embed_docs_sql() -> str:
    """Text->embedding twin: (doc_id, e0..e15)."""
    return f"WITH {_embed_ctes()}\n    SELECT * FROM emb"


def ann_topk_from_text_sql(k: int = 5, query_mod: int = 50) -> str:
    """End-to-end text -> embedding -> cosine top-k twin. Similarity is
    dot / sqrt(na*nb) over the int embeddings — integer dot/norms exact,
    sqrt and the division correctly rounded, so both engines produce
    bit-identical sims; rank on the UNROUNDED sim (ties -> nid asc),
    4dp half-away rounding only in the output (ann_topk_bruteforce
    precedent)."""
    from .pipelines.docs import _EMBED_DIM

    dot = " + ".join(f"q.e{j} * c.e{j}" for j in range(_EMBED_DIM))
    n2 = " + ".join(f"e{j} * e{j}" for j in range(_EMBED_DIM))
    sim = f"CAST({dot} AS DOUBLE) / sqrt(CAST(q.n2 * c.n2 AS DOUBLE))"
    return f"""
    WITH {_embed_ctes()},
    n AS (SELECT *, ({n2}) AS n2 FROM emb),
    q AS (SELECT * FROM n WHERE doc_id % {query_mod} = 0 AND n2 > 0),
    c AS (SELECT * FROM n WHERE doc_id % {query_mod} != 0 AND n2 > 0)
    SELECT qid, nid, sim FROM (
      SELECT q.doc_id AS qid, c.doc_id AS nid,
             round({sim}, 4) AS sim,
             row_number() OVER (PARTITION BY q.doc_id
                                ORDER BY {sim} DESC, c.doc_id) AS rk
      FROM q CROSS JOIN c) WHERE rk <= {k}
    """


def mix64_scalar(x: str) -> str:
    """splitmix64 finalizer of a scalar HUGEINT expression in [0, 2^64)
    (textual expansion — each xor step duplicates the operand text)."""
    e = f"xor(({x}), ({x}) >> 30)"
    e = f"({mulmod(e, '13787848793156543929::HUGEINT')})"
    e = f"xor({e}, {e} >> 27)"
    e = f"({mulmod(e, '10723151780598845931::HUGEINT')})"
    e = f"xor({e}, {e} >> 31)"
    return e


def deterministic_shuffle_sql() -> str:
    """Shuffle twin: the same splitmix64 order recomputed in SQL; the
    rank column encodes the permutation so the (order-insensitive)
    value compare still verifies it."""
    mix = mix64_scalar("CAST(doc_id AS HUGEINT)")
    return f"""
    SELECT CAST(row_number() OVER (ORDER BY {mix}, doc_id) - 1 AS BIGINT) AS rank,
           doc_id, lang
    FROM documents
    """


def dedup_index_first_seen_sql() -> str:
    """First-seen twin: partition by the SAME FNV-1a 64 content hash the
    actor index keys on (not by text), so even a hash collision cannot
    split the two engines."""
    return f"""
    SELECT doc_id,
           doc_id = min(doc_id) OVER (PARTITION BY {fnv_expr('text')})
               AS first_seen
    FROM documents
    """


def tfidf_top_terms_sql(top_k: int = 3) -> str:
    """Keyword-extraction twin: tf/df score (one correctly-rounded
    double division on both engines — ln() would not be bit-stable
    across libms), term-asc tie-break."""
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
    SELECT doc_id, tok AS term, score FROM (
      SELECT tf.doc_id, tf.tok,
             CAST(tf.tf AS DOUBLE) / df.df AS score,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC,
                                         tf.tok) AS rk
      FROM tf JOIN df USING (tok))
    WHERE rk <= {top_k}
    """


def cap_per_host_sql(k: int = 5) -> str:
    """Per-host cap twin: the same splitmix64 hash order in SQL."""
    mix = mix64_scalar("CAST(doc_id AS HUGEINT)")
    return f"""
    SELECT doc_id, source, lang, n_chars FROM (
      SELECT doc_id, source, lang, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY {mix}, doc_id) AS rk
      FROM documents) WHERE rk <= {k}
    """


def host_reputation_filter_sql(min_avg_chars: float = 300.0) -> str:
    """Host-reputation gate twin: the same exact-int mean (SUM/COUNT as
    one correctly-rounded double division) computed per source with a
    window, threshold compare on the UNROUNDED double — bit-identical to
    the engine's float(int)/float(int)."""
    return f"""
    WITH h AS (
      SELECT doc_id, source, lang, n_chars,
             CAST(sum(n_chars) OVER (PARTITION BY source) AS DOUBLE)
               / count(*) OVER (PARTITION BY source) AS host_avg
      FROM documents)
    SELECT doc_id, source, lang, n_chars,
           round(host_avg, 4) AS host_avg_chars
    FROM h WHERE host_avg >= {min_avg_chars}
    """


def language_balanced_sample_sql(per_lang_target: int = 60) -> str:
    """Language-balanced sampling twin: the same splitmix64 uniform and
    the same single target/count double division (LEAST against 1.0),
    so u < rate is the identical bit-exact comparison."""
    mix = mix64_scalar("CAST(doc_id AS HUGEINT)")
    return f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars,
             CAST({mix} AS DOUBLE) / 18446744073709551616.0 AS u,
             LEAST(CAST({per_lang_target} AS DOUBLE)
                     / count(*) OVER (PARTITION BY lang), 1.0) AS rate
      FROM documents)
    SELECT doc_id, lang, n_chars, rate FROM d WHERE u < rate
    """


def token_balanced_mixture_sql() -> str:
    """Token-budget mixture twin: the same integer threshold
    t_s = (B*total*2^64 - 1) // (D*n*T_s) in HUGEINT and the same
    mix64(doc_id) <= t_s compare — no float anywhere, so the two
    engines agree bit for bit by construction. NULL source joins via
    IS NOT DISTINCT FROM (USING would drop the null group)."""
    from .pipelines.docs import MIXTURE_BUDGET_DEN, MIXTURE_BUDGET_NUM

    mix = mix64_scalar("CAST(doc_id AS HUGEINT)")
    return f"""
    WITH tk AS (
      SELECT doc_id, source,
             CAST(coalesce(len(regexp_extract_all(text, '\\S+')), 0)
                  AS BIGINT) AS n_tokens
      FROM documents),
    tot AS (SELECT source, CAST(sum(n_tokens) AS HUGEINT) AS src_tok
            FROM tk GROUP BY source),
    g AS (SELECT CAST(sum(src_tok) AS HUGEINT) AS all_tok,
                 CAST(count(*) AS HUGEINT) AS n_src FROM tot),
    thr AS (SELECT source,
                   CASE WHEN src_tok = 0
                        THEN 18446744073709551615::HUGEINT
                        ELSE LEAST(
                          ({MIXTURE_BUDGET_NUM}::HUGEINT * all_tok
                             * 18446744073709551616::HUGEINT - 1)
                            // ({MIXTURE_BUDGET_DEN}::HUGEINT * n_src
                                * src_tok),
                          18446744073709551615::HUGEINT) END AS t
            FROM tot CROSS JOIN g)
    SELECT doc_id, tk.source AS source, n_tokens
    FROM tk JOIN thr ON tk.source IS NOT DISTINCT FROM thr.source
    WHERE {mix} <= thr.t
    """


def temperature_sample_sql(target_docs: int | None = None) -> str:
    """Language-temperature sampling twin (alpha = 1/2): the same exact
    integer weights w_l = isqrt(n_l) — floor(sqrt(double)) plus a +/-1
    Newton correction makes the SQL isqrt exact for any n < 2^52 — and
    the same HUGEINT threshold t_l = (target*w*2^64 - 1) // (sum_w*n)
    with the same mix64(doc_id) <= t_l compare. No float enters the
    keep rule on either side. NULL lang joins via IS NOT DISTINCT FROM
    (its own group, engine semantics)."""
    from .pipelines.docs import TEMP_SAMPLE_TARGET

    target = TEMP_SAMPLE_TARGET if target_docs is None else int(target_docs)
    mix = mix64_scalar("CAST(doc_id AS HUGEINT)")
    return f"""
    WITH cnt AS (
      SELECT lang, CAST(count(*) AS HUGEINT) AS n
      FROM documents GROUP BY lang),
    w AS (
      SELECT lang, n,
             CASE WHEN (f + 1) * (f + 1) <= n THEN f + 1
                  WHEN f * f > n THEN f - 1
                  ELSE f END AS w
      FROM (SELECT lang, n,
                   CAST(floor(sqrt(CAST(n AS DOUBLE))) AS HUGEINT) AS f
            FROM cnt)),
    g AS (SELECT CAST(sum(w) AS HUGEINT) AS sw FROM w),
    thr AS (
      SELECT lang,
             LEAST(({target}::HUGEINT * w
                      * 18446744073709551616::HUGEINT - 1) // (sw * n),
                   18446744073709551615::HUGEINT) AS t
      FROM w CROSS JOIN g)
    SELECT doc_id, d.lang AS lang, n_chars
    FROM documents d JOIN thr ON d.lang IS NOT DISTINCT FROM thr.lang
    WHERE {mix} <= thr.t
    """


def passage_chunks_sql(passage_len: int | None = None,
                       stride: int | None = None) -> str:
    """Sliding-passage twin: 3-arg generate_series starts + DuckDB's
    1-based INCLUSIVE list slice + array_to_string over the same [a-z]+
    token list (so the joined passage text matches the engine's
    binary_join byte for byte on the ASCII corpus). Null/empty/
    no-token docs drop via the len(ts) > 0 guard (len(NULL) is NULL ->
    false, same as the engine's zero-token skip)."""
    from .pipelines.docs import PASSAGE_LEN, PASSAGE_STRIDE

    P = PASSAGE_LEN if passage_len is None else int(passage_len)
    S = PASSAGE_STRIDE if stride is None else int(stride)
    return f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts
      FROM documents),
    p AS (
      SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n,
             unnest(generate_series(0::BIGINT,
                                    CAST(len(ts) AS BIGINT) - 1,
                                    {S}::BIGINT)) AS s
      FROM tk WHERE len(ts) > 0)
    SELECT doc_id,
           CAST(s // {S} AS BIGINT) AS passage_id,
           CAST(s AS BIGINT) AS tok_start,
           CAST(LEAST(s + {P}, n) AS BIGINT) AS tok_end,
           array_to_string(ts[s + 1 : CAST(LEAST(s + {P}, n) AS BIGINT)],
                           ' ') AS passage
    FROM p
    """


def topic_classify_sql() -> str:
    """Topic-classifier twin generated from the SAME frozen lexicons
    (one spec, two engines): per-topic scores via list_filter counts
    over the same [a-z]+ token list, argmax via a CASE chain evaluated
    in sorted topic-name order (== the engine's first-max tie-break).
    Null text: list ops go NULL -> coalesce to 0 -> ('none', 0), the
    engine's zero-token result."""
    from .pipelines.docs import TOPIC_LEXICONS

    names = sorted(TOPIC_LEXICONS)
    score_cols = []
    for n in names:
        words = ", ".join(f"'{w}'" for w in sorted(TOPIC_LEXICONS[n]))
        score_cols.append(
            f"coalesce(len(list_filter(ts, t -> t IN ({words}))), 0)"
            f" AS s_{n}")
    greatest = "GREATEST(" + ", ".join(f"s_{n}" for n in names) + ")"
    whens = []
    for i, n in enumerate(names):
        rest = [f"s_{n} >= s_{m}" for m in names[i + 1:]]
        cond = " AND ".join(rest) if rest else "TRUE"
        whens.append(f"WHEN {cond} THEN '{n}'")
    case = (f"CASE WHEN {greatest} = 0 THEN 'none' "
            + " ".join(whens) + " END")
    return f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts
      FROM documents),
    s AS (SELECT doc_id, {", ".join(score_cols)} FROM tk)
    SELECT doc_id, {case} AS topic,
           CAST({greatest} AS BIGINT) AS score
    FROM s
    """


def bm25_search_sql(k: int | None = None) -> str:
    """BM25 top-k twin generated from the SAME frozen query set: the
    rational-idf variant (one double division of exact ints — no ln, so
    both engines agree bit for bit), the classic tf normalization with
    k1/b derived from the same small-int ratios (6::DOUBLE/5 == np 6/5),
    and per-query contributions summed LEFT-ASSOCIATIVELY in sorted term
    order (SQL + parses left-assoc — the engine adds in the same
    order). Null text: len/list ops go NULL -> coalesce to 0 tokens,
    score 0, same as the engine."""
    from .pipelines.docs import BM25_QUERIES, BM25_TOPK

    kk = BM25_TOPK if k is None else int(k)
    terms = sorted({t for q in BM25_QUERIES.values() for t in q})
    dfv = ", ".join(
        f"CAST(count(*) FILTER (WHERE list_contains(ts, '{t}')) AS BIGINT)"
        f" AS df_{t}" for t in terms)
    arms = []
    for qid in sorted(BM25_QUERIES):
        contribs = []
        for t in sorted(BM25_QUERIES[qid]):
            idf = (f"(CAST(2 * n_docs - 2 * df_{t} + 1 AS DOUBLE)"
                   f" / CAST(2 * df_{t} + 1 AS DOUBLE))")
            tf = (f"CAST(coalesce(len(list_filter(ts, x -> x = '{t}')), 0)"
                  f" AS DOUBLE)")
            contribs.append(
                f"{idf} * (({tf} * (CAST(11 AS DOUBLE) / 5))"
                f" / ({tf} + (CAST(6 AS DOUBLE) / 5)"
                f" * (0.25 + 0.75 * r)))")
        arms.append(f"SELECT {qid} AS query_id, doc_id, "
                    + " + ".join(contribs)
                    + " AS score FROM st CROSS JOIN g CROSS JOIN dfv")
    union = "\n      UNION ALL ".join(arms)
    return f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts
      FROM documents),
    st0 AS (SELECT doc_id, ts,
                   CAST(coalesce(len(ts), 0) AS BIGINT) AS dl FROM tk),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(coalesce(sum(dl), 0) AS BIGINT) AS total_tok
          FROM st0),
    dfv AS (SELECT {dfv} FROM st0),
    st AS (SELECT doc_id, ts,
                  CAST(dl * (SELECT n_docs FROM g) AS DOUBLE)
                    / CAST((SELECT total_tok FROM g) AS DOUBLE) AS r
           FROM st0),
    scored AS ({union})
    SELECT query_id, doc_id, round(score, 4) AS score,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id) AS rk
          FROM scored)
    WHERE rk <= {kk}
    """


def assign_output_shards_sql(shard_bytes: int | None = None) -> str:
    """Byte-balanced shard-assignment twin: exclusive window cumsum of
    strlen BYTES (DuckDB strlen is bytes, length is chars — the house
    extraction_yield note) in doc_id order, floor-divided by the shard
    size. Null text -> 0 bytes via coalesce, same as the engine."""
    from .pipelines.docs import OUTPUT_SHARD_BYTES

    S = OUTPUT_SHARD_BYTES if shard_bytes is None else int(shard_bytes)
    return f"""
    WITH b AS (
      SELECT doc_id,
             CAST(coalesce(strlen(text), 0) AS BIGINT) AS n_bytes
      FROM documents)
    SELECT doc_id, n_bytes,
           CAST(coalesce(sum(n_bytes) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) // {S} AS BIGINT) AS shard_id
    FROM b
    """


def doremi_source_weights_sql() -> str:
    """DoReMi source-weight twin: the same frozen micro-nat cost table
    as VALUES, per-source HUGEINT totals, the integer sign test
    cost_s*tok_g > cost_g*tok_s, and one HUGEINT->DOUBLE division for
    the magnitude (the grouped_variance correctly-rounded-cast
    precedent). Docs with no tokens contribute 0 via the LEFT JOIN
    coalesce."""
    from .stages.perplexity import quantized_cost_table

    vocab, costs, oov = quantized_cost_table()
    cost_rows = ", ".join(
        f"('{t}', {c})" for t, c in zip(vocab.to_pylist(), costs.tolist()))
    return f"""
    WITH cost(tok, c) AS (VALUES {cost_rows}),
    ctok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents),
    dcost AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             CAST(sum(coalesce(c.c, {oov})) AS BIGINT) AS total_cost
      FROM ctok t LEFT JOIN cost c USING (tok) GROUP BY t.doc_id),
    per AS (
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(dc.n_tok), 0) AS HUGEINT) AS tok_s,
             CAST(coalesce(sum(dc.total_cost), 0) AS HUGEINT) AS cost_s
      FROM documents d LEFT JOIN dcost dc USING (doc_id)
      GROUP BY d.source),
    g AS (SELECT CAST(coalesce(sum(tok_s), 0) AS HUGEINT) AS tok_g,
                 CAST(coalesce(sum(cost_s), 0) AS HUGEINT) AS cost_g
          FROM per)
    SELECT source, n_docs,
           CAST(tok_s AS BIGINT) AS n_tokens,
           CAST(cost_s AS BIGINT) AS total_cost,
           round(CASE WHEN tok_s = 0 OR cost_s * tok_g <= cost_g * tok_s
                      THEN 0.0
                      ELSE CAST(cost_s * tok_g - cost_g * tok_s AS DOUBLE)
                             / CAST(tok_s * tok_g AS DOUBLE) END,
                 4) AS excess_w
    FROM per CROSS JOIN g
    """


def rule_bank_ablation_sql(pages_glob: str) -> str:
    """Ablation twin: the five bank keeps come from THEIR OWN oracle
    builders nested as subqueries (the rule_bank_funnel_sql pattern —
    the twins can never drift), null-text pages are excluded from
    every count, and per bank the twin counts fails and UNIQUE fails
    (fails with the other four passing) over a VALUES spine so zero
    rows survive."""
    from .pipelines import webtext as w

    spine = ", ".join(
        f"({i}, '{b}')" for i, b in enumerate(w.FUNNEL_BANKS))
    fail = {"url": "NOT k_url", "c4": "NOT k_c4", "gopher": "NOT k_gopher",
            "repetition": "NOT k_rep", "classifier": "NOT k_cls"}
    arms = []
    for i, b in enumerate(w.FUNNEL_BANKS):
        others = " AND ".join(fail[o].replace("NOT ", "")
                              for o in w.FUNNEL_BANKS if o != b)
        arms.append(
            f"SELECT {i} AS bank_idx, "
            f"CAST(count(*) FILTER (WHERE {fail[b]}) AS BIGINT) AS n_failed, "
            f"CAST(count(*) FILTER (WHERE {fail[b]} AND {others}) AS BIGINT)"
            f" AS n_unique_drops FROM lab")
    union = "\n      UNION ALL ".join(arms)
    return f"""
    WITH uf AS (SELECT url, coalesce(keep, FALSE) AS k_url
                FROM ({url_host_filter_sql(pages_glob)})),
    c4f AS (SELECT url, coalesce(keep, FALSE) AS k_c4
            FROM ({c4_line_filter_sql(pages_glob)})),
    gqf AS (SELECT url, coalesce(gopher_keep, FALSE) AS k_gopher
            FROM ({gopher_quality_flags_sql(pages_glob)})),
    repf AS (SELECT url, coalesce(repetition_keep, FALSE) AS k_rep
             FROM ({gopher_repetition_sql(pages_glob)})),
    qcf AS (SELECT url, coalesce(keep, FALSE) AS k_cls
            FROM ({quality_classifier_sql(pages_glob)})),
    base AS (SELECT url FROM read_parquet('{pages_glob}')
             WHERE text IS NOT NULL),
    lab AS (
      SELECT k_url, k_c4, k_gopher, k_rep, k_cls
      FROM base JOIN uf USING (url) JOIN c4f USING (url)
                JOIN gqf USING (url) JOIN repf USING (url)
                JOIN qcf USING (url)),
    cnt AS ({union})
    SELECT CAST(s.bank_idx AS BIGINT) AS bank_idx, s.bank,
           coalesce(cnt.n_failed, 0::BIGINT) AS n_failed,
           coalesce(cnt.n_unique_drops, 0::BIGINT) AS n_unique_drops
    FROM (VALUES {spine}) s(bank_idx, bank)
    LEFT JOIN cnt USING (bank_idx)
    ORDER BY s.bank_idx
    """


def hard_negatives_sql(n_queries: int | None = None,
                       k: int | None = None,
                       iters: int | None = None) -> str:
    """Hard-negative twin: the k-means CTEs + a probe-to-corpus join
    restricted to DIFFERENT final clusters, ranked by the exact cosine
    (int dot / sqrt(double(na)*double(nb)) — the semdedup recipe) with
    row_number ties to the lower vec_id; sim rounds only in the output
    projection (ranking sees the unrounded double, same as the
    engine)."""
    from .pipelines import docs as d

    nq = d.HARDNEG_N_QUERIES if n_queries is None else int(n_queries)
    kk = d.HARDNEG_TOPK if k is None else int(k)
    iters = d.KMEANS_ITERS if iters is None else iters
    return f"""
    WITH {_kmeans_ctes(None, iters)},
    qa AS (
      SELECT a.vec_id, a.cid, v.q,
             list_sum(list_transform(v.q, x -> x*x)) AS na
      FROM asg{iters + 1} a JOIN q v USING (vec_id)),
    pairs AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             CAST(list_sum(list_transform(list_zip(a.q, b.q),
                  p -> p[1]*p[2])) AS DOUBLE)
               / sqrt(CAST(a.na AS DOUBLE) * CAST(b.na AS DOUBLE)) AS sim
      FROM qa a JOIN qa b
        ON a.vec_id < {nq} AND b.vec_id != a.vec_id
       AND b.cid != a.cid AND a.na > 0 AND b.na > 0)
    SELECT qid, nid, round(sim, 4) AS sim, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY sim DESC, nid) AS rk
          FROM pairs)
    WHERE rk <= {kk}
    """


def inverted_index_sql() -> str:
    """Postings twin: unnest the same [a-z]+ token list, count per
    (token, document)."""
    return """
    SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
          FROM documents)
    GROUP BY tok, doc_id
    """


def shingle_novelty_sql() -> str:
    """Novelty twin over the trigram STRINGS (the shared _SHINGLES
    spec): per distinct (doc, shingle), novel iff doc == the shingle's
    corpus-wide min doc_id; the engine attributes over 64-bit shingle
    hashes — the documented collision tolerance (decontaminate
    precedent). Zero-shingle docs keep NULL novelty via the LEFT
    JOIN."""
    return f"""
    WITH {_SHINGLES},
    tr AS (SELECT doc_id, unnest(s) AS sv FROM sh),
    mn AS (SELECT sv, min(doc_id) AS first_doc FROM tr GROUP BY sv),
    per AS (
      SELECT tr.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(count(*) FILTER (WHERE tr.doc_id = mn.first_doc)
                  AS BIGINT) AS n_novel
      FROM tr JOIN mn USING (sv) GROUP BY tr.doc_id)
    SELECT d.doc_id,
           coalesce(p.n_shingles, 0::BIGINT) AS n_shingles,
           coalesce(p.n_novel, 0::BIGINT) AS n_novel,
           CASE WHEN p.n_shingles > 0
                THEN CAST(p.n_novel AS DOUBLE)
                       / CAST(p.n_shingles AS DOUBLE)
           END AS novelty
    FROM documents d LEFT JOIN per p USING (doc_id)
    """


def quality_percentile_sql() -> str:
    """Percent-rank twin: DuckDB's percent_rank() == the engine's
    (strictly-below count)/(n-1) with tie-sharing min rank; single-row
    partitions are 0.0 on both sides."""
    return """
    SELECT doc_id, lang, n_chars,
           percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
             AS pct_rank
    FROM documents
    """


def tokenizer_fertility_sql() -> str:
    """Fertility twin: the frozen BPE subword counts (bpe_ntok chain)
    joined with the [a-z]+ word counts, grouped per language, ONE
    int/int double division (NULL for zero-word languages)."""
    from .functions.bpe import bpe_ntok_ctes

    return ("WITH " + bpe_ntok_ctes() + """,
    w AS (
      SELECT doc_id, lang,
             CAST(coalesce(len(regexp_extract_all(lower(text), '[a-z]+')),
                  0) AS BIGINT) AS n_words
      FROM documents),
    per AS (
      SELECT w.lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(w.n_words) AS BIGINT) AS n_words,
             CAST(sum(b.n_tokens) AS BIGINT) AS n_subwords
      FROM w JOIN bpe_ntok b USING (doc_id) GROUP BY w.lang)
    SELECT lang, n_docs, n_words, n_subwords,
           CASE WHEN n_words > 0
                THEN round(CAST(n_subwords AS DOUBLE)
                             / CAST(n_words AS DOUBLE), 4)
           END AS fertility
    FROM per""")


def span_corruption_plan_sql(span_len: int | None = None,
                             grid: int | None = None) -> str:
    """Span-plan twin: the same mix64 grid offset and 3-arg
    generate_series starts (empty when the doc is shorter than one
    span — generate_series with end < start yields no rows)."""
    from .pipelines.docs import SPAN_CORRUPT_GRID, SPAN_CORRUPT_LEN

    L = SPAN_CORRUPT_LEN if span_len is None else int(span_len)
    G = SPAN_CORRUPT_GRID if grid is None else int(grid)
    mix = mix64_scalar("CAST(doc_id AS HUGEINT)")
    return f"""
    WITH d AS (
      SELECT doc_id,
             CAST(coalesce(len(regexp_extract_all(text, '\\S+')), 0)
                  AS BIGINT) AS n,
             CAST({mix} % {G} AS BIGINT) AS off
      FROM documents),
    s AS (
      SELECT doc_id, off,
             unnest(generate_series(off, n - {L}, {G}::BIGINT)) AS start
      FROM d WHERE n - {L} >= off)
    SELECT doc_id,
           CAST((start - off) // {G} AS BIGINT) AS span_id,
           CAST(start AS BIGINT) AS tok_start,
           CAST(start + {L} AS BIGINT) AS tok_end
    FROM s
    """


def doc_commonness_sql() -> str:
    """Commonness twin: df = COUNT(DISTINCT doc) per token, per-doc
    sum over token OCCURRENCES, the same integer cross-multiplied keep
    and one exact-int double division for the score; zero-token docs
    get NULL score / keep false via the LEFT JOIN coalesce."""
    from .pipelines.docs import COMMONNESS_DEN, COMMONNESS_NUM

    return f"""
    WITH u AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
               AS tok
      FROM documents),
    df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM u GROUP BY tok),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    per AS (
      SELECT u.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             CAST(sum(df.df) AS BIGINT) AS sum_df
      FROM u JOIN df USING (tok) GROUP BY u.doc_id)
    SELECT d.doc_id,
           coalesce(p.n_tok, 0::BIGINT) AS n_tok,
           CASE WHEN p.n_tok > 0
                THEN CAST(p.sum_df AS DOUBLE)
                       / CAST(p.n_tok * g.n AS DOUBLE) END AS commonness,
           coalesce({COMMONNESS_NUM} * p.n_tok * g.n
                      >= {COMMONNESS_DEN} * p.sum_df, FALSE) AS keep
    FROM documents d CROSS JOIN g LEFT JOIN per p USING (doc_id)
    """


def host_dup_rate_sql() -> str:
    """Dup-rate rollup twin: duplication attributed over the text
    itself (window count per text partition; the engine hashes — the
    documented collision tolerance), per-source dup counts over
    non-null text, doc counts over everything, one exact-int double
    division."""
    return """
    WITH c AS (
      SELECT source, count(*) OVER (PARTITION BY text) AS k
      FROM documents WHERE text IS NOT NULL),
    per AS (
      SELECT source,
             CAST(count(*) FILTER (WHERE k >= 2) AS BIGINT) AS n_dup
      FROM c GROUP BY source),
    nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source)
    SELECT nd.source, nd.n_docs,
           coalesce(p.n_dup, 0::BIGINT) AS n_dup_docs,
           CASE WHEN nd.n_docs > 0
                THEN CAST(coalesce(p.n_dup, 0) AS DOUBLE)
                       / CAST(nd.n_docs AS DOUBLE) END AS dup_rate
    FROM nd LEFT JOIN per p ON nd.source IS NOT DISTINCT FROM p.source
    """


def source_datacard_sql(pages_glob: str) -> str:
    """Datacard twin: the same WORD/STOPWORD/SYMBOL RE2 constants
    (webtext module — one spec, two engines), grouped on the raw
    ^scheme://host capture (pii_density_by_host's host key), ratios as
    single exact-int double divisions, NULL for zero-word hosts."""
    from .pipelines import webtext as w

    def cnt(pat: str) -> str:
        esc = pat.replace("'", "''")
        return f"coalesce(len(regexp_extract_all(text, '{esc}')), 0)"

    return f"""
    WITH c AS (
      SELECT nullif(regexp_extract(url, '^[a-z]+://([^/]+)', 1), '')
               AS host,
             {cnt(w.WORD_RE)} AS n_words,
             {cnt("(?i)" + w.GOPHER_STOPWORD_RE)} AS n_stop,
             {cnt(w.SYMBOL_RE)} AS n_sym
      FROM read_parquet('{pages_glob}')),
    g AS (
      SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
             CAST(sum(n_words) AS BIGINT) AS n_words,
             CAST(sum(n_stop) AS BIGINT) AS n_stop,
             CAST(sum(n_sym) AS BIGINT) AS n_sym
      FROM c GROUP BY host)
    SELECT host, n_pages, n_words,
           round(CAST(n_words AS DOUBLE) / CAST(n_pages AS DOUBLE), 4)
             AS mean_words,
           CASE WHEN n_words > 0
                THEN round(CAST(n_stop AS DOUBLE)
                             / CAST(n_words AS DOUBLE), 4) END
             AS stop_ratio,
           CASE WHEN n_words > 0
                THEN round(CAST(n_sym AS DOUBLE)
                             / CAST(n_words AS DOUBLE), 4) END
             AS symbol_ratio
    FROM g
    """


def tumbling_distinct_users_sql() -> str:
    """Windowed COUNT(DISTINCT) twin (the hopping_window timestamp
    recipe at the 1-hour width)."""
    return """
    SELECT event_type,
           make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
             AS win,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """


def ngram_lm_export_sql(train_mod: int = 2) -> str:
    """Trigram count-table twin: the same [a-z]+ tokens, trigram =
    three space-joined consecutive tokens within a doc, counted over
    the same training split."""
    return f"""
    WITH tk AS (
      SELECT regexp_extract_all(lower(text), '[a-z]+') AS lst
      FROM documents WHERE doc_id % {train_mod} = 0),
    g AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(lst) - 2, 0)),
               i -> lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2])) AS gram
      FROM tk)
    SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY gram
    """


def incremental_dedup_sql(old_mod: int = 2) -> str:
    """Incremental-dedup twin: membership by the TEXT itself (engine
    hashes — documented collision tolerance), null text as empty
    string on both sides."""
    return f"""
    WITH o AS (SELECT DISTINCT coalesce(text, '') AS t
               FROM documents WHERE doc_id % {old_mod} = 0),
    n AS (SELECT doc_id, source, coalesce(text, '') AS t
          FROM documents WHERE doc_id % {old_mod} != 0)
    SELECT doc_id, source,
           NOT EXISTS (SELECT 1 FROM o WHERE o.t = n.t) AS keep
    FROM n
    """


def topic_mixture_report_sql() -> str:
    """Mixture-matrix twin: the SAME frozen lexicons and CASE-chain
    argmax as topic_classify_sql, rolled up per (source, topic) with
    the share as an exact-int double division (window sum over BIGINT
    is exact)."""
    from .pipelines.docs import TOPIC_LEXICONS

    names = sorted(TOPIC_LEXICONS)
    score_cols = []
    for n in names:
        words = ", ".join(f"'{w}'" for w in sorted(TOPIC_LEXICONS[n]))
        score_cols.append(
            f"coalesce(len(list_filter(ts, t -> t IN ({words}))), 0)"
            f" AS s_{n}")
    greatest = "GREATEST(" + ", ".join(f"s_{n}" for n in names) + ")"
    whens = []
    for i, n in enumerate(names):
        rest = [f"s_{n} >= s_{m}" for m in names[i + 1:]]
        cond = " AND ".join(rest) if rest else "TRUE"
        whens.append(f"WHEN {cond} THEN '{n}'")
    case = (f"CASE WHEN {greatest} = 0 THEN 'none' "
            + " ".join(whens) + " END")
    return f"""
    WITH tk AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z]+') AS ts
      FROM documents),
    s AS (SELECT doc_id, source,
                 CAST(coalesce(len(ts), 0) AS BIGINT) AS n_tok,
                 {", ".join(score_cols)}
          FROM tk),
    lab AS (SELECT source, {case} AS topic, n_tok FROM s),
    g AS (SELECT source, topic, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS n_tokens
          FROM lab GROUP BY 1, 2)
    SELECT source, topic, n_docs, n_tokens,
           round(CAST(n_docs AS DOUBLE)
                   / CAST(sum(n_docs) OVER (PARTITION BY source)
                          AS DOUBLE), 4) AS doc_share
    FROM g
    """


def hex16(v: str) -> str:
    """16-digit lowercase hex of a HUGEINT in [0, 2^64)."""
    return (f"printf('%08x%08x', CAST(({v}) >> 32 AS BIGINT), "
            f"CAST(({v}) % {M32} AS BIGINT))")


_SIMHASH_CTES = """
    tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ),
    th AS (SELECT doc_id, {fnv} AS h FROM tok),
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
"""


def simhash_neardup_sql(max_hamming: int = 3) -> str:
    """All pairs with hamming(simhash) <= k — checks the banded LSH pair
    generation end to end (pigeonhole makes the Ray side exact, so the
    brute-force SQL is a strict oracle)."""
    ctes = _SIMHASH_CTES.format(fnv=fnv_expr("tok"))
    return f"""
    WITH {ctes},
    fullsh AS (
      SELECT d.doc_id, coalesce(s.sh, 0::HUGEINT) AS sh
      FROM documents d LEFT JOIN sh s USING (doc_id)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
    FROM fullsh a JOIN fullsh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """


def dedup_adjacent_tokens_sql() -> str:
    """Within-doc adjacent-token collapse twin (lag() window + ordered
    string_agg re-join)."""
    return r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok,
             generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS pos
      FROM documents),
    keep AS (
      SELECT doc_id, tok, pos,
             lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM toks),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_dedup,
             CAST(count(*) AS BIGINT) AS n_kept
      FROM keep WHERE prev IS NULL OR tok != prev GROUP BY doc_id),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_all
            FROM toks GROUP BY doc_id)
    SELECT d.doc_id, coalesce(a.text_dedup, '') AS text_dedup,
           coalesce(a.n_kept, 0::BIGINT) AS n_kept,
           coalesce(t.n_all, 0::BIGINT) - coalesce(a.n_kept, 0::BIGINT) AS n_removed
    FROM documents d LEFT JOIN agg a USING (doc_id) LEFT JOIN tot t USING (doc_id)
    """


def dedup_paragraphs_sql(seg_tokens: int = 20) -> str:
    """Cross-corpus segment dedup twin: tokenize (\\S+ = the engine's
    utf8_split_whitespace after empty-token filtering), group tokens
    into `seg_tokens`-sized segments, keep the row_number()=1 occurrence
    of each distinct segment text ordered by (doc_id, seg_idx), and
    reassemble each document with an ordered string_agg."""
    return rf"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok,
             generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS pos
      FROM documents),
    segs AS (
      SELECT doc_id, CAST(floor((pos - 1) / {seg_tokens}) AS BIGINT) AS seg_idx,
             string_agg(tok, ' ' ORDER BY pos) AS seg
      FROM toks GROUP BY doc_id, 2),
    kept AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
      FROM segs),
    agg AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup,
             CAST(count(*) AS BIGINT) AS n_kept_segs
      FROM kept WHERE rn = 1 GROUP BY doc_id),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total_segs
            FROM segs GROUP BY doc_id)
    SELECT d.doc_id, coalesce(a.text_dedup, '') AS text_dedup,
           coalesce(a.n_kept_segs, 0::BIGINT) AS n_kept_segs,
           coalesce(t.n_total_segs, 0::BIGINT) AS n_total_segs
    FROM documents d LEFT JOIN agg a USING (doc_id) LEFT JOIN tot t USING (doc_id)
    """


def embedding_neardup_clusters_sql(threshold: float = 0.4) -> str:
    """Connected components of the embedding-cosine pair graph via a
    recursive min-label walk (same shape as neardup_clusters_sql over
    the Jaccard graph)."""
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[]))
            >= {threshold}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    walk(node, label) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS vec_id, min(label) AS cluster_id FROM walk GROUP BY node
    """


def knn_self_join_sql(k: int = 5) -> str:
    """All-pairs top-k cosine self-join twin: rank on the UNROUNDED
    similarity with the family's (sim desc, nid asc) tie-break, emit the
    rounded sim (house ANN convention, same as ann_topk_bruteforce)."""
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings)
    SELECT qid, nid, sim FROM (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             round(list_cosine_similarity(a.emb, b.emb), 4) AS sim,
             row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_cosine_similarity(a.emb, b.emb) DESC, b.vec_id
             ) AS rk
      FROM e a JOIN e b ON a.vec_id != b.vec_id
    ) WHERE rk <= {k}
    """


def dup_window_fraction_sql(window_tokens: int = 8,
                            max_frac: float = 0.3) -> str:
    """Sliding-window cross-doc duplicate-fraction twin: windows via
    1-based inclusive list slices over the [a-z]+ tokens of lower(text)
    (ts.tokenize), shared = window text in >= 2 DISTINCT docs, dup count
    = window POSITIONS whose text is shared. dup_frac is one int/int
    double division (bit-equal to the engine); n_windows = 0 docs keep."""
    w1 = window_tokens - 1
    return rf"""
    WITH tl AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts
      FROM documents),
    win AS (
      SELECT doc_id, array_to_string(ts[i:i+{w1}], ' ') AS wtext
      FROM tl CROSS JOIN
           unnest(generate_series(1, coalesce(len(ts), 0) - {w1})) AS u(i)),
    shared AS (
      SELECT wtext FROM win GROUP BY wtext
      HAVING count(DISTINCT doc_id) >= 2),
    dup AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
      FROM win JOIN shared USING (wtext) GROUP BY doc_id),
    nw AS (
      SELECT doc_id,
             CAST(greatest(coalesce(len(ts), 0) - {w1}, 0) AS BIGINT) AS n_windows
      FROM tl)
    SELECT d.doc_id, nw.n_windows,
           coalesce(dup.n_dup, 0::BIGINT) AS n_dup_windows,
           CASE WHEN nw.n_windows > 0
                THEN CAST(coalesce(dup.n_dup, 0) AS DOUBLE)
                     / CAST(nw.n_windows AS DOUBLE) END AS dup_frac,
           (nw.n_windows = 0 OR
            CAST(coalesce(dup.n_dup, 0) AS DOUBLE)
            / CAST(greatest(nw.n_windows, 1) AS DOUBLE) <= {max_frac}) AS keep
    FROM documents d JOIN nw USING (doc_id) LEFT JOIN dup USING (doc_id)
    """


def remove_dup_windows_sql(window_tokens: int = 8) -> str:
    """Exact-substring removal twin: covered token positions = the
    1-based union of [i, i+W-1] over every shared window start i
    (engine: 0-based [wpos, wpos+W) — same set); anti-join the token
    stream, ordered string_agg. Empty-after-removal and tokenless docs
    both yield ''."""
    w1 = window_tokens - 1
    return rf"""
    WITH tl AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts
      FROM documents),
    toks AS (
      SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS pos
      FROM tl),
    win AS (
      SELECT doc_id, i, array_to_string(ts[i:i+{w1}], ' ') AS wtext
      FROM tl CROSS JOIN
           unnest(generate_series(1, coalesce(len(ts), 0) - {w1})) AS u(i)),
    shared AS (
      SELECT wtext FROM win GROUP BY wtext
      HAVING count(DISTINCT doc_id) >= 2),
    cov AS (
      SELECT DISTINCT w.doc_id, u.p
      FROM win w JOIN shared USING (wtext)
      CROSS JOIN unnest(generate_series(w.i, w.i + {w1})) AS u(p)),
    kept AS (
      SELECT t.doc_id, t.tok, t.pos
      FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.pos
      WHERE c.doc_id IS NULL),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_dedup,
             CAST(count(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
            FROM toks GROUP BY doc_id)
    SELECT d.doc_id, coalesce(a.text_dedup, '') AS text_dedup,
           coalesce(t.n, 0::BIGINT) AS n_tokens,
           coalesce(t.n, 0::BIGINT) - coalesce(a.n_kept, 0::BIGINT)
               AS n_removed_tokens
    FROM documents d LEFT JOIN agg a USING (doc_id)
    LEFT JOIN tot t USING (doc_id)
    """


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


# ---- PMIS flow oracles over the frozen sections fixture ------------------

# every non-equi-key column of the sections schema (suffixed after join)
PMIS_NONKEY = ("fiscal_year", "begin_dfo", "end_dfo", "start_time",
               "lane_number", "direction", "vehicle_id", "comment_code",
               "avg_speed", "measure_iri", "measure_rut", "util_score",
               "traffic_level", "section_length")
PMIS_MEASURES = ("measure_iri", "measure_rut", "util_score")
PMIS_FILTER_MEASURES = ("measure_iri", "measure_rut")
PMIS_UTIL_MEASURES = ("util_score",)


def pmis_merged_cte(path_a: str, path_b: str) -> str:
    """CTE reproducing pipelines.pmis.data_merge over the frozen fixture:
    load-derive section_length (S3), inner equi-join on (hwy_id, county)
    (which subsumes the reference's county semi-join), STRICT <0.05 band,
    NaN-propagating diff columns."""
    sel = ["a.hwy_id", "a.county"]
    for s, side in (("_a", "a"), ("_b", "b")):
        sel += [f"{side}.{c} AS {c}{s}" for c in PMIS_NONKEY]
    sel += [f"a.{m} - b.{m} AS diff_{m}" for m in PMIS_MEASURES]
    return f"""
    ca AS (SELECT *, abs(begin_dfo - end_dfo) AS section_length
           FROM read_parquet('{path_a}')),
    cb AS (SELECT *, abs(begin_dfo - end_dfo) AS section_length
           FROM read_parquet('{path_b}')),
    m AS (
      SELECT {', '.join(sel)}
      FROM ca a JOIN cb b ON a.hwy_id = b.hwy_id AND a.county = b.county
      WHERE abs(a.begin_dfo - b.begin_dfo) < 0.05
        AND abs(a.end_dfo - b.end_dfo) < 0.05
    )
    """


def pmis_audit_flow_sql(path_a: str, path_b: str, percentile: float = 0.95) -> str:
    """Audit flow: p95-of-abs(diff) thresholds per filter measure
    (quantile_cont == numpy linear interpolation), keep rows where ANY
    abs(diff) >= threshold. NaN guards are explicit: DuckDB orders NaN
    greatest, so `abs(NaN) >= t` would spuriously flag — the reference's
    pandas semantics (NaN never flags, Home.py:139) need NOT isnan."""
    thr = ", ".join(
        f"quantile_cont(abs(diff_{m}), {percentile}) "
        f"FILTER (WHERE NOT isnan(diff_{m})) AS thr_{m}"
        for m in PMIS_FILTER_MEASURES)
    flag = " OR ".join(
        f"(NOT isnan(diff_{m}) AND abs(diff_{m}) >= thr_{m})"
        for m in PMIS_FILTER_MEASURES)
    return f"""
    WITH {pmis_merged_cte(path_a, path_b)},
    thr AS (SELECT {thr} FROM m)
    SELECT m.*, CAST(1 AS BIGINT) AS flag FROM m, thr WHERE {flag}
    """


def pmis_yby_flow_sql(path_a: str, path_b: str) -> str:
    """Year-by-year flow: two-sided [p2.5, p97.5] thresholds of the
    SIGNED diff (Home.py:340), keep rows where diff >= hi OR diff <= lo."""
    thr = ", ".join(
        f"quantile_cont(diff_{m}, 0.025) FILTER (WHERE NOT isnan(diff_{m})) AS lo_{m}, "
        f"quantile_cont(diff_{m}, 0.975) FILTER (WHERE NOT isnan(diff_{m})) AS hi_{m}"
        for m in PMIS_FILTER_MEASURES)
    flag = " OR ".join(
        f"(NOT isnan(diff_{m}) AND (diff_{m} >= hi_{m} OR diff_{m} <= lo_{m}))"
        for m in PMIS_FILTER_MEASURES)
    return f"""
    WITH {pmis_merged_cte(path_a, path_b)},
    thr AS (SELECT {thr} FROM m)
    SELECT m.*, CAST(1 AS BIGINT) AS flag FROM m, thr WHERE {flag}
    """


def _exact_mean(col: str, scale: int) -> str:
    """Order-independent NaN-skipping mean of exact-decimal data: sum the
    `round(v*scale)` integers exactly, divide once (mirrors
    pipelines.pmis integer-units mode — float sums of decimal data land
    exactly ON rounding boundaries where engine order would split)."""
    # the CASE guard matters: DuckDB evaluates the cast argument on every
    # row BEFORE the aggregate FILTER, and CAST(NaN AS BIGINT) throws
    safe = f"CASE WHEN isnan({col}) THEN 0 ELSE {col} END"
    return (f"round(sum(CAST(round({safe} * {scale}) AS BIGINT)) "
            f"FILTER (WHERE NOT isnan({col})) "
            f"/ ({scale}.0 * count(*) FILTER (WHERE NOT isnan({col}))), 4)")


def _case_bins(expr: str, edges: tuple[float, ...]) -> str:
    """np.digitize(x, edges) twin: x < e0 -> b0, e0 <= x < e1 -> b1, ..."""
    whens = " ".join(f"WHEN {expr} < {e} THEN 'b{i}'" for i, e in enumerate(edges))
    return f"CASE {whens} ELSE 'b{len(edges)}' END"


def pmis_counters_sql(path_a: str, path_b: str,
                      speed_edges: tuple[float, ...],
                      speed_diff_edges: tuple[float, ...],
                      percentile: float = 0.95) -> str:
    """Per-dimension outlier counters twin (Home.py:444-904 blocks fused
    into one pass on the Ray side; here one grouped select per dimension,
    UNION ALL). Section-length miles in integer milli units (exact);
    time_diff as FLOORED days (pandas .dt.days semantics — DuckDB's //
    truncates toward zero, so floor() over a double division is used)."""
    thr = ", ".join(
        f"quantile_cont(abs(diff_{m}), {percentile}) "
        f"FILTER (WHERE NOT isnan(diff_{m})) AS thr_{m}"
        for m in PMIS_FILTER_MEASURES)
    flag = " OR ".join(
        f"(NOT isnan(diff_{m}) AND abs(diff_{m}) >= thr_{m})"
        for m in PMIS_FILTER_MEASURES)
    dims = {
        "county": "county",
        "lane_pair": ("CAST(lane_number_a AS VARCHAR) || '-' || "
                      "CAST(lane_number_b AS VARCHAR)"),
        "direction": "direction_a",
        "vehicle_id": "vehicle_id_a",
        "speed_bin": _case_bins("avg_speed_a", speed_edges),
        "speed_diff_bin": _case_bins("avg_speed_a - avg_speed_b", speed_diff_edges),
        "time_diff_days": ("CAST(CAST(floor((epoch_us(start_time_a) - "
                           "epoch_us(start_time_b)) / 86400000000.0) AS BIGINT) "
                           "AS VARCHAR)"),
        "comment_code": "comment_code_a",
    }
    sides = " UNION ALL ".join(
        f"""SELECT '{dim}' AS dim, {expr} AS key,
               CAST(count(*) AS BIGINT) AS count_all,
               sum(CAST(round(section_length_a * 1000) AS BIGINT)) / 1000.0 AS len_all,
               CAST(count(*) FILTER (WHERE flag) AS BIGINT) AS count_out,
               coalesce(sum(CAST(round(section_length_a * 1000) AS BIGINT))
                        FILTER (WHERE flag), 0) / 1000.0 AS len_out,
               100.0 * count(*) FILTER (WHERE flag) / count(*) AS pct_out
            FROM flagged GROUP BY 2"""
        for dim, expr in dims.items())
    return f"""
    WITH {pmis_merged_cte(path_a, path_b)},
    thr AS (SELECT {thr} FROM m),
    flagged AS (SELECT m.*, ({flag}) AS flag FROM m, thr)
    {sides}
    """


def pmis_diff_histogram_sql(path_a: str, path_b: str, measure: str,
                            edges: tuple[float, ...]) -> str:
    """Diff-histogram twin: bin index = count of edges <= d (np.digitize
    right=False), +-inf end bins, NaN diffs excluded, empty bins kept."""
    n_bins = len(edges) + 1
    edge_list = ", ".join(str(e) for e in edges)
    lo0, step = edges[0], edges[1] - edges[0]
    return f"""
    WITH {pmis_merged_cte(path_a, path_b)},
    counted AS (
      SELECT len(list_filter([{edge_list}], x -> x <= diff_{measure})) AS i,
             CAST(count(*) AS BIGINT) AS cnt
      FROM m WHERE NOT isnan(diff_{measure}) GROUP BY 1)
    SELECT printf('b%02d', b.i) AS bin,
           CASE WHEN b.i = 0 THEN '-infinity'::DOUBLE
                ELSE {lo0} + (b.i - 1) * {step} END AS lo,
           CASE WHEN b.i = {n_bins - 1} THEN 'infinity'::DOUBLE
                ELSE {lo0} + b.i * {step} END AS hi,
           coalesce(c.cnt, 0::BIGINT) AS cnt
    FROM (SELECT unnest(generate_series(0, {n_bins - 1})) AS i) b
    LEFT JOIN counted c ON b.i = c.i
    """


def pmis_county_summary_sql(path_a: str, path_b: str) -> str:
    """Per-cycle county means (NaN-skipping), match count, and the IRI
    traffic-level miles pivot (Home.py:215-260 + 226-254; empty
    (county, level) cells are 0.0 by deliberate choice, see
    pipelines.pmis.county_summary). Integer-exact decimal units."""
    def side(s: str) -> str:
        means = ", ".join(
            f"{_exact_mean(f'{m}{s}', 100)} AS {m}" for m in PMIS_MEASURES)
        lens = ", ".join(
            f"round(coalesce(sum(CAST(round(section_length{s} * 1000) AS BIGINT)) "
            f"FILTER (WHERE traffic_level{s} = '{lvl}'), 0) / 1000.0, 4) "
            f"AS len_{lvl.lower()}"
            for lvl in ("LOW", "MEDIUM", "HIGH"))
        return (f"SELECT county, '{s[1:]}' AS cycle, {means}, {lens}, "
                f"CAST(count(*) AS BIGINT) AS n_match FROM m GROUP BY county")

    return f"""
    WITH {pmis_merged_cte(path_a, path_b)}
    {side('_a')} UNION ALL {side('_b')}
    """


def pmis_yby_district_sql(path_a: str, path_b: str) -> str:
    """YbY district summary (Home.py:263-270): NaN-skipping mean of the
    UTIL measures per fiscal year (one row per rating cycle)."""
    def side(s: str) -> str:
        means = ", ".join(
            f"{_exact_mean(f'{m}{s}', 100)} AS {m}" for m in PMIS_UTIL_MEASURES)
        return (f"SELECT CAST(fiscal_year{s} AS BIGINT) AS rating_cycle, "
                f"'{s[1:]}' AS cycle, {means} FROM m GROUP BY fiscal_year{s}")

    return f"""
    WITH {pmis_merged_cte(path_a, path_b)}
    {side('_a')} UNION ALL {side('_b')}
    """


def csv_ingest_sql(path_csv: str) -> str:
    """S1/S2/S3 CSV-ingestion twin: DuckDB read_csv + strptime
    `%Y%m%d%H%M%S` + the section-length load-derive. comment_code's empty
    cells coalesce to '' (matching the Arrow-side fill_null)."""
    meas = ", ".join(PMIS_MEASURES)
    return f"""
    SELECT fiscal_year, hwy_id, county, begin_dfo, end_dfo,
           strptime(CAST(start_time AS VARCHAR), '%Y%m%d%H%M%S') AS start_time,
           lane_number, direction, vehicle_id,
           coalesce(comment_code, '') AS comment_code,
           avg_speed, {meas}, traffic_level,
           abs(begin_dfo - end_dfo) AS section_length
    FROM read_csv('{path_csv}', header = true)
    """


def _langid_pred_ctes(src: str = "documents") -> str:
    """CTE chain ending in `langpred(doc_id, lang_pred)` — the frozen
    vocab-profile classifier re-expressed in SQL, shared by langid_sql,
    ccnet_ppl_buckets_sql and lang_confusion_sql (one spec, three uses).
    `src` is any relation exposing (doc_id, text) — callers over the
    pages corpus alias url AS doc_id in a prior CTE. Null text -> NULL
    lang (the engine's LangIdModel returns None there; tokenless but
    non-null text -> 'und')."""
    from .config import LANGID_LANGS, LANGID_MIN_SCORE, LANGID_UNKNOWN
    from .vocab import LANG_VOCABS

    vocab_rows = ", ".join(
        f"('{lang}', '{tok}')"
        for lang in LANGID_LANGS
        for tok in sorted(set(LANG_VOCABS[lang]))
    )
    ord_rows = ", ".join(f"('{lang}', {i})" for i, lang in enumerate(LANGID_LANGS))
    return f"""
    vocab(lang, tok) AS (VALUES {vocab_rows}),
    lang_order(lang, ord) AS (VALUES {ord_rows}),
    tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM {src}
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
    ),
    langpred AS (
      SELECT d.doc_id,
             CASE WHEN d.text IS NULL THEN NULL
                  WHEN b.score IS NULL OR b.score < {LANGID_MIN_SCORE}
                  THEN '{LANGID_UNKNOWN}' ELSE b.lang END AS lang_pred
      FROM {src} d
      LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
    )"""


def langid_sql() -> str:
    return f"""
    WITH {_langid_pred_ctes()}
    SELECT doc_id, lang_pred FROM langpred
    """


def ccnet_ppl_buckets_sql() -> str:
    """CCNet-style per-language perplexity-bucket twin: the frozen
    integer micro-nat cost table (stages.perplexity.quantized_cost_table
    — the SAME ints the engine uses) as VALUES; score = CAST(cost
    sum)/CAST(n) double division; thresholds = the ceil(k*n/3)-th
    smallest score per language via row_number (order statistics — no
    interpolation, tie-proof across engines)."""
    from .stages.perplexity import quantized_cost_table

    vocab, costs, oov = quantized_cost_table()
    cost_rows = ", ".join(
        f"('{t}', {c})" for t, c in zip(vocab.to_pylist(), costs.tolist()))
    return f"""
    WITH {_langid_pred_ctes()},
    cost(tok, c) AS (VALUES {cost_rows}),
    ctok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents),
    dcost AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             CAST(sum(coalesce(c.c, {oov})) AS BIGINT) AS total_cost
      FROM ctok t LEFT JOIN cost c USING (tok) GROUP BY t.doc_id),
    scored AS (
      SELECT l.doc_id, l.lang_pred,
             coalesce(d.n_tok, 0::BIGINT) AS n_tok,
             CASE WHEN d.n_tok > 0
                  THEN CAST(d.total_cost AS DOUBLE) / CAST(d.n_tok AS DOUBLE)
             END AS ppl_score
      FROM langpred l LEFT JOIN dcost d USING (doc_id)),
    ranked AS (
      SELECT lang_pred, ppl_score,
             row_number() OVER (PARTITION BY lang_pred ORDER BY ppl_score) AS rn,
             count(*) OVER (PARTITION BY lang_pred) AS n
      FROM scored WHERE n_tok > 0),
    th AS (
      SELECT lang_pred,
             max(CASE WHEN rn = CAST(ceil(n / 3.0) AS BIGINT)
                      THEN ppl_score END) AS t1,
             max(CASE WHEN rn = CAST(ceil(2 * n / 3.0) AS BIGINT)
                      THEN ppl_score END) AS t2
      FROM ranked GROUP BY lang_pred)
    SELECT s.doc_id, s.lang_pred, s.n_tok, s.ppl_score,
           CASE WHEN s.n_tok = 0 THEN NULL
                WHEN s.ppl_score <= t.t1 THEN 'head'
                WHEN s.ppl_score <= t.t2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scored s LEFT JOIN th t USING (lang_pred)
    """


# ---------------------------------------------------------------------------
# Web-text quality-filter twins (pipelines/webtext.py). Each embeds the SAME
# RE2 pattern constants the Ray operators use — same spec, independent engine
# (DuckDB regexp_* vs pyarrow compute). `pages_glob` is the frozen
# deterministic pages corpus (sources/pages.py), PMIS-fixture style.
# ---------------------------------------------------------------------------

def scrub_docs_sql(pages_glob: str) -> str:
    from .stages.scrub import SCRUB_PATTERNS

    expr = "text"
    for _name, pat, repl in SCRUB_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"""
    WITH s AS (
      SELECT url, text, {expr} AS scrubbed_text
      FROM read_parquet('{pages_glob}'))
    SELECT url, scrubbed_text,
           coalesce(text <> scrubbed_text, FALSE) AS scrubbed
    FROM s
    """


def pii_counts_sql(pages_glob: str) -> str:
    """PII-audit twin: independent non-overlapping RE2 counts per frozen
    scrub pattern — len(regexp_extract_all) mirrors pyarrow's
    count_substring_regex over the SAME constants; null text -> 0."""
    from .stages.scrub import SCRUB_PATTERNS

    cols = ",\n             ".join(
        f"coalesce(len(regexp_extract_all(text, '{pat}')), 0) AS n_{name}"
        for name, pat, _repl in SCRUB_PATTERNS)
    total = " + ".join(f"n_{name}" for name, _p, _r in SCRUB_PATTERNS)
    casts = ",\n           ".join(
        f"CAST(n_{name} AS BIGINT) AS n_{name}"
        for name, _p, _r in SCRUB_PATTERNS)
    return f"""
    WITH c AS (
      SELECT url,
             {cols}
      FROM read_parquet('{pages_glob}'))
    SELECT url,
           {casts},
           CAST({total} AS BIGINT) AS n_pii_total,
           ({total}) > 0 AS has_pii
    FROM c
    """


def dedup_lines_within_doc_sql(pages_glob: str) -> str:
    """Within-doc line-dedup twin: keep element iff its FIRST list
    position equals its own index (list_position returns the first
    match), then rejoin — the same first-occurrence spec as the
    engine's lexsort mask. array_to_string([]) is NULL in DuckDB ->
    coalesce for the all-lines-removed-impossible / valid-empty case."""
    return f"""
    WITH l AS (
      SELECT url, text, string_split(text, chr(10)) AS ls
      FROM read_parquet('{pages_glob}')),
    k AS (
      SELECT url, text, ls,
             list_filter(ls, (x, i) -> list_position(ls, x) = i) AS kept
      FROM l)
    SELECT url,
           CASE WHEN text IS NULL THEN NULL
                ELSE coalesce(array_to_string(kept, chr(10)), '') END AS clean_text,
           CAST(coalesce(len(ls), 0) AS BIGINT) AS n_lines,
           CAST(coalesce(len(ls), 0) - coalesce(len(kept), 0) AS BIGINT)
             AS n_dup_lines
    FROM k
    """


def quality_classifier_sql(pages_glob: str) -> str:
    """Linear quality classifier twin: the same frozen integer weight
    vector (webtext.QC_WEIGHTS) over the same RE2 count features —
    integer dot product, integer cross-multiplied keep rule, exact by
    construction."""
    from .pipelines import webtext as w

    feat_re = {
        "stop": f"text, '(?i){w.GOPHER_STOPWORD_RE}'",
        "alpha": f"text, '{w.ALPHA_WORD_RE}'",
        "sym": f"text, '{w.SYMBOL_RE}'",
        "tox": f"text, '{w.BADWORD_RE}'",
        "digit": f"text, '{w.DIGIT_RE}'",
    }
    cols = ",\n             ".join(
        f"coalesce(len(regexp_extract_all({feat_re[name]})), 0) AS n_{name}"
        for name, _wt in w.QC_WEIGHTS)
    score = " + ".join(f"({wt}) * n_{name}" for name, wt in w.QC_WEIGHTS)
    return f"""
    WITH c AS (
      SELECT url,
             coalesce(len(regexp_extract_all(text, '{w.WORD_RE}')), 0) AS n_words,
             {cols}
      FROM read_parquet('{pages_glob}')),
    s AS (SELECT url, n_words, {score} AS score FROM c)
    SELECT url, CAST(n_words AS BIGINT) AS n_words,
           CAST(score AS BIGINT) AS quality_score,
           n_words > 0 AND score >= {w.QC_MIN_SCORE_PER_WORD} * n_words AS keep
    FROM s
    """


def lexical_diversity_sql(pages_glob: str) -> str:
    """Lexical-diversity twin: the SAME [a-z]+ lowercased tokenization
    (unnest + per-(url, tok) counts), integer distinct/hapax counts,
    single int/int float64 divisions for the ratios, and the identical
    integer cross-multiplied keep gate — bit-exact by construction.
    Zero-token docs never reach the aggregate, so the spine left-join
    coalesces their counts to 0 / ratios to NULL / keep to false."""
    from .pipelines import webtext as w

    return f"""
    WITH p AS (
      SELECT url, text FROM read_parquet('{pages_glob}')),
    t AS (
      SELECT url, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM p),
    c AS (SELECT url, tok, count(*) AS cnt FROM t GROUP BY url, tok),
    a AS (SELECT url, sum(cnt) AS n_tokens, count(*) AS n_distinct,
                 sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n_hapax
          FROM c GROUP BY url)
    SELECT p.url,
           CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,
           CAST(coalesce(a.n_hapax, 0) AS BIGINT) AS n_hapax,
           CASE WHEN a.n_tokens > 0
                THEN a.n_distinct * 1.0 / a.n_tokens END AS ttr,
           CASE WHEN a.n_tokens > 0
                THEN a.n_hapax * 1.0 / a.n_tokens END AS hapax_frac,
           coalesce(a.n_tokens > 0
                    AND {w.LEX_MIN_TTR_DEN} * a.n_distinct
                        >= {w.LEX_MIN_TTR_NUM} * a.n_tokens,
                    FALSE) AS keep
    FROM p LEFT JOIN a USING (url)
    """


def readability_scores_sql(pages_glob: str) -> str:
    """Readability twin: the SAME WORD_RE / SENTENCE_RUN_RE constants
    counted with len(regexp_extract_all(...)), the same integer
    cross-multiplied two-sided gate, and one int/int float64 division
    for words_per_sentence — bit-exact by construction."""
    from .pipelines import webtext as w

    return f"""
    WITH c AS (
      SELECT url,
             coalesce(len(regexp_extract_all(text, '{w.WORD_RE}')), 0)
               AS n_words,
             coalesce(len(regexp_extract_all(text, '{w.SENTENCE_RUN_RE}')), 0)
               AS n_sentences,
             text IS NOT NULL AS valid
      FROM read_parquet('{pages_glob}'))
    SELECT url,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CASE WHEN n_sentences > 0
                THEN n_words * 1.0 / n_sentences END AS words_per_sentence,
           valid AND n_sentences > 0
             AND n_words >= {w.READ_MIN_WPS} * n_sentences
             AND n_words <= {w.READ_MAX_WPS} * n_sentences AS keep
    FROM c
    """


def c4_line_filter_sql(pages_glob: str) -> str:
    from .pipelines import webtext as w

    return f"""
    WITH f AS (
      SELECT url, text,
             coalesce(len(string_split(text, chr(10))), 0) AS n_lines,
             list_filter(string_split(text, chr(10)), x ->
                 regexp_matches(x, '{w.C4_TERMINAL_RE}')
                 AND len(regexp_extract_all(x, '{w.WORD_RE}')) >= {w.C4_MIN_LINE_WORDS}
                 AND NOT regexp_matches(x, '{w.C4_JAVASCRIPT_RE}')) AS kept
      FROM read_parquet('{pages_glob}')),
    c AS (
      SELECT url, text, n_lines, coalesce(len(kept), 0) AS n_kept,
             CASE WHEN text IS NULL THEN NULL
                  ELSE coalesce(array_to_string(kept, chr(10)), '') END AS clean_text
      FROM f)
    SELECT url, clean_text,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_kept AS BIGINT) AS n_kept,
           coalesce(text IS NOT NULL
             AND NOT regexp_matches(text, '{w.C4_LOREM_RE}')
             AND NOT contains(text, chr(123))
             AND NOT regexp_matches(text, '{w.BADWORD_RE}')
             AND len(regexp_extract_all(clean_text, '{w.SENTENCE_RE}'))
                   >= {w.C4_MIN_SENTENCES}, FALSE) AS keep
    FROM c
    """


def gopher_quality_flags_sql(pages_glob: str) -> str:
    from .pipelines import webtext as w

    return f"""
    WITH base AS (
      SELECT url, text,
        coalesce(len(regexp_extract_all(text, '{w.WORD_RE}')), 0) AS n_words,
        coalesce(len(regexp_extract_all(text, '{w.ALPHA_WORD_RE}')), 0) AS n_alpha,
        coalesce(len(regexp_extract_all(text, '{w.SYMBOL_RE}')), 0) AS n_sym,
        coalesce(len(regexp_extract_all(lower(text), '{w.GOPHER_STOPWORD_RE}')), 0) AS n_stop,
        coalesce(length(regexp_replace(text, '{w.WHITESPACE_RE}', '', 'g')), 0) AS wchars,
        string_split(text, chr(10)) AS ls
      FROM read_parquet('{pages_glob}')),
    lines AS (
      SELECT *, coalesce(len(ls), 0) AS n_lines,
        coalesce(len(list_filter(ls, x ->
            regexp_matches(x, '{w.BULLET_LINE_RE}'))), 0) AS n_bullet,
        coalesce(len(list_filter(ls, x ->
            regexp_matches(x, '{w.ELLIPSIS_LINE_RE}'))), 0) AS n_ellipsis
      FROM base),
    d AS (
      SELECT url, text, n_words, n_stop, n_lines,
        CASE WHEN n_words = 0 THEN NULL
             ELSE CAST(wchars AS DOUBLE) / n_words END AS mean_word_len,
        CASE WHEN n_words = 0 THEN NULL
             ELSE CAST(n_sym AS DOUBLE) / n_words END AS symbol_word_ratio,
        CASE WHEN n_words = 0 THEN NULL
             ELSE CAST(n_alpha AS DOUBLE) / n_words END AS frac_alpha_words,
        CASE WHEN n_lines = 0 THEN NULL
             ELSE CAST(n_bullet AS DOUBLE) / n_lines END AS frac_bullet_lines,
        CASE WHEN n_lines = 0 THEN NULL
             ELSE CAST(n_ellipsis AS DOUBLE) / n_lines END AS frac_ellipsis_lines
      FROM lines)
    SELECT url,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_stop AS BIGINT) AS n_stop,
           mean_word_len, symbol_word_ratio, frac_alpha_words,
           frac_bullet_lines, frac_ellipsis_lines,
           coalesce(text IS NOT NULL
             AND n_words BETWEEN {w.GOPHER_MIN_WORDS} AND {w.GOPHER_MAX_WORDS}
             AND mean_word_len >= {w.GOPHER_MEAN_LEN_LO}
             AND mean_word_len <= {w.GOPHER_MEAN_LEN_HI}
             AND symbol_word_ratio <= {w.GOPHER_MAX_SYMBOL_RATIO}
             AND frac_alpha_words >= {w.GOPHER_MIN_ALPHA_FRAC}
             AND n_stop >= {w.GOPHER_MIN_STOPWORDS}
             AND frac_bullet_lines <= {w.GOPHER_MAX_BULLET_FRAC}
             AND frac_ellipsis_lines <= {w.GOPHER_MAX_ELLIPSIS_FRAC},
             FALSE) AS gopher_keep
    FROM d
    """


def url_host_filter_sql(pages_glob: str) -> str:
    from .pipelines import webtext as w

    # DuckDB regexp_extract returns '' (not NULL) on no match -> nullif;
    # the AND chain goes NULL for unparsed hosts -> coalesce(..., FALSE)
    # matches the engine's plain-bool keep. Host normalization (strip
    # userinfo / digits-only port / FQDN trailing dot, lowercase)
    # mirrors webtext._url_keep: each pattern matches at most once, so
    # replace-first == replace-all.
    blocklist = ", ".join(f"'{h}'" for h in w.URL_HOST_BLOCKLIST)
    return f"""
    WITH d AS (
      SELECT url,
             nullif(lower(regexp_replace(regexp_replace(regexp_replace(
                 regexp_extract(url,
                     '^https?://({w.URL_HOST_CHARSET})', 1),
                 '^.*@', ''), ':[0-9]*$', ''), '\\.+$', '')), '') AS host
      FROM read_parquet('{pages_glob}'))
    SELECT url, host,
           coalesce(host IS NOT NULL
             AND host NOT IN ({blocklist})
             AND NOT regexp_matches(url, '{w.URL_BAD_EXT_RE}'),
             FALSE) AS keep
    FROM d
    """


def gopher_repetition_sql(pages_glob: str) -> str:
    from .pipelines import webtext as w

    dup_ns = tuple(sorted(w.REP_MAX_DUP_GRAM_FRAC))
    n_max = max(dup_ns)
    grams = "\n".join(
        f"    g{n} AS (SELECT rid, tok || ' ' || "
        + " || ' ' || ".join(f"t{k}" for k in range(1, n))
        + f" AS gram FROM wnd WHERE t{n-1} IS NOT NULL),"
        for n in sorted(set((2, 3, 4) + dup_ns)))
    leads = ",\n".join(
        f"             lead(tok, {k}) OVER win AS t{k}"
        for k in range(1, n_max))
    tops = "\n".join(
        f"""    top{n} AS (
      SELECT rid, cnt * length(gram) AS chars FROM (
        SELECT rid, gram, cnt, row_number() OVER (
            PARTITION BY rid ORDER BY cnt DESC, length(gram) ASC) AS rk
        FROM (SELECT rid, gram, count(*) AS cnt FROM g{n} GROUP BY 1, 2))
      WHERE rk = 1),"""
        for n in (2, 3, 4))
    dups = "\n".join(
        f"""    dup{n} AS (
      SELECT rid, sum(cnt * length(gram)) AS chars
      FROM (SELECT rid, gram, count(*) AS cnt FROM g{n} GROUP BY 1, 2)
      WHERE cnt >= 2 GROUP BY rid),"""
        for n in dup_ns)
    t = {n: w.REP_MAX_TOP_GRAM_FRAC[n] for n in (2, 3, 4)}
    dup_frac_cols = "\n".join(
        f"""        CASE WHEN coalesce(tc.total_chars, 0) = 0 THEN NULL
             ELSE LEAST(CAST(coalesce(d{n}.chars, 0) AS DOUBLE)
                          / tc.total_chars, 1.0)
             END AS frac_chars_dup_{n}grams,"""
        for n in dup_ns)
    dup_joins = "\n".join(
        f"      LEFT JOIN dup{n} d{n} USING (rid)" for n in dup_ns)
    dup_selects = ",\n".join(
        f"           frac_chars_dup_{n}grams" for n in dup_ns)
    dup_keeps = "\n".join(
        f"             AND frac_chars_dup_{n}grams <= "
        f"{w.REP_MAX_DUP_GRAM_FRAC[n]}" for n in dup_ns)
    # every aggregation keys on `rid` (filename:file_row_number — unique
    # per ROW), not url: the op is per-row and a corpus can legitimately
    # carry the same url twice (recrawls at different warc_ts)
    return f"""
    WITH base AS (
      SELECT url, text,
             filename || ':' || file_row_number AS rid,
             regexp_extract_all(lower(text), '{w.TOKEN_RE}') AS toks,
             string_split(text, chr(10)) AS ls,
             string_split(text, chr(10) || chr(10)) AS ps
      FROM read_parquet('{pages_glob}', filename=true, file_row_number=true)),
    tok AS (
      SELECT rid, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
      FROM base),
    tc AS (SELECT rid, sum(length(tok)) AS total_chars FROM tok GROUP BY rid),
    wnd AS (
      SELECT rid, tok,
{leads}
      FROM tok WINDOW win AS (PARTITION BY rid ORDER BY pos)),
{grams}
{tops}
{dups}
    ln AS (SELECT rid, unnest(ls) AS line FROM base),
    lc AS (SELECT rid, line, count(*) AS cnt, length(line) AS len
           FROM ln GROUP BY rid, line),
    lstat AS (
      SELECT rid, sum(cnt) AS n_lines, count(*) AS n_distinct,
             sum(cnt * len) AS line_chars,
             sum(CASE WHEN cnt >= 2 THEN cnt * len ELSE 0 END) AS dup_chars
      FROM lc GROUP BY rid),
    pn AS (SELECT rid, unnest(ps) AS para FROM base),
    pc AS (SELECT rid, para, count(*) AS cnt, length(para) AS len
           FROM pn GROUP BY rid, para),
    pstat AS (
      SELECT rid, sum(cnt) AS n_paras, count(*) AS n_distinct,
             sum(cnt * len) AS para_chars,
             sum(CASE WHEN cnt >= 2 THEN cnt * len ELSE 0 END) AS dup_chars
      FROM pc GROUP BY rid),
    d AS (
      SELECT b.url, b.text,
        CASE WHEN l.n_lines IS NULL THEN NULL
             ELSE CAST(l.n_lines - l.n_distinct AS DOUBLE) / l.n_lines
             END AS frac_dup_lines,
        CASE WHEN coalesce(l.line_chars, 0) = 0 THEN NULL
             ELSE CAST(l.dup_chars AS DOUBLE) / l.line_chars
             END AS frac_chars_dup_lines,
        CASE WHEN p.n_paras IS NULL THEN NULL
             ELSE CAST(p.n_paras - p.n_distinct AS DOUBLE) / p.n_paras
             END AS frac_dup_paragraphs,
        CASE WHEN coalesce(p.para_chars, 0) = 0 THEN NULL
             ELSE CAST(p.dup_chars AS DOUBLE) / p.para_chars
             END AS frac_chars_dup_paragraphs,
        CASE WHEN coalesce(tc.total_chars, 0) = 0 THEN NULL
             ELSE LEAST(CAST(coalesce(t2.chars, 0) AS DOUBLE)
                          / tc.total_chars, 1.0) END AS frac_chars_top_2gram,
        CASE WHEN coalesce(tc.total_chars, 0) = 0 THEN NULL
             ELSE LEAST(CAST(coalesce(t3.chars, 0) AS DOUBLE)
                          / tc.total_chars, 1.0) END AS frac_chars_top_3gram,
        CASE WHEN coalesce(tc.total_chars, 0) = 0 THEN NULL
             ELSE LEAST(CAST(coalesce(t4.chars, 0) AS DOUBLE)
                          / tc.total_chars, 1.0) END AS frac_chars_top_4gram,
{dup_frac_cols}
        b.rid AS rid
      FROM base b
      LEFT JOIN lstat l USING (rid)
      LEFT JOIN pstat p USING (rid)
      LEFT JOIN tc USING (rid)
      LEFT JOIN top2 t2 USING (rid)
      LEFT JOIN top3 t3 USING (rid)
      LEFT JOIN top4 t4 USING (rid)
{dup_joins})
    SELECT url, frac_dup_lines, frac_chars_dup_lines,
           frac_dup_paragraphs, frac_chars_dup_paragraphs,
           frac_chars_top_2gram, frac_chars_top_3gram, frac_chars_top_4gram,
{dup_selects},
           coalesce(text IS NOT NULL
             AND frac_dup_lines <= {w.REP_MAX_DUP_LINE_FRAC}
             AND frac_chars_dup_lines <= {w.REP_MAX_DUP_LINE_CHAR_FRAC}
             AND frac_dup_paragraphs <= {w.REP_MAX_DUP_PARA_FRAC}
             AND frac_chars_dup_paragraphs <= {w.REP_MAX_DUP_PARA_CHAR_FRAC}
             AND frac_chars_top_2gram <= {t[2]}
             AND frac_chars_top_3gram <= {t[3]}
             AND frac_chars_top_4gram <= {t[4]}
{dup_keeps},
             FALSE) AS repetition_keep
    FROM d
    """


def fineweb_quality_flags_sql(pages_glob: str) -> str:
    """FineWeb line-filter twin: lines from the SAME chr(10) split,
    terminal-punctuation via the SAME C4_TERMINAL_RE, lengths in chars
    (DuckDB length() == pyarrow utf8_length), dup-line chars via the
    lc/ldup pattern of the Gopher repetition twin. Every fraction is
    one int/int double division and the keep rule the SAME three
    integer cross-multiplies, so values are bit-identical."""
    from .pipelines import webtext as w

    return f"""
    WITH base AS (
      SELECT url, text, filename || ':' || file_row_number AS rid,
             string_split(text, chr(10)) AS ls
      FROM read_parquet('{pages_glob}', filename=true,
                        file_row_number=true)),
    ln AS (SELECT rid, unnest(ls) AS line FROM base),
    lagg AS (
      SELECT rid, count(*) AS n_lines,
             sum(CASE WHEN regexp_matches(line, '{w.C4_TERMINAL_RE}')
                      THEN 1 ELSE 0 END) AS n_punct,
             sum(CASE WHEN length(line) < {w.FINEWEB_SHORT_LINE_CHARS}
                      THEN 1 ELSE 0 END) AS n_short,
             sum(length(line)) AS line_chars
      FROM ln GROUP BY rid),
    lc AS (SELECT rid, line, count(*) AS cnt, length(line) AS len
           FROM ln GROUP BY rid, line),
    ldup AS (SELECT rid,
                    sum(CASE WHEN cnt >= 2 THEN cnt * len ELSE 0 END)
                      AS dup_chars
             FROM lc GROUP BY rid)
    SELECT b.url,
           CAST(l.n_lines AS BIGINT) AS n_lines,
           CAST(l.n_punct AS DOUBLE) / l.n_lines AS punct_line_frac,
           CAST(l.n_short AS DOUBLE) / l.n_lines AS short_line_frac,
           CASE WHEN coalesce(l.line_chars, 0) = 0 THEN NULL
                ELSE CAST(d.dup_chars AS DOUBLE) / l.line_chars
           END AS dup_line_char_frac,
           coalesce(b.text IS NOT NULL
             AND 100 * l.n_punct >= {w.FINEWEB_MIN_PUNCT_LINE_PCT} * l.n_lines
             AND 100 * l.n_short < {w.FINEWEB_MAX_SHORT_LINE_PCT} * l.n_lines
             AND (100 * d.dup_chars
                    < {w.FINEWEB_MAX_DUP_LINE_CHAR_PCT} * l.line_chars
                  OR l.line_chars = 0),
             FALSE) AS keep
    FROM base b
    LEFT JOIN lagg l USING (rid)
    LEFT JOIN ldup d USING (rid)
    """


def normalize_unicode_sql(pages_glob: str) -> str:
    """NFC-normalization twin over the same decomposed-recapture view:
    the decoration predicate is the SAME fnv1a64(url) % NFC_MOD and the
    suffix the SAME decomposed bytes (embedded verbatim — DuckDB string
    literals are byte-preserving), normalized by DuckDB's own
    nfc_normalize — an implementation of UAX #15 independent of the
    engine's unicodedata path, like the RE2-vs-RE2 rule banks."""
    from .pipelines import webtext as w

    return f"""
    WITH base AS (SELECT url, text, {fnv_expr('url')} AS h
                  FROM read_parquet('{pages_glob}')),
    dec AS (SELECT url,
                   CASE WHEN text IS NOT NULL AND h % {w.NFC_MOD} = 0
                        THEN text || '{w.NFC_SUFFIX}' ELSE text END AS t
            FROM base)
    SELECT url, nfc_normalize(t) AS text_nfc,
           coalesce(nfc_normalize(t) != t, FALSE) AS changed
    FROM dec
    """


def rule_bank_funnel_sql(pages_glob: str) -> str:
    """Funnel twin: each bank's keep comes from ITS OWN oracle builder
    nested as a subquery (same pattern constants, same thresholds —
    the five twins can never drift from the funnel), joined on url
    (unique per fixture row), first-fail CASE in the frozen
    FUNNEL_STAGES order, and a VALUES spine so zero-count stages are
    present on both sides."""
    from .pipelines import webtext as w

    spine = ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(w.FUNNEL_STAGES))
    return f"""
    WITH uf AS (SELECT url, coalesce(keep, FALSE) AS k_url
                FROM ({url_host_filter_sql(pages_glob)})),
    c4f AS (SELECT url, coalesce(keep, FALSE) AS k_c4
            FROM ({c4_line_filter_sql(pages_glob)})),
    gqf AS (SELECT url, coalesce(gopher_keep, FALSE) AS k_gopher
            FROM ({gopher_quality_flags_sql(pages_glob)})),
    repf AS (SELECT url, coalesce(repetition_keep, FALSE) AS k_rep
             FROM ({gopher_repetition_sql(pages_glob)})),
    qcf AS (SELECT url, coalesce(keep, FALSE) AS k_cls
            FROM ({quality_classifier_sql(pages_glob)})),
    base AS (SELECT url, text IS NULL AS is_null
             FROM read_parquet('{pages_glob}')),
    lab AS (
      SELECT CASE WHEN is_null THEN 0
                  WHEN NOT k_url THEN 1
                  WHEN NOT k_c4 THEN 2
                  WHEN NOT k_gopher THEN 3
                  WHEN NOT k_rep THEN 4
                  WHEN NOT k_cls THEN 5
                  ELSE 6 END AS stage_idx
      FROM base JOIN uf USING (url) JOIN c4f USING (url)
                JOIN gqf USING (url) JOIN repf USING (url)
                JOIN qcf USING (url)),
    cnt AS (SELECT stage_idx, count(*) AS n FROM lab GROUP BY 1)
    SELECT CAST(s.stage_idx AS BIGINT) AS stage_idx, s.drop_stage,
           CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_docs
    FROM (VALUES {spine}) s(stage_idx, drop_stage)
    LEFT JOIN cnt USING (stage_idx)
    ORDER BY s.stage_idx
    """


def url_snapshot_changes_sql(pages_glob: str) -> str:
    """Cross-snapshot change twin over the same deterministic union:
    the recrawl predicate and the change predicate are the SAME stable
    FNV-1a arithmetic, the mutation the SAME text || CHANGE_SUFFIX, and
    `changed` counts distinct text values with NULL as its own value
    (count(DISTINCT) skips NULLs -> add bool_or(text IS NULL))."""
    from .pipelines import webtext as w

    return f"""
    WITH base AS (SELECT url, text FROM read_parquet('{pages_glob}')),
    marked AS (SELECT url, text, {fnv_expr('url')} AS h FROM base),
    re AS (SELECT url,
                  CASE WHEN (h // {w.RECRAWL_MOD}) % 2 = 0
                            AND text IS NOT NULL
                       THEN text || '{w.CHANGE_SUFFIX}' ELSE text
                  END AS text
           FROM marked WHERE h % {w.RECRAWL_MOD} = 0),
    u AS (SELECT url, text FROM base
          UNION ALL SELECT url, text FROM re)
    SELECT url, CAST(count(*) AS BIGINT) AS n_snapshots,
           (count(DISTINCT text)
              + CASE WHEN bool_or(text IS NULL) THEN 1 ELSE 0 END) > 1
             AS changed
    FROM u GROUP BY url
    """


def remove_boilerplate_lines_sql(pages_glob: str) -> str:
    """Boilerplate-removal twin: the SAME normalized-host expression as
    url_host_filter_sql (coalesced to '' — unparsed hosts form one
    chrome group, as in the engine), the same chrome injection
    constants, distinct-page counts per EXACT (host, line), ANTI JOIN
    to drop boilerplate occurrences, ordered string_agg to reassemble.
    A page whose every line is chrome string_aggs to NULL -> coalesce
    to '' (Arrow binary_join of an empty list is ''); null text stays
    NULL via the outer CASE."""
    from .pipelines import webtext as w

    host = ("coalesce(nullif(lower(regexp_replace(regexp_replace("
            "regexp_replace(regexp_extract(url, "
            f"'^https?://({w.URL_HOST_CHARSET})', 1), "
            "'^.*@', ''), ':[0-9]*$', ''), '\\.+$', '')), ''), '')")
    return f"""
    WITH base AS (
      SELECT url, text, {host} AS host, {fnv_expr('url')} AS uh
      FROM read_parquet('{pages_glob}')),
    inj AS (
      SELECT url, text, host,
             CASE WHEN text IS NULL THEN NULL
                  ELSE host || '{w.BOILERPLATE_HEADER_SUFFIX}'
                       || chr(10) || text
                       || CASE WHEN uh % {w.FOOTER_MOD} = 0
                               THEN chr(10) || '{w.BOILERPLATE_FOOTER_PRE}'
                                    || host
                                    || '{w.BOILERPLATE_FOOTER_POST}'
                               ELSE '' END
             END AS itext
      FROM base),
    lines AS (
      SELECT url, host,
             unnest(split(itext, chr(10))) AS line,
             generate_subscripts(split(itext, chr(10)), 1) AS i
      FROM inj WHERE itext IS NOT NULL),
    bp AS (
      SELECT host, line
      FROM (SELECT host, line, count(DISTINCT url) AS c
            FROM lines GROUP BY 1, 2)
      WHERE c >= {w.BOILERPLATE_MIN_DOCS}),
    tot AS (SELECT url, count(*) AS n_tot FROM lines GROUP BY url),
    kept AS (
      SELECT url, count(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY i) AS clean
      FROM (SELECT * FROM lines ANTI JOIN bp USING (host, line))
      GROUP BY url)
    SELECT b.url,
           CASE WHEN b.text IS NULL THEN NULL
                ELSE coalesce(k.clean, '') END AS clean_text,
           CAST(coalesce(t.n_tot, 0) - coalesce(k.n_kept, 0) AS BIGINT)
             AS n_removed
    FROM base b LEFT JOIN tot t USING (url) LEFT JOIN kept k USING (url)
    """


def train_val_split_sql(pages_glob: str) -> str:
    """Holdout-split twin: the same mix64(fnv1a64(url)) % 100 assignment
    in HUGEINT. FNV is computed in ONE CTE column and mix64 applied to
    that column (inlining fnv into mix64's textual expansion would
    duplicate it ~100x)."""
    from .pipelines import webtext as w

    return f"""
    WITH f AS (SELECT lang, {fnv_expr('url')} AS f
               FROM read_parquet('{pages_glob}')),
    s AS (SELECT lang,
                 CASE WHEN {mix64_scalar('f')} % 100 < {w.VAL_PCT}
                      THEN 'val' ELSE 'train' END AS split
          FROM f)
    SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
    FROM s GROUP BY 1, 2
    """


def dedup_url_keep_latest_sql(pages_glob: str) -> str:
    """Keep-latest twin over the same deterministic two-crawl union:
    the recrawl predicate is the SAME stable FNV-1a (fnv_expr) mod
    RECRAWL_MOD, the shift the SAME exact INTERVAL 1 DAY at us
    precision, the winner a row_number over (warc_ts DESC)."""
    from .pipelines import webtext as w

    return f"""
    WITH base AS (SELECT url, warc_ts FROM read_parquet('{pages_glob}')),
    marked AS (SELECT url, warc_ts, {fnv_expr('url')} AS h FROM base),
    re AS (SELECT url, warc_ts + INTERVAL 1 DAY AS warc_ts
           FROM marked WHERE h % {w.RECRAWL_MOD} = 0),
    u AS (SELECT url, warc_ts FROM base
          UNION ALL SELECT url, warc_ts FROM re),
    r AS (SELECT url, warc_ts,
                 row_number() OVER (PARTITION BY url
                                    ORDER BY warc_ts DESC) AS rk,
                 count(*) OVER (PARTITION BY url) AS n
          FROM u)
    SELECT url, warc_ts, CAST(n AS BIGINT) AS n_snapshots
    FROM r WHERE rk = 1
    """


def calibrated_outlier_flags_sql(pages_glob: str) -> str:
    """Per-language percentile-band length flags twin. Float parity is
    EXACT by construction, no rounding: with DYADIC quantile positions
    (1/16, 15/16) over integer n_words every interpolation intermediate
    is an exactly-representable dyadic rational, so quantile_cont and
    the histogram-quantile produce bit-identical doubles regardless of
    evaluation order."""
    from .pipelines import webtext as w

    return f"""
    WITH f AS (
      SELECT url, lang, coalesce(lang, '') AS lang_key,
             CAST(len(regexp_extract_all(text, '{w.WORD_RE}')) AS BIGINT)
               AS n_words
      FROM read_parquet('{pages_glob}') WHERE text IS NOT NULL),
    q AS (
      SELECT lang_key, quantile_cont(n_words, {w.CAL_Q_LO!r}) AS lo,
             quantile_cont(n_words, {w.CAL_Q_HI!r}) AS hi
      FROM f GROUP BY lang_key)
    SELECT f.url, f.lang, f.n_words, q.lo, q.hi,
           (f.n_words < q.lo OR f.n_words > q.hi) AS is_outlier
    FROM f JOIN q USING (lang_key)
    """


def contamination_fraction_sql(eval_mod: int = 50,
                               frac_pct: int = 10) -> str:
    """Eval-overlap-fraction twin: distinct-trigram hit share per
    non-eval doc (string shingles end to end — value-checks the hash
    path). frac is one int/int double division in both engines; the
    label compare is integer cross-multiplied."""
    return f"""
    WITH {_SHINGLES},
    evs AS (SELECT DISTINCT e.sv FROM
            (SELECT unnest(s) AS sv FROM sh WHERE doc_id % {eval_mod} = 0) e),
    tr AS (SELECT doc_id, unnest(s) AS sv FROM sh WHERE doc_id % {eval_mod} != 0),
    tot AS (SELECT doc_id, CAST(coalesce(len(s), 0) AS BIGINT) AS n_shingles
            FROM sh WHERE doc_id % {eval_mod} != 0),
    ov AS (SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
           FROM tr JOIN evs USING (sv) GROUP BY 1)
    SELECT t.doc_id, t.n_shingles,
           coalesce(o.n_overlap, 0::BIGINT) AS n_overlap,
           CASE WHEN t.n_shingles > 0
                THEN CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / t.n_shingles
                ELSE 0.0 END AS frac,
           (100 * coalesce(o.n_overlap, 0) >= {frac_pct} * t.n_shingles
            AND t.n_shingles > 0) AS contaminated
    FROM tot t LEFT JOIN ov o USING (doc_id)
    """


def exact_budget_sample_sql(pct: int = 17) -> str:
    """Exact-count stratified sample twin: the same largest-remainder
    allocation (integer arithmetic end to end) and the same splitmix64
    within-source order recomputed as a row_number rank."""
    mix = mix64_scalar("CAST(doc_id AS HUGEINT)")
    return f"""
    WITH d AS (SELECT doc_id, lang, source, {mix} AS u FROM documents),
    c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
          FROM d GROUP BY source),
    alloc0 AS (SELECT source, n_s, n_s * {pct} // 100 AS k0,
                      n_s * {pct} % 100 AS rem FROM c),
    consts AS (SELECT (SELECT sum(n_s) FROM c) * {pct} // 100
                      - (SELECT sum(k0) FROM alloc0) AS leftover),
    ordered AS (SELECT *, row_number() OVER
                  (ORDER BY rem DESC, source ASC NULLS LAST) AS rr
                FROM alloc0),
    alloc AS (SELECT source,
                     k0 + CASE WHEN rr <= (SELECT leftover FROM consts)
                               THEN 1 ELSE 0 END AS k
              FROM ordered),
    r AS (SELECT doc_id, lang, source,
                 row_number() OVER (PARTITION BY source ORDER BY u) AS rk
          FROM d)
    SELECT r.doc_id, r.lang, r.source
    FROM r JOIN alloc ON r.source IS NOT DISTINCT FROM alloc.source
    WHERE r.rk <= alloc.k
    """


def canonical_url_dedup_sql(pages_glob: str) -> str:
    """Canonical-url first-capture twin over the same deterministic
    decorated-recapture union: the decoration predicate is the SAME
    stable FNV-1a mod DECOR_MOD (utm vs fragment variant picked by
    (h // DECOR_MOD) % 2), the canonicalizer the SAME RE2 chain
    (fragment strip, utm_* param strip, dangling-separator tidy) via
    regexp_replace(..., 'g')."""
    from .pipelines import webtext as w

    canon = (f"regexp_replace(regexp_replace(regexp_replace(url, "
             f"'{w.CANON_FRAG_RE}', ''), "
             f"'{w.CANON_UTM_RE}', '', 'g'), "
             f"'{w.CANON_DANGLING_RE}', '')")
    return f"""
    WITH base AS (SELECT url, warc_ts FROM read_parquet('{pages_glob}')),
    marked AS (SELECT url, warc_ts, {fnv_expr('url')} AS h FROM base),
    re AS (SELECT url || CASE WHEN (h // {w.DECOR_MOD}) % 2 = 0
                              THEN '{w.DECOR_UTM_SUFFIX}'
                              ELSE '{w.DECOR_FRAG_SUFFIX}' END AS url,
                  warc_ts + INTERVAL 1 DAY AS warc_ts
           FROM marked WHERE h % {w.DECOR_MOD} = 0),
    u AS (SELECT url, warc_ts FROM base
          UNION ALL SELECT url, warc_ts FROM re),
    c AS (SELECT {canon} AS url, warc_ts FROM u),
    r AS (SELECT url, warc_ts,
                 row_number() OVER (PARTITION BY url
                                    ORDER BY warc_ts ASC) AS rk,
                 count(*) OVER (PARTITION BY url) AS n
          FROM c)
    SELECT url, warc_ts AS first_ts, CAST(n AS BIGINT) AS n_captures
    FROM r WHERE rk = 1
    """


def ngram_fluency_sql(train_mod: int = 2, n: int = 3,
                      pct: int = 40) -> str:
    """n-gram-fluency twin: the table is fit as distinct STRING n-grams
    of the training split (value-checks the hash path end to end);
    scoring counts position-level occurrences (no list_distinct — every
    repeated known transition counts). frac is one int/int double
    division; the label is integer cross-multiplied."""
    join = " || ' ' || ".join(f"lst[i+{j}]" if j else "lst[i]"
                              for j in range(n))
    return f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS lst
      FROM documents),
    bg AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(len(lst)-{n-1}, 0)),
                            i -> {join}) AS b
      FROM toks),
    train AS (SELECT DISTINCT t.bv FROM
              (SELECT unnest(b) AS bv FROM bg
               WHERE doc_id % {train_mod} = 0) t),
    held AS (SELECT doc_id, unnest(b) AS bv FROM bg
             WHERE doc_id % {train_mod} != 0),
    tot AS (SELECT doc_id, CAST(coalesce(len(b), 0) AS BIGINT) AS n_ngrams
            FROM bg WHERE doc_id % {train_mod} != 0),
    hits AS (SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_known
             FROM held h JOIN train USING (bv) GROUP BY 1)
    SELECT t.doc_id, t.n_ngrams,
           coalesce(k.n_known, 0::BIGINT) AS n_known,
           CASE WHEN t.n_ngrams > 0
                THEN CAST(coalesce(k.n_known, 0) AS DOUBLE) / t.n_ngrams
                ELSE 0.0 END AS frac,
           (100 * coalesce(k.n_known, 0) >= {pct} * t.n_ngrams
            AND t.n_ngrams > 0) AS fluent
    FROM tot t LEFT JOIN hits k USING (doc_id)
    """


def extract_page_metadata_sql(pages_glob: str) -> str:
    """Page-metadata twin: the SAME RE2 constants via regexp_extract
    (guarded to NULL-on-no-match — DuckDB's bare regexp_extract returns
    '' there), len(regexp_extract_all) for the link count, octet_length
    for the raw size."""
    from .pipelines import webtext as w

    return f"""
    SELECT url,
           CASE WHEN regexp_matches(CAST(html AS VARCHAR), '{w.TITLE_RE}')
                THEN regexp_extract(CAST(html AS VARCHAR), '{w.TITLE_RE}', 1)
                ELSE NULL END AS title,
           CAST(coalesce(len(regexp_extract_all(
                CAST(html AS VARCHAR), '{w.LINK_RE}')), 0) AS BIGINT)
             AS n_links,
           CAST(coalesce(octet_length(html), 0) AS BIGINT) AS html_bytes
    FROM read_parquet('{pages_glob}')
    """


def top_dup_windows_sql(window_tokens: int = 8, k: int = 20) -> str:
    """Top-duplicated-windows twin: the dup_window_fraction window CTEs,
    grouped by window text, total-ordered (n_occurrences DESC, n_docs
    DESC, wtext ASC) so the k-boundary is deterministic."""
    w1 = window_tokens - 1
    return rf"""
    WITH tl AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts
      FROM documents),
    win AS (
      SELECT doc_id, array_to_string(ts[i:i+{w1}], ' ') AS wtext
      FROM tl CROSS JOIN
           unnest(generate_series(1, coalesce(len(ts), 0) - {w1})) AS u(i)),
    stats AS (
      SELECT wtext, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_occurrences
      FROM win GROUP BY wtext HAVING count(DISTINCT doc_id) >= 2)
    SELECT wtext, n_docs, n_occurrences FROM stats
    ORDER BY n_occurrences DESC, n_docs DESC, wtext LIMIT {k}
    """


def source_divergence_tv_sql() -> str:
    """Per-source unigram total-variation twin: same integer-cleared
    numerator (present-token |c*N - C_t*N_s| sum + absent-token mass
    N_s*(N - sum of present C_t)), one BIGINT->DOUBLE cast pair and one
    division — bit-identical to the numpy side (the TV-not-KL house
    float-parity rule: libm ln() differs across engines, integer
    ratios do not)."""
    return """
    WITH toks AS (
      SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents),
    c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
          FROM toks GROUP BY 1, 2),
    ct AS (SELECT tok, CAST(sum(cnt) AS BIGINT) AS ctot FROM c GROUP BY 1),
    ns AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens
           FROM c GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS ntot FROM c),
    pres AS (
      SELECT c.source,
             CAST(sum(abs(c.cnt * tot.ntot - ct.ctot * ns.n_tokens))
                  AS BIGINT) AS sabs,
             CAST(sum(ct.ctot) AS BIGINT) AS sctot
      FROM c JOIN ct USING (tok) JOIN ns ON ns.source = c.source
      CROSS JOIN tot GROUP BY 1)
    SELECT ns.source, ns.n_tokens,
           CAST(p.sabs + ns.n_tokens * (tot.ntot - p.sctot) AS DOUBLE)
           / CAST(2 * ns.n_tokens * tot.ntot AS DOUBLE) AS tv
    FROM ns JOIN pres p USING (source) CROSS JOIN tot
    ORDER BY ns.source
    """


def source_overlap_matrix_sql() -> str:
    """Cross-source shared-shingle matrix twin: hash-free — DISTINCT
    (source, shingle-text) rows self-joined on the shingle with
    source_a < source_b (the Ray side counts distinct shared HASHES;
    1:1 up to the documented fnv collision bound)."""
    return f"""
    WITH {_SHINGLES},
    ss AS (SELECT DISTINCT source, sv
           FROM (SELECT source, unnest(s) AS sv FROM sh))
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM ss a JOIN ss b ON a.sv = b.sv AND a.source < b.source
    GROUP BY 1, 2 ORDER BY 1, 2
    """


def interleave_sources_sql() -> str:
    """Weighted-fair-queueing interleave twin: the virtual-time key
    rn * (6 / w) computed with the SAME fnv-derived weights, globally
    ordered by row_number() OVER (ORDER BY key, source) — the naive
    global sort whose closed-form the Ray side evaluates instead."""
    return f"""
    WITH w AS (SELECT source,
                      CAST(6 // (1 + {fnv_expr('source')} % 3) AS BIGINT)
                        AS step
               FROM (SELECT DISTINCT source FROM documents)),
    r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY doc_id) AS rn
          FROM documents),
    k AS (SELECT r.doc_id, r.source, r.rn * w.step AS key
          FROM r JOIN w USING (source))
    SELECT CAST(row_number() OVER (ORDER BY key, source) AS BIGINT)
             AS position,
           doc_id, source
    FROM k ORDER BY position
    """


def funnel_conversion_sql(first_stage: str = "signup",
                          second_stage: str = "purchase") -> str:
    """Conversion-funnel twin: first-stage min(ts) per user, EXISTS a
    strictly-later second-stage event; all three counters exact BIGINT
    (coalesce guards the empty-funnel NULL scalar)."""
    return f"""
    WITH su AS (SELECT user_id, min(ts) AS mts FROM events
                WHERE event_type = '{first_stage}' GROUP BY 1),
    conv AS (SELECT count(DISTINCT e.user_id) AS c
             FROM events e JOIN su USING (user_id)
             WHERE e.event_type = '{second_stage}' AND e.ts > su.mts)
    SELECT CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
             AS n_users,
           CAST((SELECT count(*) FROM su) AS BIGINT) AS n_signed_up,
           CAST(coalesce((SELECT c FROM conv), 0) AS BIGINT)
             AS n_converted
    """


def retention_cohorts_sql(stage: str = "signup") -> str:
    """Retention-triangle twin: epoch-week cohorts from min(stage ts)
    per user, distinct (user, activity-week) pairs, plain counts —
    identical integer week arithmetic (epoch_us // one week)."""
    return f"""
    WITH su AS (SELECT user_id, min(ts) AS mts FROM events
                WHERE event_type = '{stage}' GROUP BY 1),
    act AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 604800000000 AS aw
            FROM events),
    sel AS (SELECT a.user_id,
                   epoch_us(su.mts) // 604800000000 AS cw, a.aw
            FROM act a JOIN su USING (user_id))
    SELECT CAST(cw AS BIGINT) AS cohort_week,
           CAST(aw - cw AS BIGINT) AS weeks_since,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM sel WHERE aw >= cw
    GROUP BY 1, 2 ORDER BY 1, 2
    """


def _link_edges_ctes(pages_glob: str) -> str:
    """CTE block ending in `edges` (src_host, dst_host, n_links): the
    decorated-outlink view + anchor extraction re-expressed in SQL —
    the SAME fnv1a64 / splitmix64 HUGEINT arithmetic picks k = 1 + h %
    LINK_OUT_MOD appended anchors per page (the j-th pointing at host
    mix64(h + j + LINK_SALT) % LINK_HOST_SPACE), then the decorated
    bytes are genuinely parsed: regexp_extract_all over the anchor
    opener, relative hrefs resolved against the page's own host."""
    from .pipelines import webtext as w

    hs = (f"list_transform(generate_series(0, CAST(h % {w.LINK_OUT_MOD} "
          f"AS BIGINT)), j -> (h + j) % {M64})")
    anchor = (f"'<a href=\"https://host' || "
              f"lpad(CAST(ml[i] % {w.LINK_HOST_SPACE} AS VARCHAR), 3, '0')"
              f" || '.example/o/' || CAST(i-1 AS VARCHAR) || '\">r</a>'")
    return f"""
    base AS (
      -- decode(), not CAST(html AS VARCHAR): the cast renders quotes
      -- and newlines as \\x22 / \\x0A escapes, silently hiding every
      -- <a href="..."> from the regex
      SELECT url, decode(html) AS hs, {fnv_expr('url')} AS h
      FROM read_parquet('{pages_glob}') WHERE html IS NOT NULL),
    deco AS (
      SELECT url, hs, {mixed_list(hs, w.LINK_SALT)} AS ml FROM base),
    anch AS (
      SELECT url, hs || array_to_string(
        list_transform(generate_series(1, len(ml)), i -> {anchor}),
        '') AS dec
      FROM deco),
    hrefs AS (
      SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS src_host,
             unnest(regexp_extract_all(dec, '{w.LINK_HREF_RE}', 1)) AS href
      FROM anch),
    resolved AS (
      SELECT src_host,
             CASE WHEN href LIKE '/%' THEN src_host
                  ELSE regexp_extract(href, '{w.LINK_ABS_HOST_RE}', 1)
             END AS dst_host
      FROM hrefs),
    edges AS (
      SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
      FROM resolved
      WHERE dst_host IS NOT NULL AND dst_host != ''
      GROUP BY 1, 2)"""


def extract_links_sql(pages_glob: str) -> str:
    """Outlink-extraction twin: the decorated-anchor edge CTEs verbatim."""
    return f"""
    WITH {_link_edges_ctes(pages_glob)}
    SELECT src_host, dst_host, n_links FROM edges
    """


def noindex_filter_sql(pages_glob: str) -> str:
    """Meta-robots gate twin over the same decorated-head view: the
    decoration predicate is the SAME mix64(fnv(url) + SALT) chain (fnv
    materialized ONCE in a CTE column — inlining it into mix64_scalar's
    textual expansion duplicates it ~100x), the appended tag the SAME
    constants, and the scan the SAME RE2 patterns over decode(html)
    (decode, NOT CAST: casting a BLOB renders quotes as \\x22 escapes
    and silently hides every quoted attribute from the regex)."""
    from .pipelines import webtext as w

    mix = mix64_scalar(f"(f + {w.NOINDEX_SALT}::HUGEINT) % {M64}")
    return f"""
    WITH base AS (SELECT url, html, {fnv_expr('url')} AS f
                  FROM read_parquet('{pages_glob}')),
    m AS (SELECT url, html, {mix} AS h FROM base),
    dec AS (SELECT url,
                   CASE WHEN html IS NULL THEN NULL
                        WHEN h % {w.NOINDEX_MOD} = 0
                        THEN decode(html) ||
                             (CASE WHEN (h // {w.NOINDEX_MOD}) % 2 = 0
                                   THEN '{w.ROBOTS_NOINDEX_TAG}'
                                   ELSE '{w.ROBOTS_NOFOLLOW_TAG}' END)
                        ELSE decode(html) END AS d
            FROM m)
    SELECT url,
           coalesce(regexp_matches(d, '{w.ROBOTS_NOINDEX_RE}'),
                    FALSE) AS noindex,
           coalesce(regexp_matches(d, '{w.ROBOTS_NOFOLLOW_RE}'),
                    FALSE) AS nofollow,
           coalesce(NOT regexp_matches(d, '{w.ROBOTS_NOINDEX_RE}'),
                    FALSE) AS keep
    FROM dec
    """


def host_pagerank_sql(pages_glob: str, n_iter: int = 3) -> str:
    """Host-PageRank twin: the SAME integer fixed-point damped power
    iteration, unrolled as one CTE pair per iteration over the edge
    CTEs — per-edge floor((rank * w) / outw) contributions summed per
    destination, then rank <- BASE + (85 * inflow) // 100. All HUGEINT
    floor arithmetic, so every intermediate matches the engine's int64
    numpy bit for bit (values stay far below 2^63 by SCALE choice);
    dangling-host mass is dropped on both sides."""
    from .pipelines import webtext as w

    iters = []
    for k in range(1, n_iter + 1):
        iters.append(f"""
    c{k} AS (
      SELECT e.dst_host AS host,
             sum((r.rank * e.n_links::HUGEINT) // o.outw) AS s
      FROM ce e JOIN r{k - 1} r ON r.host = e.src_host
                JOIN ow o ON o.host = e.src_host
      GROUP BY 1),
    r{k} AS (
      SELECT n.host,
             ({w.PAGERANK_BASE}::HUGEINT
              + ({w.PAGERANK_DAMP_NUM} * coalesce(c.s, 0))
                // {w.PAGERANK_DAMP_DEN}) AS rank
      FROM nodes n LEFT JOIN c{k} c USING (host))""")
    return f"""
    WITH {_link_edges_ctes(pages_glob)},
    ce AS (SELECT * FROM edges WHERE src_host <> dst_host),
    nodes AS (SELECT src_host AS host FROM ce
              UNION SELECT dst_host FROM ce),
    ow AS (SELECT src_host AS host, sum(n_links)::HUGEINT AS outw
           FROM ce GROUP BY 1),
    r0 AS (SELECT host, {w.PAGERANK_SCALE}::HUGEINT AS rank FROM nodes),
    {','.join(iters)}
    SELECT host, CAST(rank AS BIGINT) AS rank FROM r{n_iter}
    """


def host_rank_filter_sql(pages_glob: str, pct: int = 25,
                         n_iter: int = 3) -> str:
    """Rank-gate twin: the host_pagerank CTEs + the ceil(pct*n/100)-th
    smallest-rank order statistic (integer arithmetic, row_number — no
    interpolation) + a LEFT JOIN of every page's host against the rank
    table, coalesced to rank 0 / keep false for unranked hosts."""
    pr = host_pagerank_sql(pages_glob, n_iter=n_iter)
    # reuse the full pagerank statement as a subquery (it is already a
    # single WITH ... SELECT): DuckDB allows WITH r AS (<stmt>) nesting
    return f"""
    WITH ranks AS ({pr}),
    thr AS (
      SELECT rank AS t FROM
        (SELECT rank, row_number() OVER (ORDER BY rank) AS rn,
                count(*) OVER () AS n
         FROM ranks)
      WHERE rn = greatest(({pct} * n + 99) // 100, 1)),
    pages AS (
      SELECT url, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
      FROM read_parquet('{pages_glob}'))
    SELECT p.url, p.host,
           coalesce(r.rank, 0::BIGINT) AS rank,
           (r.rank IS NOT NULL
            AND r.rank >= (SELECT t FROM thr)) AS keep
    FROM pages p LEFT JOIN ranks r ON r.host = p.host
    """


def host_components_sql(pages_glob: str, min_links: int = 2) -> str:
    """Mutual-strong-link host-components twin: the link-edge CTEs, a
    reciprocity self-join (both directions >= min_links on their own),
    then the recursive min-label walk the near-dup cluster twins use,
    with the component id as the lexicographically smallest host (min
    over VARCHAR — the engine's sorted-unique int mapping preserves
    exactly this order)."""
    return f"""
    WITH RECURSIVE {_link_edges_ctes(pages_glob)},
    ce AS (SELECT src_host, dst_host, n_links FROM edges
           WHERE src_host <> dst_host AND n_links >= {min_links}),
    rec AS (SELECT a.src_host AS s, a.dst_host AS d
            FROM ce a JOIN ce b ON a.src_host = b.dst_host
                              AND a.dst_host = b.src_host
            WHERE a.src_host < a.dst_host),
    ue AS (SELECT s AS src, d AS dst FROM rec
           UNION ALL SELECT d, s FROM rec),
    walk(node, label) AS (
      SELECT DISTINCT src, src FROM ue
      UNION
      SELECT e.dst, w.label FROM walk w JOIN ue e ON e.src = w.node)
    SELECT node AS host, min(label) AS component FROM walk GROUP BY node
    """


def extraction_yield_sql(pages_glob: str) -> str:
    """Extraction-yield twin: strlen(text) is BYTE length in DuckDB and
    octet_length over the html BLOB the raw byte count — the same two
    integers pyarrow's binary_length kernels produce, so the single
    int/int double division is bit-identical. The keep gate embeds the
    SAME YIELD_NUM/YIELD_DEN integer cross-multiply."""
    from .pipelines import webtext as w

    ok = "(text IS NOT NULL AND html IS NOT NULL AND octet_length(html) > 0)"
    return f"""
    SELECT url,
           CAST(strlen(text) AS BIGINT) AS text_bytes,
           CAST(octet_length(html) AS BIGINT) AS html_bytes,
           CASE WHEN {ok}
                THEN CAST(strlen(text) AS DOUBLE) / octet_length(html)
           END AS yield_ratio,
           ({ok} AND {w.YIELD_DEN} * strlen(text)
                     >= {w.YIELD_NUM} * octet_length(html)) AS keep
    FROM read_parquet('{pages_glob}')
    """


def dedup_normalized_sql(pages_glob: str) -> str:
    """Normalized-exact-dedup twin over the same deterministic
    perturbed-recapture union: the recapture predicate is the SAME
    stable FNV-1a mod NORMDUP_MOD, the reflow the SAME
    uppercase/doubled-space/suffix construction, and the normalization
    the SAME lower -> collapse NORM_COLLAPSE_RE -> trim chain."""
    from .pipelines import webtext as w

    norm = (f"trim(regexp_replace(lower(text), "
            f"'{w.NORM_COLLAPSE_RE}', ' ', 'g'))")
    return f"""
    WITH base AS (SELECT url, warc_ts, text FROM read_parquet('{pages_glob}')
                  WHERE text IS NOT NULL),
    marked AS (SELECT url, warc_ts, text, {fnv_expr('url')} AS h FROM base),
    re AS (SELECT url || '{w.NORMDUP_URL_SUFFIX}' AS url,
                  warc_ts + INTERVAL 1 DAY AS warc_ts,
                  replace(upper(text), ' ', '  ')
                    || '{w.NORMDUP_TEXT_SUFFIX}' AS text
           FROM marked WHERE h % {w.NORMDUP_MOD} = 0),
    u AS (SELECT url, warc_ts, text FROM base
          UNION ALL SELECT url, warc_ts, text FROM re),
    n AS (SELECT url, warc_ts, {norm} AS norm FROM u),
    f AS (SELECT * FROM n WHERE norm != ''),
    r AS (SELECT url, warc_ts,
                 row_number() OVER (PARTITION BY norm
                                    ORDER BY warc_ts ASC, url ASC) AS rk,
                 count(*) OVER (PARTITION BY norm) AS cnt
          FROM f)
    SELECT url, warc_ts AS first_ts, CAST(cnt AS BIGINT) AS n_variants
    FROM r WHERE rk = 1
    """


def lang_confusion_sql(pages_glob: str) -> str:
    """Declared-vs-predicted language confusion-matrix twin: the SAME
    frozen vocab-profile classifier CTEs (_langid_pred_ctes) over the
    pages corpus (url aliased as doc_id), grouped on the raw pair —
    NULL declared langs and NULL predictions (null text) are real
    matrix cells, not dropped rows."""
    return f"""
    WITH pages AS (SELECT url AS doc_id, text, lang
                   FROM read_parquet('{pages_glob}')),
    {_langid_pred_ctes(src="pages")}
    SELECT p.lang AS lang_declared, lp.lang_pred,
           CAST(count(*) AS BIGINT) AS n_pages
    FROM pages p JOIN langpred lp USING (doc_id)
    GROUP BY 1, 2
    """


def pii_density_by_host_sql(pages_glob: str) -> str:
    """Host-level PII-density twin: the SAME frozen scrub-pattern count
    expressions as pii_counts_sql, grouped on the simple host capture
    (the audit's host key is functions.urls.host_of_urls — the raw
    ^scheme://host extract, NOT url_host_filter's normalized form);
    rates are int/int double divisions."""
    from .stages.scrub import SCRUB_PATTERNS

    total = " + ".join(
        f"coalesce(len(regexp_extract_all(text, '{pat}')), 0)"
        for _name, pat, _repl in SCRUB_PATTERNS)
    return f"""
    WITH c AS (
      SELECT nullif(regexp_extract(url, '^[a-z]+://([^/]+)', 1), '') AS host,
             {total} AS n_pii
      FROM read_parquet('{pages_glob}'))
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(count(*) FILTER (WHERE n_pii > 0) AS BIGINT)
             AS n_pages_with_pii,
           CAST(sum(n_pii) AS BIGINT) AS n_pii_total,
           CAST(count(*) FILTER (WHERE n_pii > 0) AS DOUBLE) / count(*)
             AS pii_rate,
           CAST(sum(n_pii) AS DOUBLE) / count(*) AS pii_per_page
    FROM c GROUP BY host
    """


def crawl_drift_sql(pages_glob: str) -> str:
    """Capture-hour drift-report twin: the bucket is an integer floor
    division of the epoch-microsecond timestamp (epoch_us // 3.6e9 —
    the same int the engine computes from the cast Arrow column); byte
    lengths via strlen (bytes in DuckDB); the mean is one int/int
    double division, NULL for textless buckets."""
    return f"""
    WITH b AS (SELECT epoch_us(warc_ts) // 3600000000 AS bucket_hour, text
               FROM read_parquet('{pages_glob}'))
    SELECT bucket_hour,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(count(text) AS BIGINT) AS n_text,
           CAST(coalesce(sum(strlen(text)), 0) AS BIGINT)
             AS total_text_bytes,
           CASE WHEN count(text) > 0
                THEN CAST(sum(strlen(text)) AS DOUBLE) / count(text)
           END AS mean_text_bytes
    FROM b GROUP BY bucket_hour
    """


def dedup_normalized_rows_sql(pages_glob: str) -> str:
    """Per-page label twin of dedup_normalized_sql: same decorated
    union + normalization; keep = NOT(in-scope AND non-first capture);
    out-of-scope rows (null text / empty norm) keep TRUE."""
    from .pipelines import webtext as w

    norm = (f"trim(regexp_replace(lower(text), "
            f"'{w.NORM_COLLAPSE_RE}', ' ', 'g'))")
    return f"""
    WITH base AS (SELECT url, warc_ts, text FROM read_parquet('{pages_glob}')),
    marked AS (SELECT url, warc_ts, text, {fnv_expr('url')} AS h FROM base
               WHERE text IS NOT NULL),
    re AS (SELECT url || '{w.NORMDUP_URL_SUFFIX}' AS url,
                  warc_ts + INTERVAL 1 DAY AS warc_ts,
                  replace(upper(text), ' ', '  ')
                    || '{w.NORMDUP_TEXT_SUFFIX}' AS text
           FROM marked WHERE h % {w.NORMDUP_MOD} = 0),
    u AS (SELECT url, warc_ts, text FROM base
          UNION ALL SELECT url, warc_ts, text FROM re),
    n AS (SELECT url, warc_ts,
                 CASE WHEN text IS NULL THEN NULL ELSE {norm} END AS norm
          FROM u),
    r AS (SELECT url, norm,
                 row_number() OVER (PARTITION BY norm
                                    ORDER BY warc_ts ASC, url ASC) AS rk
          FROM n WHERE norm IS NOT NULL AND norm != '')
    SELECT n.url,
           coalesce(NOT (r.rk > 1), TRUE) AS keep,
           CASE WHEN r.url IS NOT NULL
                THEN {hex16(fnv_expr('r.norm'))} END AS norm_hash
    FROM n LEFT JOIN r ON n.url = r.url
    """


def _kmeans_ctes(k: int | None = None, iters: int | None = None) -> str:
    """Shared CTE block for the integer fixed-point k-means twins: the
    SAME quantization (floor(x * 2^20) — an exact power-of-two scale),
    init (k smallest vec_ids), assignment (min int64 squared L2, ties
    to the lowest cid via row_number) and centroid update (truncating
    `//` division; DuckDB truncates toward zero, which the engine
    mirrors with sign(s)*(|s|//n)) as pipelines.docs._kmeans_fit, one
    CTE pair per Lloyd round (the host_pagerank unrolling precedent).
    asg{iters+1} holds the final assignment under the updated
    centroids."""
    from .pipelines import docs as d

    k = d.KMEANS_K if k is None else k
    iters = d.KMEANS_ITERS if iters is None else iters
    parts = [f"""
    q AS (
      SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor(x * {float(d.KMEANS_SCALE)}) AS BIGINT)) AS q
      FROM embeddings WHERE embedding IS NOT NULL),
    c0 AS (
      SELECT rn - 1 AS cid, q AS c FROM
        (SELECT vec_id, q, row_number() OVER (ORDER BY vec_id) AS rn FROM q)
      WHERE rn <= {k}),
    qd AS (
      SELECT vec_id, unnest(q) AS val, generate_subscripts(q, 1) AS d
      FROM q)"""]
    for i in range(1, iters + 2):
        parts.append(f"""
    d{i} AS (
      SELECT v.vec_id, c.cid,
             list_sum(list_transform(list_zip(v.q, c.c),
                      p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
      FROM q v CROSS JOIN c{i-1} c),
    asg{i} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM d{i}) WHERE rn = 1)""")
        if i <= iters:
            parts.append(f"""
    u{i} AS (
      SELECT a.cid, u.d, sum(u.val) AS s, count(*) AS n
      FROM asg{i} a JOIN qd u USING (vec_id)
      GROUP BY 1, 2),
    nc{i} AS (
      SELECT cid, list(CAST(s // n AS BIGINT) ORDER BY d) AS c
      FROM u{i} GROUP BY cid),
    c{i} AS (
      SELECT p.cid, coalesce(nn.c, p.c) AS c
      FROM c{i-1} p LEFT JOIN nc{i} nn USING (cid))""")
    return ",".join(parts)


def embedding_kmeans_sql(k: int | None = None, iters: int | None = None) -> str:
    """Integer k-means twin: final assignment + exact int64 squared
    distance after the unrolled Lloyd rounds."""
    from .pipelines import docs as d

    iters = d.KMEANS_ITERS if iters is None else iters
    return f"""
    WITH {_kmeans_ctes(k, iters)}
    SELECT vec_id, cid AS cluster_id, CAST(dist AS BIGINT) AS dist
    FROM asg{iters + 1}
    """


def semdedup_sql(threshold: float | None = None, k: int | None = None,
                 iters: int | None = None) -> str:
    """SemDeDup twin: k-means CTEs + a correlated NOT EXISTS over
    same-cluster lower-id neighbors. The cosine is the engine's exact
    recipe — integer dot / sqrt(double(na) * double(nb)) — so the
    threshold compare sees bit-identical doubles; zero-norm vectors are
    excluded from matching on both sides (always kept)."""
    from .pipelines import docs as d

    threshold = (d.SEMDEDUP_SIM_THRESHOLD if threshold is None
                 else threshold)
    iters = d.KMEANS_ITERS if iters is None else iters
    return f"""
    WITH {_kmeans_ctes(k, iters)},
    qa AS (
      SELECT a.vec_id, a.cid, v.q,
             list_sum(list_transform(v.q, x -> x*x)) AS na
      FROM asg{iters + 1} a JOIN q v USING (vec_id))
    SELECT a.vec_id, a.cid AS cluster_id,
           NOT EXISTS (
             SELECT 1 FROM qa b
             WHERE b.cid = a.cid AND b.vec_id < a.vec_id
               AND a.na > 0 AND b.na > 0
               AND CAST(list_sum(list_transform(list_zip(a.q, b.q),
                        p -> p[1]*p[2])) AS DOUBLE)
                   / sqrt(CAST(a.na AS DOUBLE) * CAST(b.na AS DOUBLE))
                   >= {threshold}
           ) AS keep
    FROM qa a
    """


def cluster_cap_sample_sql(m: int | None = None, k: int | None = None,
                           iters: int | None = None) -> str:
    """Cluster-cap twin: k-means CTEs + row_number over the SAME
    splitmix64(vec_id) order within each final cluster (keys are
    distinct — mix64 is a bijection — so rn <= m equals the engine's
    key <= m-th-smallest-key threshold exactly)."""
    from .pipelines import docs as d

    m = d.CLUSTER_CAP_M if m is None else m
    iters = d.KMEANS_ITERS if iters is None else iters
    mix = mix64_scalar("CAST(vec_id AS HUGEINT)")
    return f"""
    WITH {_kmeans_ctes(k, iters)},
    ranked AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY cid ORDER BY {mix}) AS rn
      FROM asg{iters + 1})
    SELECT vec_id, cid AS cluster_id, rn <= {m} AS keep
    FROM ranked
    """


def pmi_collocations_sql(k: int = 20, min_cnt: int = 5) -> str:
    """PMI-collocation twin: the same [a-z]+ tokens, bigram = two
    space-joined consecutive tokens within a doc, score = the SAME
    fixed float expression tree (cab * N) / (ca * cb) — every factor a
    correctly-rounded CAST of an exact integer, so both engines round
    identically (the bm25 no-ln rule: the log is monotone and
    omitted)."""
    return f"""
    WITH tk AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS lst
                FROM documents),
    uni AS (SELECT unnest(lst) AS tok FROM tk),
    uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
    bg AS (SELECT unnest(list_transform(
             generate_series(1, greatest(len(lst) - 1, 0)),
             i -> lst[i] || ' ' || lst[i+1])) AS gram FROM tk),
    bc AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM bg
           GROUP BY gram HAVING count(*) >= {min_cnt})
    SELECT bc.gram, bc.cnt,
           (CAST(bc.cnt AS DOUBLE) * CAST(n.n AS DOUBLE)) /
           (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS score
    FROM bc
    CROSS JOIN n
    JOIN uc ua ON ua.tok = split_part(bc.gram, ' ', 1)
    JOIN uc ub ON ub.tok = split_part(bc.gram, ' ', 2)
    ORDER BY score DESC, bc.gram LIMIT {k}
    """


def anchor_text_corpus_sql(pages_glob: str) -> str:
    """Anchor-text-corpus twin: the extract_links decorated-anchor view
    extended with the varied-text pick (a second mixed_list under
    ANCHOR_TEXT_SALT indexes the frozen ANCHOR_WORDS lexicon), then the
    decorated bytes are genuinely parsed with the SAME two-capture RE2
    (list_zip of the two regexp_extract_all calls — numeric struct
    index, named access fails on unnamed structs), relative hrefs
    resolved against the page's own host, counts grouped per
    (destination host, anchor text)."""
    from .pipelines import webtext as w

    lex = "[" + ", ".join(f"'{t}'" for t in w.ANCHOR_WORDS) + "]"
    hs = (f"list_transform(generate_series(0, CAST(h % {w.LINK_OUT_MOD} "
          f"AS BIGINT)), j -> (h + j) % {M64})")
    anchor = (f"'<a href=\"https://host' || "
              f"lpad(CAST(ml[i] % {w.LINK_HOST_SPACE} AS VARCHAR), 3, '0')"
              f" || '.example/o/' || CAST(i-1 AS VARCHAR) || '\">' || "
              f"({lex})[1 + CAST(mw[i] % {len(w.ANCHOR_WORDS)} AS BIGINT)]"
              f" || '</a>'")
    return f"""
    WITH base AS (
      SELECT url, decode(html) AS hs, {fnv_expr('url')} AS h
      FROM read_parquet('{pages_glob}') WHERE html IS NOT NULL),
    deco AS (
      SELECT url, hs, {mixed_list(hs, w.LINK_SALT)} AS ml,
             {mixed_list(hs, w.ANCHOR_TEXT_SALT)} AS mw FROM base),
    anch AS (
      SELECT url, hs || array_to_string(
        list_transform(generate_series(1, len(ml)), i -> {anchor}),
        '') AS dec
      FROM deco),
    zipped AS (
      SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS src_host,
             unnest(list_zip(
               regexp_extract_all(dec, '{w.ANCHOR_PAIR_RE}', 1),
               regexp_extract_all(dec, '{w.ANCHOR_PAIR_RE}', 2))) AS p
      FROM anch),
    resolved AS (
      SELECT CASE WHEN p[1] LIKE '/%' THEN src_host
                  ELSE regexp_extract(p[1], '{w.LINK_ABS_HOST_RE}', 1)
             END AS dst_host, p[2] AS txt
      FROM zipped)
    SELECT dst_host, txt AS anchor_text,
           CAST(count(*) AS BIGINT) AS n_anchors
    FROM resolved
    WHERE dst_host IS NOT NULL AND dst_host != ''
    GROUP BY 1, 2
    """


def url_features_sql(pages_glob: str) -> str:
    """URL-shape twin over the same decorated-url view: the SAME
    mix64(fnv(url) + SALT) chain picks the decoration (fnv materialized
    once per the house rule), the SAME four suffix constants, then
    length/regexp-count kernels measure the identical string and the
    keep gate is the identical integer comparison chain."""
    from .pipelines import webtext as w

    mix = mix64_scalar(f"(f + {w.URLFEAT_SALT}::HUGEINT) % {M64}")
    variants = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(w.URLFEAT_DECOR))
    return f"""
    WITH base AS (SELECT url, {fnv_expr('url')} AS f
                  FROM read_parquet('{pages_glob}')),
    m AS (SELECT url, {mix} AS h FROM base),
    dec AS (SELECT url,
                   url || CASE WHEN h % {w.URLFEAT_MOD} = 0
                     THEN (CASE CAST((h // {w.URLFEAT_MOD})
                                     % {len(w.URLFEAT_DECOR)} AS BIGINT)
                           {variants} END)
                     ELSE '' END AS d
            FROM m),
    feat AS (SELECT url,
                    CAST(length(d) AS BIGINT) AS url_len,
                    CAST(len(regexp_extract_all(d, '/')) - 2 AS BIGINT)
                      AS path_depth,
                    CAST(CASE WHEN contains(d, '?')
                         THEN len(regexp_extract_all(d, '&')) + 1
                         ELSE 0 END AS BIGINT) AS n_params,
                    CAST(len(regexp_extract_all(d, '[0-9]')) AS BIGINT)
                      AS n_digits
             FROM dec)
    SELECT url, url_len, path_depth, n_params, n_digits,
           (path_depth <= {w.URLFEAT_MAX_DEPTH}
            AND n_params <= {w.URLFEAT_MAX_PARAMS}
            AND url_len <= {w.URLFEAT_MAX_LEN}
            AND {w.URLFEAT_DIGIT_DEN} * n_digits
                <= {w.URLFEAT_DIGIT_NUM} * url_len) AS keep
    FROM feat
    """


def winnow_fingerprints_sql(n: int = 3, w: int = 4) -> str:
    """Winnowing twin: the SAME mixed_list gram hashes in HUGEINT
    (m_k[i] = mix64(tokhash[i] + (k+1)), gram = xor chain — the
    fingerprint_sql machinery), then per window of w grams the minimum
    with the rightmost-tie rule via list_position over the REVERSED
    slice (first position in the reversed window = rightmost in the
    original — exactly the engine's argmin-of-reversed-view)."""
    gram = "xor(xor(m0[i], m1[i+1]), m2[i+2])"
    assert n == 3, "twin is generated for the house trigram"
    mixes = ", ".join(f"{mixed_list('hs', k + 1)} AS m{k}" for k in range(n))
    return f"""
    WITH hs_t AS (
      SELECT doc_id, list_transform(regexp_extract_all(lower(text), '[a-z]+'),
                                    t -> {fnv_expr('t')}) AS hs
      FROM documents
    ),
    mixed AS (SELECT doc_id, {mixes}, len(hs) AS nt FROM hs_t),
    grams AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(nt - {n - 1}, 0)),
                            i -> {gram}) AS g
      FROM mixed
    ),
    sel AS (
      SELECT doc_id, g,
             list_distinct(list_transform(
               generate_series(1, greatest(len(g) - {w - 1}, 0)),
               i -> i + {w} - list_position(list_reverse(g[i:i+{w - 1}]),
                                            list_min(g[i:i+{w - 1}]))))
               AS poss
      FROM grams
    )
    SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos, {hex16('g[p]')} AS fp
    FROM (SELECT doc_id, g, unnest(poss) AS p FROM sel)
    """


def code_detect_sql(pages_glob: str) -> str:
    """Code-gate twin over the same decorated-text view: the SAME
    mix64(fnv(url) + SALT) pick, the SAME snippet constants repeated
    1 + n_words // CODE_REP_WORDS times (repeat() mirrors the engine's
    object-array string multiply), then the SAME three RE2 counts and
    the identical integer gate chain. Null text -> NULL decorated
    string -> zero counts -> is_code false (both engines)."""
    from .pipelines import webtext as w

    mix = mix64_scalar(f"(f + {w.CODE_SALT}::HUGEINT) % {M64}")
    variants = " ".join(
        f"WHEN {i} THEN '{s}'".replace("\n", chr(10))
        for i, s in enumerate(x.replace("'", "''")
                              for x in w.CODE_SNIPPETS))
    return f"""
    WITH base AS (SELECT url, text, {fnv_expr('url')} AS f
                  FROM read_parquet('{pages_glob}')),
    m AS (SELECT url, text, {mix} AS h FROM base),
    dec AS (SELECT url,
                   text || ' ' || CASE WHEN h % {w.CODE_MOD} = 0
                     THEN repeat(
                       (CASE CAST((h // {w.CODE_MOD})
                                  % {len(w.CODE_SNIPPETS)} AS BIGINT)
                        {variants} END),
                       CAST(1 + len(regexp_extract_all(text, '{w.WORD_RE}'))
                            // {w.CODE_REP_WORDS} AS BIGINT))
                     ELSE '' END AS d
            FROM m),
    feat AS (SELECT url,
                    coalesce(len(regexp_extract_all(d, '{w.WORD_RE}')), 0)
                      ::BIGINT AS n_words,
                    coalesce(len(regexp_extract_all(d, '{w.CODE_SYM_RE}')), 0)
                      ::BIGINT AS n_code_sym,
                    coalesce(len(regexp_extract_all(d, '{w.CODE_KW_RE}')), 0)
                      ::BIGINT AS n_kw
             FROM dec)
    SELECT url, n_words, n_code_sym, n_kw,
           ({w.CODE_SYM_DEN} * n_code_sym >= {w.CODE_SYM_NUM} * n_words
            AND n_kw >= {w.CODE_MIN_KW} AND n_words > 0) AS is_code,
           NOT ({w.CODE_SYM_DEN} * n_code_sym >= {w.CODE_SYM_NUM} * n_words
                AND n_kw >= {w.CODE_MIN_KW} AND n_words > 0) AS keep
    FROM feat
    """


def dup_cluster_sizes_sql(threshold: float = 0.5) -> str:
    """Cluster-size histogram twin: the recursive min-label walk from
    neardup_clusters_sql as a subquery, then two plain groupbys."""
    return f"""
    WITH cl AS ({neardup_clusters_sql(threshold)}),
    sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
           FROM cl GROUP BY cluster_id)
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM sz GROUP BY cluster_size
    """


def neardup_threshold_curve_sql(
        thresholds: tuple = (0.5, 0.6, 0.7, 0.8, 0.9)) -> str:
    """Threshold-curve twin: the exact string-shingle Jaccard pair set
    at the loosest sweep point, cross-joined with the threshold list
    (same literals as the engine), counted per threshold. The engine
    thresholds on the SAME round-to-4dp jaccard as `_JACCARD`, so the
    boundary behavior is identical by construction."""
    vals = ", ".join(f"({t})" for t in thresholds)
    return f"""
    WITH {_SHINGLES},
    jp AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) AS na, len(b.s) AS nb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ),
    p AS (SELECT id_a, id_b, {_JACCARD} AS jaccard FROM jp
          WHERE {_JACCARD} >= {min(thresholds)}),
    th(t) AS (VALUES {vals}),
    f AS (SELECT th.t, p.id_a, p.id_b FROM th JOIN p ON p.jaccard >= th.t),
    pc AS (SELECT t, CAST(count(*) AS BIGINT) AS n_pairs FROM f GROUP BY t),
    docs AS (SELECT t, id_a AS d FROM f UNION SELECT t, id_b FROM f),
    dc AS (SELECT t, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
           FROM docs GROUP BY t)
    SELECT th.t AS threshold,
           coalesce(pc.n_pairs, 0) AS n_pairs,
           coalesce(dc.n_docs, 0) AS n_docs
    FROM th LEFT JOIN pc ON pc.t = th.t LEFT JOIN dc ON dc.t = th.t
    """


def curriculum_order_sql() -> str:
    """Curriculum-order twin: the composite (length bucket, mixed key)
    order recomputed in SQL — bucket CASE matches the engine's
    searchsorted(side='right') edges, the within-bucket key is the same
    splitmix64 output's top 61 bits, doc_id breaks ties."""
    mix = mix64_scalar("CAST(doc_id AS HUGEINT)")
    return f"""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CASE WHEN n_chars < 200 THEN 0
                  WHEN n_chars < 500 THEN 1
                  WHEN n_chars < 1000 THEN 2
                  WHEN n_chars < 2000 THEN 3
                  ELSE 4 END AS bucket,
             ({mix}) // 8 AS mk
      FROM documents)
    SELECT CAST(row_number() OVER (ORDER BY bucket, mk, doc_id) - 1
                AS BIGINT) AS order_idx,
           doc_id, n_chars, CAST(bucket AS BIGINT) AS bucket
    FROM d
    """


def mixture_epoch_plan_sql() -> str:
    """Mixture-plan twin: the same \\S+ token mass as
    token_balanced_mixture_sql, an exact integer floor for the uniform
    planned share, and ONE int/int double division for epochs."""
    return """
    WITH c AS (
      SELECT source,
             CAST(coalesce(sum(len(regexp_extract_all(text, '\\S+'))), 0)
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS n_src FROM c)
    SELECT c.source, c.n_tokens,
           CAST(t.total // t.n_src AS BIGINT) AS planned_tokens,
           CASE WHEN c.n_tokens = 0 THEN NULL
                ELSE CAST(t.total // t.n_src AS DOUBLE) / c.n_tokens
           END AS epochs
    FROM c, t
    """


def eval_contamination_report_sql(eval_mod: int = 50,
                                  frac_pct: int = 50) -> str:
    """Per-eval-doc leak twin: distinct trigram STRINGS (strictly finer
    than the engine's 64-bit hashes — decontaminate precedent), train
    side as one DISTINCT set, integer cross-multiplied label."""
    return f"""
    WITH base AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(lst)-2, 0)),
               i -> lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2])) AS s
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS lst
            FROM documents)),
    ev AS (SELECT doc_id, unnest(s) AS g FROM base
           WHERE doc_id % {eval_mod} = 0),
    tr AS (SELECT DISTINCT unnest(s) AS g FROM base
           WHERE doc_id % {eval_mod} <> 0),
    leaks AS (SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_leaked
              FROM ev JOIN tr USING (g) GROUP BY ev.doc_id),
    tot AS (SELECT doc_id, CAST(coalesce(len(s), 0) AS BIGINT) AS n_shingles
            FROM base WHERE doc_id % {eval_mod} = 0)
    SELECT tot.doc_id, tot.n_shingles,
           coalesce(l.n_leaked, 0) AS n_leaked,
           CASE WHEN tot.n_shingles = 0 THEN 0.0
                ELSE CAST(coalesce(l.n_leaked, 0) AS DOUBLE) / tot.n_shingles
           END AS frac,
           CASE WHEN tot.n_shingles = 0 THEN FALSE
                ELSE 100 * coalesce(l.n_leaked, 0)
                     >= {frac_pct} * tot.n_shingles
           END AS compromised
    FROM tot LEFT JOIN leaks l USING (doc_id)
    """


def partition_skew_report_sql(pages_glob: str, n_shards: int = 16) -> str:
    """Skew-audit twin: the same FNV-1a url hash in HUGEINT, strlen
    byte mass (DuckDB strlen is BYTES, matching Arrow binary_length on
    utf8), one int/int division for the share."""
    return f"""
    WITH d AS (SELECT ({fnv_expr('url')}) % {n_shards} AS shard,
                      CAST(coalesce(strlen(text), 0) AS BIGINT) AS nb
               FROM read_parquet('{pages_glob}')),
    g AS (SELECT CAST(shard AS BIGINT) AS shard,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(nb) AS BIGINT) AS n_bytes
          FROM d GROUP BY shard),
    t AS (SELECT CAST(coalesce(sum(n_bytes), 0) AS BIGINT) AS total FROM g)
    SELECT g.shard, g.n_docs, g.n_bytes,
           CASE WHEN t.total = 0 THEN 0.0
                ELSE CAST(g.n_bytes AS DOUBLE) / t.total END AS byte_share
    FROM g, t
    """


def quality_flag_cooccurrence_sql(pages_glob: str) -> str:
    """Co-fire twin: the five bank keeps from their own oracle builders
    (the ablation pattern), null-text pages excluded, one UNION arm per
    unordered bank pair over a VALUES spine so zero rows survive."""
    from .pipelines import webtext as w

    fail = {"url": "NOT k_url", "c4": "NOT k_c4", "gopher": "NOT k_gopher",
            "repetition": "NOT k_rep", "classifier": "NOT k_cls"}
    banks = w.FUNNEL_BANKS
    pairs = [(i, j) for i in range(len(banks)) for j in range(i, len(banks))]
    spine = ", ".join(f"({k}, '{banks[i]}', '{banks[j]}')"
                      for k, (i, j) in enumerate(pairs))
    arms = []
    for k, (i, j) in enumerate(pairs):
        cond = (fail[banks[i]] if i == j
                else f"{fail[banks[i]]} AND {fail[banks[j]]}")
        arms.append(f"SELECT {k} AS pair_idx, "
                    f"CAST(count(*) FILTER (WHERE {cond}) AS BIGINT)"
                    f" AS n FROM lab")
    union = "\n      UNION ALL ".join(arms)
    return f"""
    WITH uf AS (SELECT url, coalesce(keep, FALSE) AS k_url
                FROM ({url_host_filter_sql(pages_glob)})),
    c4f AS (SELECT url, coalesce(keep, FALSE) AS k_c4
            FROM ({c4_line_filter_sql(pages_glob)})),
    gqf AS (SELECT url, coalesce(gopher_keep, FALSE) AS k_gopher
            FROM ({gopher_quality_flags_sql(pages_glob)})),
    repf AS (SELECT url, coalesce(repetition_keep, FALSE) AS k_rep
             FROM ({gopher_repetition_sql(pages_glob)})),
    qcf AS (SELECT url, coalesce(keep, FALSE) AS k_cls
            FROM ({quality_classifier_sql(pages_glob)})),
    base AS (SELECT url FROM read_parquet('{pages_glob}')
             WHERE text IS NOT NULL),
    lab AS (
      SELECT k_url, k_c4, k_gopher, k_rep, k_cls
      FROM base JOIN uf USING (url) JOIN c4f USING (url)
                JOIN gqf USING (url) JOIN repf USING (url)
                JOIN qcf USING (url)),
    cnt AS ({union})
    SELECT s.bank_a, s.bank_b, coalesce(cnt.n, 0::BIGINT) AS n_both_failed
    FROM (VALUES {spine}) s(pair_idx, bank_a, bank_b)
    LEFT JOIN cnt USING (pair_idx)
    ORDER BY s.pair_idx
    """


def grouped_rollup_sql() -> str:
    """ROLLUP twin: native GROUP BY ROLLUP with the SQL grouping_id
    convention (GROUPING(source)*2 + GROUPING(lang)); rolled key
    columns are NULL, real NULL key values disambiguated by the id."""
    return """
    SELECT CAST(GROUPING(source)*2 + GROUPING(lang) AS BIGINT)
               AS grouping_id,
           source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars
    FROM documents GROUP BY ROLLUP(source, lang)
    """


def mojibake_gate_sql(pages_glob: str) -> str:
    """Encoding-damage twin over the same mojibake view: the decoration
    predicate is the SAME fnv1a64(url) % MOJI_MOD and suffix, the
    digraph count runs the same RE2 class through DuckDB's regexp
    binding (hex-escape spelling of the identical pattern), and the
    replacement-char count is a length-difference (replace() removes
    whole codepoints in DuckDB's char semantics)."""
    from .pipelines import webtext as w

    rc = "\ufffd"
    moji_re = "\u00c3[\\x{80}-\\x{bf}]"
    return f"""
    WITH base AS (SELECT url, text, {fnv_expr('url')} AS h
                  FROM read_parquet('{pages_glob}')),
    dec AS (SELECT url,
                   CASE WHEN text IS NOT NULL AND h % {w.MOJI_MOD} = 0
                        THEN text || '{w.MOJI_SUFFIX}' ELSE text END AS t
            FROM base),
    c AS (SELECT url,
                 CAST(coalesce(len(regexp_extract_all(t, '{moji_re}')), 0)
                      AS BIGINT) AS n_mojibake,
                 CAST(coalesce(length(t) - length(replace(t, '{rc}', '')),
                               0) AS BIGINT) AS n_replacement
          FROM dec)
    SELECT url, n_mojibake, n_replacement,
           (n_mojibake = 0 AND n_replacement = 0) AS keep
    FROM c
    """


def column_profile_sql(top_k: int = 5) -> str:
    """Profiling twin: per-column grouped counts, ranked (count DESC,
    value ASC NULLS LAST) — the engine's explicit nulls-last sort."""
    return f"""
    WITH l AS (SELECT 'lang' AS col, lang AS value, count(*) AS n
               FROM documents GROUP BY lang),
    s AS (SELECT 'source' AS col, source AS value, count(*) AS n
          FROM documents GROUP BY source),
    u AS (SELECT * FROM l UNION ALL SELECT * FROM s),
    r AS (SELECT col, value, CAST(n AS BIGINT) AS n_docs,
                 CAST(row_number() OVER (
                     PARTITION BY col
                     ORDER BY n DESC, value ASC NULLS LAST)
                      AS BIGINT) AS rank
          FROM u)
    SELECT col, value, n_docs, rank FROM r WHERE rank <= {top_k}
    """


def dedup_savings_report_sql(threshold: float = 0.5) -> str:
    """Savings-planner twin: exact losers = everything but each text
    group's min doc_id (SQL GROUP BY text semantics — the exact_dedup
    twin's grouping, nulls one group); near-dup losers = cluster walk
    members minus the per-cluster (n_chars DESC, doc_id ASC) winner;
    'either' = their distinct union; char mass joined from documents."""
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
    ),
    cl AS (SELECT node AS doc_id, min(label) AS cluster_id
           FROM walk GROUP BY node),
    j AS (SELECT cl.cluster_id, d.doc_id,
                 CAST(coalesce(d.n_chars, 0) AS BIGINT) AS n_chars
          FROM cl JOIN documents d USING (doc_id)),
    r AS (SELECT cluster_id, doc_id,
                 row_number() OVER (PARTITION BY cluster_id
                                    ORDER BY n_chars DESC, doc_id ASC) AS rk
          FROM j),
    nd AS (SELECT doc_id FROM r WHERE rk > 1),
    exd AS (SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT min(doc_id) FROM documents
                                 GROUP BY text)),
    eit AS (SELECT doc_id FROM exd UNION SELECT doc_id FROM nd),
    ch AS (SELECT doc_id, CAST(coalesce(n_chars, 0) AS BIGINT) AS c
           FROM documents)
    SELECT 'exact' AS strategy,
           CAST(count(*) AS BIGINT) AS n_docs_dropped,
           CAST(coalesce(sum(c), 0) AS BIGINT) AS chars_dropped
    FROM exd JOIN ch USING (doc_id)
    UNION ALL
    SELECT 'neardup', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(c), 0) AS BIGINT)
    FROM nd JOIN ch USING (doc_id)
    UNION ALL
    SELECT 'either', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(c), 0) AS BIGINT)
    FROM eit JOIN ch USING (doc_id)
    """
