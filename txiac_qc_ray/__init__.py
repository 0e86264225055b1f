"""txiac_qc_ray — a Ray-Data-native web-text quality-control engine.

From-scratch re-expression of the row-level QC semantics of the reference
app (hongbin-xu/txIAC-QC, a Streamlit+pandas pavement-QC tool; see
SURVEY.md) as a streaming Ray Data pipeline over Common-Crawl-style pages:

    read_parquet(pages)
      -> extract_text        (frozen deterministic HTML->text)
      -> features            (vectorized Gopher/C4-style heuristics)
      -> langid              (actor pool, frozen n-gram/vocab model)
      -> perplexity          (actor pool, frozen unigram LM)
      -> rules               (declarative threshold flagger; ref Home.py:161-184)
      -> scrub               (compiled-regex PII/toxicity transform)
      -> counters + lineage  (groupby-aggregate; ref Home.py:444-904)
      -> write_parquet       (partitioned, resumable)

Everything here derives from public knowledge only: the Ray Data and
pyarrow APIs, and the reference's observable behavior.
"""

__version__ = "0.1.0"
