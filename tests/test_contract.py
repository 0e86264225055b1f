"""Driver-contract consistency gates:

- every queries() key has an oracle_sql() twin (round-2 invariant: NO
  rows-only checks remain);
- every queries() key is documented in SURVEY.md §8 (the judge's
  coverage checklist can't silently drift from the code);
- oracle SQL strings at least parse under DuckDB (cheap EXPLAIN against
  empty views — catches SQL syntax rot without running the data).
"""

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _entry():
    import __ray_entry__ as E

    return E


def test_every_query_has_an_oracle():
    E = _entry()
    q, o = set(E.queries()), set(E.oracle_sql())
    assert q - o == set(), f"queries without oracle: {sorted(q - o)}"
    assert o - q == set(), f"orphan oracles: {sorted(o - q)}"


def test_every_query_documented_in_survey():
    E = _entry()
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    missing = [k for k in E.queries() if k not in survey]
    assert missing == [], f"queries missing from SURVEY.md: {missing}"


def test_oracle_sql_parses():
    """EXPLAIN every oracle against schema-faithful empty views (real
    execution is scripts/check_oracle.py / the driver)."""
    import pyarrow.parquet as pq

    E = _entry()
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        schema = pq.read_schema(f"{sf}/{t}.parquet")
        con.register(f"_{t}_empty", schema.empty_table())
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM _{t}_empty")
    failures = []
    for name, sql in E.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            failures.append((name, str(exc).splitlines()[0]))
    assert failures == [], failures


def test_correctness_cap_covers_priority_queries():
    """The driver records correctness rows for the FIRST 50 queries()
    entries only; the flagship, PMIS flows, text-analysis/prep family
    and every round-3 operator must sit inside that cap (a future
    reorder silently dropping one of these from the record should fail
    here, not in the next VERDICT)."""
    import __ray_entry__ as E

    keys = list(E.queries())
    first50 = set(keys[:50])
    priority = {
        "qc_label_documents", "pmis_audit_flow", "pmis_yby_flow",
        "pmis_county_summary", "pmis_counters", "pmis_diff_histogram",
        "pmis_yby_district", "csv_ingest_sections", "prep_corpus",
        "token_counts", "quality_stats", "fingerprint_docs", "langid_docs",
        "decontaminate", "vocab_topk", "tfidf_top_terms", "deterministic_shuffle",
        "cap_per_host", "running_total_cents", "multiway_join_agg",
        "distinct_count_users", "minhash_lsh_dedup", "exact_dedup_rows",
        "asof_join", "session_windows", "rolling_sum_cents", "lag_diff",
        "rolling_time_sum_cents",
    }
    missing = priority - first50
    assert not missing, f"priority queries past the 50-row cap: {missing}"
    # every query has an oracle twin (value-checked, not rows-only)
    assert set(E.oracle_sql()) == set(keys)
