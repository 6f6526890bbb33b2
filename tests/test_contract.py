"""Driver-contract self-checks: registry shape and oracle SQL validity.

These catch contract regressions (a renamed column, an SQL typo, an
oracle pointing at a dropped query) in pytest, before the round driver
turns them into CORRECTNESS failures.
"""

import glob
import os

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def test_registry_shape():
    qs = E.queries()
    osql = E.oracle_sql()
    assert len(qs) == 50, "driver cap is exactly 50 recorded rows"
    dangling = [k for k in osql if k not in qs]
    assert not dangling, f"oracle entries without a query: {dangling}"
    # the engine-defining rows must be registered (cap trims from the
    # tail, so these being present means they can never be dropped)
    for key in ("encode_kernel_summaries", "flagship_session_features",
                "flagship_skeleton", "leakage_audit", "session_code_pooling",
                "dedup_minhash_clusters", "simhash_neardup_pairs",
                "ann_topk_variants", "semdedup_embeddings",
                "dsir_fit_score_sample"):
        assert key in qs, key
    # round-6 registry swap: the flagship LLM ops hold ORACLED rows (the
    # scalar_* rows were consolidated, q5 retired, and the two backward
    # as-of strategy rows merged into one tagged union to free slots)
    for key in ("bm25_topk_documents", "rrf_hybrid_documents",
                "dedup_paragraphs_documents", "dedup_spans_documents",
                "scalar_function_suite", "asof_backward_strategies"):
        assert key in qs and key in osql, key
    for gone in ("q5_region_revenue", "scalar_props_extract",
                 "scalar_string_funcs", "scalar_math_conditional",
                 "asof_backward_latest_order",
                 "asof_union_strategy_equivalence"):
        assert gone not in qs, f"{gone} was retired in round 6"
    # round-8 consolidation: both merged into variant-tagged union rows
    # (ann_topk_variants's 'lsh' leg; encode_kernel_summaries's
    # 'ksvd_learn' legs) to fund the semdedup/dsir rows
    for gone in ("ann_lsh_topk", "dictionary_learning"):
        assert gone not in qs, f"{gone} was consolidated in round 8"


def test_every_oracle_sql_binds_in_duckdb():
    """EXPLAIN (bind, don't execute) every oracle against the real table
    schemas. Oracles reading Spark-materialized cache parquet are checked
    only when their cache exists (any rehearsal/driver run creates it)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    checked = skipped = 0
    for name, sql in E.oracle_sql().items():
        if ".oracle_cache" in sql:
            paths = [p for p in sql.split("'") if ".oracle_cache" in p]
            if not all(glob.glob(p) for p in paths):
                skipped += 1
                continue
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # pragma: no cover - the assertion payload
            pytest.fail(f"oracle SQL for {name!r} failed to bind: {exc}")
        checked += 1
    assert checked >= 36, (checked, skipped)
