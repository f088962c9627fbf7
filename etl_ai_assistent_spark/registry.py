"""The queries()/oracle_sql() registry behind __spark_entry__.py.

Every implemented operator from SURVEY.md §2 (plus the north-star
extension operators) registers here as a named query callable
``(spark, sf_dir) -> DataFrame`` and, when ANSI-SQL-expressible, a DuckDB
oracle SQL string over the same parquet tables. The driver cross-checks
the two at sf0.01 (row count + schema + order-insensitive value hash).

Float discipline (SURVEY.md §7 hard-part 4): every float column that
reaches a query result is either (a) computed in DOUBLE with a
deterministic fold order on both engines and therefore bit-identical, or
(b) an order-sensitive aggregate rounded to a fixed number of decimals on
both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = (
    "etl_ai_assistent_spark.queries.vector_search",
    "etl_ai_assistent_spark.queries.relational",
    "etl_ai_assistent_spark.queries.text_etl",
    "etl_ai_assistent_spark.queries.dedup",
    "etl_ai_assistent_spark.queries.text_analysis",
    "etl_ai_assistent_spark.queries.events",
    "etl_ai_assistent_spark.queries.multimodal",
    "etl_ai_assistent_spark.queries.streaming",
    "etl_ai_assistent_spark.queries.docx",
    "etl_ai_assistent_spark.queries.rag",
    "etl_ai_assistent_spark.queries.scale",
    "etl_ai_assistent_spark.queries.graph",
    "etl_ai_assistent_spark.queries.curation",
    "etl_ai_assistent_spark.queries.clustering",
    "etl_ai_assistent_spark.queries.dq",
)

_loaded = False

# The driver cross-checks the FIRST 50 registered queries only. Names
# here are emitted first, so the finite driver window covers (a) queries
# fixed or changed this round (fresh verdicts needed) and (b) queries
# whose most recent driver verdict is oldest; long-green recently-checked
# queries rotate to the tail — their prior rows stand. Names not in this
# list keep module registration order after it.
DRIVER_FIRST: tuple[str, ...] = (
    # broken by the round-3 events.ts re-type (timestamp[us]) — fixed in
    # round 4 by the canonical ts_us normalization; need fresh verdicts
    "q_asof_purchase_signup",
    "q_purchases_after_signup",
    "q_sliding_windows",
    "q_moving_value_range",
    "q_event_gaps",
    "q_scd2_intervals",
    "q_event_funnel",
    "q_cohort_retention",
    "q_group_regression",
    "q_stream_tumbling_hourly",
    "q_stream_sessions",
    "q_stream_sliding",
    "q_stream_join",
    # same break, but rotated out of the round-3 window (invisible fails)
    "q_sessionize",
    "q_tumbling_hourly",
    "q_except_event_hours",
    # ported to ts_us this round — confirm no regression
    "q_latest_event_per_user",
    # retrieval re-based on the token-hash inverted index this round
    # (semantics changed with the oracle in lock-step) — recheck
    "q_rag_retrieval",
    "q_rag_eval",
    "q_rag_rerank",
    "q_tfidf_retrieval",
    # new in round 4 — no verdict yet
    "q_decontaminate",
    "q_repetition_stats",
    "q_pii_scrub",
    "q_mix_weights",
    "q_stream_dedup_watermarked",
    "q_kmeans_step",
    "q_quality_gate",
    "q_token_shards",
    "q_bm25_retrieval",
    "q_props_variant",
    "q_dq_constraints",
    "q_rfm_segments",
    "q_event_transitions",
    "q_ewma_user_value",
    "q_table_stats",
    "q_full_outer_reconcile",
    "q_sentence_stats",
    "q_unpivot_part_metrics",
    "q_daily_gapfill",
    # plan changed this round (tokenize-once / shingle lambda binding /
    # ts_us loader) — semantics unchanged but re-verify the new plans
    "q_token_stats",
    "q_lang_id",
    "q_quality_score",
    "q_minhash_near_dup",
    # last verdict is round 1 (stalest) — refresh, registration order
    "q_revenue_by_nation",
    "q_top_orders_per_customer",
    "q_running_revenue",
    "q_cube_quantity",
    "q_rollup_orders",
    "q_pivot_linestatus",
)


def _ordered(d: dict) -> dict:
    head = {n: d[n] for n in DRIVER_FIRST if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        import_module(mod)
    _loaded = True


def queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)
