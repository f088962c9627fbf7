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
    "etl_ai_assistent_spark.queries.storage",
)

_loaded = False

# The driver cross-checks the FIRST 50 registered queries only. Names
# here are emitted first, so the finite driver window covers (a) queries
# fixed or changed this round (fresh verdicts needed) and (b) queries
# whose most recent driver verdict is oldest; long-green recently-checked
# queries rotate to the tail — their prior rows stand. Names not in this
# list keep module registration order after it.
DRIVER_FIRST: tuple[str, ...] = (
    # new in round 5 — no verdict yet
    "q_pq_adc_topk",
    "q_compaction_stats",
    "q_sink_roundtrip",
    "q_rag_judged",
    "q_cdc_merge",
    "q_bpe_pairs",
    "q_testset_generate",
    "q_fuzzy_match_names",
    "q_table_fingerprint",
    "q_skew_stats",
    "q_ivfpq_topk",
    "q_stream_cdc_merge",
    "q_synthetic_source",
    "q_doc_surprisal",
    "q_window_family",
    "q_array_functions",
    "q_triangle_count",
    "q_corrupt_quarantine",
    "q_schema_evolution",
    # plan changed in round 5 (broadcast-hint audit / distributed
    # fixture writers) — semantics unchanged but re-verify the new plans
    "q_revenue_by_nation",
    "q_daily_gapfill",
    "q_vectorize_lines",
    # (q_docx_pipeline/q_docx_media also got the distributed fixture
    # writer, but both were re-validated by the local sf0.01 gate twice
    # this round — rotated out in favor of never-driver-checked queries)
    # last verdict is round 1 (stalest — three rounds of churn since);
    # every one of these gets a fresh green this round
    "q_pad_truncate",
    "q_srp_topk",
    "q_pricing_summary",
    "q_customers_without_orders",
    "q_active_machinery_customers",
    "q_nation_intersect",
    "q_priority_stats",
    "q_grouping_sets",
    "q_value_percentiles",
    "q_ntile_segments",
    "q_orders_above_cust_avg",
    "q_caption_classify",
    "q_sanitized_asset_names",
    "q_title_text",
    "q_caption_pairing",
    "q_chunk_fixed",
    "q_hash_embed_profile",
    "q_point_records",
    "q_version_diff",
    "q_exact_dedup",
    "q_simhash_signatures",
    "q_simhash_near_dup",
    "q_ngram_jaccard_pairs",
    "q_fingerprint",
    "q_dedup_components",
    "q_dedup_survivors",
    "q_hash_split",
    "q_source_sample",
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
