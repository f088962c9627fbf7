"""Dump .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/explain_dump.py <tag> <suffix> q_a,q_b,...
Builds each query DataFrame at $SPARK_GRAFT_SF_DIR (default sf0.1) and writes
the formatted physical plan — the judge-checkable evidence for plan-shape
claims (Exchange counts, join strategies, PushedFilters) in OPTIMIZATION_*.md.

Streaming queries that execute inside their builder (foreachBatch) cannot be
explained without running; for those, registry entries listed in _SURROGATES
dump the plan of the per-trigger batch computation instead (noted in-file).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _stream_ann_lookup_surrogate(spark, sf_dir):
    """The per-trigger ADC plan of q_stream_ann_lookup: the probe cohort
    as one batch through the same serve-path operators the foreachBatch
    closure calls. The streaming wrapper itself only adds the sink."""
    from pyspark.sql import functions as F

    from etl_ai_assistent_spark.operators import kmeans as KM
    from etl_ai_assistent_spark.operators import pq as PQ
    from etl_ai_assistent_spark import io as eio
    from etl_ai_assistent_spark.queries.clustering import (
        DIM, M_SUB, NQ_PQ, PQ_TOPK, _literal_codebooks, _pq_index,
    )

    _, cb_rows, codes, _, _ = _pq_index(spark, sf_dir)
    cbs = _literal_codebooks(spark, cb_rows)
    cb_table = PQ.codebook_table(cbs)
    batch = (
        eio.load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < NQ_PQ)
        .select("vec_id", KM.quantize("embedding").alias("qv"))
    )
    tables = PQ.probe_tables_flat(batch, cb_table, m=M_SUB, dim=DIM)
    # mirror queries/streaming.py serve(): the r13 lookup-map form
    return PQ.adc_topk_multi_maps(
        codes, PQ.probe_lookup_maps(tables), m=M_SUB, k=PQ_TOPK
    )


_SURROGATES = {
    "q_stream_ann_lookup": _stream_ann_lookup_surrogate,
}


def main() -> None:
    tag, suffix, names_csv = sys.argv[1], sys.argv[2], sys.argv[3]
    names = [n.strip() for n in names_csv.split(",") if n.strip()]
    from etl_ai_assistent_spark.registry import queries
    from etl_ai_assistent_spark.session import get_spark

    spark = get_spark("explain-dump")
    qs = queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            if name in _SURROGATES:
                df = _SURROGATES[name](spark, SF_DIR)
                note = (
                    "# surrogate: per-trigger batch computation of the"
                    " streaming query (the foreachBatch body's plan)\n"
                )
            else:
                df = qs[name](spark, SF_DIR)
                note = ""
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(note + buf.getvalue())
            print(f"wrote {path}")
        except Exception as exc:  # noqa: BLE001 — keep dumping the rest
            print(f"FAILED {name}: {type(exc).__name__}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
