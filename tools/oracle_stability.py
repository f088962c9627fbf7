"""Oracle-determinism sweep: execute every registered DuckDB oracle
TWICE on fresh connections and hash-compare the canonicalized results.

Why this exists: the round-8 sf0.1 stress caught DuckDB's parallel
window executor returning run-to-run DIFFERENT results for ROWS frames
over tied ORDER BY keys (q_interval_union — 4/1000 suppliers flipped
between two executions of the identical SQL; Spark was stable). A
nondeterministic oracle makes the driver's correctness gate flaky in a
way per-round single runs can't see. This sweep is the cheap detector:
DuckDB-only (no Spark session), ~10 min at sf0.1, run it whenever
oracles changed. Structural rule it enforces in practice: every
ROWS-frame window in an oracle must ORDER BY a key unique within its
partition (pre-aggregate to distinct keys or add a tiebreak column);
RANGE/default frames are peer-aware and safe.

Usage: python tools/oracle_stability.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, REPO)
    import pandas as pd

    from etl_ai_assistent_spark.parity import duckdb_connection
    from etl_ai_assistent_spark.registry import oracle_sql

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sqls = oracle_sql()
    unstable, errors = [], []
    for name in sorted(sqls):
        try:
            hashes = []
            for _ in range(2):
                con = duckdb_connection(sf)  # fresh connection per run
                df = con.execute(sqls[name]).df()
                con.close()
                df = df[sorted(df.columns)]
                df = df.sort_values(by=list(df.columns)).reset_index(
                    drop=True
                )
                hashes.append(
                    hashlib.md5(
                        pd.util.hash_pandas_object(
                            df, index=False
                        ).values.tobytes()
                    ).hexdigest()
                )
            stable = hashes[0] == hashes[1]
            if not stable:
                unstable.append(name)
            print(f"[{'STABLE' if stable else 'UNSTABLE'}] {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            errors.append(name)
            print(f"[ERR] {name}: {type(e).__name__}: {str(e)[:120]}", flush=True)
    print("DONE unstable =", unstable, "errors =", errors, flush=True)
    if unstable or errors:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
