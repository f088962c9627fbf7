"""Per-round lineage barrier for iterative DataFrame loops.

Every unrolled iterative operator in this engine (k-core pruning, label
propagation, PageRank, connected components) rebuilds round i's state
from round i-1's DataFrame. Expressing that directly in Catalyst makes
the LOGICAL PLAN grow with the round count — and when a round references
its predecessor twice (both endpoints of an edge join), the analyzed
tree duplicates the entire upstream lineage per reference, i.e. grows
EXPONENTIALLY in rounds: q_kcore_prune's r12 plan carried 929 Exchange
nodes / 5105 formatted lines and q_pagerank_nations 2003 / 14406 for
graphs whose data fits in kilobytes. persist() deduplicates EXECUTION
but not PLANNING — InMemoryRelation embeds the full child plan, so
analysis/optimization still walks (and canonicalizes, and re-optimizes
under AQE) the duplicated trees; at sf0.1 the planner, not the data,
dominated those queries' wall clock, and the planning cost grows with
round count at ANY data scale.

``barrier(df)`` compiles the round's plan NOW and returns a DataFrame
rooted at the resulting RDD (``localCheckpoint(eager=False)``): the
next round plans against a flat LogicalRDD scan, so plan size per round
is O(1) and total planning work is O(rounds). Execution semantics are
unchanged — rows are identical, the checkpoint RDD is storage-backed
(MEMORY_AND_DISK) so a twice-referenced round computes once, and
nothing materializes until the query's terminal action (lazy checkpoint
— no extra driver jobs per round).

Lifecycle: a locally-checkpointed RDD registers in the persistent-RDD
set (its blocks ARE the checkpoint) and the ContextCleaner only
releases it when both the Python proxy and the JVM Dataset are garbage
— non-deterministic, so a long bench session would otherwise
accumulate pinned round-state RDDs the way bare per-call persist()
chains did (the r11 q_rag_rerank pathology, re-guarded by
tests/test_plans.py's leak gate). Each operator therefore calls
``begin()`` on entry: it advances a generation counter and unpersists
every registered checkpoint from PRIOR generations that has
MATERIALIZED blocks — by then the owning query's terminal action has
run (calls are sequential in the bench/driver/tests), so the blocks
are dead weight. Checkpoints that never materialized (a query that was
built for explain() but never executed) keep their persist mark — an
early unpersist would make a later execution fail localCheckpoint's
storage-level assertion — and are swept on a later begin() once (if
ever) they hold blocks; the registry caps at _CAP handles either way.

Trade-off (documented, deliberate): a locally-checkpointed round is not
recomputable if an executor holding its blocks dies — Spark fails the
job and the caller re-runs. That is the standard localCheckpoint
contract (guide §5: "a cheaper way to cut lineage when fault tolerance
of that intermediate is not critical"); these loops are minutes-bounded
maintenance passes whose rerun is cheap, not day-long lineages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CAP = 256
_REG: dict = {"app": None, "gen": 0, "entries": []}  # entries: (gen, jrdd)


def begin(spark: SparkSession) -> None:
    """Start a new barrier generation: evict materialized checkpoint
    RDDs from prior generations (their owning queries' actions have
    completed — see module docstring)."""
    sc = spark.sparkContext
    app = sc.applicationId
    if _REG["app"] != app:
        _REG["app"] = app
        _REG["gen"] = 0
        _REG["entries"] = []
    _REG["gen"] += 1
    cur = _REG["gen"]
    try:
        infos = {
            i.id(): i.numCachedPartitions()
            for i in sc._jsc.sc().getRDDStorageInfo()
        }
    except Exception:  # noqa: BLE001 — eviction is best-effort
        infos = {}
    kept = []
    for gen, jrdd in _REG["entries"]:
        if gen < cur and infos.get(jrdd.id(), 0) > 0:
            try:
                jrdd.unpersist(False)
            except Exception:  # noqa: BLE001
                pass
        else:
            kept.append((gen, jrdd))
    _REG["entries"] = kept[-_CAP:]


def barrier(df: DataFrame) -> DataFrame:
    """Flat-lineage copy of ``df`` for the next loop round (see module
    docstring). Lazy: compiles the plan, materializes nothing."""
    out = df.localCheckpoint(eager=False)
    try:
        # the checkpoint RDD itself: localCheckpoint's result is rooted
        # at LogicalRDD(rdd) — unpersisting THAT rdd releases the
        # checkpoint blocks (a re-planned toRdd() would only wrap it)
        _REG["entries"].append(
            (_REG["gen"], out._jdf.queryExecution().analyzed().rdd())
        )
    except Exception:  # noqa: BLE001 — registry is best-effort
        pass
    return out
