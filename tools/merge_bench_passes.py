"""Merge per-query minima across full bench passes (the r12/r13
min-of-passes protocol): single-pass minima on this shared host embed
sub-threshold co-tenant pressure the storm probes cannot always flag,
so the committed BENCH_LOCAL.json is the per-query min across passes on
identical code, with a merge_protocol block recording both passes and
each minimum's source.

Usage: python tools/merge_bench_passes.py A=/tmp/BENCH_PASS_A.json B=/tmp/BENCH_PASS_B.json
Writes the merged artifact to BENCH_LOCAL.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    passes = {}
    for arg in sys.argv[1:]:
        tag, path = arg.split("=", 1)
        with open(path) as f:
            passes[tag] = json.load(f)
    tags = sorted(passes)
    base = dict(passes[tags[0]])  # structure from the first pass

    names = set()
    for p in passes.values():
        names |= set(p["queries"])
    queries, src, spread, cold, runs_actual = {}, {}, {}, {}, {}
    sw = {}
    for n in sorted(names):
        cands = [(p["queries"][n], t) for t, p in passes.items() if n in p["queries"]]
        best, tag = min(cands)
        queries[n] = best
        src[n] = tag
        mins = [p["runs_min_mean_max"][n] for t, p in passes.items() if n in p.get("runs_min_mean_max", {})]
        if mins:
            spread[n] = [
                round(min(m[0] for m in mins), 3),
                round(sum(m[1] for m in mins) / len(mins), 3),
                round(max(m[2] for m in mins), 3),
            ]
        colds = [p["cold"][n] for p in passes.values() if n in p.get("cold", {})]
        if colds:
            cold[n] = round(min(colds), 3)
        ra = [p.get("runs_actual", {}).get(n) for p in passes.values()]
        ra = [x for x in ra if x]
        if ra:
            runs_actual[n] = max(ra)
        # byte attribution: take the source pass's warm-run record
        rec = passes[tag].get("warm_run_bytes_sw_spill_in", {}).get(n)
        if rec:
            sw[n] = rec
    base["queries"] = queries
    base["value"] = round(sum(queries.values()), 3)
    base["runs_min_mean_max"] = spread
    base["cold"] = cold
    base["runs_actual"] = runs_actual
    if sw:
        base["warm_run_bytes_sw_spill_in"] = sw
    residual = {}
    for n in sorted(names):
        # a merged min is storm-flagged only if its SOURCE pass flagged it
        if passes[src[n]].get("storm_residual", {}).get(n):
            residual[n] = True
    base["quiet"] = not residual
    if residual:
        base["storm_residual"] = residual
    else:
        base.pop("storm_residual", None)
    base["merge_protocol"] = {
        "passes": {
            t: {
                "headline": p["value"],
                "quiet": p.get("quiet"),
                "storm_residual": sorted(p.get("storm_residual", {})),
            }
            for t, p in passes.items()
        },
        "note": (
            "per-query minima merged across full bench passes on identical"
            " code (the r12 min-of-passes protocol); spread = [min of mins,"
            " mean of pass means, max of maxes], cold = min of first-run"
            " times per pass, bytes = the min's source pass"
        ),
        "min_source_pass": src,
    }
    with open(os.path.join(REPO, "BENCH_LOCAL.json"), "w") as f:
        json.dump(base, f, indent=1)
    print(
        "merged", len(queries), "queries; headline",
        base["value"], "from passes",
        {t: p["value"] for t, p in passes.items()},
    )


if __name__ == "__main__":
    main()
