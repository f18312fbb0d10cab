"""Ad-hoc round-13 bench-artifact merger (not a pytest module).

Reads the two round-13 closing-tree full-registry bench artifacts
(`bench.py --all --out` → /tmp/BENCH_SELF_r13_run{1,2}.json), takes
per-query minima, and emits BENCH_SELF_r13.json (+ BENCH_SELF_LATEST
.json). The eight text-statistics-family queries rewritten this round
(x15/x16/x20/x22/x48/x57/x88/x120 — the `_doc_stats` one-pass
amortization) are re-floored in bench.BASELINE_S from these same runs
(the round-10 "floors record the SHIPPED plans" convention); the
script prints the old→new floor moves so BASELINE.md can record them.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from scylladb_redpanda_cdc_spark.plans import _REWRITTEN, registry


def main() -> None:
    r1 = json.load(open("/tmp/BENCH_SELF_r13_run1.json"))
    r2 = json.load(open("/tmp/BENCH_SELF_r13_run2.json"))
    reg = list(registry())
    assert set(r1["queries"]) == set(reg), "run 1 does not cover the registry"
    assert set(r2["queries"]) == set(reg), "run 2 does not cover the registry"
    mins = {q: round(min(r1["queries"][q], r2["queries"][q]), 3) for q in reg}
    colds = {
        q: round(min(r1["queries_cold"][q], r2["queries_cold"][q]), 3)
        for q in reg
    }
    art = {
        "metric": "full_registry_total_wall",
        "value": round(sum(mins.values()), 3),
        "unit": "sec",
        "queries": mins,
        "queries_cold": colds,
        "sf": 0.1,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("BENCH_SELF_r13.json", "BENCH_SELF_LATEST.json"):
        with open(os.path.join(repo, name), "w", encoding="utf-8") as f:
            json.dump(art, f, indent=1)
            f.write("\n")
    print("re-floor moves for the round-13 rewrites (old -> new = run min):")
    for q in _REWRITTEN:
        print(f"  {q}: {bench.BASELINE_S[q]} -> {mins[q]}")
    floor_sum = sum(bench.BASELINE_S[q] for q in reg)
    worst = max(mins[q] / bench.BASELINE_S[q] for q in reg)
    over = [q for q in reg if mins[q] > 2 * bench.BASELINE_S[q]]
    print(
        f"min-sum {art['value']} vs CURRENT floor-sum {round(floor_sum, 3)} "
        f"({art['value'] / floor_sum:.3f}x); worst ratio {worst:.2f}x; "
        f"over-2x: {over}"
    )


if __name__ == "__main__":
    main()
