"""Ad-hoc round-12 bench-artifact merger (not a pytest module).

Reads the two round-12 closing-tree full-registry bench artifacts
(`bench.py --all --out` → /tmp/BENCH_SELF_r12_run{1,2}.json), takes
per-query minima, and emits BENCH_SELF_r12.json (+ BENCH_SELF_LATEST
.json). NO floors move this round: the only plan delta since the
round-11 flooring is the x10/x101 NULL-coalesce wrapper, which is kept
against its EXISTING (lower) floors — the conservative direction of the
full-run-context convention (BASELINE.md "Round-11 closing correction").
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from scylladb_redpanda_cdc_spark.plans import registry


def main() -> None:
    r1 = json.load(open("/tmp/BENCH_SELF_r12_run1.json"))
    r2 = json.load(open("/tmp/BENCH_SELF_r12_run2.json"))
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
    for name in ("BENCH_SELF_r12.json", "BENCH_SELF_LATEST.json"):
        with open(os.path.join(repo, name), "w", encoding="utf-8") as f:
            json.dump(art, f, indent=1)
            f.write("\n")
    floor_sum = sum(bench.BASELINE_S[q] for q in reg)
    worst = max(mins[q] / bench.BASELINE_S[q] for q in reg)
    over = [q for q in reg if mins[q] > 2 * bench.BASELINE_S[q]]
    print(
        f"min-sum {art['value']} vs floor-sum {round(floor_sum, 3)} "
        f"({art['value'] / floor_sum:.3f}x); worst ratio {worst:.2f}x; "
        f"over-2x: {over}"
    )


if __name__ == "__main__":
    main()
