"""Ad-hoc round-11 floor merger (not a pytest module).

Reads the two closing-tree full-registry bench artifacts
(/tmp/ba1.json, /tmp/ba2.json from `bench.py --all --out ...`), takes
per-query minima, and emits:
  1. BENCH_SELF_r11.json (+ BENCH_SELF_LATEST.json) — the measured
     full-registry artifact;
  2. the bench.py BASELINE_S literal block for the round-11 floors
     (new floors for every previously-unfloored query, re-floors for
     the 17 round-11-rewritten plans) on stdout;
  3. the BASELINE.md markdown table rows on stdout.
Floors for queries neither new nor rewritten are NOT touched — the
contract keeps its history (the f20/u19/x121 convention).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from scylladb_redpanda_cdc_spark.plans import _REWRITTEN, registry


def main() -> None:
    r1 = json.load(open("/tmp/ba1.json"))
    r2 = json.load(open("/tmp/ba2.json"))
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
    for name in ("BENCH_SELF_r11.json", "BENCH_SELF_LATEST.json"):
        with open(os.path.join(repo, name), "w", encoding="utf-8") as f:
            json.dump(art, f, indent=1)
            f.write("\n")
    rewritten = set(_REWRITTEN)
    new_floor = [q for q in reg if q not in bench.BASELINE_S]
    refloor = [q for q in reg if q in bench.BASELINE_S and q in rewritten]
    print("# --- bench.py block: round-11 re-floors (old -> new) ---")
    for q in refloor:
        print(f'    "{q}": {mins[q]:.3f},  # was {bench.BASELINE_S[q]:.3f}')
    print("# --- bench.py block: round-11 first floors ---")
    for q in new_floor:
        print(f'    "{q}": {mins[q]:.3f},')
    print("# --- BASELINE.md rows: re-floors ---")
    for q in refloor:
        print(f"| {q} | {mins[q]:.3f} |")
    print("# --- BASELINE.md rows: first floors ---")
    for q in new_floor:
        print(f"| {q} | {mins[q]:.3f} |")
    print("# totals:", len(refloor), "re-floors,", len(new_floor), "new,")
    print("# sum:", art["value"])


if __name__ == "__main__":
    main()
