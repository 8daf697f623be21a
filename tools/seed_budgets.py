"""Seed BENCH/query_budgets.json from the latest clean bench run.

Policy (round 5): budget = max(1.5 x clean-run min, 2.0 s floor).

- 1.5x: a real code regression typically costs 2x+ (an extra shuffle, a
  Python fallback, a lost pushdown); 1.5x headroom keeps the gate
  sensitive to those while absorbing ordinary rep-to-rep jitter.
- 2.0 s floor: sub-second queries carry fixed session costs (task
  dispatch, codegen cache hits) whose absolute jitter rivals their
  runtime; a 0.3 s budget on a 0.2 s query flags noise, not code.
- Budgets are re-seeded fresh each time (no max-with-old): a gate whose
  carrier was slimmed down must get a tighter budget, not inherit the
  bloated one.
- ``mins`` records the RAW clean-run min per query — bench.py's
  env_scale normalization divides measured times by these (the budget
  floor would otherwise understate sub-1.33s queries' ratios and bias
  the median-of-ratios low; caught in round 5 review).
- ``control_min`` carries the pure-JVM control job's clean min
  (bench._control_sec) — the env anchor that distinguishes a slow box
  from a broad code regression.  Preserved from the existing file when
  the source artifact has no ``budget_control_sec``.

bench.py enforces these with min-over-separate-passes plus TARGETED
retries (only still-over-budget queries re-run, up to a retry budget), so
a tenant burst that poisons one pass cannot manufacture violations while
a genuine regression stays over budget on every quiet retry.

Usage: python tools/seed_budgets.py [path-to-bench-json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADROOM = 1.5
FLOOR_SEC = 2.0


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/BENCH/bench_last.json"
    with open(src) as f:
        bench = json.load(f)
    queries = bench["queries"]
    dst = f"{REPO}/BENCH/query_budgets.json"
    try:
        with open(dst) as f:
            old = json.load(f)
    except (OSError, ValueError):
        old = {}
    mins = {name: round(sec, 3) for name, sec in sorted(queries.items())}
    budgets = {
        name: round(max(HEADROOM * sec, FLOOR_SEC), 2)
        for name, sec in mins.items()
    }
    control_min = bench.get("budget_control_sec") or old.get("control_min")
    out = {
        "policy": (
            f"budget = max({HEADROOM} x clean-run min, {FLOOR_SEC}s floor); "
            "checked by bench.py against min-over-separate-passes with "
            "targeted retries; env_scale ratios use the raw `mins`; "
            "`control_min` anchors the pure-JVM env control "
            "(tools/seed_budgets.py)"
        ),
        "seeded_from": os.path.basename(src),
        "budgets": budgets,
        "mins": mins,
        "control_min": control_min,
    }
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(budgets)} budgets to {dst} (control_min={control_min})")


if __name__ == "__main__":
    main()
