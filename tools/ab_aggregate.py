#!/usr/bin/env python
"""Compute the A/B aggregate (mean/CI/verdict) from one or more
per-seed artifacts (.partial or final), so a cut-short campaign can
still be adjudicated under the pre-registered rule.

  python tools/ab_aggregate.py bench_artifacts/ab_budget_s8.json.partial \
      [more.json ...] --out bench_artifacts/ab_budget_final.json
"""

from __future__ import annotations

import argparse
import json
import math

_T95 = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447,
        7: 2.365, 8: 2.306, 9: 2.262, 10: 2.228, 11: 2.201, 12: 2.179,
        13: 2.160, 14: 2.145, 15: 2.131}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("artifacts", nargs="+")
    p.add_argument("--out", default="")
    args = p.parse_args()

    import numpy as np
    per_seed, mode, arms = {}, None, None
    for path in args.artifacts:
        with open(path) as f:
            d = json.load(f)
        mode = mode or d["mode"]
        arms = arms or d["arms"]
        assert d["mode"] == mode, f"{path}: mode mismatch"
        for r in d["per_seed"]:
            per_seed[r["seed"]] = r   # later artifacts win
    rows = [per_seed[s] for s in sorted(per_seed)]
    used = [r for r in rows if not r["excluded"] and r["delta"] is not None]
    deltas = [r["delta"] for r in used]
    n = len(deltas)
    mean = float(np.mean(deltas)) if n else None
    sd = float(np.std(deltas, ddof=1)) if n > 1 else None
    half = _T95.get(n - 1, 1.96) * sd / math.sqrt(n) if n > 1 else None
    ci = [mean - half, mean + half] if half is not None else None
    report = {
        "mode": mode, "arms": arms, "n_functional": n,
        "excluded_seeds": [r["seed"] for r in rows if r["excluded"]],
        "deltas": deltas, "delta_mean": mean, "delta_sd": sd,
        "delta_ci95": ci,
        "final_base_mean": float(np.mean([r["final_base"] for r in used]))
        if n else None,
        "final_var_mean": float(np.mean([r["final_var"] for r in used]))
        if n else None,
        "verdict": (None if ci is None else
                    ("PASS" if ci[0] > -2.0 else
                     ("FAIL" if ci[1] < 0.0 else "INCONCLUSIVE"))),
        "verdict_rule": "PASS iff CI95 lower bound > -2 AP50; FAIL iff "
                        "CI95 upper bound < 0 (pre-registered, harness v2)",
        "per_seed": rows,
    }
    print(json.dumps({k: v for k, v in report.items() if k != "per_seed"},
                     indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
