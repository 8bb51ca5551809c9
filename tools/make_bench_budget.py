"""Regenerate bench_budget.json from the newest full-session bench
artifact (bench_full_r*.json).

The budget is each key's expected wall-clock seconds under the noop
materializer at sf0.1 in a FULL session (targeted SPARK_GRAFT_ONLY runs
are warmup-tainted and must not seed budgets), plus the host-speed
anchor (the code-frozen r01 43-key subset total) the numbers were
measured under, so bench.py can normalize away host drift before
flagging >2x deviations.

Usage: python tools/make_bench_budget.py [path/to/bench_full_rNN.json]
"""

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    if len(sys.argv) > 1:
        src = sys.argv[1]
    else:
        cands = sorted(
            glob.glob(os.path.join(HERE, "bench_full_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
        )
        if not cands:
            raise SystemExit("no bench_full_r*.json artifact found")
        src = cands[-1]
    with open(src) as f:
        full = json.load(f)
    if full.get("materialize") != "noop":
        raise SystemExit(f"{src} was not a noop-materializer session")
    budgets = {
        k: v for k, v in sorted(full["queries"].items()) if v > 0
    }
    out = {
        "source": os.path.basename(src),
        "sf": str(full.get("sf", "0.1")),
        "materialize": "noop",
        "calibration_r01_subset_s": full.get("calibration_r01_subset_s"),
        "budgets": budgets,
    }
    dst = os.path.join(HERE, "bench_budget.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {dst}: {len(budgets)} keys from {os.path.basename(src)}")


if __name__ == "__main__":
    main()
