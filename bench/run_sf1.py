"""Official sf1 (10x bench scale) artifact runner (round-4 verdict #8).

Stages the deterministic sf1 set (bench/gen_sf1.py, idempotent), runs the
SAME bench.py harness (k interleaved passes, per-query medians, all samples
disclosed) against it, and writes BENCH_SF1_r<N>.json at the repo root — so
scale-trend regressions are machine-checkable round over round instead of
living in BENCH.md prose.

Usage:  python bench/run_sf1.py --round 5 [--k 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, ".bench_sf1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    if not os.path.isdir(SF1_DIR):
        subprocess.run([sys.executable, os.path.join(REPO, "bench",
                                                     "gen_sf1.py")],
                       check=True, cwd=REPO)

    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=SF1_DIR,
               SPARK_GRAFT_CPUS=str(args.cpus),
               SPARK_GRAFT_BENCH_K=str(args.k))
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         check=True, cwd=REPO, env=env,
                         capture_output=True, text=True)
    # bench.py prints ONE json line last; anything before is Spark noise
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    payload["sf"] = "1"  # the staging dir name (.bench_sf1) parses as such
    path = os.path.join(REPO, f"BENCH_SF1_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(payload, f)
        f.write("\n")
    print(json.dumps({"wrote": path,
                      "value": payload["value"],
                      "queries": payload["queries"]}))


if __name__ == "__main__":
    main()
