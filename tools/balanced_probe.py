#!/usr/bin/env python3
"""Balanced-corpus linearity probe -> the "balanced" section of
BENCH_SCALE.json (r14 VERDICT #1).

Runs graft.BalancedSemBench: semanticDedup over deliberately BALANCED
corpora whose per-cluster fair share is far above the absolute cap —
the regime where the occupancy-only skew guard never fired and pair
work grew quadratically. With the composed min(absCap, 4 x fair share)
threshold the wall must grow linearly with the corpus.

Usage: python3 tools/balanced_probe.py  (from the repo root)
"""
import json
import os
import subprocess
import sys

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    cmd = 'sbt -batch "runMain graft.BalancedSemBench"'
    env = dict(os.environ, SPARK_GRAFT_CPUS=CPUS)
    print(f"running: {cmd}")
    proc = subprocess.run(cmd, shell=True, env=env,
                          capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-2000:])
    line = None
    for ln in proc.stdout.splitlines():
        # sbt prefixes stdout with "[info] " — search, don't anchor
        idx = ln.find("BALANCED_PROBE ")
        if idx >= 0:
            line = ln[idx + len("BALANCED_PROBE "):]
    if proc.returncode != 0 or line is None:
        sys.stderr.write(proc.stderr[-4000:])
        sys.exit(f"probe failed (rc={proc.returncode}, line={line is not None})")
    section = json.loads(line)
    section["probe"] = (
        "deliberately balanced corpora (uniform [-1,1)^64, pure function "
        "of vec_id), k=16 emulating the capped-kEff regime, absCap scaled "
        "to 512 so fairShare/absCap spans 8x-132x while staying tractable; "
        "wall must grow linearly (bound: factor x 1.5). Largest factor is "
        "a single pass; smaller factors are median-of-3.")
    with open("BENCH_SCALE.json") as f:
        result = json.load(f)
    result["balanced"] = section
    with open("BENCH_SCALE.json", "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(section, indent=1))
    if not section.get("all_linear"):
        sys.exit("NOT LINEAR — see ratios above")


if __name__ == "__main__":
    main()
