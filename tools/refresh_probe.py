#!/usr/bin/env python3
"""Refresh-cost probe -> BENCH_REFRESH.json: is index refresh-on-append
O(delta + index metadata), never O(corpus)?

Runs graft.RefreshProbe, which for each persisted index kind (scalar
btree, BM25 text, LSH, IVF, IVF_PQ) builds at 1x over the sf tables,
appends GRAFT_REFRESH_DELTA_PCT percent (default 5) of new rows, then
refreshes — measuring wall seconds and cluster-wide records read for
build vs refresh. A kind passes when the refresh read less than half of
what the build read (delta rows + per-segment metadata; a corpus
re-scan is >= 1x by construction).

Usage: python3 tools/refresh_probe.py  (from the repo root)
"""
import json
import os
import re
import subprocess
import sys

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    env = dict(os.environ)
    env.update({"SPARK_GRAFT_SF_DIR": SF, "SPARK_GRAFT_CPUS": CPUS})
    p = subprocess.run('sbt -batch "runMain graft.RefreshProbe"',
                       shell=True, capture_output=True, text=True, env=env)
    m = re.search(r'\{"metric":"refresh_o_delta".*\}',
                  p.stdout + "\n" + p.stderr)
    if not m:
        sys.exit(f"no probe line in output:\n{p.stdout[-2000:]}\n"
                 f"{p.stderr[-2000:]}")
    parsed = json.loads(m.group(0))
    with open("BENCH_REFRESH.json", "w") as f:
        json.dump(parsed, f, indent=1)
        f.write("\n")
    for k in parsed["kinds"]:
        flag = "OK  " if k["ok"] else "FAIL"
        print(f"{flag} {k['kind']}: build {k['build_records']} rec / "
              f"{k['build_sec']}s -> refresh {k['refresh_records']} rec / "
              f"{k['refresh_sec']}s (records x{k['records_ratio']})")
    print(f"all_o_delta: {parsed['all_o_delta']}")
    if not parsed["all_o_delta"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
