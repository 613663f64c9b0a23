#!/usr/bin/env python3
"""Adversarial-skew probe for the dedup path -> BENCH_SKEW.json.

Generates a skewed corpus (graft.SkewGen: corpus-wide hot token, a
10k-doc near-dup chain, 2k shared-prefix bucket-stress docs) from
sf0.1, then benches the dedup queries (t01/t02/t03/t15) on the healthy
and skewed corpora under the SAME conf (dfCap lowered so the guard is
actually exercised at probe scale - at 100 TB the cap is always far
below the corpus size). A guard holds when the skewed/healthy time
ratio stays at-or-below the row ratio; an unguarded run would be
quadratic in the hot-token df / chain diameter instead.

Usage: python3 tools/skew_probe.py  (from the repo root)
"""
import json
import os
import re
import subprocess
import sys

SRC = os.environ.get("GRAFT_SKEW_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("GRAFT_SKEW_DIR", "/tmp/graft_skew/sf0.1skew")
QUERIES = os.environ.get("GRAFT_SKEW_QUERIES",
                         "t01,t02,t03,t15,t17,t24,t25,t26")
CONF = "spark.graft.jaccard.dfCap=256"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run(cmd, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    p = subprocess.run(cmd, shell=True, capture_output=True, text=True, env=e)
    if p.returncode != 0:
        sys.exit(f"FAILED: {cmd}\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
    return p.stdout


def bench(sf_dir):
    out = run('sbt -batch "runMain graft.Bench"', env={
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_ONLY": QUERIES,
        "SPARK_GRAFT_BENCH_CONF": CONF,
        "SPARK_GRAFT_CPUS": CPUS,
    })
    m = re.search(r'\{"metric":.*\}', out)
    if not m:
        sys.exit(f"no bench line in output:\n{out[-2000:]}")
    parsed = json.loads(m.group(0))
    # a failing query is recorded by Bench as a near-zero timing with the
    # failure only in "errs" — which would read as a PERFECT ratio here;
    # the probe must never publish a verdict over errored runs
    if parsed.get("errs"):
        sys.exit(f"bench reported query errors at {sf_dir}: {parsed['errs']}")
    return parsed


def main():
    rows_healthy = 5000
    print(f"generating skewed corpus at {OUT} ...")
    gen = run(f'sbt -batch "runMain graft.SkewGen {SRC} {OUT}"',
              env={"SPARK_GRAFT_CPUS": CPUS})
    mg = re.search(r"documents: (\d+) rows", gen)
    rows_skewed = int(mg.group(1)) if mg else 17000
    row_ratio = rows_skewed / rows_healthy

    print("bench: healthy corpus ...")
    healthy = bench(SRC)
    print("bench: skewed corpus ...")
    skewed = bench(OUT)

    result = {
        "probe": ("adversarial skew (graft.SkewGen): corpus-wide hot token "
                  "(df=corpus), 10k-doc near-dup chain (diameter ~5k), 2k "
                  "shared-prefix docs (LSH mega-buckets); dfCap=256 so the "
                  "guard binds at probe scale; the shared-prefix docs double "
                  "as mega-duplicated grams for the exact-substring family "
                  "(t24/t25) and as index-side mega-buckets for the "
                  "incremental path's per-(bucket, delta-doc) cap (t26)"),
        "base_sf_dir": SRC,
        "skew_dir": OUT,
        "rows": {"healthy": rows_healthy, "skewed": rows_skewed},
        "row_ratio": round(row_ratio, 2),
        "conf": CONF,
        "cpus": int(CPUS),
        "healthy_sec": healthy["queries"],
        "skewed_sec": skewed["queries"],
        "ratio": {},
        "verdict": {},
    }
    ok = True
    for q, h in healthy["queries"].items():
        s = skewed["queries"].get(q)
        if s is None:
            continue
        # small absolute floor: sub-second queries are scheduling noise
        ratio = s / max(h, 0.2)
        result["ratio"][q] = round(ratio, 2)
        # superlinear = worse than the row growth with 1.5x headroom
        # (skewed data also changes per-row work, e.g. 13 CC rounds vs 10)
        bound = row_ratio * 1.5
        verdict = "ok" if ratio <= bound else f"SUPERLINEAR (> {bound:.1f}x)"
        result["verdict"][q] = verdict
        ok = ok and ratio <= bound
    result["all_linear"] = ok
    with open("BENCH_SKEW.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    if not ok:
        sys.exit("superlinear query under skew - guard failed")


if __name__ == "__main__":
    main()
