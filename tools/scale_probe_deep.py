#!/usr/bin/env python3
"""Deep scale probe -> the "deep" section of BENCH_SCALE.json.

At 4x a constant overhead can hide a superlinear term; one more decade
separates them (r12 VERDICT stretch #6). This probe pushes the queries
with the HIGHEST 4x ratios (default: v09 semantic dedup at 2.30, t15
dedup clusters at 2.06) to FACTOR 16x and records base/scaled medians
and ratios alongside the committed 4x section. Base timings are
re-measured in the same session as the scaled run so box drift between
rounds cannot skew the ratio.

The 4x section is left untouched — its covered paths did not change.

Usage: python3 tools/scale_probe_deep.py  (from the repo root)
"""
import json
import os
import sys

SRC = os.environ.get("GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("GRAFT_SCALE_DEEP_FACTOR", "16"))
OUT = os.environ.get("GRAFT_SCALE_DEEP_DIR", f"/tmp/graft_scale/sf_deep{FACTOR}")
SECTION = os.environ.get("GRAFT_SCALE_DEEP_SECTION", "deep")
QUERIES = os.environ.get("GRAFT_SCALE_DEEP_QUERIES", "t15,v09")

# reuse scale_probe's run/bench (same sbt invocation, artifact-line
# parse, and errored-run rejection) rather than forking a copy that
# would drift; its module-level QUERIES is env-derived, so pin the deep
# query set before import
os.environ["GRAFT_SCALE_QUERIES"] = QUERIES
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scale_probe  # noqa: E402

run = scale_probe.run
bench = scale_probe.bench
CPUS = scale_probe.CPUS


def main():
    with open("BENCH_SCALE.json") as f:
        result = json.load(f)

    if os.path.exists(f"{OUT}/embeddings.parquet/_SUCCESS"):
        # pre-built (e.g. composed 4x-of-16x for factors past ScaleGen's
        # 26-rotation cap); trust the caller's corpus
        print(f"reusing existing {FACTOR}x corpus at {OUT}")
    else:
        print(f"generating {FACTOR}x corpus at {OUT} ...")
        run(f'sbt -batch "runMain graft.ScaleGen {SRC} {OUT} {FACTOR}"',
            env={"SPARK_GRAFT_CPUS": CPUS})

    print("bench: base scale (deep queries) ...")
    base = bench(SRC)
    print(f"bench: {FACTOR}x scale (deep queries) ...")
    scaled = bench(OUT)

    deep = {
        "factor": FACTOR,
        "why": (("the two highest 4x ratios pushed one decade further: at "
                 "4x a constant overhead can hide a superlinear term")
                if SECTION == "deep" else
                (f"single-query {FACTOR}x decade probe (r13 VERDICT #2: "
                 "the occupancy-keyed sub-split must keep the "
                 "16x->64x leg linear)")),
        "base_sec": base["queries"],
        "scaled_sec": scaled["queries"],
        "ratio": {},
        "verdict": {},
    }
    ok = True
    bound = FACTOR * 1.5
    for q, b in base["queries"].items():
        s = scaled["queries"].get(q)
        if s is None:
            continue
        ratio = s / max(b, 0.2)
        deep["ratio"][q] = round(ratio, 2)
        verdict = "ok" if ratio <= bound else f"SUPERLINEAR (> {bound:.1f}x)"
        deep["verdict"][q] = verdict
        ok = ok and ratio <= bound
    # no silent caps: a typo'd query list (or a scaled run missing
    # entries) must not publish a vacuous all_linear=true
    for prefix in [p.strip() for p in QUERIES.split(",") if p.strip()]:
        if not any(q.startswith(prefix) for q in deep["ratio"]):
            sys.exit(f"deep probe measured NOTHING for '{prefix}' — "
                     "check GRAFT_SCALE_DEEP_QUERIES")
    deep["all_linear"] = ok
    result[SECTION] = deep
    with open("BENCH_SCALE.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(deep, indent=1))
    if not ok:
        sys.exit(f"superlinear query at {FACTOR}x - scaling failed")


if __name__ == "__main__":
    main()
