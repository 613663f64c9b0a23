#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sf parquet tables, loads the Spark result parquet from <outDir>/<name>/,
sorts columns by name + rows by all columns, and value-compares.

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import sys, json, glob, math

import duckdb

def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            oc = con.execute(sql)
            ocols = [d[0] for d in oc.description]
            orows = oc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        sc = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in sc.description]
        srows = sc.fetchall()
        oc_c, oc_r = canon(orows, ocols)
        sc_c, sc_r = canon(srows, scols)
        if oc_c != sc_c:
            print(f"FAIL {name}: cols oracle={oc_c} spark={sc_c}"); n_bad += 1
        elif oc_r != sc_r:
            diffs = [(a, b) for a, b in zip(oc_r, sc_r) if a != b]
            print(f"FAIL {name}: {len(oc_r)} vs {len(sc_r)} rows, "
                  f"{len(diffs)} differing; first: "
                  f"{diffs[0] if diffs else (oc_r[:1], sc_r[:1])}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(oc_r)} rows"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
