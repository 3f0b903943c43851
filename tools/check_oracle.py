#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then this script compares
each <outDir>/<name> parquet against its oracle SQL executed by DuckDB over
the same sf tables.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob, math
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style: exact value match; format repr canonically
        return repr(v)
    return repr(v)

def table(rows, cols):
    # sort columns by name, then rows lexicographically (stringified)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            d = con.sql(sql)
            dcols, drows = d.columns, d.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        sq = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols, srows = sq.columns, sq.fetchall()
        c1, r1 = table(drows, dcols)
        c2, r2 = table(srows, scols)
        if c1 != c2:
            print(f"FAIL {name}: columns {c2} != oracle {c1}"); n_fail += 1
        elif r1 != r2:
            diff = [(a, b) for a, b in zip(r1, r2) if a != b][:3]
            print(f"FAIL {name}: {len(r1)} vs {len(r2)} rows; first diffs "
                  f"(oracle, spark): {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(r1)} rows)"); n_pass += 1
    extra = [q for q in os.listdir(out_dir)
             if os.path.isdir(f"{out_dir}/{q}") and q not in oracle]
    if extra:
        print(f"rows-only (no oracle): {sorted(extra)}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
