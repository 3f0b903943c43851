#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool, not library
code): read Verify's parquet dumps + oracle_sql.json, run each oracle in
DuckDB over the same sf dir, and compare rows/schema/value-hash the same
way the driver does (columns sorted by name, rows sorted, values stringified
then sha256'd).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, hashlib, glob, os
import duckdb
import pyarrow.parquet as pq

# Queries intentionally shipped WITHOUT an oracle (rows-only driver check).
# Currently every gate query has one; any dump directory missing from
# oracle_sql.json and not listed here is treated as a FAILURE — otherwise a
# dynamically-registered oracle that failed to materialize (e.g. a
# post-training SQL whose query errored after dumping partial state) would
# silently count toward the green total.
ORACLE_FREE = set()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results, bad = {}, []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        if not files:
            results[name] = {"err": "no_spark_dump"}
            bad.append(name)
            continue
        tbl = pq.read_table(files)  # all part files, deterministic order
        if name not in oracle:
            results[name] = {"err": "no_oracle", "spark_rows": tbl.num_rows}
            if name not in ORACLE_FREE:
                bad.append(name)
            continue
        try:
            cur = con.execute(oracle[name])
            o_cols = [c[0] for c in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            results[name] = {"err": f"oracle_failed: {e}"}
            bad.append(name)
            continue
        s_cols = tbl.column_names
        s_rows = [tuple(tbl.column(c)[i].as_py() for c in s_cols)
                  for i in range(tbl.num_rows)]
        r = {
            "rows_match": tbl.num_rows == len(o_rows),
            "schema_match": sorted(s_cols) == sorted(o_cols),
            "hash_match": table_hash(s_cols, s_rows) == table_hash(o_cols, o_rows),
            "spark_rows": tbl.num_rows, "oracle_rows": len(o_rows),
        }
        results[name] = r
        if not (r["rows_match"] and r["schema_match"] and r["hash_match"]):
            bad.append(name)
    print(json.dumps(results, indent=1))
    n = len(results)
    print(f"\n{n - len(bad)}/{n} green" + (f"; FAILING: {bad}" if bad else ""),
          file=sys.stderr)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
