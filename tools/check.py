#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run DuckDB oracle SQL over
the sf tables and compare with the Spark parquet output written by
graft.Verify. Usage: tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        ok, msg = compare(want, got)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

def compare(want, got):
    wc, gc = sorted(want.columns), sorted(got.columns)
    if wc != gc:
        return False, f"schema mismatch: oracle={wc} spark={gc}"
    if len(want) != len(got):
        return False, f"rowcount mismatch: oracle={len(want)} spark={len(got)}"
    w = want[wc].reset_index(drop=True)
    g = got[gc].reset_index(drop=True)
    # driver sorts columns by name then hashes values; emulate by sorting rows
    w = w.sort_values(by=wc, kind="mergesort").reset_index(drop=True)
    g = g.sort_values(by=gc, kind="mergesort").reset_index(drop=True)
    for c in wc:
        for i in range(len(w)):
            a, b = w[c][i], g[c][i]
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    return False, f"col {c} row {i}: oracle={a!r} spark={b!r} (diff={a-b})"
            elif str(a) != str(b):
                return False, f"col {c} row {i}: oracle={a!r} spark={b!r}"
    return True, ""

if __name__ == "__main__":
    main()
