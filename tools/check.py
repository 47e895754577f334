#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run DuckDB oracle SQL over
the sf tables and compare with the Spark parquet output written by
graft.Verify. Usage:
  tools/check.py <sfDir> <verifyOutDir> [--json OUT.json] [query ...]

A VerifySubset dump writes the FULL oracle map but only the named
queries' parquet — when checking such a dir, pass those query names;
a no-names invocation checks every oracle entry and will fail on the
queries the subset run never dumped.

Handles both table layouts: the driver's flat `<table>.parquet` files and
ScaleUp's `<table>.parquet/` directories of part files. ScaleUp writes
`events.ts` as raw INT64 nanoseconds (Spark cannot write parquet
TIMESTAMP(NANOS)); the view layer converts it back to a µs TIMESTAMP so
oracle SQL sees the same type at every scale factor.

With --json, writes a per-query artifact in the driver's CORRECTNESS
format plus an `sf` field per run — the per-scale-factor evidence ADVICE
r7 asked for (a single flat file cannot back a cross-scale claim).
"""
import json, os, sys
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Queries whose VALUES are waived by design: the oracle reproduces row
# count and schema, but the payload is engine-specific (Spark's HLL++
# estimate has no DuckDB twin). The engine-independent property (the
# estimate's error bound) is fully hash-gated by kpi_headcount_audit.
# The authoritative map is SparkEntry.valueWaived, dumped by Verify as
# <outDir>/waivers.json with per-query reasons; this set is the
# fallback for older dumps without one.
VALUE_WAIVED = {"kpi_headcount_approx"}

def table_source(sf_dir, t):
    p = f"{sf_dir}/{t}.parquet"
    return f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"

def main():
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    # The compare is row-order-insensitive (rows are sorted/hashed below),
    # so DuckDB need not preserve insertion order — dropping it lets the
    # big aggregations stream instead of materializing (r11: the sf10
    # text_linedup oracle OOM'd a 125 GB box with order preservation on,
    # passes without it; check_staged.py has set this since r10).
    con.execute("SET preserve_insertion_order = false")
    con.execute(f"SET memory_limit = '{os.environ.get('CHECK_MEM', '100GB')}'")
    for t in TABLES:
        src = table_source(sf_dir, t)
        cols = "*"
        if t == "events":
            # schema-level probe: works on zero rows, where the previous
            # fetchone()[0] on a value row crashed with TypeError
            row = con.sql(
                f"SELECT column_type FROM (DESCRIBE SELECT ts FROM {src})"
            ).fetchone()
            ts_type = row[0] if row else None
            if ts_type == "BIGINT":
                cols = ("event_id, make_timestamp(ts // 1000) AS ts, "
                        "user_id, event_type, value, props")
        con.execute(f"CREATE VIEW {t} AS SELECT {cols} FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    waiver_path = f"{out_dir}/waivers.json"
    waivers = (json.load(open(waiver_path)) if os.path.exists(waiver_path)
               else {n: "value waived (legacy dump: no waivers.json)"
                     for n in VALUE_WAIVED})
    n_pass = n_fail = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None,
               "sf": sf_dir}
        report[name] = rec
        try:
            want = con.sql(sql).df()
        except Exception as e:
            rec["err"] = f"oracle error: {e}"
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            rec["err"] = f"spark output missing: {e}"
            print(f"FAIL {name}: {rec['err']}")
            n_fail += 1
            continue
        rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
        ok, msg = compare(want, got)
        rec["rows_match"] = len(want) == len(got)
        rec["schema_match"] = sorted(want.columns) == sorted(got.columns)
        rec["hash_match"] = ok
        if name in waivers and rec["rows_match"] and rec["schema_match"]:
            n_pass += 1
            if not ok:
                # self-describing artifact: this row is a DESIGNED waiver,
                # not a failure — carry the reason so no reader re-derives
                # it from SURVEY.md
                rec["waived"] = True
                rec["waive_reason"] = waivers[name]
            note = "" if ok else " [value waived: engine-specific sketch]"
            print(f"PASS {name} ({len(got)} rows, rows+schema gate{note})")
        elif ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            rec["err"] = msg
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"wrote {json_out}")
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
    # vectorized exact compare (the per-row Python loop took minutes per
    # million-row query at sf1): numeric dtypes compare by value with
    # NaN==NaN; everything else by string repr with a both-missing mask.
    # str() of float64 is round-trippable, so string compare is exact for
    # mixed/object columns too; the numeric fast path keeps -0.0 == 0.0.
    for c in wc:
        aw, ag = w[c], g[c]
        both_na = aw.isna() & ag.isna()
        if aw.dtype == ag.dtype and pd.api.types.is_numeric_dtype(aw):
            ok = both_na | (aw == ag)
        else:
            ok = both_na | (aw.astype(str) == ag.astype(str))
        # nullable (extension) dtypes propagate NA through == and
        # Series.all() SKIPS NA — a one-sided NULL would silently pass.
        # Force NA -> mismatch.
        ok = ok.fillna(False)
        if not ok.all():
            i = int(ok.idxmin())
            a, b = aw[i], ag[i]
            return False, f"col {c} row {i}: oracle={a!r} spark={b!r}"
    return True, ""

if __name__ == "__main__":
    main()
