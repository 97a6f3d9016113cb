#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query result
parquet dumped by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same sf tables and compare rows/schema/values exactly
(columns sorted by name, like the driver)."""
import sys, glob, json, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    got = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    if name not in oracle:
        results[name] = {"status": "rows_only", "rows": len(got)}
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = {"status": "oracle_error", "error": str(e)[:300]}
        continue
    entry = {"rows_got": len(got), "rows_exp": len(exp)}
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        entry["status"] = "schema_mismatch"
        entry["cols_got"], entry["cols_exp"] = list(got.columns), list(exp.columns)
    elif len(got) != len(exp):
        entry["status"] = "rowcount_mismatch"
    else:
        mismatch = None
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                mismatch = {"col": c, "row": i, "got": repr(a.iloc[i]),
                            "exp": repr(b.iloc[i]),
                            "n_bad": int((~eq).sum())}
                break
        if mismatch:
            entry["status"] = "value_mismatch"
            entry["detail"] = mismatch
        else:
            # dtype check (schema-level)
            dt_got = [str(d) for d in got.dtypes]
            dt_exp = [str(d) for d in exp.dtypes]
            if dt_got != dt_exp:
                entry["status"] = "dtype_mismatch"
                entry["dtypes"] = {c: (g, e) for c, g, e in
                                   zip(got.columns, dt_got, dt_exp) if g != e}
            else:
                entry["status"] = "ok"
    results[name] = entry

n_ok = sum(1 for v in results.values() if v.get("status") == "ok")
n_rows_only = sum(1 for v in results.values() if v.get("status") == "rows_only")
print(json.dumps(results, indent=1, default=str))
print(f"\n== {n_ok} ok, {n_rows_only} rows_only, "
      f"{len(results) - n_ok - n_rows_only} BAD, of {len(results)}")
missing = set(oracle) - set(results)
if missing:
    print("MISSING RESULTS (query failed?):", sorted(missing))
