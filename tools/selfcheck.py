#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each query's
parquet dump from Verify, run the oracle SQL in DuckDB over the same
testdata parquet tables, compare row count / column names / values."""
import json, sys, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    entry = {"rows_match": False, "schema_match": False, "hash_match": False}
    try:
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
        got_cols = [d[0] for d in con.description]
        want = con.execute(sql).fetchall()
        want_cols = [d[0] for d in con.description]
        entry["rows_match"] = len(got) == len(want)
        entry["schema_match"] = sorted(got_cols) == sorted(want_cols)
        if entry["rows_match"] and entry["schema_match"]:
            gi = [got_cols.index(c) for c in sorted(got_cols)]
            wi = [want_cols.index(c) for c in sorted(want_cols)]
            ok = True
            for r, (g, w) in enumerate(zip(got, want)):
                for a, b in zip([g[i] for i in gi], [w[i] for i in wi]):
                    same = (a == b)
                    if not same and isinstance(a, float) and isinstance(b, float):
                        same = (math.isnan(a) and math.isnan(b)) or a == b
                    if not same:
                        if ok:  # report first diff only
                            entry["first_diff"] = f"row {r}: {a!r} != {b!r}"
                        ok = False
                        break
                if not ok:
                    break
            entry["hash_match"] = ok
        elif not entry["rows_match"]:
            entry["first_diff"] = f"rows {len(got)} vs {len(want)}"
        else:
            entry["first_diff"] = f"cols {got_cols} vs {want_cols}"
    except Exception as e:
        entry["error"] = str(e).split("\n")[0][:200]
    results[name] = entry

n_ok = sum(1 for e in results.values() if e.get("hash_match"))
for name, e in results.items():
    flag = "OK " if e.get("hash_match") else "FAIL"
    extra = e.get("error") or e.get("first_diff") or ""
    print(f"{flag} {name} {extra}")
print(f"\n{n_ok}/{len(results)} hash-match")
