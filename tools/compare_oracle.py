#!/usr/bin/env python3
"""Mimic the driver's correctness gate: for each query output parquet and
its oracle SQL, run the SQL in DuckDB over the sf tables and compare
row count, schema (column names), and values (sorted columns+rows)."""
import duckdb, json, sys, glob, os

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    qdir = f"{out_dir}/{name}"
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        exp = con.execute(sql).fetchdf()
        act = duckdb.connect().execute(f"SELECT * FROM '{files[0]}'").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}"); fail += 1; continue
    # sort columns by name
    exp = exp[sorted(exp.columns)]
    act = act[sorted(act.columns)]
    if list(exp.columns) != list(act.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} act={list(act.columns)}"); fail += 1; continue
    if len(exp) != len(act):
        print(f"FAIL {name}: rows exp={len(exp)} act={len(act)}"); fail += 1; continue
    # sort rows for stable compare
    exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    act_s = act.sort_values(by=list(act.columns)).reset_index(drop=True)
    diffs = []
    for c in exp.columns:
        if not exp_s[c].equals(act_s[c]):
            # tolerate dtype diff but not value diff
            ev, av = exp_s[c].astype(str), act_s[c].astype(str)
            if not ev.equals(av):
                n = (ev != av).sum()
                idx = (ev != av).idxmax()
                diffs.append(f"col {c}: {n} diffs, first at row {idx}: exp={ev[idx][:80]} act={av[idx][:80]}")
    if diffs:
        print(f"FAIL {name}: " + "; ".join(diffs[:3])); fail += 1
    else:
        print(f"OK   {name} ({len(exp)} rows)"); ok += 1

# rows-only queries
queries = [os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)]
for name in sorted(set(queries) - set(oracle)):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no output (rows-only)"); fail += 1; continue
    n = duckdb.connect().execute(f"SELECT count(*) FROM '{files[0]}'").fetchone()[0]
    status = "OK  " if n > 0 else "WARN"
    print(f"{status} {name} rows-only: {n} rows")
    if n == 0: fail += 1

print(f"\n{ok} oracled OK, {fail} failures")
sys.exit(1 if fail else 0)
