#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (my test tool only;
the Scala library never depends on this). Usage:
    python3 tools/check.py <sfDir> <outDir>
Reads each <outDir>/<name>/ parquet result dumped by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against views
over <sfDir>/*.parquet, and compares values after sorting columns by name
and rows by all columns."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_skip = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            arrow = con.execute(oracle[name]).arrow()
            exp = arrow.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # arrow-level schema families must match (driver may compare types)
        import pyarrow.parquet as _pq
        ss = _pq.read_schema(files[0])
        spark_t = {n: str(t).replace('large_string', 'string')
                   for n, t in zip(ss.names, ss.types)}
        duck_t = {f.name: str(f.type).replace('large_string', 'string')
                  for f in arrow.schema}
        tdiff = [(c, spark_t[c], duck_t.get(c, 'MISSING'))
                 for c in spark_t if spark_t[c] != duck_t.get(c, 'MISSING')]
        if tdiff:
            print(f"FAIL {name}: schema mismatch {tdiff}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        # dtype-aware exact compare
        mismatch = None
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                gv2 = gv.astype(ev.dtype) if gv.dtype != ev.dtype else gv
            except Exception:
                gv2 = gv
            neq = ~((gv2 == ev) | (gv2.isna() & ev.isna()))
            if neq.any():
                i = neq.idxmax()
                mismatch = (c, gv2[i], ev[i], int(neq.sum()), str(gv.dtype), str(ev.dtype))
                break
        if mismatch:
            c, a, b, n, dt1, dt2 = mismatch
            print(f"FAIL {name}: col {c} ({dt1} vs {dt2}): {n} diffs, e.g. {a!r} != {b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip (rows-only)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
