#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare: for each query dir
under outDir, run the matching oracle SQL on the sf parquet tables and
diff (rows sorted, columns sorted by name). Driver-side python only —
never imported by the engine."""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v

def main(sf_dir, out_dir, prefix=""):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}") and d.startswith(prefix))
    for name in names:
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"  {name}: rows={len(got)} (no oracle, rows-only check)",
                  "OK" if len(got) > 0 else "FAIL-EMPTY")
            failures += 0 if len(got) > 0 else 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as ex:
            print(f"  {name}: ORACLE SQL ERROR: {ex}")
            failures += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"  {name}: SCHEMA MISMATCH\n    got  {gcols}\n    want {ecols}")
            failures += 1
            continue
        g = [tuple(norm(v) for v in r) for r in got[gcols].itertuples(index=False)]
        e = [tuple(norm(v) for v in r) for r in exp[ecols].itertuples(index=False)]
        g.sort(key=repr); e.sort(key=repr)
        if g == e:
            print(f"  {name}: OK ({len(g)} rows, {len(gcols)} cols)")
        else:
            failures += 1
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"  {name}: VALUE MISMATCH rows {len(g)} vs {len(e)}")
            for a, b in bad:
                d = [(c, x, y) for c, x, y in zip(gcols, a, b) if x != y][:4]
                print(f"    diff cols: {d}")
    print(("PASS" if failures == 0 else f"FAIL ({failures})"))
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "")
