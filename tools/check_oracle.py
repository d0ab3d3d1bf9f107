#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Runs each oracle_sql.json query in DuckDB over the sf parquet tables and
compares with the Spark result parquet: column names sorted, rows sorted,
exact value equality (floats compared bit-exactly, with a report of the
max abs diff when they differ).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        got = con.sql(f"SELECT * FROM read_parquet({files})").df()
        if name not in oracle:
            print(f"  {name}: NO ORACLE (rows={len(got)})")
            continue
        exp = con.sql(oracle[name]).df()
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        status = []
        if list(got.columns) != list(exp.columns):
            status.append(f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}")
        elif len(got) != len(exp):
            status.append(f"ROWS got={len(got)} exp={len(exp)}")
        else:
            gs = got.sort_values(by=list(got.columns), ignore_index=True)
            es = exp.sort_values(by=list(exp.columns), ignore_index=True)
            for c in got.columns:
                gv, ev = gs[c], es[c]
                if gv.dtype.kind != ev.dtype.kind:
                    status.append(f"DTYPE {c} got={gv.dtype} exp={ev.dtype}")
                    continue
                try:
                    same = (gv.equals(ev)) or bool((gv.fillna(-9e99) == ev.fillna(-9e99)).all())
                except Exception:
                    same = list(gv) == list(ev)
                if not same:
                    detail = ""
                    try:
                        import numpy as np
                        d = (gv.astype(float) - ev.astype(float)).abs()
                        detail = f" maxdiff={d.max():.3e} n={int((d > 0).sum())}"
                    except Exception:
                        bad = [(a, b) for a, b in zip(gv, ev) if a != b and not (a != a and b != b)][:3]
                        detail = f" ex={bad}"
                    status.append(f"COL {c}{detail}")
            # also verify row order as emitted (driver may not sort rows)
            if not status and not got.equals(exp):
                status.append("ORDER (values equal after sort, emitted order differs)")
        if status:
            n_bad += 1
            print(f"  {name}: FAIL {'; '.join(status)}")
        else:
            n_ok += 1
            print(f"  {name}: ok ({len(got)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
