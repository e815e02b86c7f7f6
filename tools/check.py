#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Loads each <name> parquet written by graft.Verify, runs the matching
oracle SQL (oracle_sql.json) in DuckDB over the sf_dir tables, sorts
columns by name, and compares row-by-row.
"""
import json, sys, glob, os
import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return sorted(cols), out


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(outdir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            scols, srows = spark_rel.columns, spark_rel.fetchall()
            duck_rel = con.sql(sql)
            dcols, drows = duck_rel.columns, duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        # Driver-parity dtype check: the driver hashes pandas frames, so
        # a DuckDB HUGEINT (-> float64/object) vs Spark int64 mismatches
        # even when the values are identical. Surface that here.
        try:
            sdf = spark_rel.df(); ddf = duck_rel.df()
            sdt = {c: str(sdf[c].dtype) for c in sdf.columns}
            ddt = {c: str(ddf[c].dtype) for c in ddf.columns}
            dt_bad = [c for c in sdt if c in ddt and sdt[c] != ddt[c]]
            if dt_bad:
                print(f"WARN {name}: pandas dtype mismatch "
                      + ", ".join(f"{c}: spark={sdt[c]} duck={ddt[c]}" for c in dt_bad)
                      + " (driver hasher would FAIL this)")
                n_bad += 1
                continue
            import pandas as _pd
            for df_, side in ((sdf, 'spark'), (ddf, 'duck')):
                for c in df_.columns:
                    if df_[c].dtype == object and len(df_) and isinstance(df_[c].iloc[0], (list, tuple)) or                        str(df_[c].dtype) == 'object' and len(df_) and df_[c].map(lambda v: hasattr(v, '__len__') and not isinstance(v, (str, bytes))).any():
                        print(f"WARN {name}: {side} column {c} holds arrays — driver sort_values would CRASH")
                        raise RuntimeError('array column')
        except RuntimeError:
            n_bad += 1
            continue
        sc, sr = canon(srows, scols)
        dc, dr = canon(drows, dcols)
        if sc != dc:
            print(f"FAIL {name}: schema {sc} != {dc}")
            n_bad += 1
        elif sr != dr:
            n_bad += 1
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)} "
                  f"first_diffs={diffs[:3]}")
            for i in diffs[:3]:
                print(f"  spark[{i}]={sr[i]}")
                print(f"  duck [{i}]={dr[i]}")
            if len(sr) != len(dr):
                print(f"  spark head={sr[:2]} duck head={dr[:2]}")
        else:
            print(f"OK   {name} ({len(sr)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
