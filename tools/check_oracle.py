#!/usr/bin/env python3
"""Dev-side oracle checker mimicking the driver's t2 gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (Spark result) and runs the matching
oracle_sql.json query in DuckDB over <sf_dir>/*.parquet views, compares
row sets (columns sorted by name, rows sorted, values rounded for
floats). NOT part of the engine — local development tool only.
"""
import json, sys, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize list/array cells to tuples for sorting/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     hasattr(v, "tolist") and not isinstance(v, str)).any():
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                              else (tuple(v) if isinstance(v, (list, tuple)) else v))
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
        # tz-aware → naive
        try:
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        except Exception:
            pass
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            duck_df = canon(con.execute(sql).df())
            if len(spark_df) != len(duck_df):
                print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
                fail += 1; continue
            if list(spark_df.columns) != list(duck_df.columns):
                print(f"FAIL {name}: cols {list(spark_df.columns)} vs {list(duck_df.columns)}")
                fail += 1; continue
            # elementwise compare with float tolerance
            bad = None
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                if a.dtype == "float64" or b.dtype == "float64":
                    aa = pd.to_numeric(a, errors="coerce")
                    bb = pd.to_numeric(b, errors="coerce")
                    close = ((aa - bb).abs() < 1e-6) | (aa.isna() & bb.isna())
                    if not close.all():
                        bad = (c, a[~close].head(3).tolist(), b[~close].head(3).tolist())
                        break
                else:
                    eq = (a == b) | (a.isna() & b.isna()) if hasattr(a, "isna") else (a == b)
                    if not eq.all():
                        idx = (~eq).idxmax()
                        bad = (c, a[idx], b[idx])
                        break
            if bad:
                print(f"FAIL {name}: col {bad[0]}: spark={bad[1]!r} duck={bad[2]!r}")
                fail += 1
            else:
                print(f"OK   {name} ({len(spark_df)} rows)")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
