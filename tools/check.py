#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [name ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over views of
<sfDir>/*.parquet, and compares: row count, column names (sorted), and a
hash of the canonicalized values.
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical string form; floats via repr of float64
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.api.types.is_scalar(v) and pd.isna(v):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    return "\n".join(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    if os.path.exists(f"{sf_dir}/BENCH_ONLY"):
        print(f"REFUSED: {sf_dir} is a bench-only corpus "
              "(scale-docs: brute-force oracles are O(n^2) there)")
        sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset directory
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noorc = 0
    for d in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(d)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        spark_df = pd.read_parquet(d)
        if name not in oracle:
            n_noorc += 1
            status = "NO-ORACLE" if len(spark_df) > 0 else "NO-ORACLE-EMPTY"
            print(f"  {status:>10} {name} rows={len(spark_df)}")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"  ORACLE-ERR {name}: {e}")
            continue
        a, b = canon(spark_df), canon(duck_df)
        ha = hashlib.sha256(a.encode()).hexdigest()[:12]
        hb = hashlib.sha256(b.encode()).hexdigest()[:12]
        cols_a = sorted(spark_df.columns)
        cols_b = sorted(duck_df.columns)
        if cols_a != cols_b:
            n_fail += 1
            print(f"  FAIL-COLS  {name} spark={cols_a} duck={cols_b}")
        elif len(spark_df) != len(duck_df):
            n_fail += 1
            print(f"  FAIL-ROWS  {name} spark={len(spark_df)} duck={len(duck_df)}")
        elif ha != hb:
            n_fail += 1
            print(f"  FAIL-HASH  {name} ({len(spark_df)} rows)")
            la, lb = a.split("\n"), b.split("\n")
            for i, (x, y) in enumerate(zip(la, lb)):
                if x != y:
                    print(f"    row {i}: spark={x!r} duck={y!r}")
                    break
        else:
            n_pass += 1
            print(f"  PASS       {name} rows={len(spark_df)} hash={ha}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noorc} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
