#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the declared oracle SQL in DuckDB
over the same sf dir and compare (columns sorted by name, rows sorted,
values canonicalized). Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def dtype_class(s: pd.Series) -> str:
    """Coarse type class, mimicking the driver's type-sensitive hash.
    DuckDB HUGEINT (e.g. an unwrapped windowed SUM(BIGINT)) lands in
    pandas as float64, so an int-typed Spark column vs a HUGEINT
    oracle column shows up as int-vs-float here and FAILS — exactly
    what the driver does (q184, round 11)."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    if k == "O":
        vals = s.dropna()
        if len(vals):
            v = vals.iloc[0]
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            # Spark DATE reads back as object-of-datetime.date while
            # DuckDB DATE reads as datetime64 — same class (the
            # driver's hasher passes these; cell() canonicalizes both
            # to %Y-%m-%d)
            import datetime
            if isinstance(v, datetime.date):
                return "ts"
    return "obj"

def cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, pd.Timestamp):
        if v == v.normalize():
            return v.strftime("%Y-%m-%d")  # midnight == plain date
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if hasattr(v, "tolist"):  # numpy arrays / lists
        return str([cell(x) for x in v.tolist()])
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        tg = [dtype_class(got[c]) for c in got.columns]
        te = [dtype_class(exp[c]) for c in exp.columns]
        if tg != te:
            diffs = [(c, a, b) for c, a, b in zip(got.columns, tg, te) if a != b]
            print(f"FAIL {name}: dtype classes differ (spark vs duckdb): {diffs}")
            n_bad += 1
            continue
        gh = got.map(cell)
        eh = exp.map(cell)
        neq = (gh != eh)
        if neq.any().any():
            bad_rows = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad_rows.sum())}/{len(got)} rows differ; first:")
            idx = bad_rows.idxmax()
            print("  spark :", dict(gh.loc[idx]))
            print("  duckdb:", dict(eh.loc[idx]))
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
