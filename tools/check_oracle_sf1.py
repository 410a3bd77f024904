#!/usr/bin/env python3
"""Driver-side sf1 parity sweep: check_oracle.py's compare with a
PER-QUERY wall-clock budget, so one pathological single-threaded
DuckDB oracle (q100's recursive semantic-dedup closure at 50k
vectors) cannot stall the whole sweep. Each query runs in a fresh
subprocess; over-budget queries are recorded as TIMEOUT (not a
correctness verdict — the ENGINE result exists; the single-threaded
replay is what ran out of time). Resumable: pass a done-file of
names to skip. Usage:
  check_oracle_sf1.py <sfDir> <verifyOutDir> [timeoutSec] [doneFile]
"""
import json, multiprocessing as mp, queue as queue_mod, sys


def one(sf_dir, out_dir, name, sql, q):
    import math
    import duckdb
    import pandas as pd

    TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6g}"
        if isinstance(v, pd.Timestamp):
            if v == v.normalize():
                return v.strftime("%Y-%m-%d")
            return v.strftime("%Y-%m-%d %H:%M:%S")
        if hasattr(v, "tolist"):
            return str([cell(x) for x in v.tolist()])
        return str(v)

    def dtype_class(s):
        # Type-sensitive like the driver's hash: DuckDB HUGEINT
        # (unwrapped windowed SUM(BIGINT)) lands as float64, so
        # int-vs-float mismatches FAIL here instead of slipping
        # through %.6g canonicalization (q184, round 11).
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
                import datetime
                if isinstance(v, datetime.date):
                    return "ts"
        return "obj"

    try:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        exp = canon(con.execute(sql).df())
        if list(got.columns) != list(exp.columns):
            q.put(f"FAIL {name}: columns {list(got.columns)} != "
                  f"{list(exp.columns)}")
            return
        if len(got) != len(exp):
            q.put(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            return
        tg = [dtype_class(got[c]) for c in got.columns]
        te = [dtype_class(exp[c]) for c in exp.columns]
        if tg != te:
            diffs = [(c, a, b)
                     for c, a, b in zip(got.columns, tg, te) if a != b]
            q.put(f"FAIL {name}: dtype classes differ: {diffs}")
            return
        if (got.map(cell) != exp.map(cell)).any().any():
            q.put(f"FAIL {name}: values differ")
            return
        q.put(f"OK   {name} ({len(got)} rows)")
    except Exception as e:
        q.put(f"FAIL {name}: {e}")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    done = set()
    if len(sys.argv) > 4:
        done = {l.split()[1] for l in open(sys.argv[4])
                if l.startswith(("OK", "FAIL", "TIME"))}
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    counts = {"OK": 0, "FAIL": 0, "TIME": 0}
    for name, sql in sorted(oracle.items()):
        if name in done:
            continue
        q = mp.Queue()
        p = mp.Process(target=one, args=(sf_dir, out_dir, name, sql, q))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"TIMEOUT {name} (> {budget}s single-threaded replay)",
                  flush=True)
            counts["TIME"] += 1
        else:
            # The child can die without putting a result (native DuckDB
            # crash / OOM kill) — a bare q.get() would block forever.
            try:
                line = q.get(timeout=10)
            except queue_mod.Empty:
                line = f"FAIL {name}: child exited without result " \
                       f"(exitcode {p.exitcode})"
            print(line, flush=True)
            counts["OK" if line.startswith("OK") else "FAIL"] += 1
    print(f"\n{counts['OK']} ok, {counts['FAIL']} failed, "
          f"{counts['TIME']} timed out", flush=True)


if __name__ == "__main__":
    main()
