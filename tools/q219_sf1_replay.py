#!/usr/bin/env python3
"""Focused sf1 replay of the q219_crosslingual_neardup oracle with the
FULL DuckDB oracle text, unbudgeted.

The q219 oracle is the q35 `scored` CTE (the 16-bit/4-band portable
LSH over 50k vectors — within-bucket candidates grow ~n²/2¹⁶ with
density, the documented fixed-bit contract) plus two documents joins.
At sf1 that single-threaded-ish replay exceeds
check_oracle_sf1.py's per-query subprocess budget, so — exactly like
the q100 precedent — the verdict comes from this dedicated script:
same canonicalization and dtype-class comparison as check_oracle.py,
no wall-clock budget. Round-12 measurement: 1,484 s under a loaded
machine, 37,717 rows, schema and type-sensitive value equality EXACT.

Usage: q219_sf1_replay.py <sfDir> <verifyOutDir>
  (verifyOutDir must contain q219_crosslingual_neardup/ and
   oracle_sql.json from `graft.Verify`.)
"""
import importlib.util
import json
import sys
import time

import duckdb
import pandas as pd

HERE = __file__.rsplit("/", 1)[0]
spec = importlib.util.spec_from_file_location("co", f"{HERE}/check_oracle.py")
co = importlib.util.module_from_spec(spec)
spec.loader.exec_module(co)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in co.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[
        "q219_crosslingual_neardup"]
    t0 = time.time()
    exp = co.canon(con.execute(sql).df())
    took = time.time() - t0
    got = co.canon(
        pd.read_parquet(f"{out_dir}/q219_crosslingual_neardup"))
    schema_ok = (list(exp.columns) == list(got.columns) and all(
        co.dtype_class(exp[c]) == co.dtype_class(got[c])
        for c in exp.columns))
    rows_ok = len(exp) == len(got)
    hash_ok = rows_ok and schema_ok and all(
        (exp[c].map(co.cell).values == got[c].map(co.cell).values).all()
        for c in exp.columns)
    verdict = "OK" if hash_ok else "FAIL"
    print(f"{verdict} q219_crosslingual_neardup ({len(got)} rows, "
          f"oracle {took:.0f}s, rows={rows_ok} schema={schema_ok} "
          f"hash={hash_ok})")
    return 0 if hash_ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
