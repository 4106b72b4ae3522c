#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over <sf_dir>'s
tables, sorts columns by name and rows by all columns, and compares.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


class ArrayCellError(Exception):
    """The driver's pandas row-sort crashes on list/ndarray cells
    (TypeError: unhashable type) — treat any array column as a failure."""


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        bad = df[c].map(
            lambda v: not isinstance(v, str) and hasattr(v, "__iter__"),
            na_action="ignore")
        if bad.any():
            raise ArrayCellError(f"column {c!r} holds array cells")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    # Dtype-sensitive, mirroring the driver's value hash: an int64 26817
    # from Spark does NOT match DuckDB's float64 26817.0 (hugeint sums
    # come back as floats via pandas — cast them to BIGINT in oracle SQL).
    a_f, b_f = isinstance(a, float), isinstance(b, float)
    if a_f != b_f:
        return False
    if a_f:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    vdir, sfdir = sys.argv[1], sys.argv[2]
    sql = json.load(open(f"{vdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    # attempted.json (written by Verify) distinguishes a targeted run's
    # deliberately-undumped queries (skip) from a crashed query whose dump
    # is missing (hard FAIL). Absent file = strict mode: everything counts.
    attempted = None
    try:
        attempted = set(json.load(open(f"{vdir}/attempted.json")))
    except FileNotFoundError:
        pass
    failed = []
    checked = 0
    for name, q in sorted(sql.items()):
        if attempted is not None and name not in attempted:
            continue
        checked += 1
        try:
            got = canon(pd.read_parquet(f"{vdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failed.append(name)
            continue
        try:
            exp = canon(con.execute(q).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failed.append(name)
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failed.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failed.append(name)
            continue
        mism = None
        for c in got.columns:
            for i, (x, y) in enumerate(zip(got[c].tolist(), exp[c].tolist())):
                xna = x is None or (isinstance(x, float) and math.isnan(x))
                yna = y is None or (isinstance(y, float) and math.isnan(y))
                if xna and yna:
                    continue
                if xna != yna or not cells_equal(x, y):
                    mism = (c, i, x, y)
                    break
            if mism:
                break
        if mism:
            c, i, x, y = mism
            print(f"FAIL {name}: first mismatch col={c} row={i}: spark={x!r} oracle={y!r}")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"\n{checked - len(failed)}/{checked} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
