#!/usr/bin/env python3
"""Local differential checker mimicking the driver's t2 gate:
run Verify's parquet dumps against DuckDB executing oracle_sql.json
on the same testdata tables. Usage: check.py <sfDir> <outDir> [key...]"""
import json, sys, math
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, Decimal):
        return ("num", float(v)) if v == v.to_integral_value() or True else v
    if isinstance(v, float):
        return ("num", v)
    if isinstance(v, int):
        return ("num", float(v))
    return ("v", str(v))

def cmp_val(a, b):
    # numeric compare exact; Decimal vs float must match exactly as numbers
    if isinstance(a, (int, float, Decimal)) and isinstance(b, (int, float, Decimal)):
        if isinstance(a, float) and isinstance(b, float):
            return (a == b) or (math.isnan(a) and math.isnan(b))
        return Decimal(str(a)) == Decimal(str(b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cmp_val(x, y) for x, y in zip(a, b))
    return str(a) == str(b)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    npass = nfail = 0
    for key, sql in oracles.items():
        if only and key not in only:
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet('{out}/{key}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {key}: no spark output ({e})"); nfail += 1; continue
        try:
            ora = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {e}"); nfail += 1; continue
        mc, oc = sorted(mine.columns), sorted(ora.columns)
        if mc != oc:
            print(f"FAIL {key}: columns differ spark={mc} oracle={oc}"); nfail += 1; continue
        if len(mine) != len(ora):
            print(f"FAIL {key}: rows spark={len(mine)} oracle={len(ora)}"); nfail += 1; continue
        m = mine[mc].values.tolist()
        o = ora[oc].values.tolist()
        bad = None
        for i, (rm, ro) in enumerate(zip(m, o)):
            for j, (a, b) in enumerate(zip(rm, ro)):
                if not cmp_val(a, b):
                    bad = (i, mc[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {key}: row {i} col {c}: spark={a!r} oracle={b!r}")
            nfail += 1
        else:
            # dtype note (informational)
            dt_m = [str(mine[c].dtype) for c in mc]
            dt_o = [str(ora[c].dtype) for c in oc]
            note = "" if dt_m == dt_o else f"  [dtypes spark={dt_m} oracle={dt_o}]"
            print(f"PASS {key} ({len(mine)} rows){note}")
            npass += 1
    print(f"== {npass} pass, {nfail} fail, {len(oracles)} oracles ==")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
