#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output (outDir/<name>/ parquet + oracle_sql.json)
against DuckDB over the same testdata dir, mimicking the driver compare:
sort columns by name, sort rows, compare values (exact for ints/strings,
bit-exact expected for rounded doubles — a tolerance pass is reported
separately so float hash risks are visible).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cellEq(a, b):
    if a is None and b is None:
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        return a == b, math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    try:
        if pd.isna(a) and pd.isna(b):
            return True, True
    except (TypeError, ValueError):
        pass
    eq = str(a) == str(b)
    return eq, eq


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{sfdir}/{tname}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    names = sorted(oracle) if not only else [n for n in sorted(oracle) if n in only]
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = normalize(con.execute(
            f"SELECT * FROM read_parquet({files!r})").df())
        try:
            exp = normalize(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            fails += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            fails += 1
            continue
        exact = close = True
        where = None
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c], exp[c])):
                e, cl = cellEq(a, b)
                exact = exact and e
                close = close and cl
                if not cl and where is None:
                    where = (c, i, a, b)
        dtypes_match = [str(d) for d in got.dtypes] == [str(d) for d in exp.dtypes]
        if close:
            tag = "PASS" if exact else "PASS~ (float-close, NOT bit-exact — hash risk)"
            dt = "" if dtypes_match else f"  [dtype mismatch: {list(map(str, got.dtypes))} vs {list(map(str, exp.dtypes))}]"
            print(f"{tag} {name}: {len(got)} rows{dt}")
            if not dtypes_match:
                fails += 1
        else:
            print(f"FAIL {name}: first diff col={where[0]} row={where[1]}: {where[2]!r} != {where[3]!r}")
            fails += 1
    print(f"\n{len(names) - fails}/{len(names)} ok")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
