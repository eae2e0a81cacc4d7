#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Reads Verify.scala output (outDir/<name>/ parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf directory, and
compares: row count, column names (sorted), and values (rows sorted,
floats at FULL precision via repr — matching the driver's hash, which
compares complete double representations; a 1-ulp divergence must FAIL
here, never pass locally and fail at the gate).

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noor = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        got = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            print(f"  NO-ORACLE {name}: rows={got.shape[0]} (rows-only check)")
            n_noor += 1
            continue
        exp = con.sql(oracle[name])
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"  FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
            continue
        # types too: a DuckDB HUGEINT vs a Spark BIGINT hashes the same
        # values here but can fail the driver's schema gate
        gtypes = dict(zip(got.columns, (str(t) for t in got.types)))
        etypes = dict(zip(exp.columns, (str(t) for t in exp.types)))
        mism = [c for c in gcols if gtypes[c] != etypes[c]]
        if mism:
            print(f"  WARN {name}: column type drift "
                  f"{[(c, gtypes[c], etypes[c]) for c in mism]}")
        grows = sorted(tuple(canon(v) for v in row) for row in
                       got.select(", ".join(f'"{c}"' for c in gcols)).fetchall())
        erows = sorted(tuple(canon(v) for v in row) for row in
                       exp.select(", ".join(f'"{c}"' for c in ecols)).fetchall())
        if len(grows) != len(erows):
            print(f"  FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
        elif grows != erows:
            bad = sum(1 for a, b in zip(grows, erows) if a != b)
            print(f"  FAIL {name}: {bad}/{len(grows)} rows differ")
            for a, b in list(zip(grows, erows))[:400]:
                if a != b:
                    print(f"    spark={a}")
                    print(f"    duck ={b}")
                    break
            n_fail += 1
        else:
            print(f"  PASS {name}: {len(grows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noor} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
