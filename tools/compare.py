#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: register the sfDir parquet tables as
views, run the oracle SQL in DuckDB, read the Spark parquet output, sort
both by all columns (column order normalized by name), and diff values.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"{name}: MISSING spark output")
            failed.append(name)
            continue
        try:
            oracle_rel = con.sql(sql)
            ocols = [c.lower() for c in oracle_rel.columns]
            orows = oracle_rel.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failed.append(name)
            continue
        srel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols = [c.lower() for c in srel.columns]
        srows = srel.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"{name}: SCHEMA mismatch spark={sorted(scols)} oracle={sorted(ocols)}")
            failed.append(name)
            continue
        # normalize column order by name
        operm = [ocols.index(c) for c in sorted(ocols)]
        sperm = [scols.index(c) for c in sorted(scols)]
        oset = sorted(tuple(norm(r[i]) for i in operm) for r in orows)
        sset = sorted(tuple(norm(r[i]) for i in sperm) for r in srows)
        if oset == sset:
            print(f"{name}: OK ({len(sset)} rows)")
        else:
            print(f"{name}: VALUE mismatch spark={len(sset)} oracle={len(oset)} rows")
            only_s = [r for r in sset if r not in oset][:5]
            only_o = [r for r in oset if r not in sset][:5]
            print(f"  spark-only: {only_s}")
            print(f"  oracle-only: {only_o}")
            failed.append(name)
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} OK; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
