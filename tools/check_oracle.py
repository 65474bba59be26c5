#!/usr/bin/env python3
"""Local t2 rehearsal: compare Verify.scala's parquet dumps against DuckDB
running SparkEntry.oracleSql on the same fixture tables.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [keyFilter...]

Mimics the driver's compare: per query, load the Spark parquet result and the
DuckDB result of the oracle SQL (tables registered as views over
{sfDir}/{table}.parquet), sort columns by name, then compare row-by-row on
stringified values. Also flags rounded doubles that sit within 1e-6 of a
rounding boundary (risk of cross-engine round flips).

Dev-only tool; the shipped engine is the Scala code under src/main.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_rows(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    return [cols[i] for i in order], [
        tuple(norm_cell(r[i]) for i in order) for r in rows
    ]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    key_filter = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if key_filter and name not in key_filter:
            continue
        try:
            duck_cols, duck = table_rows(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            n_fail += 1
            continue
        try:
            spark_cols, spark = table_rows(
                con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if duck_cols != spark_cols:
            print(f"FAIL {name}: columns differ: duck={duck_cols} spark={spark_cols}")
            n_fail += 1
            continue
        if duck == spark:
            print(f"PASS {name} ({len(spark)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(duck)} duck rows vs {len(spark)} spark rows")
            for i, (dr, sr) in enumerate(zip(duck, spark)):
                if dr != sr:
                    print(f"  first diff at row {i}:\n    duck : {dr}\n    spark: {sr}")
                    break
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
