#!/usr/bin/env python3
"""Oracle result-type lint: flag DuckDB oracle columns whose type does not
round-trip through a pandas/pyarrow fetch identically to the Spark parquet
dump — HUGEINT/UHUGEINT (→ float64, so "1000000.0" vs "1000000"), DECIMAL
(float64 with precision loss), or an int-vs-float dtype split between the
two sides. These hash-mismatch at the driver even when the values agree.

Usage: python3 tools/check_types.py <sfDir> <outDir>
Dev-only tool; the shipped engine is the Scala code under src/main.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

LOSSY = {"HUGEINT", "UHUGEINT"}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_flag = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:
            print(f"FLAG {name}: oracle errored: {e}")
            n_flag += 1
            continue
        try:
            srel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet') LIMIT 0")
            spark_types = dict(zip(srel.columns, [str(t) for t in srel.types]))
        except Exception:
            spark_types = {}
        for c, dt in duck_types.items():
            base = dt.split("(")[0]
            st = spark_types.get(c)
            if base in LOSSY:
                print(f"FLAG {name}.{c}: duck {dt} -> pandas float64 (spark {st})")
                n_flag += 1
            elif base == "DECIMAL" and st not in (None, dt):
                print(f"FLAG {name}.{c}: duck {dt} vs spark {st}")
                n_flag += 1
            elif st is not None:
                ints = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
                if (base in ints) != (st.split("(")[0] in ints) and \
                        base != st.split("(")[0]:
                    print(f"FLAG {name}.{c}: duck {dt} vs spark {st}")
                    n_flag += 1
    print(f"== {n_flag} flags ==")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
