#!/usr/bin/env python3
"""Dev-only cross-check that mimics the driver's correctness gate:
run graft.Verify first, then this script compares each query's parquet dump
against its DuckDB oracle (sorted columns, sorted rows, exact values).

usage: crosscheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)) \
                .reset_index(drop=True)
            got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)) \
                .reset_index(drop=True)
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
                failures += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
                failures += 1
                continue
            if not exp.equals(got):
                neq = (exp != got) & ~(exp.isna() & got.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())} mismatching rows, e.g.")
                print("  expected:", exp[bad].head(3).to_dict("records"))
                print("  got     :", got[bad].head(3).to_dict("records"))
                failures += 1
                continue
            print(f"ok   {name}: {len(exp)} rows")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'}: "
          f"{len(oracle) - failures}/{len(oracle)} oracled queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
