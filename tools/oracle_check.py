#!/usr/bin/env python3
"""Local differential check mirroring the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each <name>/ parquet dir in verifyOutDir and its SQL in oracle_sql.json:
run the SQL in DuckDB over the sfDir parquet tables, sort columns by name,
and compare values row by row (exact equality). Prints PASS/FAIL per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols)
                + f" FROM spark_rel").fetchall()
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in duck_cols)
                + " FROM duck_rel").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} != {duck_cols}")
            n_fail += 1
            continue
        # Type lint (the q182/q207 class): DuckDB widens integer sums to
        # HUGEINT (int128) and some decimals to DECIMAL(38,*); Python's
        # int compare hides it but the driver's hash normalization does
        # not. FAIL any oracle output column whose DuckDB type is one of
        # the wide classes unless the Spark (parquet) type is the same.
        spark_types = dict(zip(spark_rel.columns,
                               (str(t).upper() for t in spark_rel.types)))
        duck_types = dict(zip(duck_rel.columns,
                              (str(t).upper() for t in duck_rel.types)))
        wide = [c for c in duck_cols
                if (duck_types[c] in ("HUGEINT", "UHUGEINT")
                    or duck_types[c].startswith("DECIMAL(38,"))
                and duck_types[c] != spark_types.get(c)]
        if wide:
            print(f"FAIL {name}: oracle emits wide types the Spark dump "
                  f"does not: "
                  + ", ".join(f"{c}: {duck_types[c]} vs "
                              f"{spark_types.get(c)}" for c in wide)
                  + " — CAST the oracle column (BUILDLOG r2 invariant)")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows {len(spark_rows)} != {len(duck_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            an = tuple(norm(x) for x in a)
            bn = tuple(norm(x) for x in b)
            if an != bn:
                bad = (i, an, bn)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} differs\n  spark: {a}\n  duck:  {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
