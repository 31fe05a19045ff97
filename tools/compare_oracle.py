#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify's
parquet output against the DuckDB oracle SQL, compare row/schema/hash.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [q1,q2,...]
(the optional third arg restricts the compare to named queries — pair it
with graft.Verify's same filter arg for a fast single-query loop)
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    return repr(val)


def rows_canon(names, cols):
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = list(zip(*[cols[i] for i in order])) if cols else []
    return sorted(tuple(canon(v) for v in r) for r in rows)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    # plan fingerprints stamped by graft.Verify (r13+): carried onto each
    # result line so a correctness run is linkable to the bench run that
    # shares its plans (same normalization, partition counts factored out)
    try:
        fps = json.load(open(f"{out_dir}/fingerprints.json"))
    except Exception:
        fps = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pads.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        s_names = sorted(spark_tbl.column_names)
        d_names = sorted(duck.column_names)
        if s_names != d_names:
            print(f"FAIL {name}: columns {s_names} vs {d_names}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows {spark_tbl.num_rows} vs {duck.num_rows}")
            n_fail += 1
            continue
        s_rows = rows_canon(spark_tbl.column_names,
                            [c.to_pylist() for c in spark_tbl.columns])
        d_rows = rows_canon(duck.column_names,
                            [c.to_pylist() for c in duck.columns])
        if s_rows != d_rows:
            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            print(f"FAIL {name}: {len(diffs)} row diffs; first: "
                  f"spark={diffs[0][0]} duck={diffs[0][1]}")
            n_fail += 1
            continue
        fp = f" fp={fps[name]}" if name in fps else ""
        print(f"PASS {name} ({spark_tbl.num_rows} rows){fp}")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
