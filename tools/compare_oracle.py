#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify's
parquet output against the DuckDB oracle SQL, compare row/schema/hash.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [q1,q2,...]
(the optional third arg restricts the compare to named queries — pair it
with graft.Verify's same filter arg for a fast single-query loop)

Emits <verifyOutDir>/correctness.json with the driver artifact's shape —
per-query {rows_match, schema_match, hash_match, err} — so the repo owns
a committed correctness attestation independent of the driver (VERDICT
r14 item 1: the driver's CORRECTNESS_r14.json arrived empty).

Queries compare in PARALLEL (one DuckDB connection per worker process);
the serial compare was ~6 min at sf0.01, the pool runs the same set in
well under a minute on this box.
"""
import hashlib
import json
import math
import multiprocessing as mp
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_worker = {}


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


def rows_hash(rows):
    h = hashlib.md5()
    for r in rows:
        for v in r:
            h.update(v.encode("utf-8"))
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def _init(sf_dir):
    import duckdb
    con = duckdb.connect()
    # one pool process per core already: an uncapped connection spawns
    # its own all-core thread pool (30 workers x 32 duckdb threads
    # measured 48 min of sys time at sf0.001 — pure scheduler thrash)
    con.execute("SET threads=2")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    _worker["con"] = con


def _compare(task):
    """One query: returns (name, result-dict). Never raises — a worker
    exception must surface as err text, not kill the pool."""
    name, sql, out_dir, threads = task
    import time
    import pyarrow.dataset as pads
    t0 = time.monotonic()
    # set per task (workers are reused — a raised count must not leak
    # into the next task on the same worker)
    _worker["con"].execute(f"SET threads={threads}")
    res = {"rows_match": False, "schema_match": False,
           "hash_match": False, "err": None}
    try:
        try:
            spark_tbl = pads.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            res["err"] = f"no spark output ({e})"
            return name, res
        try:
            duck = _worker["con"].execute(sql).fetch_arrow_table()
        except Exception as e:
            res["err"] = f"oracle sql error: {str(e).splitlines()[0]}"
            return name, res
        s_names = sorted(spark_tbl.column_names)
        d_names = sorted(duck.column_names)
        res["schema_match"] = s_names == d_names
        if not res["schema_match"]:
            res["err"] = f"columns {s_names} vs {d_names}"
            return name, res
        res["rows_match"] = spark_tbl.num_rows == duck.num_rows
        if not res["rows_match"]:
            res["err"] = f"rows {spark_tbl.num_rows} vs {duck.num_rows}"
            return name, res
        s_rows = rows_canon(spark_tbl.column_names,
                            [c.to_pylist() for c in spark_tbl.columns])
        d_rows = rows_canon(duck.column_names,
                            [c.to_pylist() for c in duck.columns])
        res["hash_match"] = rows_hash(s_rows) == rows_hash(d_rows)
        res["n_rows"] = spark_tbl.num_rows
        if not res["hash_match"]:
            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            res["err"] = (f"{len(diffs)} row diffs; first: "
                          f"spark={diffs[0][0]} duck={diffs[0][1]}"
                          if diffs else "row diffs (length mismatch)")
    except Exception as e:  # pragma: no cover — belt and braces
        res["err"] = f"compare error: {e}"
    finally:
        res["sec"] = round(time.monotonic() - t0, 2)
    return name, res


def main(sf_dir, out_dir, only=None):
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
    # Longest-job-first scheduling off the PREVIOUS run's per-query secs
    # (if a correctness.json is already in outDir): the q193 recursive-CTE
    # oracle is ~5 min at 2 duckdb threads and bounds the pool's wall when
    # it starts mid-alphabet. Known-heavy compares (>30 s last run) also
    # get 8 duckdb threads — the pool has idle cores by the time only
    # stragglers remain.
    prev = {}
    try:
        prev = {k: v.get("sec", 0.0) for k, v in json.load(
            open(f"{out_dir}/correctness.json"))["queries"].items()}
    except Exception:
        pass
    tasks = [(name, sql, out_dir, 8 if prev.get(name, 0) > 30 else 2)
             for name, sql in sorted(oracle.items(),
                                     key=lambda kv: -prev.get(kv[0], 0.0))]
    procs = min(len(tasks), max(2, (os.cpu_count() or 4) - 2)) or 1
    with mp.Pool(processes=procs, initializer=_init,
                 initargs=(sf_dir,)) as pool:
        results = dict(pool.map(_compare, tasks, chunksize=1))
    n_pass = n_fail = 0
    for name in sorted(results):
        r = results[name]
        ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
        if ok:
            fp = f" fp={fps[name]}" if name in fps else ""
            print(f"PASS {name} ({r.get('n_rows', '?')} rows){fp}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {r['err']}")
            n_fail += 1
        if name in fps:
            r["fingerprint"] = fps[name]
    # A filtered run (the single-query debug loop) must not clobber the
    # full run's artifact: the full per-query secs drive longest-job-first
    # scheduling, and correctness.json is the round's attestation. Write
    # filtered results to correctness.partial.json instead (ADVICE r15).
    art_path = (f"{out_dir}/correctness.partial.json" if only
                else f"{out_dir}/correctness.json")
    art = {"sf": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
           "queries": results}
    with open(art_path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    slow = sorted(results.items(), key=lambda kv: -kv[1].get("sec", 0))[:5]
    print("slowest compares: " +
          ", ".join(f"{k}={v['sec']}s" for k, v in slow))
    print(f"== {n_pass} pass / {n_fail} fail ==")
    print(f"wrote {art_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
