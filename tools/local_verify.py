#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (SURVEY.md §5): run
graft.Verify output against the DuckDB oracle on the same parquet tables,
sort columns by name, sort rows, and diff values.

Usage: python3 tools/local_verify.py <sfDir> <outDir> [query ...]
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def close(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, (int, float)):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if a is None and b is None:
        return True
    return str(a) == str(b)

def check_one(sf_dir, out_dir, name, sql):
    """Returns (ok, message). Fresh, CLOSED connection per query: a
    long-lived connection (or a leaked one) accumulates buffer-manager
    state across ~200 heavy queries (recursive CTEs, wide unions) and
    starts throwing Out of Memory on later queries even with free RAM —
    observed at sf0.1 on the graph oracles."""
    con = duckdb.connect()
    try:
        # at 32 threads DuckDB's per-thread reservations on the heaviest
        # oracles (list-comprehension shingle chains, d36) abort with
        # bad_alloc at sf0.1 despite free RAM; 8 threads is reliable
        con.execute("SET threads=8")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        try:
            mine = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            return False, f"spark output unreadable: {e}"
        try:
            oref = con.execute(sql).fetchdf()
        except Exception as e:
            return False, f"oracle sql error: {e}"
    finally:
        con.close()
    mcols, ocols = sorted(mine.columns), sorted(oref.columns)
    if mcols != ocols:
        return False, f"column mismatch spark={mcols} oracle={ocols}"
    m = mine[mcols].sort_values(mcols).reset_index(drop=True)
    o = oref[ocols].sort_values(ocols).reset_index(drop=True)
    if len(m) != len(o):
        return False, f"row count spark={len(m)} oracle={len(o)}"
    for i in range(len(m)):
        for c in mcols:
            if not close(m.at[i, c], o.at[i, c]):
                return False, (f"row {i} col {c}: spark={m.at[i, c]!r} "
                               f"oracle={o.at[i, c]!r}")
    return True, f"({len(m)} rows)"

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        ok, msg = check_one(sf_dir, out_dir, name, sql)
        if ok:
            print(f"PASS {name} {msg}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
