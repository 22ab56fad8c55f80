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

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            oref = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        mcols, ocols = sorted(mine.columns), sorted(oref.columns)
        if mcols != ocols:
            print(f"FAIL {name}: column mismatch spark={mcols} oracle={ocols}")
            n_fail += 1
            continue
        m = mine[mcols].sort_values(mcols).reset_index(drop=True)
        o = oref[ocols].sort_values(ocols).reset_index(drop=True)
        if len(m) != len(o):
            print(f"FAIL {name}: row count spark={len(m)} oracle={len(o)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(m)):
            for c in mcols:
                if not close(m.at[i, c], o.at[i, c]):
                    bad = (i, c, m.at[i, c], o.at[i, c])
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(m)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
