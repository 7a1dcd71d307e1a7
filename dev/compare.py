#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same testdata
tables, canonicalize (sort columns by name), and compare row-by-row.

Usage: python3 dev/compare.py <sf_dir> <verify_out> [query names... — optional subset for chunked/resumed runs]
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if v is None:
        return "<NULL>"
    return str(v)

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for miss in sorted(set(only) - set(oracles)):
        # a typo'd subset name must FAIL, not verify vacuously
        print(f"FAIL {miss}: no such oracle")
        n_fail += 1
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        pq = os.path.join(out_dir, name)
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output dumped")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: can't read spark parquet: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        grows = [tuple(canon(v) for v in r) for r in got.itertuples(index=False)]
        wrows = [tuple(canon(v) for v in r) for r in want.itertuples(index=False)]
        if grows != wrows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, wrows)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  spark:  {grows[bad]}")
            print(f"  duckdb: {wrows[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
