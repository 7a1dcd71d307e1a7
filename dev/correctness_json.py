#!/usr/bin/env python3
"""Emit a driver-style CORRECTNESS json from a Verify dump: per query a
{rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}
record (the format the round files use), built by the same canonical
compare as dev/compare.py — columns sorted by name, rows in order,
floats at 6dp. Queries with no oracle (rows-only by design) record
rows_match = spark_rows > 0 with hash/schema null.

Usage: python3 dev/correctness_json.py <sf_dir> <verify_out> <out.json>
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


def main(sf_dir, out_dir, out_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    dumped = sorted(d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d)))
    # Union with the oracle list so a partial Verify dump (crash midway)
    # can never read as an all-green artifact: an oracle-bearing query
    # with no dumped directory records a loud failure, mirroring
    # dev/compare.py's "no spark output dumped".
    names = sorted(set(dumped) | set(oracles.keys()))
    res = {}
    for name in names:
        pq = os.path.join(out_dir, name)
        rec = {"rows_match": False, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        if name not in dumped:
            rec["err"] = "no spark output dumped"
            rec["hash_match"] = False
            res[name] = rec
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetchdf()
            rec["spark_rows"] = len(got)
        except Exception as e:
            rec["err"] = f"spark parquet: {str(e)[:200]}"
            res[name] = rec
            continue
        if name not in oracles:
            # rows-only contract (q34/q49/q111 class): no SQL oracle
            rec["rows_match"] = len(got) > 0
            res[name] = rec
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
            rec["oracle_rows"] = len(want)
        except Exception as e:
            rec["err"] = f"oracle SQL: {str(e)[:200]}"
            res[name] = rec
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        rec["schema_match"] = list(got.columns) == list(want.columns)
        rec["rows_match"] = len(got) == len(want)
        if rec["schema_match"] and rec["rows_match"]:
            grows = [tuple(canon(v) for v in r)
                     for r in got.itertuples(index=False)]
            wrows = [tuple(canon(v) for v in r)
                     for r in want.itertuples(index=False)]
            rec["hash_match"] = grows == wrows
        else:
            rec["hash_match"] = False
        res[name] = rec
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    ok = sum(1 for r in res.values()
             if r["rows_match"] and r["hash_match"] in (True, None))
    print(f"{ok}/{len(res)} green -> {out_path}")
    return 0 if ok == len(res) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
