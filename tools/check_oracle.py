#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over views
named after the tables in <sfDir>, sorts columns by name, and compares
row-by-row. Mirrors (our best understanding of) the driver's compare so
mismatches surface before the round gate runs.
"""
import json, math, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        # strict type audit: spark parquet types vs duckdb result types
        gt = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()}
        wt = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        tdiff = {c: (gt[c], wt[c]) for c in gt if c in wt and gt[c] != wt[c]}
        if tdiff:
            print(f"WARN {name}: type mismatch {tdiff}")
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        g = [tuple(canon(v) for v in row) for row in got.itertuples(index=False)]
        w = [tuple(canon(v) for v in row) for row in want.itertuples(index=False)]
        if g != w:
            bad = next(i for i in range(len(g)) if g[i] != w[i])
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  spark : {g[bad]}")
            print(f"  duckdb: {w[bad]}")
            failures += 1
            continue
        print(f"ok   {name} ({len(got)} rows)")
    # queries without oracle: rows-only check, driven off the dump's
    # manifest. queries.txt is SCOPED to what Verify actually dumped
    # (r8 verdict item 5), so a SPARK_GRAFT_ONLY subset run no longer
    # FAILs every unselected query — while within the manifest a query
    # that FAILED inside Verify (no output dir) still cannot silently
    # pass.
    declared = open(f"{out_dir}/queries.txt").read().split()
    for name in declared:
        if name in oracle:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output (self-check)")
            failures += 1
            continue
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
        status = "ok  " if n > 0 else "FAIL"
        if n == 0:
            failures += 1
        print(f"{status} {name} (self-check, {n} rows)")
    print(f"\nchecked {len(oracle)} oracle + {len(declared) - len(oracle)} "
          f"self-check queries (scope: this dump's manifest)")
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
