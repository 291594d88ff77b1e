#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against SparkEntry.oracleSql in DuckDB and diff.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [nameRegex]

With nameRegex, only matching queries are compared (focused spot-checks
at big SFs where the full closure oracles take many minutes); the
"every dump has an oracle" completeness guard only runs unfiltered.
"""
import sys, os, json, re
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for robust total ordering incl. NaN/None/arrays
    key = df.astype(str)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            # driver testdata ships single-file tables; GenScale corpora are
            # Spark-written DIRECTORIES of part files — glob those
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if not oracle:
        print("FAIL: oracle_sql.json is empty — nothing would be checked")
        sys.exit(1)
    # every dumped result must have an oracle entry (rows-only queries are
    # the explicit exception list) — a dropped/renamed oracle key must not
    # silently skip verification.
    # Round 6: the former rows-only queries (q_a4b_approx_distinct,
    # q_x_minhash_lsh_fast, q_x_bpe_merges, q_x_bpe_encode_trained) now
    # carry full oracles built from checked bounds: exact components
    # replicated in DuckDB + Spark-computed band/invariant booleans whose
    # oracle side is literal true.
    ROWS_ONLY = set()
    dumped = {d for d in os.listdir(outdir)
              if os.path.isdir(os.path.join(outdir, d))}
    unchecked = dumped - set(oracle) - ROWS_ONLY
    n_pass = n_fail = 0
    if unchecked and only is None:
        print(f"FAIL: result dirs with no oracle entry: {sorted(unchecked)}")
        n_fail += len(unchecked)
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if only.search(k)}
        ROWS_ONLY = {k for k in ROWS_ONLY if only.search(k)}
    # rows-only queries still get the weaker check the driver applies:
    # the dump exists and has rows
    for name in sorted(ROWS_ONLY):
        try:
            n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
            if n > 0:
                print(f"PASS {name} (rows-only, {n} rows)")
                n_pass += 1
            else:
                print(f"FAIL {name}: rows-only dump is empty")
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: rows-only dump unreadable: {e}")
            n_fail += 1
    for name in sorted(oracle):
        res_glob = f"{outdir}/{name}/*.parquet"
        try:
            a = con.sql(f"SELECT * FROM '{res_glob}'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            b = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        a_n, b_n = norm(a), norm(b)
        if list(a_n.columns) != list(b_n.columns):
            print(f"FAIL {name}: columns {list(a_n.columns)} vs {list(b_n.columns)}")
            n_fail += 1
            continue
        if len(a_n) != len(b_n):
            print(f"FAIL {name}: rows {len(a_n)} vs {len(b_n)}")
            n_fail += 1
            continue
        # dtype-strict: the driver hash-compares TYPED values, so an
        # untyped DuckDB aggregate (HUGEINT SUM, // division) must fail
        # here too, not just on the driver (round-2 lesson).
        if list(map(str, a_n.dtypes)) != list(map(str, b_n.dtypes)):
            pairs = [(c, str(a_n[c].dtype), str(b_n[c].dtype))
                     for c in a_n.columns
                     if str(a_n[c].dtype) != str(b_n[c].dtype)]
            print(f"FAIL {name}: dtypes differ: {pairs}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a_n, b_n, check_dtype=True,
                                          check_exact=True)
            print(f"PASS {name} ({len(a_n)} rows)")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).splitlines()
            print(f"FAIL {name}: {msg[0] if msg else e}")
            # show first few differing cells
            neq = (a_n.astype(str) != b_n.astype(str))
            cells = neq.stack()
            diffs = cells[cells].index[:5]
            for (r, c) in diffs:
                print(f"   row {r} col {c}: spark={a_n.at[r, c]!r} oracle={b_n.at[r, c]!r}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
