#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify's
parquet dumps against the DuckDB oracle SQL and diff them.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: dates/timestamps -> iso strings, floats rounded
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime", "object")):
            df[c] = df[c].astype(str)
        elif df[c].dtype == "float64":
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated entry names (lets a wrapper run the
    # board in bounded chunks — one long-lived process accumulating pandas
    # frames + duckdb temp state OOMs at 10x table scale)
    only = None
    if len(sys.argv) > 3 and sys.argv[3].strip():
        only = set(x.strip() for x in sys.argv[3].split(",") if x.strip())
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute("SET threads TO 8")
    tmp = os.environ.get("DUCKDB_TMP", "/tmp/duckdb_oracle_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    try:  # bound the spill: a quadratic oracle must error out, not fill /
        con.execute("SET max_temp_directory_size='15GB'")
    except Exception:
        pass
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        if only is not None and name not in only:
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            status = "ROWS-ONLY"
            ok = len(got) > 0
            n_rowsonly += 1
            print(f"{'OK ' if ok else 'ZERO'} {status:10s} {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL SQL-ERR    {name}: {e}")
            n_fail += 1
            continue
        g, w = norm(got.copy()), norm(want.copy())
        if list(g.columns) != list(w.columns):
            print(f"FAIL COLS       {name}: got {list(g.columns)} want {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL ROWS       {name}: got {len(g)} want {len(w)}")
            n_fail += 1
            continue
        # Driver-faithful type strictness: the driver hashes stringified
        # values, so Spark BIGINT 5 vs oracle float64 5.0 is a RED even
        # when numerically equal (the r4 HUGEINT->float64 lesson). Flag
        # any int-vs-float dtype split before the tolerant value check.
        dtype_red = [
            c for c in g.columns
            if (pd.api.types.is_integer_dtype(g[c]) != pd.api.types.is_integer_dtype(w[c]))
            and (pd.api.types.is_numeric_dtype(g[c]) and pd.api.types.is_numeric_dtype(w[c]))
        ]
        if dtype_red:
            print(f"FAIL DTYPE      {name}: int/float split on {dtype_red} "
                  f"(got {[str(g[c].dtype) for c in dtype_red]}, "
                  f"want {[str(w[c].dtype) for c in dtype_red]}) — driver hash would red this")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=False, rtol=1e-7, atol=1e-7)
            print(f"OK  ORACLE      {name}: {len(g)} rows")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL VALUES     {name}:")
            diff = (g != w)
            bad = diff.any(axis=1)
            print("  got :", g[bad].head(4).to_dict("records"))
            print("  want:", w[bad].head(4).to_dict("records"))
            n_fail += 1
    print(f"\n== {n_pass} oracle-pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
