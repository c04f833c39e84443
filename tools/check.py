#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs DuckDB.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Loads each <name>/ parquet dump, runs oracle_sql.json[name] in DuckDB against
the sfDir parquet tables, sorts columns by name + rows by values, compares.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noorc = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracle:
            n_noorc += 1
            print(f"  [rows-only] {name}: rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-sql ] {name}: oracle error: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            n_fail += 1
            print(f"  [FAIL-cols] {name}: spark={list(g.columns)} oracle={list(e.columns)}")
            continue
        if len(g) != len(e):
            n_fail += 1
            print(f"  [FAIL-rows] {name}: spark={len(g)} oracle={len(e)}")
            continue
        # Dtype-sensitive compare, faithful to the driver's stringify+hash:
        # the driver hashes stringified values, so int64(10) vs float64(10.0)
        # IS a mismatch.  Rules:
        #   - int-kind vs float-kind on the same column  -> FAIL (dtype)
        #   - integer / bool / string / object columns   -> exact equality
        #   - float on BOTH sides                        -> 1e-9 tolerance
        #   - timestamps normalized to us on both sides
        def dkind(s):
            k = s.dtype.kind
            return {"i": "i", "u": "i", "b": "b", "f": "f", "M": "M"}.get(k, "o")
        dtype_fail = None
        for c in g.columns:
            kg, ke = dkind(g[c]), dkind(e[c])
            if kg != ke and {kg, ke} <= {"i", "f"}:
                dtype_fail = (c, g[c].dtype, e[c].dtype)
                break
        if dtype_fail:
            n_fail += 1
            c, dg, de = dtype_fail
            print(f"  [FAIL-type] {name}: column '{c}' spark={dg} oracle={de} "
                  f"(int-vs-float hashes differ in the driver)")
            continue
        def norm(df):
            out = pd.DataFrame()
            for c in df.columns:
                s = df[c]
                if s.dtype.kind == "M":
                    out[c] = s.astype("datetime64[us]")
                else:
                    out[c] = s
            return out
        g2, e2 = norm(g), norm(e)
        try:
            float_cols = [c for c in g2.columns if dkind(g2[c]) == "f"]
            exact_cols = [c for c in g2.columns if c not in float_cols]
            if exact_cols:
                pd.testing.assert_frame_equal(
                    g2[exact_cols], e2[exact_cols],
                    check_dtype=False, check_exact=True)
            if float_cols:
                pd.testing.assert_frame_equal(
                    g2[float_cols], e2[float_cols],
                    check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            n_pass += 1
            print(f"  [PASS     ] {name}: rows={len(g)}")
        except AssertionError as ex:
            n_fail += 1
            msg = str(ex).split("\n")[0:3]
            print(f"  [FAIL-vals] {name}: {' | '.join(msg)}")
    print(f"== pass={n_pass} fail={n_fail} rows_only={n_noorc}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
