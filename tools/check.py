#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify (compiled classes + /opt/spark/jars) on a testdata dir,
then compares each query's parquet output against its DuckDB oracle the
way the driver does: both sides as PANDAS dataframes (so DuckDB HUGEINT
-> float64 conversions are visible), columns sorted by name, rows sorted,
DTYPE-STRICT value compare (int64 123 != float64 123.0), and a hard
reject on list/array-typed output columns (the driver's row sort crashes
on them).

Usage: python3 tools/check.py [sfdir] [--skip-verify] [query ...]
"""
import json, math, subprocess, sys, glob, os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# per-sfdir dump dir: concurrent gate runs on different scale factors
# must never clobber each other's Spark outputs mid-compare
OUT = "/tmp/graft_verify_out"


def set_out(sfdir):
    global OUT
    OUT = f"/tmp/graft_verify_out_{os.path.basename(sfdir.rstrip('/'))}"

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify(sfdir):
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-Xmx8g", "-Dspark.ui.enabled=false",
            "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.Verify", sfdir, OUT]
    r = subprocess.run(cmd, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print(line)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)


class ArrayColumn(Exception):
    pass


def canon(df):
    """Driver-equivalent canonicalization: sorted columns, sorted rows,
    dtypes preserved. Raises ArrayColumn on list/ndarray-typed cells —
    the driver's pandas sort crashes on those, so we fail them here."""
    import numpy as np
    cols = sorted(df.columns)
    df = df[cols]
    for c in cols:
        if df[c].dtype == object:
            s = df[c].dropna()
            if len(s) and s.map(
                    lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
                raise ArrayColumn(c)
    # normalize datetime resolution (pyarrow may give ns where duckdb
    # gives us); the driver compares timestamp VALUES fine, so unit
    # differences alone must not fail
    for c in cols:
        if str(df[c].dtype).startswith("datetime64"):
            # tz-aware columns raise on astype('datetime64[ns]') in
            # pandas 2 — strip the tz first (values compare fine)
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[ns]")
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort")
    return df.reset_index(drop=True)


def frames_equal(got, exp):
    """Dtype-strict equality. Returns (ok, reason)."""
    gd = [str(t) for t in got.dtypes]
    ed = [str(t) for t in exp.dtypes]
    if gd != ed:
        bad = [(c, g, e) for c, g, e in zip(got.columns, gd, ed) if g != e]
        return False, f"DTYPE MISMATCH {bad}"
    if not got.equals(exp):
        return False, "VALUE MISMATCH"
    return True, None


def main():
    args = [a for a in sys.argv[1:]]
    skip = "--skip-verify" in args
    args = [a for a in args if a != "--skip-verify"]
    sfdir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = [a for a in args if not a.startswith("/")]
    set_out(sfdir)

    if not skip:
        run_verify(sfdir)

    import duckdb
    import pandas as pd
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    names = sorted(os.listdir(OUT))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        d = os.path.join(OUT, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            n_fail += 1
            print(f"  ✗ {name}: NO PARQUET OUTPUT FILES in {d}")
            continue
        raw = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            got = canon(raw)
        except ArrayColumn as ac:
            if name not in oracle:
                n_noracle += 1
                print(f"  ~ {name}: no oracle ({len(raw)} rows; array col {ac})")
                continue
            n_fail += 1
            print(f"  ✗ {name}: ARRAY OUTPUT COLUMN '{ac}' (driver sort crashes)")
            continue
        if name not in oracle:
            n_noracle += 1
            print(f"  ~ {name}: no oracle ({len(got)} rows)")
            continue
        try:
            exp = canon(con.sql(oracle[name]).df())
        except ArrayColumn as ac:
            n_fail += 1
            print(f"  ✗ {name}: ARRAY ORACLE COLUMN '{ac}' (driver sort crashes)")
            continue
        except Exception as ex:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE SQL ERROR: {str(ex)[:200]}")
            continue
        if list(got.columns) != list(exp.columns):
            n_fail += 1
            print(f"  ✗ {name}: COLUMN MISMATCH spark={list(got.columns)}"
                  f" oracle={list(exp.columns)}")
            continue
        if len(got) != len(exp):
            n_fail += 1
            print(f"  ✗ {name}: ROW COUNT got={len(got)} exp={len(exp)}")
            continue
        ok, reason = frames_equal(got, exp)
        if ok:
            n_pass += 1
            print(f"  ✓ {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"  ✗ {name}: {reason}")
            if reason == "VALUE MISMATCH":
                neq = (got != exp) & ~(got.isna() & exp.isna())
                bad = neq.any(axis=1)
                for i in list(got.index[bad])[:3]:
                    print(f"      got {tuple(got.loc[i])}\n"
                          f"      exp {tuple(exp.loc[i])}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
