#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify (compiled classes + /opt/spark/jars) on a testdata dir,
then compares each query's parquet output against its DuckDB oracle:
columns sorted by name, rows sorted, exact value compare.

Usage: python3 tools/check.py [sfdir] [--skip-verify] [query ...]
"""
import json, math, subprocess, sys, glob, os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/graft_verify_out"

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


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    args = [a for a in sys.argv[1:]]
    skip = "--skip-verify" in args
    args = [a for a in args if a != "--skip-verify"]
    sfdir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = [a for a in args if not a.startswith("/")]

    if not skip:
        run_verify(sfdir)

    import duckdb
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
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        cols = sorted(got.columns)
        got_rows = sorted(
            (tuple(norm(v) for v in r) for r in
             got.select(", ".join(f'"{c}"' for c in cols)).fetchall()),
            key=repr)
        if name not in oracle:
            n_noracle += 1
            print(f"  ~ {name}: no oracle ({len(got_rows)} rows)")
            continue
        try:
            exp = con.sql(oracle[name])
            ecols = sorted(exp.columns)
            exp_rows = sorted(
                (tuple(norm(v) for v in r) for r in
                 exp.select(", ".join(f'"{c}"' for c in ecols)).fetchall()),
                key=repr)
        except Exception as ex:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE SQL ERROR: {str(ex)[:200]}")
            continue
        if cols != ecols:
            n_fail += 1
            print(f"  ✗ {name}: COLUMN MISMATCH spark={cols} oracle={ecols}")
            continue
        if got_rows == exp_rows:
            n_pass += 1
            print(f"  ✓ {name} ({len(got_rows)} rows)")
        else:
            n_fail += 1
            print(f"  ✗ {name}: ROW MISMATCH got={len(got_rows)} exp={len(exp_rows)}")
            diff = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e]
            for g, e in diff[:3]:
                print(f"      got {g}\n      exp {e}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
