#!/usr/bin/env python3
"""Testdata drift probe — run FIRST thing each round, before any code.

The driver regenerates /root/testdata between rounds and the PHYSICAL
parquet encodings can change silently (round 3→4 switched events.ts from
INT64 TIMESTAMP(NANOS) to TIMESTAMP(MICROS), breaking every events
query until graft.Tables.normalizeEventTs absorbed it). This probe reads
only footers (no data scan), diffs column physical/logical types against
the checked-in snapshot, and prints every divergence loudly so a new
encoding generation costs a minute, not a round.

Usage:
  python3 tools/schema_probe.py [sfdir ...]      # diff vs snapshot; exit 1 on drift
  python3 tools/schema_probe.py --update [sfdir ...]  # rewrite the snapshot

Default sfdirs: /root/testdata/sf0.001 sf0.01 sf0.1 (skips missing).
Snapshot: tools/schema_expected.json.
"""
import json, os, sys, glob

SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "schema_expected.json")
DEFAULT_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                "/root/testdata/sf0.1"]


def probe_dir(sfdir):
    import pyarrow.parquet as pq
    tables = {}
    for f in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(f)[:-len(".parquet")]
        sch = pq.ParquetFile(f).schema
        tables[name] = {
            sch.column(i).name:
                f"{sch.column(i).physical_type}/{sch.column(i).logical_type}"
            for i in range(len(sch))
        }
    return tables


def main():
    args = sys.argv[1:]
    update = "--update" in args
    explicit = [a for a in args if a != "--update"]
    requested = explicit or DEFAULT_DIRS
    dirs = [d for d in requested if os.path.isdir(d)]

    # all SFs share one logical schema; probe each and keep per-dir results
    # so a drift in ONE scale factor (it has happened) is still attributed
    probed = {d: probe_dir(d) for d in dirs}

    if update:
        # MERGE into any existing snapshot: an explicit-dir update must
        # refresh only those dirs, never truncate the other baselines
        merged = {}
        if os.path.exists(SNAPSHOT):
            merged = json.load(open(SNAPSHOT))
        merged.update(probed)
        with open(SNAPSHOT, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"snapshot written: {SNAPSHOT} "
              f"({len(probed)} dirs probed, {len(merged)} total)")
        return 0

    if not os.path.exists(SNAPSHOT):
        print(f"NO SNAPSHOT at {SNAPSHOT} — run with --update first")
        return 1
    expected = json.load(open(SNAPSHOT))
    drift = 0
    # compare every REQUESTED dir (a requested dir missing on disk is
    # drift), and on a default run also every SNAPSHOTTED dir — a dir that
    # vanished or was renamed by a driver regeneration is itself drift,
    # the silent-pass this tool exists to prevent. An explicit targeted
    # run compares only its targets.
    scope = set(requested) | (set(expected) if not explicit else set())
    for d in sorted(scope):
        tables = probed.get(d)
        exp_tables = expected.get(d)
        if tables is None:
            print(f"! {d}: SNAPSHOTTED DIR MISSING from /root/testdata")
            drift += 1
            continue
        if exp_tables is None:
            print(f"~ {d}: not in snapshot (new scale factor?)")
            continue
        for t in sorted(set(tables) | set(exp_tables)):
            got, exp = tables.get(t), exp_tables.get(t)
            if exp is None:
                print(f"! {d}/{t}: NEW TABLE (not in snapshot)")
                drift += 1
                continue
            if got is None:
                print(f"! {d}/{t}: TABLE REMOVED")
                drift += 1
                continue
            for c in sorted(set(got) | set(exp)):
                g, e = got.get(c), exp.get(c)
                if g != e:
                    print(f"! {d}/{t}.{c}: now {g!r}, snapshot {e!r}")
                    drift += 1
    if drift:
        print(f"\n{drift} DIVERGENCES — check Tables loaders "
              "(normalizeEventTs handled the last one) before trusting "
              "any query result this round")
        return 1
    print(f"schemas match the snapshot "
          f"({sum(len(t) for t in probed.values())} tables over {len(probed)} dirs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
