#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's correctness gate:
runs each oracle_sql.json query in DuckDB against the sf tables and
compares (sorted columns, sorted rows) with the Verify.scala parquet dumps.
Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out

Selftest (r8, judge item #9 — prove the gate CAN go red): --selftest
builds a throwaway out-dir whose oracle is a deliberately un-cast
sum(int) (DuckDB types it HUGEINT — the exact r6 q12 escape class) with a
value-identical spark-side dump, runs the normal gate on it end-to-end,
and exits 0 only if the gate FAILED it via the HUGEINT lint:
    python3 tools/check.py /root/testdata/sf0.01 --selftest

This script IS the local gate's second half: Verify.scala dumps the
results, check.py replays the oracles. Running Verify without check.py
is not a gate (the round workflow doc and .claude/skills/verify say so).
"""
import duckdb, json, sys, os

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def selftest(sf):
    """Plant the r6-q12 escape class and require the gate to catch it."""
    import tempfile, subprocess
    out = tempfile.mkdtemp(prefix="graft-gate-selftest-")
    # un-cast sum(int): DuckDB types it HUGEINT; values agree with the
    # spark-side dump exactly, so only the DESCRIBE lint can catch it
    bad_sql = "SELECT l_returnflag, sum(l_linenumber) AS s FROM lineitem GROUP BY 1"
    json.dump({"selftest_uncast_sum": bad_sql},
              open(f"{out}/oracle_sql.json", "w"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    os.makedirs(f"{out}/selftest_uncast_sum", exist_ok=True)
    con.execute(
        "COPY (SELECT l_returnflag, CAST(sum(l_linenumber) AS BIGINT) AS s "
        f"FROM lineitem GROUP BY 1) TO '{out}/selftest_uncast_sum/part.parquet'")
    r = subprocess.run([sys.executable, __file__, sf, out],
                       capture_output=True, text=True)
    caught = r.returncode != 0 and "LINT" in r.stdout and "HUGEINT" in r.stdout
    print(r.stdout.strip())
    print("SELFTEST " + ("PASS: gate went red on the un-cast sum(int)"
                         if caught else
                         "FAIL: gate let the un-cast sum(int) through"))
    sys.exit(0 if caught else 1)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    if out == "--selftest":
        selftest(sf)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    only = set(sys.argv[3:])  # optional query-name filter for the dev loop
    ok = fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        path = f"{out}/{name}"
        if not os.path.isdir(path):
            print(f"{name:28s} MISSING spark output"); fail += 1; continue
        try:
            # Lint (r7, judge item #1): any HUGEINT column in the oracle's
            # output schema is a guaranteed driver hash mismatch (Spark has
            # no int128; DuckDB types sum(int) as HUGEINT). Catch it from
            # the DESCRIBE schema, not the pandas dtypes — fetch_df silently
            # narrows HUGEINT to float64, which is exactly how q12 slipped
            # through the r6 gate.
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
            huge = [r[0] for r in desc if "HUGEINT" in str(r[1]).upper()]
            if huge:
                print(f"{name:28s} LINT oracle emits HUGEINT (cast to BIGINT): {huge}")
                fail += 1; continue
            a = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetch_df()
            b = con.execute(sql).fetch_df()
            a = a.reindex(sorted(a.columns), axis=1)
            b = b.reindex(sorted(b.columns), axis=1)
            if list(a.columns) != list(b.columns):
                print(f"{name:28s} COLS spark={list(a.columns)} oracle={list(b.columns)}")
                fail += 1; continue
            cols = list(a.columns)
            a = a.sort_values(by=cols).reset_index(drop=True)
            b = b.sort_values(by=cols).reset_index(drop=True)
            if len(a) != len(b):
                print(f"{name:28s} ROWS spark={len(a)} oracle={len(b)}"); fail += 1; continue
            dt = [c for c in cols if str(a.dtypes[c]) != str(b.dtypes[c])]
            if dt:
                # r7: dtype drift is a FAIL, not a warning — the driver's
                # hash is over typed bytes, so int64-vs-float64 agreement on
                # values still hash-mismatches there (the q12 r6 escape).
                print(f"{name:28s} DTYPES " + ", ".join(
                    f"{c}: spark={a.dtypes[c]} oracle={b.dtypes[c]}" for c in dt))
                fail += 1; continue
            bad = None
            for c in cols:
                if not a[c].equals(b[c]):
                    neq = (a[c] != b[c])
                    try:
                        neq = neq & ~(a[c].isna() & b[c].isna())
                    except Exception:
                        pass
                    n = int(neq.sum())
                    if n:
                        i = neq.idxmax()
                        bad = f"col {c}: {n} diffs, first@{i}: spark={a[c][i]!r} oracle={b[c][i]!r}"
                        break
            if bad: print(f"{name:28s} VALUES {bad}"); fail += 1
            else: print(f"{name:28s} OK ({len(a)} rows)"); ok += 1
        except Exception as e:
            print(f"{name:28s} ERROR {str(e)[:300]}"); fail += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

main()
