#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling only,
not part of the library). Usage:
    python3 tools/selfcheck.py /tmp/verify_out [sfdir]
after running:  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"

For each <name>/ parquet dir in outDir, runs oracle_sql.json[name] in DuckDB
against views over the sfdir parquet tables, then compares: sorted columns by
name, sorted rows, exact values (with a float near-miss report).
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    # The driver hashes value REPRESENTATIONS, not Python values: compare
    # (type-name, str) pairs so Decimal('5.00') != float 5.0 — a decimal
    # column that merely *equals* the oracle still hash-fails the driver.
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple((type(r[i]).__name__, str(r[i])) if r[i] is not None else None
                         for i in idx))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), [cols[i] for i in idx]


# Output types whose rendering is engine-specific: any query emitting one of
# these in its FINAL projection will hash-fail the driver even when the
# values are equal (round-1 lesson: 9 queries failed exactly this way).
NONPORTABLE = ("DECIMAL", "HUGEINT", "UHUGEINT")


def near(a, b):
    if a == b:
        return True
    if a is None or b is None:
        return False
    (ta, sa), (tb, sb) = a, b
    if ta == "float" and tb == "float":
        return math.isclose(float(sa), float(sb), rel_tol=1e-9, abs_tol=1e-9)
    return False


def main():
    outdir = Path(sys.argv[1])
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    # Verify writes attempted.json so we can tell "absent because the
    # query filter excluded it" (SKIP) from "attempted but crashed at
    # runtime, leaving no dump" (FAIL) — without it a crashing query in
    # a FULL run would print SKIP and the gate would exit 0.
    attempted = failed_runtime = None
    att_path = outdir / "attempted.json"
    if att_path.exists():
        att = json.loads(att_path.read_text())
        attempted = set(att.get("attempted", []))
        failed_runtime = set(att.get("failed", []))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        res_dir = outdir / name
        if not res_dir.exists():
            if attempted is not None and name in attempted:
                print(f"FAIL {name}: attempted but no result dir (runtime failure)")
                n_fail += 1
            else:
                # excluded by Verify's query-name filter (or a pre-manifest
                # outDir): skipped, not failed
                print(f"SKIP {name}: not attempted (query filter)"); n_skip += 1
            continue
        if failed_runtime and name in failed_runtime:
            # dump dir exists but THIS run's attempt crashed — whatever
            # parquet is there is stale (prior build); never compare it
            print(f"FAIL {name}: runtime failure (stale dump ignored)")
            n_fail += 1
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_cols, got_types = got_rel.columns, [str(t) for t in got_rel.types]
            got_rows = got_rel.fetchall()
            exp_rel = con.sql(oracle[name])
            exp_cols, exp_types = exp_rel.columns, [str(t) for t in exp_rel.types]
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        bad_types = [(side, c, t)
                     for side, cols, types in (("spark", got_cols, got_types),
                                               ("oracle", exp_cols, exp_types))
                     for c, t in zip(cols, types)
                     if any(t.upper().startswith(p) for p in NONPORTABLE)]
        if bad_types:
            print(f"FAIL {name}: non-portable output types (driver will hash-fail): {bad_types}")
            n_fail += 1; continue
        g, gc = canon(got_rows, got_cols)
        e, ec = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            if gr != er:
                # float near-miss diagnosis
                close = all(near(a, b) for a, b in zip(gr, er))
                bad = (i, gr, er, close)
                break
        if bad:
            i, gr, er, close = bad
            tag = "NEAR-MISS(float)" if close else "MISMATCH"
            print(f"FAIL {name}: {tag} at row {i}\n  spark : {gr}\n  oracle: {er}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, cols={gc})"); n_pass += 1
    missing = set()  # queries without oracle entries are rows-only; just list them
    for d in outdir.iterdir():
        if d.is_dir() and d.name not in oracle:
            missing.add(d.name)
    if missing:
        print(f"rows-only (no oracle): {sorted(missing)}")
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} skip ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
