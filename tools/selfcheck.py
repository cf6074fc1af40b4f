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
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), [cols[i] for i in idx]


def main():
    outdir = Path(sys.argv[1])
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = outdir / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            got_rel = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got_rows = got_rel.fetchall()
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
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
                close = all(
                    (a == b) or (isinstance(a, float) and isinstance(b, float)
                                 and math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9))
                    for a, b in zip(gr, er))
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
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
