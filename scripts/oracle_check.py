#!/usr/bin/env python3
"""Dev-loop mimic of the driver's DuckDB correctness gate.

Reads the graft.Verify output dir (per-query parquet + oracle_sql.json),
registers /root/testdata/<sf>/ parquet files as DuckDB views named by
table basename, runs each oracle, and compares result sets:
columns sorted by name, rows sorted, exact value equality.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [--pandas-hash]

--pandas-hash additionally replays the r10 driver-gate hypothesis: the
Spark parquet read back through pandas/pyarrow (exact Decimal objects)
vs the DuckDB oracle through .df() (DECIMAL flattened to float64), each
column-name-sorted, row-sorted, every cell stringified, sha256-hashed.
A query that passes the value compare but fails this hash has a
representation-unstable output type (the q_auc/q_grpo_advantage class).
"""
import hashlib
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(rows, cols):
    """Column-name-sorted, row-sorted canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def pandas_hash_mismatch(con, sql, qdir):
    """True iff the pandas-path hashes differ (driver-gate mimic)."""
    import pandas as pd

    def h(df):
        df = df[sorted(df.columns)]
        cells = sorted(tuple(str(v) for v in row)
                       for row in df.itertuples(index=False, name=None))
        dig = hashlib.sha256()
        for row in cells:
            for c in row:
                dig.update(c.encode())
                dig.update(b"\x1f")
            dig.update(b"\x1e")
        return dig.hexdigest()

    exp = con.sql(sql).df()
    parts = sorted(qdir.glob("*.parquet"))
    if parts:
        got = pd.concat([pd.read_parquet(p) for p in parts],
                        ignore_index=True)
    elif (qdir / "_SUCCESS").exists():
        # a COMMITTED zero-row Spark result writes no part files;
        # pd.concat([]) would raise and masquerade as a hash FAIL even
        # though the value compare passed — hash an empty frame with the
        # oracle's columns instead (both sides then hash the empty cell
        # set). Without the _SUCCESS marker an empty dir means the write
        # job died mid-flight, which must stay a loud failure.
        got = pd.DataFrame(columns=exp.columns)
    else:
        raise RuntimeError("no part files and no _SUCCESS marker — "
                           "uncommitted Spark output")
    return h(got) != h(exp)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    typed = "--pandas-hash" in sys.argv[3:]
    con = duckdb.connect()
    for p in Path(sf_dir).glob("*.parquet"):
        con.sql(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        qdir = Path(out_dir, name)
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            ecols, erows = canon(exp.fetchall(), exp.columns)
            if sorted(qdir.glob("*.parquet")):
                got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
                gcols, grows = canon(got.fetchall(), got.columns)
            elif (qdir / "_SUCCESS").exists():
                # a COMMITTED zero-row Spark result can land with no
                # part files at all; DuckDB's glob then throws, which
                # would read as a query failure. A committed empty dir
                # IS a result: zero rows (column names unknowable
                # without parts — compare as the oracle's own columns
                # so only the row sets decide). No _SUCCESS = the write
                # died mid-flight → falls through to the loud FAIL.
                gcols, grows = ecols, []
            else:
                raise RuntimeError("no part files and no _SUCCESS "
                                   "marker — uncommitted Spark output")
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
        elif grows != erows:
            n_fail += 1
            diff = [(a, b) for a, b in zip(grows, erows) if a != b]
            tail = (grows[-1] if grows else None,
                    erows[-1] if erows else None)
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows, "
                  f"{len(diff)} differing; first: "
                  f"{diff[0] if diff else tail}")
        else:
            # NOTE: this re-runs the oracle SQL through .df() on purpose —
            # the point is duckdb's own pandas conversion (DECIMAL →
            # float64 etc.), which rebuilding a frame from the fetched
            # rows would not reproduce.
            try:
                bad = typed and pandas_hash_mismatch(con, sql, qdir)
            except Exception as e:  # noqa: BLE001 - count, keep sweeping
                print(f"FAIL {name}: pandas-path hash errored: {e}")
                n_fail += 1
                continue
            if bad:
                print(f"FAIL {name}: values match but pandas-path hash "
                      "differs (representation-unstable output type)")
                n_fail += 1
            else:
                print(f"PASS {name}: {len(grows)} rows")
                n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
