#!/usr/bin/env python3
"""Full-catalog determinism sweep (round-9 verdict item #4).

Compares two independent `graft.Verify` dump dirs (same code, same SF,
run back-to-back) query by query: each per-query parquet is read via
DuckDB, canonicalized (columns sorted by name, rows sorted by their
string form — the driver-hasher's own canonical form), and diffed
value-exactly. Any divergence means a query is nondeterministic across
runs (unstable tie-breaks, time/randomness leakage, representation
drift) — the class of bug a single-run oracle check cannot see.

Usage: python3 scripts/determinism_diff.py <verifyOutDirA> <verifyOutDirB>
Exit 0 = byte-equivalent catalogs; 1 = diffs listed.
"""
import math
import sys
from pathlib import Path

import duckdb


def canon(con, qdir: Path):
    rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = []
    for r in rel.fetchall():
        rows.append(tuple(norm(r[i]) for i in order))
    rows.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], rows


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main():
    dir_a, dir_b = Path(sys.argv[1]), Path(sys.argv[2])
    queries_a = {p.name for p in dir_a.iterdir() if p.is_dir()}
    queries_b = {p.name for p in dir_b.iterdir() if p.is_dir()}
    con = duckdb.connect()
    n_diff = 0
    for only, where in ((queries_a - queries_b, "A"), (queries_b - queries_a, "B")):
        for name in sorted(only):
            print(f"DIFF {name}: present only in run {where}")
            n_diff += 1
    for name in sorted(queries_a & queries_b):
        ca, cb = canon(con, dir_a / name), canon(con, dir_b / name)
        if ca[0] != cb[0]:
            print(f"DIFF {name}: schema {ca[0]} vs {cb[0]}")
            n_diff += 1
        elif ca[1] != cb[1]:
            first = next(i for i, (x, y) in enumerate(zip(ca[1], cb[1])) if x != y) \
                if len(ca[1]) == len(cb[1]) else -1
            print(f"DIFF {name}: {len(ca[1])} vs {len(cb[1])} rows, "
                  f"first differing row index {first}")
            n_diff += 1
    print(f"{len(queries_a & queries_b)} queries compared / {n_diff} diffs")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
