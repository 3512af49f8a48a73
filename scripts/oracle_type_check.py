#!/usr/bin/env python3
"""Oracle type-discipline sweep (round-9 verdict item #2).

The r8 red row (`q_shard_plan`) slipped past the value-level oracle
compare because DuckDB's window `SUM(BIGINT)` is HUGEINT and `//` keeps
it — the VALUES matched but the driver's type-sensitive hasher did not.
This sweep prevents the class: DESCRIBE every `oracle_sql.json` entry in
DuckDB and fail on any output column whose DuckDB type is outside the
portable set {BIGINT, DOUBLE, VARCHAR, BOOLEAN, TIMESTAMP}.

HUGEINT (window SUM / // on BIGINT), INTEGER/SMALLINT (un-widened
literals), TIMESTAMP WITH TIME ZONE (timezone-dependent hashing) are all
rejected — cast at the oracle's output edge instead.

Round-10 postmortem tightened the set further: DECIMAL(p,s) is NOT
portable either. duckdb's .df() flattens DECIMAL to float64 ("-5" →
"-5.0", 21-digit values → 1.23e+20) while Spark parquet decimal128
round-trips as exact Decimal objects — the r10 driver flagged the only
two queries with decimal OUTPUT columns (q_auc, q_grpo_advantage) as
hash-mismatched despite value-exact results. Unbounded exact integers
must leave as canonical decimal VARCHAR in BOTH engines.

Usage: python3 scripts/oracle_type_check.py <sfDir> <verifyOutDir>
  <verifyOutDir> only needs oracle_sql.json (a graft.Verify dump dir).
Exit 0 = all portable; 1 = violations listed.
"""
import json
import sys
from pathlib import Path

import duckdb

PORTABLE = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "TIMESTAMP"}


def portable(duck_type: str) -> bool:
    return duck_type.strip().upper() in PORTABLE


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in Path(sf_dir).glob("*.parquet"):
        con.sql(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_bad = 0
    for name in sorted(oracle):
        try:
            desc = con.sql(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:  # noqa: BLE001 - report and count, keep sweeping
            print(f"VIOLATION {name}: DESCRIBE failed: {e}")
            n_bad += 1
            continue
        for col, ctype, *_ in desc:
            if not portable(ctype):
                print(f"VIOLATION {name}: column '{col}' has non-portable "
                      f"DuckDB type {ctype}")
                n_bad += 1
    print(f"{len(oracle)} oracles swept / {n_bad} violations")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
