#!/usr/bin/env python3
"""Pin: no oracle SQL may surface a HUGEINT (int128) output column.

DuckDB widens `sum()` over integer inputs — windowed or grouped — to
HUGEINT, and integer `//` keeps it. The driver's hash normalization
renders HUGEINT differently from Spark's int64, so a value-identical
result still hash-mismatches (the q341 round-10 incident). The repo's
discipline is to CAST every sum-derived OUTPUT column to BIGINT in the
oracle SQL; this script enforces it by running `DESCRIBE <sql>` for
every entry in oracle_sql.json against the sf tables and failing on any
HUGEINT (or DECIMAL(38,0)-style widened-integer) output column.

Usage: oracle_types.py <sfDir> <verifyOutDir-with-oracle_sql.json>
Exit 0 = all clean; exit 1 = offending columns listed on stdout.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DECIMAL(38,0) is DuckDB's other widened-integer spelling (sum over
# DECIMAL inputs); it round-trips through the hash normalization just
# as badly as HUGEINT
BANNED = ("HUGEINT", "UHUGEINT", "INT128", "DECIMAL(38,0)")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    bad = []
    errs = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 — report, don't abort sweep
            errs.append((name, str(e).splitlines()[0]))
            continue
        for col, typ, *_ in desc:
            if any(b in typ.upper() for b in BANNED):
                bad.append((name, col, typ))
    for name, col, typ in bad:
        print(f"HUGEINT-OUTPUT {name}.{col}: {typ}")
    for name, err in errs:
        print(f"DESCRIBE-ERROR {name}: {err}")
    print(f"checked {len(oracle)} oracles: "
          f"{len(bad)} banned-type columns, {len(errs)} describe errors")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
