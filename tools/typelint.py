#!/usr/bin/env python3
"""Oracle output-type lint — makes the ml_export_shards class of driver-red
structural instead of anecdotal.

DuckDB's sum() (including window sums) returns HUGEINT for integer inputs,
and any arithmetic on a HUGEINT stays int128. Our local check compares via
fetchall() (Python ints — numerically fine), but a checker that
materializes through pandas/Arrow renders int128 as float64/decimal128 and
byte-hash-fails against Spark's int64 with rows/schema matching — exactly
the two-round ml_export_shards signature. So: no oracle may OUTPUT a
HUGEINT/UHUGEINT/DECIMAL column; every sum-derived column must be CAST to
BIGINT (or DOUBLE) explicitly.

Usage: python3 tools/typelint.py [sfdir] [outdir]
  outdir must hold an oracle_sql.json (from a graft.Verify run — use
  SPARK_GRAFT_SQL_ONLY=1 to dump ALL oracle SQL without executing queries).
DESCRIBE only binds; nothing executes, so a full-catalog lint is seconds.
check.py also applies the same lint inline per-oracle.
"""
import sys, json, os
import duckdb

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def register_views(con, sfdir):
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def lint(con, name, sql):
    """Returns a list of (column, type) violations; [] if clean.
    DESCRIBE failures (e.g. missing artifact parquet in a lint-only run)
    are reported as a single ('<describe>', error) violation so they are
    loud, not skipped."""
    try:
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        return [("<describe>", str(e).splitlines()[0])]
    return [(r[0], r[1]) for r in rows
            if any(b in r[1].upper() for b in BANNED)]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    register_views(con, sfdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        bad = lint(con, name, sql)
        if bad:
            n_bad += 1
            for c, t in bad:
                print(f"TYPELINT FAIL {name}: column {c!r} is {t}")
        else:
            print(f"TYPELINT ok   {name}")
    print(f"== typelint: {len(oracle) - n_bad} clean, {n_bad} dirty ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
