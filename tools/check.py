#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

1. (caller runs `sbt "runMain graft.Verify <sfdir> <outdir>"` first)
2. registers every testdata parquet as a DuckDB view named after the table
3. runs each oracle_sql.json query
4. compares against the Spark parquet dump: sorted columns by name, sorted
   rows, exact match (floats compared by IEEE bit pattern — catches signed
   zero / NaN payloads that numeric == hides; diffs printed unpacked)
"""
import sys, json, glob, os, struct
import duckdb
import typelint  # oracle output-type lint (HUGEINT/DECIMAL → driver hash-red)

TABLES = typelint.TABLES  # ONE table list for both tools

def _canon(v):
    # floats compare by IEEE bit pattern: Python's == hides -0.0 vs +0.0
    # (and NaN never equals), but the driver's hash compares bytes —
    # round 3 shipped two "locally green" queries that failed exactly there.
    if isinstance(v, float):
        return struct.pack('<d', v)
    return v

def norm_rows(cols, rows):
    # sort columns by name, then rows by value tuple (None-safe)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(type(v)), v if not isinstance(v, (dict, list)) else str(v)) for v in t))
    return [cols[i] for i in order], out

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    typelint.register_views(con, sfdir)  # shared registration (dir vs file)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only check for query dumps without an oracle entry
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        if n > 0:
            print(f"PASS {name} (rows-only, {n} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows-only check, 0 rows"); n_fail += 1
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        bad_types = typelint.lint(con, name, sql)
        if any(c != "<describe>" for c, _ in bad_types):
            # int128/decimal oracle outputs byte-hash-fail on the driver even
            # when values match numerically here — fail loudly and locally
            print(f"FAIL {name}: oracle type lint: " +
                  ", ".join(f"{c} is {t}" for c, t in bad_types))
            n_fail += 1
            continue
        try:
            orc = con.execute(sql)
            ocols = [d[0] for d in orc.description]
            orows = orc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}"); n_fail += 1; continue
        sq = con.execute(f"SELECT * FROM read_parquet({spark_files!r})")
        scols = [d[0] for d in sq.description]
        srows = sq.fetchall()
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}"); n_fail += 1; continue
        _, so = norm_rows(scols, srows)
        _, oo = norm_rows(ocols, orows)
        if so == oo:
            print(f"PASS {name} ({len(so)} rows)"); n_pass += 1
        else:
            n_fail += 1
            if len(so) != len(oo):
                print(f"FAIL {name}: row count spark={len(so)} oracle={len(oo)}")
            else:
                diffs = [(a, b) for a, b in zip(so, oo) if a != b]
                def disp(row):  # unpack float bits for readable diff output
                    return tuple(struct.unpack('<d', v)[0] if isinstance(v, bytes) and len(v) == 8 else v for v in row)
                print(f"FAIL {name}: {len(diffs)}/{len(so)} rows differ; first: spark={disp(diffs[0][0])} oracle={disp(diffs[0][1])}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
