#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against DuckDB oracle.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out, [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            grows, gcols = canon(got.fetchall(), got.columns)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        try:
            exp = con.sql(sql)
            # The driver converts via pandas/arrow, where HUGEINT and other
            # exotic integer widths hash differently from Spark's BIGINT even
            # when values are identical (r1: q_token_stats/q_track_decompose/
            # q_orbit_pass all failed on exactly this). Flag them hard.
            odd = [(c, str(t)) for c, t in zip(exp.columns, exp.types)
                   if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT", "TINYINT",
                                 "SMALLINT", "UINTEGER", "USMALLINT",
                                 "UTINYINT")]
            if odd:
                results[name] = f"ORACLE-TYPE {odd} — CAST to BIGINT/INT"
                continue
            erows, ecols = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            results[name] = f"ORACLE-FAIL {type(e).__name__} {str(e)[:200]}"
            continue
        if [c.lower() for c in gcols] != [c.lower() for c in ecols]:
            results[name] = f"SCHEMA-MISMATCH spark={gcols} oracle={ecols}"
        elif len(grows) != len(erows):
            results[name] = f"ROWCOUNT {len(grows)} vs {len(erows)}"
        elif grows != erows:
            ndiff = sum(1 for a, b in zip(grows, erows) if a != b)
            ex = next((a, b) for a, b in zip(grows, erows) if a != b)
            results[name] = (f"VALUE-MISMATCH {ndiff}/{len(grows)} rows "
                             f"e.g. {ex[0][:120]} vs {ex[1][:120]}")
        else:
            results[name] = f"OK ({len(grows)} rows)"
    nok = sum(1 for v in results.values() if v.startswith("OK"))
    for name, res in sorted(results.items()):
        print(f"{'PASS' if res.startswith('OK') else 'FAIL'} {name}: {res}")
    print(f"\n{nok}/{len(results)} oracle queries match")


if __name__ == "__main__":
    main()
