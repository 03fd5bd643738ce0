#!/usr/bin/env python3
"""Local simulation of the driver's t2 correctness gate.

After `sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each
Spark parquet dump in <outDir>/<name>/ against the DuckDB oracle SQL
in <outDir>/oracle_sql.json: columns sorted by name, values compared
row-by-row with float slack. Also flags arrow-type mismatches, which
may matter to the driver's schema check.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import json
import sys

import duckdb


def norm_rows(rows):
    # bit-exact: the probe corpus is designed so Spark and DuckDB agree
    # on float bits (ROUND discipline, fixed division orders); any
    # drift should FAIL here rather than hide behind rounding slack
    return [tuple(row) for row in rows]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want_rel = con.sql(sql)
            wcols = sorted(want_rel.columns)
            want_t = want_rel.arrow()
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = sorted(got_rel.columns)
            got_t = got_rel.arrow()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if wcols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {wcols}")
            n_fail += 1
            continue
        sel = ", ".join(f'"{c}"' for c in wcols)
        want = norm_rows(con.execute(f"SELECT {sel} FROM want_t").fetchall())
        got = norm_rows(con.execute(f"SELECT {sel} FROM got_t").fetchall())
        wtypes = {c: str(want_t.schema.field(c).type) for c in wcols}
        gtypes = {c: str(got_t.schema.field(c).type) for c in gcols}
        tmismatch = {c: (gtypes[c], wtypes[c])
                     for c in wcols if gtypes[c] != wtypes[c]}
        if want != got:
            print(f"FAIL {name}: values differ "
                  f"({len(got)} rows vs oracle {len(want)})")
            for i, (w, g) in enumerate(zip(want, got)):
                if w != g:
                    print(f"  first diff at row {i}: got {g} want {w}")
                    break
            n_fail += 1
        else:
            flag = f"  [type mismatch: {tmismatch}]" if tmismatch else ""
            print(f"pass {name} ({len(got)} rows){flag}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
