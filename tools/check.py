#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev loop only; the
shipped engine is pure Scala/Spark). Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
<sfDir> tables, sorts columns by name + rows, and compares values.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    rr.append("NaN")
                else:
                    rr.append(v)
            else:
                rr.append(v)
        out.append(tuple(rr))
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            n = got_rel.aggregate("count(*)").fetchone()[0]
            status = "ROWS_ONLY" if n > 0 else "ROWS_ONLY_EMPTY"
            print(f"{name:28s} {status} rows={n}")
            if n == 0:
                failed.append(name)
            continue
        got_cols = sorted(got_rel.columns)
        got = canon(got_rel.project(", ".join(f'"{c}"' for c in got_cols)).fetchall())
        try:
            exp_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"{name:28s} ORACLE_SQL_ERROR {e}")
            failed.append(name)
            continue
        exp_cols = sorted(exp_rel.columns)
        # the driver's hash path renders non-int64 integer types (e.g.
        # DuckDB HUGEINT from SUM(INTEGER)) differently than our value
        # compare — treat them as failures so they surface HERE, not in
        # the driver run (bitten in round 1 by q33/q38)
        bad_types = [(c, str(t)) for c, t in zip(exp_rel.columns, exp_rel.types)
                     if str(t) in ("HUGEINT", "UHUGEINT", "FLOAT")]
        if bad_types:
            print(f"{name:28s} ORACLE_TYPE_HAZARD {bad_types} — CAST to BIGINT/DOUBLE")
            failed.append(name)
            continue
        exp = canon(exp_rel.project(", ".join(f'"{c}"' for c in exp_cols)).fetchall())
        if got_cols != exp_cols:
            print(f"{name:28s} SCHEMA_MISMATCH got={got_cols} exp={exp_cols}")
            failed.append(name)
            continue
        if sorted(got, key=repr) == sorted(exp, key=repr):
            print(f"{name:28s} OK rows={len(got)}")
        else:
            print(f"{name:28s} VALUE_MISMATCH got_rows={len(got)} exp_rows={len(exp)}")
            gs, es = sorted(got, key=repr), sorted(exp, key=repr)
            shown = 0
            for i in range(max(len(gs), len(es))):
                g = gs[i] if i < len(gs) else None
                e = es[i] if i < len(es) else None
                if g != e and shown < 3:
                    print(f"    got {g}\n    exp {e}")
                    shown += 1
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
