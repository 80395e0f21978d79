#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev loop only; the
shipped engine is pure Scala/Spark). Usage:

    python3 tools/check.py <sfDir> <verifyOutDir> [--json OUT.json] [--times]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
<sfDir> tables, sorts columns by name + rows, and compares values.

--json OUT.json additionally writes the DRIVER'S OWN artifact schema
  ({name: {rows_match, schema_match, hash_match, err}}), so a round
  whose driver-side CORRECTNESS capture fails (r14: the artifact
  arrived literally `{}`) still ships a machine-readable local record
  (commit it as CORRECTNESS_rN_local.json — the BENCH_rN_local.json
  discipline applied to correctness).
--times prints per-oracle DuckDB replay seconds, slowest first — the
  replay-budget watchdog: a handful of unrolled-iteration oracles can
  dominate the whole sweep and blow a driver-side time budget.
"""
import json
import math
import sys
import time

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
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    show_times = "--times" in args
    if show_times:
        args.remove("--times")
    # --subset: the dump was a SPARK_GRAFT_ONLY dev-loop subset — only
    # compare what's there (without it, every oracle key missing from
    # the dump counts as a failure: a full sweep must not under-report)
    subset = "--subset" in args
    if subset:
        args.remove("--subset")
    sf_dir, out_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    report = {}  # name -> the driver's row shape
    times = []   # (seconds, name) of the oracle replay alone
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # a query that ERRORED during the dump has an oracle entry but no
    # parquet dir — it must count as a FAILURE, not silently drop from
    # the denominator (the r16 ANSI audit found 4 erroring queries
    # reported as 245/245 by the old dir-only enumeration)
    missing = [] if subset else sorted(set(oracle) - set(names))
    for name in missing:
        print(f"{name:28s} MISSING (query errored during dump?)")
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "err": "no dump dir"}
        failed.append(name)
    for name in names:
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            n = got_rel.aggregate("count(*)").fetchone()[0]
            status = "ROWS_ONLY" if n > 0 else "ROWS_ONLY_EMPTY"
            print(f"{name:28s} {status} rows={n}")
            report[name] = {"rows_match": n > 0, "schema_match": None,
                            "hash_match": None,
                            "err": None if n > 0 else "rows_only_empty"}
            if n == 0:
                failed.append(name)
            continue
        got_cols = sorted(got_rel.columns)
        got = canon(got_rel.project(", ".join(f'"{c}"' for c in got_cols)).fetchall())
        t0 = time.monotonic()
        try:
            exp_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"{name:28s} ORACLE_SQL_ERROR {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"oracle_sql: {e}"}
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
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False,
                            "err": f"oracle_type_hazard: {bad_types}"}
            failed.append(name)
            continue
        exp = canon(exp_rel.project(", ".join(f'"{c}"' for c in exp_cols)).fetchall())
        times.append((time.monotonic() - t0, name))
        if got_cols != exp_cols:
            print(f"{name:28s} SCHEMA_MISMATCH got={got_cols} exp={exp_cols}")
            report[name] = {"rows_match": len(got) == len(exp),
                            "schema_match": False, "hash_match": False,
                            "err": "schema_mismatch"}
            failed.append(name)
            continue
        if sorted(got, key=repr) == sorted(exp, key=repr):
            print(f"{name:28s} OK rows={len(got)}")
            report[name] = {"rows_match": True, "schema_match": True,
                            "hash_match": True, "err": None}
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
            report[name] = {"rows_match": len(got) == len(exp),
                            "schema_match": True, "hash_match": False,
                            "err": "value_mismatch"}
            failed.append(name)
    if show_times and times:
        total = sum(t for t, _ in times)
        print(f"\noracle replay total: {total:.1f}s; slowest:")
        for t, n in sorted(times, reverse=True)[:15]:
            print(f"  {t:7.2f}s  {n}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=0, sort_keys=True)
        print(f"\nwrote {json_out} ({len(report)} queries)")
    total = len(names) + len(missing)
    print(f"\n{total - len(failed)}/{total} pass; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
