"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` twin exists, the same query on DuckDB over the same
parquet tables; compares row count, column names, and an
order-insensitive value multiset. Usage:

    python scripts/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes the results in the driver's
CORRECTNESS_r{N}.json format (rows_match/schema_match/hash_match/
spark_rows/oracle_rows/err per query; [NQ] queries get err='no_oracle'
with their row count) so full-coverage runs can be committed as
reproducible artifacts.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill -0.0 and ulp noise surviving upstream ROUND()s
        return f"{v + 0.0:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("T", " ")
    return str(v)


def row_key(row) -> str:
    return "|".join(canon(v) for v in row)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from facolos_data_pipelines_spark.session import build_spark, load_tables

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            raise SystemExit("usage: check_oracle.py [--json OUT.json] [sf_dir] [query ...]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    # the full query surface executes in one JVM — relies on build_spark's
    # periodicGC=60s default (long-lived-driver hygiene; see session.py)
    spark = build_spark(app_name="oracle-check")
    load_tables(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    # Driver parity: events.ts is TIMESTAMP(NANOS); duckdb truncates to
    # micros the same way load_tables does, so no special handling.

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark error: {exc}"[:300],
            }
            continue
        if name not in oracles:
            print(f"  NQ {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            if not srows:
                print(f"WARN {name}: NQ query returned 0 rows")
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": f"duckdb error: {exc}"[:300],
            }
            continue
        problems = []
        rows_match = len(srows) == len(orows)
        schema_match = scols == ocols
        hash_match = None
        if not schema_match:
            problems.append(f"columns {scols} != {ocols}")
        if not rows_match:
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            sset = sorted(row_key([r[c] for c in scols]) for r in srows)
            oset = sorted(row_key(list(r)) for r in orows)
            hash_match = sset == oset
            if not hash_match:
                diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                problems.append(f"value mismatch, first diffs: {diff}")
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(srows),
            "oracle_rows": len(orows), "err": None,
        }
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"  OK {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
    print()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_out} ({len(results)} queries)")
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        return 1
    print(f"all {len([n for n in qs if not only or n in only])} queries passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
