"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, compare row count + column names +
order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.9g}"
    if hasattr(value, "isoformat"):
        return value.isoformat().replace("+00:00", "")
    return str(value)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # the centroid-literal oracles are data-dependent — point them at the
    # same tables this run compares against
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from crawl4ai_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows")
            results[name] = {"status": "rows_only", "spark_rows": len(srows)}
            continue
        try:
            ddf = con.execute(oracles[name])
            dcols = [d[0] for d in ddf.description]
            drows = ddf.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle SQL error: {exc}")
            failures.append(name)
            results[name] = {"status": "oracle_error", "err": str(exc)[:500]}
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sms = rows_to_multiset(scols, [[r[c] for c in scols] for r in srows])
            dms = rows_to_multiset(dcols, [[r[dcols.index(c)] for c in dcols] for r in drows])
            if sms != dms:
                diff_s = [r for r in sms if r not in dms][:3]
                diff_d = [r for r in dms if r not in sms][:3]
                problems.append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
        if problems:
            print(f"[FAIL] {name}: " + " | ".join(problems))
            failures.append(name)
            results[name] = {
                "status": "mismatch",
                "spark_rows": len(srows),
                "oracle_rows": len(drows),
                "problems": problems,
            }
        else:
            print(f"[ok]   {name}: {len(srows)} rows match")
            results[name] = {"status": "match", "spark_rows": len(srows)}
    spark.stop()
    # the full-registry run is the per-round self-check artifact — it makes
    # a future driver cap or registry-ordering change unable to silently
    # drop oracle coverage (tests/test_entry_contract.py asserts every
    # registry key appears here with a passing status)
    if not only:
        import json

        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "CORRECTNESS_SELFCHECK.json")
        with open(out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": results}, fh, indent=1, sort_keys=True)
        print(f"wrote {out}")
    print()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
