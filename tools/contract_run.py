#!/usr/bin/env python
"""CI-style full-contract run: every queries() entry against its
oracle_sql() at an arbitrary scale factor, with per-query wall times.

Usage: python tools/contract_run.py [--sf-dir /root/testdata/sf0.1]
                                    [--num-cpus 32]

Prints one JSON line: {"sf_dir": ..., "ok": N, "failed": {...},
"wall_sec": {...}}. The type-faithful Arrow-schema gate from
tests/test_entry_contract.py applies (VERDICT r2 items 2 and 7)."""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to these query names")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)

    import duckdb

    import __ray_entry__ as entry
    from test_entry_contract import TABLES, assert_schema_match, compare, to_arrow

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )
    oracles = entry.oracle_sql()
    queries = entry.queries()
    if args.only:
        unknown = [n for n in args.only if n not in queries]
        if unknown:
            raise SystemExit(
                f"unknown --only names: {unknown} (a typo here would "
                f"otherwise read as a passing empty run)")
    wall: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name, fn in queries.items():
        if args.only and name not in args.only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_arrow(fn(args.sf_dir))
            if name in oracles:
                want = con.sql(oracles[name]).arrow()
                assert_schema_match(got, want, name)
                compare(got.to_pandas(), want.to_pandas(), name)
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            failed[name] = f"{type(e).__name__}: {e}"[:300]
        wall[name] = round(time.perf_counter() - t0, 3)
    ray.shutdown()
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "num_cpus": args.num_cpus,
        "ok": len(wall) - len(failed),
        "total": len(wall),
        "oracle_checked": sum(1 for q in wall if q in oracles),
        "failed": failed,
        "wall_sec": wall,
    }))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
