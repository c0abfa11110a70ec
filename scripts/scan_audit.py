"""Redundant-scan audit: execute every queries() entry at a small SF and
report FileScan / ReusedExchange / BroadcastExchange counts from the
ADAPTIVE final plan (ReuseExchange only lands there).

A query whose final plan scans the same table many times is paying
multiples of the 100 TB read cost — the vocab_kl lesson (fixed from 4
scans to 1 by making null filters uniform so ReuseExchange fires).

Usage: python scripts/scan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Final Plan")[-1]
    cut = final.find("== Initial Plan ==")
    return final[:cut] if cut > 0 else final


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from transmog_spark.session import get_spark

    spark = get_spark("local[8]", shuffle_partitions=8)
    import __spark_entry__ as e

    rows = []
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()
            p = final_plan(df)
            rows.append(
                (
                    p.count("FileScan"),
                    p.count("ReusedExchange"),
                    p.count("BroadcastExchange"),
                    name,
                )
            )
        except Exception as ex:  # noqa: BLE001 - audit keeps going
            rows.append((-1, -1, -1, f"{name} ERROR {type(ex).__name__}"))
    e.release_session_caches()

    rows.sort(reverse=True)
    print(f"{'scans':>5} {'reuse':>5} {'bcast':>5}  query")
    for s, r, b, name in rows:
        print(f"{s:>5} {r:>5} {b:>5}  {name}")


if __name__ == "__main__":
    main()
