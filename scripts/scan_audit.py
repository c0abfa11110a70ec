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


def dup_scans(final: str) -> tuple[int, str]:
    """(max scans of any single table, 'tbl xN' summary of re-scanned ones).

    Multi-table queries legitimately scan several files; only SAME-table
    re-scans indicate redundant corpus passes."""
    import re
    from collections import Counter

    paths = Counter(
        m.group(1).rsplit("/", 1)[-1].removesuffix(".parquet")
        for m in re.finditer(r"InMemoryFileIndex\(\d+ paths\)\[([^\],]+)", final)
    )
    worst = max(paths.values(), default=0)
    summary = ",".join(f"{t}x{n}" for t, n in paths.most_common() if n > 1)
    return worst, summary


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
            worst, summary = dup_scans(p)
            rows.append(
                (
                    worst,
                    p.count("FileScan"),
                    p.count("ReusedExchange"),
                    name + ("  [" + summary + "]" if summary else ""),
                )
            )
        except Exception as ex:  # noqa: BLE001 - audit keeps going
            rows.append((-1, -1, -1, f"{name} ERROR {type(ex).__name__}"))
    e.release_session_caches()

    rows.sort(reverse=True)
    print(f"{'worst':>5} {'scans':>5} {'reuse':>5}  query  [same-table re-scans]")
    for w, s, r, name in rows:
        print(f"{w:>5} {s:>5} {r:>5}  {name}")


if __name__ == "__main__":
    main()
