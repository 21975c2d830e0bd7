#!/usr/bin/env python
"""Dump the physical plan of any registry query.

Usage: python scripts/explain.py <query_name> [--sf DIR] [--mode formatted]

Handy for plan review: check PushedFilters / ReadSchema on scans,
BroadcastHashJoin vs SortMergeJoin choices, ReusedExchange in the
self-join pipelines, and WholeStageCodegen span boundaries.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
    )
    args = ap.parse_args()

    import __spark_entry__ as entry
    from target_parquet_spark.session import get_spark

    qs = entry.queries()
    if args.name not in qs:
        import difflib

        close = difflib.get_close_matches(args.name, qs, n=5, cutoff=0.3)
        print(f"unknown query {args.name!r}; close: {close}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="explain")
    qs[args.name](spark, args.sf).explain(args.mode)
    return 0


if __name__ == "__main__":
    sys.exit(main())
