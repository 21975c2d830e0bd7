"""CLI entry point: ``... | python -m target_parquet_spark --config cfg.json``.

Drop-in surface for the reference's ``target-parquet`` console script
(reference target_parquet/target.py:34-35, pyproject.toml:39-40): reads
newline-delimited Singer messages on stdin, writes per-stream Parquet, and
emits the final STATE to stdout (so a pipeline runner can checkpoint it).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="target-parquet-spark")
    ap.add_argument("--config", help="path to JSON config", default=None)
    ap.add_argument("--input", help="read messages from file instead of stdin", default=None)
    ap.add_argument(
        "--watch",
        metavar="DIR",
        default=None,
        help="streaming mode: continuously ingest Singer line files dropped "
        "into DIR (Structured Streaming; checkpoint under the output root)",
    )
    args = ap.parse_args(argv)

    config = {}
    if args.config:
        with open(args.config) as fh:
            config = json.load(fh)

    from target_parquet_spark.session import get_spark
    from target_parquet_spark.target import SingerTarget

    spark = get_spark(app_name="target-parquet-spark-cli")

    if args.watch:
        from target_parquet_spark.streaming import SingerStreamTarget

        query = SingerStreamTarget(spark, config).start(args.watch)
        query.awaitTermination()  # runs until killed; checkpoint resumes
        return 0

    target = SingerTarget(spark, config)

    if args.input:
        result = target.run_path(args.input)
    else:
        # Spool stdin to a temp file so Spark can scan it in parallel —
        # the pipe is consumed once, the scan may run many tasks.
        with tempfile.NamedTemporaryFile("w", suffix=".jsonl", delete=False) as tmp:
            for line in sys.stdin:
                tmp.write(line)
            path = tmp.name
        result = target.run_path(path)

    counts = result["metrics"]["recordCount"]
    print(
        json.dumps({"recordCount": counts, "paths": result["paths"]}),
        file=sys.stderr,
    )
    if result["state"] is not None:
        print(json.dumps(result["state"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
