#!/usr/bin/env python
"""Measure the reference architecture's single-node ingest ceiling.

The reference (hotgluexyz/target-parquet) cannot run here (singer-sdk is
not installed), so this harness reproduces its DOCUMENTED per-record
cost structure with the same libraries it uses, citing the behaviors:

- jsonschema Draft-7 validation per record   (reference sinks.py:131-139)
- per-field Python coercion incl. dateutil   (reference sinks.py:71-110)
- batch buffer of 10,000 dicts               (reference sinks.py:118,168)
- pyarrow Table.from_pylist + writer append  (reference sinks.py:172-175)
- job_metrics.json READ+REWRITE per record   (reference writers.py:52-74)

Single process, single thread — the reference has no parallelism at all.
Prints one JSON line with rec/s for (a) the full loop including the
per-record metrics rewrite and (b) metrics amortized per batch (a
charitable variant), for comparison against this engine's measured
54-73k rec/s (BASELINE.md ingest section).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import jsonschema
import pyarrow as pa
import pyarrow.parquet as pq
from dateutil import parser as dateutil_parser

SCHEMA = {
    "type": "object",
    "properties": {
        "id": {"type": ["integer", "null"]},
        "v": {"type": ["number", "null"]},
        "name": {"type": ["string", "null"]},
        "ts": {"type": ["string", "null"], "format": "date-time"},
    },
}
ARROW = pa.schema(
    [("id", pa.int64()), ("v", pa.float64()), ("name", pa.string()), ("ts", pa.timestamp("us"))]
)


def _records(n):
    for i in range(n):
        yield {
            "id": i,
            "v": i * 1.5,
            "name": f"row-{i}",
            "ts": "2024-01-%02dT12:34:56" % (i % 28 + 1),
        }


def run(n: int, metrics_per_record: bool) -> float:
    validator = jsonschema.Draft7Validator(SCHEMA)
    d = tempfile.mkdtemp()
    metrics_path = os.path.join(d, "job_metrics.json")
    out = os.path.join(d, "out.parquet")
    writer = pq.ParquetWriter(out, ARROW)
    batch: list[dict] = []
    count = 0
    t0 = time.time()
    for rec in _records(n):
        validator.validate(rec)  # per-record draft-7 pass
        row = {
            "id": int(rec["id"]),
            "v": float(rec["v"]),
            "name": str(rec["name"]),
            "ts": dateutil_parser.parse(rec["ts"]),  # lenient parse per record
        }
        batch.append(row)
        count += 1
        if metrics_per_record:
            # reference: full file read + rewrite on EVERY record
            m = {}
            if os.path.exists(metrics_path):
                m = json.load(open(metrics_path))
            m["recordCount"] = m.get("recordCount", 0) + 1
            json.dump(m, open(metrics_path, "w"))
        if len(batch) >= 10000:
            writer.write_table(pa.Table.from_pylist(batch, schema=ARROW))
            batch = []
    if batch:
        writer.write_table(pa.Table.from_pylist(batch, schema=ARROW))
    writer.close()
    return count / (time.time() - t0)


def main() -> int:
    full = run(20_000, metrics_per_record=True)
    amortized = run(100_000, metrics_per_record=False)
    print(
        json.dumps(
            {
                "metric": "reference_cost_model_rec_per_sec",
                "as_written_with_per_record_metrics": round(full),
                "charitable_no_metrics_io": round(amortized),
                "threads": 1,
            }
        )
    )
    return 0


if __name__ == "__main__":
    return_code = main()
    raise SystemExit(return_code)
