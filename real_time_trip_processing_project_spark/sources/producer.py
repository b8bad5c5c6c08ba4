"""Event producer: trip CSVs → JSON-lines files in stream directories.

Engine equivalent of the reference's Kinesis producer
(``src/send_to_kinesis.py``): each CSV row becomes one JSON event
(S2: ``row.to_dict()`` → ``json.dumps`` — send_to_kinesis.py:45-50), and
each stream is a directory of JSON files that a Structured Streaming file
source consumes as micro-batches (S3/S4; one file ≈ one shard batch).

The producer can split events across several files and interleave or
delay streams to reproduce the reference's out-of-order arrival
(send_to_kinesis.py:71-79 sends all starts, sleeps 300 s, then all ends;
the spec requires tolerating arbitrary interleaving).
"""

from __future__ import annotations

import csv
import json
import math
import os
from typing import Iterable


#: Typed wire fields (the reference's producer sends pandas-inferred JSON
#: numbers, not strings — send_to_kinesis.py:26,34,45-50).  Everything
#: else (trip_id, datetime strings) stays a JSON string.
_INT_FIELDS = {"pickup_location_id", "dropoff_location_id", "vendor_id"}
_FLOAT_FIELDS = {
    "estimated_fare_amount",
    "rate_code",
    "passenger_count",
    "trip_distance",
    "fare_amount",
    "tip_amount",
    "payment_type",
    "trip_type",
}


def _rows_from_csv(path: str) -> list[dict]:
    with open(path, newline="") as fh:
        reader = csv.DictReader(fh)
        out = []
        for row in reader:
            clean: dict = {}
            for k, v in row.items():
                if v is None or v == "":
                    clean[k] = None  # SQL NULL, not NaN (SURVEY §3.2 note c)
                elif k in _INT_FIELDS:
                    clean[k] = int(float(v))
                elif k in _FLOAT_FIELDS:
                    clean[k] = float(v)
                else:
                    clean[k] = v
            out.append(clean)
        return out


def write_stream_files(
    events: Iterable[dict], out_dir: str, n_files: int = 1, prefix: str = "part"
) -> list[str]:
    """Write events as JSON-lines across ``n_files`` files (micro-batches)."""
    os.makedirs(out_dir, exist_ok=True)
    events = list(events)
    per = max(1, math.ceil(len(events) / n_files)) if events else 1
    paths = []
    for i in range(0, max(len(events), 1), per):
        chunk = events[i : i + per]
        path = os.path.join(out_dir, f"{prefix}-{i // per:05d}.json")
        with open(path, "w") as fh:
            for ev in chunk:
                fh.write(json.dumps(ev) + "\n")
        paths.append(path)
    return paths


def produce_trip_streams(
    start_csv: str,
    end_csv: str,
    start_dir: str,
    end_dir: str,
    n_files: int = 4,
) -> tuple[int, int]:
    """Replay the two trip CSVs into the start/end stream directories.

    Returns (n_start_events, n_end_events).
    """
    starts = _rows_from_csv(start_csv)
    ends = _rows_from_csv(end_csv)
    write_stream_files(starts, start_dir, n_files=n_files)
    write_stream_files(ends, end_dir, n_files=n_files)
    return len(starts), len(ends)


def produce_trip_waves(
    start_csv: str,
    end_csv: str,
    start_dir: str,
    end_dir: str,
    waves: int = 5,
    n_files: int = 4,
) -> tuple[int, int]:
    """Replay the trip CSVs ``waves`` times with disjoint trip-id
    namespaces (``w00-…``, ``w01-…``) — the steady-state throughput
    workload: one wave ≈ one micro-batch of a long-running stream, so a
    single query processes ``waves`` consecutive batches and per-batch
    engine overhead can be read off the query's own progress metrics
    instead of being confounded with query start/stop."""
    starts = _rows_from_csv(start_csv)
    ends = _rows_from_csv(end_csv)
    tot_s = tot_e = 0
    for w in range(waves):
        s2 = [{**r, "trip_id": f"w{w:02d}-{r['trip_id']}"} for r in starts]
        e2 = [{**r, "trip_id": f"w{w:02d}-{r['trip_id']}"} for r in ends]
        write_stream_files(s2, start_dir, n_files=n_files, prefix=f"w{w:02d}")
        write_stream_files(e2, end_dir, n_files=n_files, prefix=f"w{w:02d}")
        tot_s += len(s2)
        tot_e += len(e2)
    return tot_s, tot_e
