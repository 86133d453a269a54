#!/usr/bin/env python
"""Memory-bounded streaming evidence (VERDICT r4 item 6).

Runs the flagship webtable read->encode pipeline at a multiple of the
bench row count while sampling, every 100 ms:

  * system used memory  = MemTotal - MemAvailable   (/proc/meminfo)
  * shmem               = Shmem                      (object store +
                          tmpfs input; the OUTPUT goes to disk so the
                          store is the only thing that can grow here)
  * sum of VmRSS over every process                  (conservative:
                          double-counts plasma pages mapped by several
                          workers)

and reports the peaks next to the dataset's raw size. If the pipeline
streamed (blocks flow read -> encode -> sink with backpressure and are
freed after their part file lands), every peak stays far below the raw
dataset size; a pipeline that materialized the input would show
used-memory growth of at least raw_bytes.

Usage: python tools/streaming_rss.py [--rows N] [--cpus N]
Prints one JSON line; record the sample in BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _meminfo() -> dict[str, int]:
    out = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            out[k] = int(v.split()[0]) * 1024
    return out


def _rss_sum() -> int:
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1]) * 1024
                        break
        except OSError:
            continue  # process exited between listdir and open
    return total


class _Monitor(threading.Thread):
    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.peak_used = 0
        self.peak_shmem = 0
        self.peak_rss = 0
        self._halt = threading.Event()

    def run(self) -> None:
        while not self._halt.is_set():
            mi = _meminfo()
            self.peak_used = max(self.peak_used,
                                 mi["MemTotal"] - mi["MemAvailable"])
            self.peak_shmem = max(self.peak_shmem, mi.get("Shmem", 0))
            self.peak_rss = max(self.peak_rss, _rss_sum())
            self._halt.wait(0.1)

    def stop(self) -> None:
        self._halt.set()
        self.join()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=9_600_000,
                    help="20x the sf0.1 bench rows by default")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    from bench import _ensure_webtable_input, _input_bytes
    from hyparquet_writer_ray.core.options import WriteOptions
    from hyparquet_writer_ray.pipelines.write import (
        read_parquet_fused, write_parquet_dataset)

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)
    inp = _ensure_webtable_input(args.rows)

    # output on DISK: tmpfs/shmem growth during the run is then object
    # store only, not finished part files
    out = "/tmp/hpw_streaming_rss_out"
    shutil.rmtree(out, ignore_errors=True)

    base = _meminfo()
    baseline_used = base["MemTotal"] - base["MemAvailable"]
    baseline_shmem = base.get("Shmem", 0)
    baseline_rss = _rss_sum()

    mon = _Monitor()
    mon.start()
    t0 = time.perf_counter()
    stats = write_parquet_dataset(
        read_parquet_fused(inp), out, WriteOptions(auto_codec="smart"),
        max_group_bytes=32 << 20, resume=False)
    wall = time.perf_counter() - t0
    mon.stop()
    ray.shutdown()

    raw = stats["uncompressed_bytes"]
    gib = 1 << 30
    print(json.dumps({
        "metric": "streaming_peak_memory",
        "rows": stats["rows"],
        "raw_bytes": raw,
        "raw_gib": round(raw / gib, 2),
        "input_parquet_bytes": _input_bytes(inp),
        "wall_sec": round(wall, 2),
        "raw_gbps": round(raw / wall / 1e9, 3),
        "num_cpus": args.cpus,
        "baseline_used_gib": round(baseline_used / gib, 2),
        "peak_used_gib": round(mon.peak_used / gib, 2),
        "delta_used_gib": round((mon.peak_used - baseline_used) / gib, 2),
        "baseline_shmem_gib": round(baseline_shmem / gib, 2),
        "peak_shmem_gib": round(mon.peak_shmem / gib, 2),
        "peak_rss_sum_gib": round(mon.peak_rss / gib, 2),
        "baseline_rss_sum_gib": round(baseline_rss / gib, 2),
        "parts": stats["parts"],
    }))
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
