#!/usr/bin/env python
"""Memory-bounded streaming evidence (VERDICT r4 item 6): run the
flagship webtable encode at ~10x the bench row count and show the
sandbox never holds the dataset — peak RSS across the driver AND every
Ray worker stays far below the raw input size.

A sampler thread polls /proc every 200 ms and records:
  - driver RSS
  - sum + max of VmRSS over all ray:: worker processes
  - /proc/meminfo used (MemTotal - MemAvailable) delta vs start

Usage: python tools/streaming_rss.py [--rows 20000000] [--num-cpus 32]
Prints one JSON line; paste the result into BASELINE.md.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _proc_rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _ray_worker_pids() -> list[int]:
    out = []
    for p in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            with open(p, "rb") as f:
                cmd = f.read()
        except OSError:
            continue
        if b"ray::" in cmd or b"default_worker.py" in cmd:
            out.append(int(p.split("/")[2]))
    return out


def _meminfo_used_kb() -> int:
    vals = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            vals[k] = int(v.split()[0])
    return vals["MemTotal"] - vals["MemAvailable"]


class RssSampler(threading.Thread):
    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.stop = threading.Event()
        self.driver_peak_kb = 0
        self.workers_sum_peak_kb = 0
        self.worker_max_peak_kb = 0
        self.sys_used_start_kb = _meminfo_used_kb()
        self.sys_used_peak_kb = self.sys_used_start_kb

    def run(self) -> None:
        me = os.getpid()
        while not self.stop.is_set():
            self.driver_peak_kb = max(self.driver_peak_kb, _proc_rss_kb(me))
            rss = [_proc_rss_kb(p) for p in _ray_worker_pids()]
            if rss:
                self.workers_sum_peak_kb = max(self.workers_sum_peak_kb,
                                               sum(rss))
                self.worker_max_peak_kb = max(self.worker_max_peak_kb,
                                              max(rss))
            self.sys_used_peak_kb = max(self.sys_used_peak_kb,
                                        _meminfo_used_kb())
            time.sleep(0.2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)  # ~10x bench
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--out", default="/tmp/hpw_rss_out")
    args = ap.parse_args()

    import ray

    import numpy as np  # noqa: F401  (canary)

    t0 = time.perf_counter()
    np.arange(20_000_000)
    canary_ms = 1000 * (time.perf_counter() - t0)

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False)
    from hyparquet_writer_ray.core.options import WriteOptions
    from hyparquet_writer_ray.pipelines.write import write_parquet_dataset
    from hyparquet_writer_ray.sources.webtable import webtable_dataset

    import shutil

    shutil.rmtree(args.out, ignore_errors=True)
    # raw size: measured ~1.7 KB/row for the synthetic webtable
    ds = webtable_dataset(args.rows, rows_per_block=100_000)
    sampler = RssSampler()
    sampler.start()
    t0 = time.perf_counter()
    stats = write_parquet_dataset(
        ds, args.out, WriteOptions(auto_codec="smart"))
    wall = time.perf_counter() - t0
    sampler.stop.set()
    sampler.join(timeout=2)
    raw = stats["uncompressed_bytes"]
    print(json.dumps({
        "rows": stats["rows"],
        "parts": stats["parts"],
        "raw_gb": round(raw / 1e9, 3),
        "compressed_gb": round(stats["compressed_bytes"] / 1e9, 3),
        "wall_sec": round(wall, 2),
        "gbps_raw": round(raw / 1e9 / wall, 3),
        "driver_peak_rss_gb": round(sampler.driver_peak_kb / 1e6, 3),
        "workers_sum_peak_rss_gb": round(
            sampler.workers_sum_peak_kb / 1e6, 3),
        "worker_max_peak_rss_gb": round(
            sampler.worker_max_peak_kb / 1e6, 3),
        "system_used_delta_gb": round(
            (sampler.sys_used_peak_kb - sampler.sys_used_start_kb) / 1e6, 3),
        "num_cpus": args.num_cpus,
        "alloc_canary_ms": round(canary_ms, 1),
    }))
    ray.shutdown()
    shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
