"""CLI: distributed parquet encode, runnable directly or as the script
of a ``ray job submit`` (the cluster deployment shape of the north
rule — on a real cluster Ray is initialized by the job runtime; here
we attach to the local cluster if none exists).

Examples:
  python -m hyparquet_writer_ray encode --input /data/in --output /data/out
  python -m hyparquet_writer_ray encode --input /data/in/*.parquet \
      --output /data/out --mode files --codec zstd --codec-level 12
  ray job submit --working-dir . -- \
      python -m hyparquet_writer_ray encode --input s3://... --output ...
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _build_opts(args):
    from .core.options import ColumnSpec, WriteOptions
    from .core.types import Codec

    specs = {}
    for col in args.fsst or []:
        specs[col] = ColumnSpec(fsst=True)
    for col in args.bloom or []:
        specs.setdefault(col, ColumnSpec()).bloom_filter = True
    return WriteOptions(
        codec=Codec[args.codec.upper()],
        codec_level=args.codec_level,
        auto_codec=args.auto_codec,
        column_specs=specs,
    )


def cmd_encode(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    import ray.data

    from .pipelines.write import (
        write_parquet_dataset,
        write_parquet_files,
        write_parquet_single_file,
    )

    opts = _build_opts(args)
    t0 = time.perf_counter()
    if args.mode == "files":
        paths = sorted(
            p for pat in args.input for p in glob.glob(
                os.path.join(pat, "*.parquet") if os.path.isdir(pat) else pat
            )
        )
        stats = write_parquet_files(
            paths, args.output, opts, resume=not args.no_resume,
            columns=args.columns,
        )
    else:
        ds = ray.data.read_parquet(args.input, columns=args.columns)
        if args.mode == "single-file":
            stats = write_parquet_single_file(ds, args.output, opts)
        else:
            stats = write_parquet_dataset(
                ds, args.output, opts, resume=not args.no_resume,
                repartition_blocks=args.repartition,
            )
    stats["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="hyparquet_writer_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    enc = sub.add_parser("encode", help="re-encode parquet input with this engine")
    enc.add_argument("--input", nargs="+", required=True,
                     help="input parquet files/dirs/globs")
    enc.add_argument("--output", required=True, help="output file or directory")
    enc.add_argument("--mode", choices=["dataset", "files", "single-file"],
                     default="dataset")
    enc.add_argument("--codec", default="snappy",
                     choices=["uncompressed", "snappy", "gzip", "zstd", "lz4_raw", "brotli"])
    enc.add_argument("--codec-level", type=int, default=None)
    enc.add_argument("--auto-codec", choices=["reference", "smart"], default="smart")
    enc.add_argument("--columns", nargs="*", default=None, help="column pruning")
    enc.add_argument("--fsst", nargs="*", default=None, help="FSST-compress these columns")
    enc.add_argument("--bloom", nargs="*", default=None, help="bloom filters on these columns")
    enc.add_argument("--repartition", type=int, default=None)
    enc.add_argument("--no-resume", action="store_true")
    enc.set_defaults(fn=cmd_encode)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
